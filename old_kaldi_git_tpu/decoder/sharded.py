"""Graph-sharded token-sparse beam decoding over a device mesh.

For graphs whose arc tensors exceed one chip's HBM (the README's
"huge-graph decoding wants graph sharding" gap; reference scale point:
LibriSpeech fglarge HCLG is multi-GB — src/decoder/lattice-faster-decoder.cc
only ever holds it in host RAM, one process per job).  TPU-native design:

  * states are partitioned into N contiguous ranges, balanced by arc-TILE
    count, so each device stores only its shard of the per-state MD-arc
    tile table (csr.build_tile_graph) — the HBM hog splits N ways, and so
    does the per-frame gather traffic (the kernel's bottleneck).
  * the token set [B, K] stays replicated (it is tiny).  Each frame,
    every device expands only the tokens whose state lives in its range
    (their tiles are device-local by construction), dedups and
    top-K-prunes locally, then the candidates are merged with a
    ROW-PARTITIONED exact merge: an `all_to_all` routes each batch row's
    N candidate lists to the row's owner device, which performs the
    global dedup-min + top-K for its B/N rows ONCE (sort by
    (dest, cost), first-of-run dedup, sorted-slice top-K), and an
    `all_gather` redistributes the merged beams.  Wire cost is ~6·B·K
    words/device/frame independent of N (vs a butterfly's 3BK·log2 N or
    a replicated all_gather's 3BK·N), and the merge work is done once
    globally rather than replicated per device (r4's butterfly merge
    replicated it N-fold — measured 0.28 relative throughput at N=8
    virtual; row-partitioning measures 0.72).  No scatter into [B, S]
    ever exists.
  * both the local and global top-K selections are 1-key sorts + static
    slices (not lax.top_k + take_along_axis — per-element gathers are
    the kernel's pathology on TPU; see viterbi._decode_scan_tokens),
    so the N=1 "sharding tax" is two extra [B, K]-ish sorts plus the
    all_gather, not a second expansion pipeline.

  Local top-K before the gather is exact, not approximate: dedup keeps
  the min cost per dest, so if a local candidate is dropped by local
  top-K, the K local survivors that beat it can only get *better* after
  the global merge — the dropped candidate could never enter the global
  top-K.

Validated for equivalence against the single-device token kernel on a
virtual 8-device CPU mesh (tests/test_sharded_decoder.py) and dry-run as
part of __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from old_kaldi_git_tpu.decoder.csr import CsrGraph, build_tile_graph
from old_kaldi_git_tpu.decoder.viterbi import (
    BIG,
    DecodeResult,
    ViterbiOptions,
    results_from_arcs,
)
from old_kaldi_git_tpu.ops.gather_kernel import batched_table_gather
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger

log = get_logger("sharded")


@dataclasses.dataclass
class ShardedCsrGraph:
    """Host-side shard plan for a CsrGraph: N contiguous state ranges
    balanced by arc-tile count, each with local (0-based) tile_ptr and
    its slice of the [*, MD, 3] tile table.  Built once per (graph, N);
    device placement happens in the decode call."""

    graph: CsrGraph
    md: int
    lo: np.ndarray        # [N] first state of each shard
    tile_off: np.ndarray  # [N] global tile id of each shard's first tile
    tile_ptr: np.ndarray  # [N, SL+1] local tile_ptr (padded states: 0 tiles)
    tiles: np.ndarray     # [N, TL, MD, 3] int32 (w bitcast, pdf, nextstate)
    pad2orig: np.ndarray  # [Ntile*md] padded arc id -> graph arc id

    @property
    def num_shards(self) -> int:
        return len(self.lo)

    @property
    def states_per_shard(self) -> int:
        return self.tile_ptr.shape[1] - 1

    @property
    def tiles_per_shard(self) -> int:
        return self.tiles.shape[1]

    def device_arrays(self, mesh, axis: str):
        """(tile_ptr, tiles, lo, tile_off) placed ONCE with the exact
        NamedSharding the shard_map program consumes — cached per mesh.
        (A default-placement upload gets resharded on every call, which
        on the tunneled runtime round-trips the tile tables through the
        host: measured 60 s/call at minilib scale.)"""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        # keyed on the Mesh object itself (hashable), not id(mesh): an
        # id can be reused by a new Mesh after the original is collected,
        # which would return arrays placed for the dead mesh
        key = (mesh, axis)
        cache = getattr(self, "_dev", None)
        if cache is not None and cache[0] == key:
            return cache[1]
        sh = NamedSharding(mesh, PartitionSpec(axis))
        arrs = tuple(
            jax.device_put(a, sh)
            for a in (self.tile_ptr, self.tiles, self.lo, self.tile_off))
        self._dev = (key, arrs)
        return arrs


def shard_graph(graph: CsrGraph, num_shards: int) -> ShardedCsrGraph:
    """Partition states into `num_shards` contiguous ranges with ~equal
    tile counts (tile storage and gather traffic are what must balance;
    state counts may be skewed)."""
    if graph.eps_ns is not None:
        raise KaldiError(
            "sharded decode needs a folded-eps graph: split-eps backoff "
            "hops are not wired into the sharded kernel yet (decoding "
            "over emitting arcs only would silently drop backoff "
            "transitions)")
    tg = build_tile_graph(graph)
    S = graph.num_states
    NT = tg.num_tiles
    tp = tg.tile_ptr.astype(np.int64)
    targets = (NT * np.arange(1, num_shards) / num_shards).astype(np.int64)
    cuts = np.searchsorted(tp, targets, side="left")
    bounds = np.concatenate([[0], np.clip(cuts, 0, S), [S]])
    bounds = np.maximum.accumulate(bounds).astype(np.int64)
    lo = bounds[:-1]
    hi = bounds[1:]
    SL = int((hi - lo).max())
    TL = int(max(1, (tp[hi] - tp[lo]).max()))
    tile_ptr = np.zeros((num_shards, SL + 1), np.int32)
    tiles = np.zeros((num_shards, TL, tg.md, 3), np.int32)
    # padding tiles must carry w=BIG so their arcs never become candidates
    tiles[..., 0] = np.array([BIG], np.float32).view(np.int32)[0]
    for d in range(num_shards):
        n = int(hi[d] - lo[d])
        local = tp[lo[d]:hi[d] + 1] - tp[lo[d]]
        tile_ptr[d, :n + 1] = local
        tile_ptr[d, n + 1:] = local[-1]  # padded states: zero tiles
        t0, t1 = int(tp[lo[d]]), int(tp[hi[d]])
        tiles[d, : t1 - t0] = tg.tiles[t0:t1]
    return ShardedCsrGraph(
        graph=graph,
        md=tg.md,
        lo=lo.astype(np.int32),
        tile_off=tp[lo].astype(np.int32),
        tile_ptr=tile_ptr,
        tiles=tiles,
        pad2orig=tg.pad2orig,
    )


@lru_cache(maxsize=32)
def _sharded_token_scan(mesh: Mesh, axis: str, K: int, ET: int, S: int,
                        SL: int):
    """Build the jitted shard_map program (closed over static shapes;
    memoized — a fresh jax.jit wrapper per call would retrace/rebuild
    the program every decode)."""

    def run(tile_ptr_loc, tiles_loc, lo, tile_off, start, loglikes,
            num_frames, acoustic_scale, beam):
        tile_ptr_loc = tile_ptr_loc[0]   # [SL+1]
        tiles_loc = tiles_loc[0]         # [TL, MD, 3]
        lo_d = lo[0]
        tile_off_d = tile_off[0]
        B, T, Pdim = loglikes.shape
        TL, MD, _ = tiles_loc.shape
        E = ET * MD
        j = jnp.arange(ET, dtype=jnp.int32)
        tok_state0 = jnp.full((B, K), -1, jnp.int32).at[:, 0].set(start)
        tok_cost0 = jnp.full((B, K), BIG, jnp.float32).at[:, 0].set(0.0)
        # the carry is device-varying in the manual-axes type system (it is
        # rebuilt from gathered candidates each frame, equal on all devices
        # by construction but not provably so) — cast the initial carry to
        # match
        tok_state0 = jax.lax.pcast(tok_state0, axis, to="varying")
        tok_cost0 = jax.lax.pcast(tok_cost0, axis, to="varying")

        def expand_md(x):
            return jnp.broadcast_to(x[:, :, None], (B, ET, MD)).reshape(B, E)

        def frame_update(tok_state, tok_cost, ll_t, t):
            s_loc = tok_state - lo_d
            live = ((tok_state >= 0) & (tok_cost < BIG)
                    & (s_loc >= 0) & (s_loc < SL))
            s_cl = jnp.clip(s_loc, 0, SL - 1)
            rp = tile_ptr_loc[s_cl]
            deg = jnp.where(live, tile_ptr_loc[s_cl + 1] - rp, 0)
            cum = jnp.cumsum(deg, axis=1)
            prev = jnp.concatenate(
                [jnp.zeros((B, 1), jnp.int32), cum[:, :-1]], axis=1)
            # stacked run-start scatter-add + cumsum (one scatter for all
            # three run quantities — viterbi._decode_scan_tokens)

            def deltas(vals):
                return jnp.diff(
                    vals, axis=1, prepend=jnp.zeros((B, 1), jnp.int32))

            stacked = jnp.stack(
                [deltas(cum), deltas(rp - prev),
                 deltas(jax.lax.bitcast_convert_type(tok_cost, jnp.int32))],
                axis=-1)
            scat = jnp.zeros((B, ET, 3), jnp.int32).at[
                jnp.arange(B)[:, None], prev].add(stacked, mode="drop")
            bases = jnp.cumsum(scat, axis=1)
            valid = j[None, :] < bases[..., 0]
            tile = jnp.clip(bases[..., 1] + j[None, :], 0, TL - 1)
            base_cost = jax.lax.bitcast_convert_type(
                bases[..., 2], jnp.float32)
            rows = jnp.take(tiles_loc, tile, axis=0)  # [B, ET, MD, 3]
            w_arc = jax.lax.bitcast_convert_type(
                rows[..., 0].reshape(B, E), jnp.float32)
            pdf_arc = rows[..., 1].reshape(B, E)
            ns_arc = rows[..., 2].reshape(B, E)
            garc = ((tile + tile_off_d) * MD)[:, :, None]
            garc = (garc + jnp.arange(MD, dtype=jnp.int32)[None, None, :]
                    ).reshape(B, E)
            base_cost = expand_md(
                jax.lax.bitcast_convert_type(base_cost, jnp.int32))
            base_cost = jax.lax.bitcast_convert_type(base_cost, jnp.float32)
            valid = expand_md(valid.astype(jnp.int32)) > 0
            # one-hot Pallas gather on TPU (ops/gather_kernel.py);
            # take_along_axis fallback elsewhere — bit-exact either way
            ac = acoustic_scale * batched_table_gather(
                ll_t, jnp.minimum(pdf_arc, Pdim - 1))
            valid = valid & (w_arc < BIG)  # mask tile-padding arcs
            cost = base_cost + w_arc - ac
            dest = jnp.where(valid, ns_arc, S)
            cost = jnp.where(valid, jnp.minimum(cost, BIG), BIG)
            garc = jnp.where(valid, garc, -1)
            dest_s, cost_s, arc_s = jax.lax.sort(
                (dest, cost, garc), dimension=1, num_keys=2)
            first = jnp.concatenate(
                [jnp.ones((B, 1), bool), dest_s[:, 1:] != dest_s[:, :-1]],
                axis=1)
            lcand = jnp.where(first & (dest_s < S), cost_s, BIG)
            # local top-K: 1-key sort + static slice
            l_cost, l_state, l_arc = (
                x[:, :K] for x in
                jax.lax.sort((lcand, dest_s, arc_s), dimension=1,
                             num_keys=1))
            l_state = jnp.where(l_cost < BIG, l_state, S)
            N = mesh.shape[axis]
            if N >= 2:
                # ROW-PARTITIONED merge: each device owns ceil(B/N) batch
                # rows; an all_to_all routes every device's candidates for
                # those rows to their owner, which performs the global
                # dedup-min + top-K for its rows ONCE; an all_gather
                # redistributes the merged beams.  The butterfly replicates
                # the whole merge on every device (log2 N stages × 2 sorts
                # of 2K each, N-fold redundant); here total merge work is
                # one sort of N·K per row GLOBALLY, and the wire carries
                # ~2·3·B·K/N·(N−1) words/device/frame (≈6BK at large N)
                # vs the butterfly's 3BK·log2 N — less beyond N=4.
                Bp = -(-B // N) * N
                pk = jnp.stack(
                    [l_state,
                     jax.lax.bitcast_convert_type(l_cost, jnp.int32),
                     l_arc], axis=-1)  # [B, K, 3]
                if Bp > B:
                    fill = jnp.stack(
                        [jnp.full((Bp - B, K), S, jnp.int32),
                         jnp.full((Bp - B, K), jax.lax.bitcast_convert_type(
                             jnp.float32(BIG), jnp.int32), jnp.int32),
                         jnp.full((Bp - B, K), -1, jnp.int32)], axis=-1)
                    pk = jnp.concatenate([pk, fill], 0)
                recv = jax.lax.all_to_all(
                    pk, axis, split_axis=0, concat_axis=1, tiled=True
                )  # [Bp/N, N·K, 3]: block d = device d's cands for my rows
                gs = recv[..., 0]
                gc = jax.lax.bitcast_convert_type(recv[..., 1], jnp.float32)
                ga = recv[..., 2]
                ds, cc2, ca2 = jax.lax.sort(
                    (gs, gc, ga), dimension=1, num_keys=2)
                Bo = ds.shape[0]
                fst = jnp.concatenate(
                    [jnp.ones((Bo, 1), bool), ds[:, 1:] != ds[:, :-1]],
                    axis=1)
                cand = jnp.where(fst & (ds < S), cc2, BIG)
                r_cost, r_state, r_arc = (
                    x[:, :K] for x in
                    jax.lax.sort((cand, ds, ca2), dimension=1, num_keys=1))
                r_state = jnp.where(r_cost < BIG, r_state, S)
                merged = jnp.stack(
                    [r_state,
                     jax.lax.bitcast_convert_type(r_cost, jnp.int32),
                     r_arc], axis=-1)  # [Bp/N, K, 3]
                allr = jax.lax.all_gather(merged, axis, tiled=True)
                new_state = allr[:B, :, 0]
                new_cost = jax.lax.bitcast_convert_type(
                    allr[:B, :, 1], jnp.float32)
                new_arc = allr[:B, :, 2]
            else:
                # N == 1: no merge — the local select IS the global one
                # (the sharding tax at N=1 must stay ~1.0x)
                new_cost, new_state, new_arc = l_cost, l_state, l_arc
            keep = ((new_cost <= new_cost[:, :1] + beam)
                    & (new_cost < BIG) & (new_state < S))
            new_cost = jnp.where(keep, new_cost, BIG)
            new_state = jnp.where(keep, new_state, -1)
            new_arc = jnp.where(keep, new_arc, -1)
            active = (t < num_frames)[:, None]
            out_state = jnp.where(active, new_state, tok_state)
            out_cost = jnp.where(active, new_cost, tok_cost)
            bp_state = jnp.where(active, new_state, -1)
            bp_arc = jnp.where(active, new_arc, -1)
            bp_cost = jnp.where(active, new_cost, BIG)
            return out_state, out_cost, bp_state, bp_arc, bp_cost

        def step(carry, inputs):
            tok_state, tok_cost = carry
            ll_t, t = inputs
            o_s, o_c, b_s, b_a, b_c = frame_update(tok_state, tok_cost,
                                                   ll_t, t)
            return (o_s, o_c), (b_s, b_a, b_c)

        (tok_state, tok_cost), (bp_state, bp_arc, bp_cost) = jax.lax.scan(
            step, (tok_state0, tok_cost0),
            (jnp.swapaxes(loglikes, 0, 1), jnp.arange(T)),
        )
        # outputs are equal on all devices but typed device-varying (no
        # varying→invariant pcast exists): emit them under a sharded
        # leading axis of 1; the host reads shard 0
        return (tok_state[None], tok_cost[None], bp_state[None],
                bp_arc[None], bp_cost[None])

    mapped = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis),
                  P(), P(), P(), P(), P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        # the Pallas one-hot gather's out ShapeDtypeStruct carries no vma
        # annotation, which the manual-axes type checker rejects on real
        # TPU; the kernel is elementwise in the batch so the check adds
        # no safety here
        check_vma=False,
    )
    return jax.jit(mapped)


@lru_cache(maxsize=32)
def _sharded_backtrace_prog(mesh: Mesh, axis: str, MD: int, SL: int,
                            TL: int):
    """On-device backtrace over the (device-resident, sharded-output)
    [1, T, B, K] backpointer tensors: only the [T, B] winning-arc ids
    ever reach the host.  The arc→source-state lookup is owner-computed:
    the shard whose tile range contains the arc's tile searchsorts its
    LOCAL tile_ptr and contributes the source via a psum (exactly one
    shard owns any arc).  Fetching the backpointers to the host instead
    cost ~9 s/chunk over the tunneled link at minilib scale."""

    def run(tile_ptr_loc, lo, tile_off, bp_state, bp_arc, end_states,
            num_frames):
        tile_ptr_loc = tile_ptr_loc[0]
        lo_d = lo[0]
        off_d = tile_off[0]
        bp_state = bp_state[0]  # [T, B, K]
        bp_arc = bp_arc[0]
        T = bp_state.shape[0]
        end_states = jax.lax.pcast(end_states, axis, to="varying")

        def step(state, inputs):
            bps_t, bpa_t, t = inputs
            match = bps_t == state[:, None]
            slot = jnp.argmax(match, axis=1)
            found = jnp.take_along_axis(match, slot[:, None], 1)[:, 0]
            arc = jnp.take_along_axis(bpa_t, slot[:, None], 1)[:, 0]
            active = (t < num_frames) & found & (arc >= 0)
            tile_g = jnp.maximum(arc, 0) // MD
            tl_loc = tile_g - off_d
            # ownership by the shard's REAL tile count (tile_ptr_loc[SL]),
            # not the padded TL — padded ranges overlap the next shard's
            # real tiles and would double-contribute to the psum
            local = active & (tl_loc >= 0) & (tl_loc < tile_ptr_loc[-1])
            src_loc = jnp.searchsorted(
                tile_ptr_loc, jnp.clip(tl_loc, 0, TL).astype(jnp.int32),
                side="right").astype(jnp.int32) - 1
            tot_state = jax.lax.psum(
                jnp.where(local, lo_d + src_loc, 0), axis)
            tot_act = jax.lax.psum(local.astype(jnp.int32), axis)
            arc_out = jnp.where(active, arc, -1)
            new_state = jnp.where(tot_act > 0, tot_state, state)
            return new_state, arc_out

        _, arcs_rev = jax.lax.scan(
            step, end_states, (bp_state, bp_arc, jnp.arange(T)),
            reverse=True)
        return arcs_rev[None]  # [1, T, B] under the mesh axis

    mapped = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(mapped)


def _host_backtrace(bp_state: np.ndarray, bp_arc: np.ndarray,
                    frm: np.ndarray, end_states: np.ndarray,
                    num_frames: np.ndarray) -> np.ndarray:
    """Numpy backtrace over [T, B, K] backpointers.  The on-device version
    (viterbi._backtrace_scan) gathers arc→source from a device array; at
    sharded-graph scale that array is exactly what must NOT live on one
    device, so the walk runs on the host (frm stays host RAM).  Arc ids
    here are PADDED tile-slot ids; frm must be indexed accordingly."""
    T, B, K = bp_state.shape
    arcs = np.full((T, B), -1, np.int64)
    state = end_states.astype(np.int64).copy()
    rows = np.arange(B)
    for t in range(T - 1, -1, -1):
        match = bp_state[t] == state[:, None]           # [B, K]
        slot = match.argmax(axis=1)
        found = match[rows, slot]
        arc = bp_arc[t, rows, slot].astype(np.int64)
        active = (t < num_frames) & found & (arc >= 0)
        arcs[t] = np.where(active, arc, -1)
        state = np.where(active, frm[np.maximum(arc, 0)], state)
    return arcs


def decode_batch_tokens_sharded(
    graph: CsrGraph | ShardedCsrGraph,
    loglikes: np.ndarray,
    num_frames: Sequence[int],
    mesh: Optional[Mesh] = None,
    axis: str = "graph",
    opts: Optional[ViterbiOptions] = None,
    want_lattice: bool = False,
) -> List[Optional[DecodeResult]]:
    """Graph-sharded analog of viterbi.decode_batch_tokens: identical
    result contract, tile tensors split over `mesh`'s `axis` devices.
    Pass a prebuilt ShardedCsrGraph to amortize the shard plan."""
    opts = opts or ViterbiOptions()
    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()), (axis,))
    N = mesh.shape[axis]
    if isinstance(graph, ShardedCsrGraph):
        sg = graph
        if sg.num_shards != N:
            raise ValueError(
                f"shard plan has {sg.num_shards} shards, mesh axis has {N}")
        graph = sg.graph
    else:
        sg = shard_graph(graph, N)
    if graph.eps_ns is not None:
        raise KaldiError(
            "decode_batch_tokens_sharded needs a folded-eps graph "
            "(split-eps backoff hops not wired into the sharded kernel)")
    B, T, _ = loglikes.shape
    S = graph.num_states
    K = max(4, min(opts.max_active, S))
    # per-shard tile budget: same 1.25x headroom rule as
    # viterbi._token_budget against the LOCAL tile share; N>1 gets 1.5x
    # extra slack for shard skew of the active set (at N=1 the budget
    # must EQUAL the unsharded kernel's or the tax is a wider kernel)
    TL = sg.tiles_per_shard
    NT = int(sg.tile_off[-1]) + TL  # ≈ total tiles
    mean_tiles = max(1.0, NT / max(1, S))
    skew = 1.5 if N > 1 else 1.0
    ET = int(min(TL, max(1.25 * K * mean_tiles * skew / N, 1.25 * K / N)))
    ET = max(128, (ET + 127) // 128 * 128)
    num_frames = np.asarray(num_frames, np.int32)

    tile_ptr_d, tiles_d, lo_d, tile_off_d = sg.device_arrays(mesh, axis)
    prog = _sharded_token_scan(mesh, axis, K, ET, S, sg.states_per_shard)
    tok_state, tok_cost, bp_state, bp_arc, bp_cost = prog(
        tile_ptr_d, tiles_d, lo_d, tile_off_d,
        jnp.int32(graph.start), jnp.asarray(loglikes, jnp.float32),
        jnp.asarray(num_frames), jnp.float32(opts.acoustic_scale),
        jnp.float32(opts.beam),
    )
    tok_state_h = np.asarray(tok_state[0])
    tok_cost_h = np.asarray(tok_cost[0])
    fw = np.where(np.isfinite(graph.final_weight), graph.final_weight, BIG)
    end_states = np.zeros(B, np.int32)
    costs = np.zeros(B, np.float64)
    use_final = np.zeros(B, bool)
    for b in range(B):
        sb = tok_state_h[b]
        cb = np.where(sb >= 0, tok_cost_h[b], BIG)
        total = cb + fw[np.maximum(sb, 0)]
        if total.min() >= BIG:
            total = cb
        else:
            use_final[b] = True
        slot = int(np.argmin(total))
        costs[b] = float(total[slot])
        end_states[b] = sb[slot]
    # on-device backtrace over the device-resident backpointers; only
    # [T, B] arc ids cross the link (the [T, B, K] tensors never do
    # unless want_lattice needs them host-side for record rebuild)
    bprog = _sharded_backtrace_prog(mesh, axis, sg.md,
                                    sg.states_per_shard, TL)
    arcs = np.asarray(bprog(
        tile_ptr_d, lo_d, tile_off_d, bp_state, bp_arc,
        jnp.asarray(np.maximum(end_states, 0)),
        jnp.asarray(num_frames))[0])
    tg = build_tile_graph(graph)
    arcs = np.where(arcs >= 0, tg.pad2orig[np.maximum(arcs, 0)], -1)
    return results_from_arcs(
        graph, arcs, end_states, use_final, costs, num_frames,
        frame_states=np.asarray(bp_state[0]) if want_lattice else None,
        frame_costs=np.asarray(bp_cost[0]) if want_lattice else None,
    )
