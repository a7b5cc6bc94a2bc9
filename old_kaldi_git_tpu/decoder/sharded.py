"""Graph-sharded token-sparse beam decoding over a device mesh.

For graphs whose arc tensors exceed one chip's HBM (the README's
"huge-graph decoding wants graph sharding" gap; reference scale point:
LibriSpeech fglarge HCLG is multi-GB — src/decoder/lattice-faster-decoder.cc
only ever holds it in host RAM, one process per job).  TPU-native design:

  * states are partitioned into N contiguous ranges, balanced by ARC
    count, so each device stores only its shard's packed arc rows
    ([A/N, 3] int32) and local row_ptr — the HBM hog splits N ways, and
    so does the per-frame gather bandwidth (the kernel's bottleneck).
  * the token set [B, K] stays replicated (it is tiny).  Each frame,
    every device expands only the tokens whose state lives in its range
    (their out-arcs are device-local by construction), dedups and
    top-K-prunes locally, then `all_gather`s its K candidates over the
    ICI — [B, 3K] words per device per frame — and all devices compute
    the identical global merge (sort by (dest, cost), first-of-run
    dedup, top-K, beam gate).  No scatter into [B, S] ever exists.

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
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from old_kaldi_git_tpu.decoder.csr import CsrGraph
from old_kaldi_git_tpu.decoder.viterbi import (
    BIG,
    DecodeResult,
    ViterbiOptions,
    results_from_arcs,
)
from old_kaldi_git_tpu.ops.gather_kernel import batched_table_gather
from old_kaldi_git_tpu.utils.log import get_logger

log = get_logger("sharded")


@dataclasses.dataclass
class ShardedCsrGraph:
    """Host-side shard plan for a CsrGraph: N contiguous state ranges
    balanced by arc count, each with local (0-based) row_ptr and padded
    packed arc rows.  Built once per (graph, N); device placement happens
    in the decode call."""

    graph: CsrGraph
    lo: np.ndarray        # [N] first state of each shard
    arc_off: np.ndarray   # [N] global arc id of each shard's first arc
    row_ptr: np.ndarray   # [N, SL+1] local row_ptr (padded states: deg 0)
    packed: np.ndarray    # [N, AL, 3] int32 (w bitcast, pdf, nextstate)

    @property
    def num_shards(self) -> int:
        return len(self.lo)

    @property
    def states_per_shard(self) -> int:
        return self.row_ptr.shape[1] - 1

    @property
    def arcs_per_shard(self) -> int:
        return self.packed.shape[1]


def shard_graph(graph: CsrGraph, num_shards: int) -> ShardedCsrGraph:
    """Partition states into `num_shards` contiguous ranges with ~equal
    arc counts (arc storage and gather traffic are what must balance;
    state counts may be skewed)."""
    S, A = graph.num_states, graph.num_arcs
    rp = graph.row_ptr.astype(np.int64)
    targets = (A * np.arange(1, num_shards) / num_shards).astype(np.int64)
    cuts = np.searchsorted(rp, targets, side="left")
    bounds = np.concatenate([[0], np.clip(cuts, 0, S), [S]])
    bounds = np.maximum.accumulate(bounds).astype(np.int64)
    lo = bounds[:-1]
    hi = bounds[1:]
    SL = int((hi - lo).max())
    AL = int(max(1, (rp[hi] - rp[lo]).max()))
    row_ptr = np.zeros((num_shards, SL + 1), np.int32)
    packed = np.zeros((num_shards, AL, 3), np.int32)
    w_bits = np.ascontiguousarray(
        graph.weight.astype(np.float32)).view(np.int32)
    for d in range(num_shards):
        n = int(hi[d] - lo[d])
        local = rp[lo[d]:hi[d] + 1] - rp[lo[d]]
        row_ptr[d, :n + 1] = local
        row_ptr[d, n + 1:] = local[-1]  # padded states: zero out-degree
        a0, a1 = int(rp[lo[d]]), int(rp[hi[d]])
        packed[d, : a1 - a0, 0] = w_bits[a0:a1]
        packed[d, : a1 - a0, 1] = graph.pdf[a0:a1]
        packed[d, : a1 - a0, 2] = graph.nextstate[a0:a1]
    return ShardedCsrGraph(
        graph=graph,
        lo=lo.astype(np.int32),
        arc_off=rp[lo].astype(np.int32),
        row_ptr=row_ptr,
        packed=packed,
    )


def _sharded_token_scan(mesh: Mesh, axis: str, K: int, E: int, S: int,
                        SL: int):
    """Build the jitted shard_map program (closed over static shapes)."""

    def run(row_ptr_loc, packed_loc, lo, arc_off, start, loglikes,
            num_frames, acoustic_scale, beam):
        row_ptr_loc = row_ptr_loc[0]   # [SL+1]
        packed_loc = packed_loc[0]     # [AL, 3]
        lo_d = lo[0]
        arc_off_d = arc_off[0]
        B, T, Pdim = loglikes.shape
        AL = packed_loc.shape[0]
        j = jnp.arange(E, dtype=jnp.int32)
        tok_state0 = jnp.full((B, K), -1, jnp.int32).at[:, 0].set(start)
        tok_cost0 = jnp.full((B, K), BIG, jnp.float32).at[:, 0].set(0.0)
        # the carry is device-varying in the manual-axes type system (it is
        # rebuilt from gathered candidates each frame, equal on all devices
        # by construction but not provably so) — cast the initial carry to
        # match
        tok_state0 = jax.lax.pcast(tok_state0, axis, to="varying")
        tok_cost0 = jax.lax.pcast(tok_cost0, axis, to="varying")

        def frame_update(tok_state, tok_cost, ll_t, t):
            s_loc = tok_state - lo_d
            live = ((tok_state >= 0) & (tok_cost < BIG)
                    & (s_loc >= 0) & (s_loc < SL))
            s_cl = jnp.clip(s_loc, 0, SL - 1)
            rp = row_ptr_loc[s_cl]
            deg = jnp.where(live, row_ptr_loc[s_cl + 1] - rp, 0)
            cum = jnp.cumsum(deg, axis=1)
            prev = jnp.concatenate(
                [jnp.zeros((B, 1), jnp.int32), cum[:, :-1]], axis=1)
            cum_of = jax.lax.cummax(
                jnp.zeros((B, E), jnp.int32)
                .at[jnp.arange(B)[:, None], prev]
                .max(cum, mode="drop"),
                axis=1)
            valid = j[None, :] < cum_of
            # per-token bases broadcast to slots via exact delta-cumsum
            # (see viterbi._decode_scan_tokens bcast_tokens_i32: >100x
            # cheaper than take_along_axis gathers at this shape)

            def bcast(vals):
                delta = jnp.diff(
                    vals, axis=1, prepend=jnp.zeros((B, 1), jnp.int32))
                scat = jnp.zeros((B, E), jnp.int32).at[
                    jnp.arange(B)[:, None], prev].add(delta, mode="drop")
                return jnp.cumsum(scat, axis=1)

            arc = jnp.clip(
                bcast(rp - prev) + j[None, :], 0, AL - 1)
            base_cost = jax.lax.bitcast_convert_type(
                bcast(jax.lax.bitcast_convert_type(tok_cost, jnp.int32)),
                jnp.float32)
            rows = jnp.take(packed_loc, arc, axis=0)  # [B, E, 3]
            w_arc = jax.lax.bitcast_convert_type(rows[..., 0], jnp.float32)
            pdf_arc = rows[..., 1]
            ns_arc = rows[..., 2]
            # one-hot Pallas gather on TPU (ops/gather_kernel.py);
            # take_along_axis fallback elsewhere — bit-exact either way
            ac = acoustic_scale * batched_table_gather(
                ll_t, jnp.minimum(pdf_arc, Pdim - 1))
            cost = base_cost + w_arc - ac
            dest = jnp.where(valid, ns_arc, S)
            cost = jnp.where(valid, jnp.minimum(cost, BIG), BIG)
            garc = jnp.where(valid, arc + arc_off_d, -1)
            dest_s, cost_s, arc_s = jax.lax.sort(
                (dest, cost, garc), dimension=1, num_keys=2)
            first = jnp.concatenate(
                [jnp.ones((B, 1), bool), dest_s[:, 1:] != dest_s[:, :-1]],
                axis=1)
            lcand = jnp.where(first & (dest_s < S), cost_s, BIG)
            neg_top, sel = jax.lax.top_k(-lcand, K)
            l_cost = -neg_top
            l_state = jnp.where(l_cost < BIG,
                                jnp.take_along_axis(dest_s, sel, 1), S)
            l_arc = jnp.take_along_axis(arc_s, sel, 1)
            # ICI hop: every device contributes its K local winners
            g_state = jax.lax.all_gather(l_state, axis)  # [N, B, K]
            g_cost = jax.lax.all_gather(l_cost, axis)
            g_arc = jax.lax.all_gather(l_arc, axis)
            N = g_state.shape[0]
            g_state = jnp.moveaxis(g_state, 0, 1).reshape(B, N * K)
            g_cost = jnp.moveaxis(g_cost, 0, 1).reshape(B, N * K)
            g_arc = jnp.moveaxis(g_arc, 0, 1).reshape(B, N * K)
            # identical global merge on every device
            dest_g, cost_g, arc_g = jax.lax.sort(
                (g_state, g_cost, g_arc), dimension=1, num_keys=2)
            first_g = jnp.concatenate(
                [jnp.ones((B, 1), bool), dest_g[:, 1:] != dest_g[:, :-1]],
                axis=1)
            cand = jnp.where(first_g & (dest_g < S), cost_g, BIG)
            neg_top, sel = jax.lax.top_k(-cand, K)
            new_cost = -neg_top
            new_state = jnp.take_along_axis(dest_g, sel, 1)
            new_arc = jnp.take_along_axis(arc_g, sel, 1)
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
    )
    return jax.jit(mapped)


def _host_backtrace(bp_state: np.ndarray, bp_arc: np.ndarray,
                    frm: np.ndarray, end_states: np.ndarray,
                    num_frames: np.ndarray) -> np.ndarray:
    """Numpy backtrace over [T, B, K] backpointers.  The on-device version
    (viterbi._backtrace_scan) gathers arc→source from a [A] device array;
    at sharded-graph scale that array is exactly what must NOT live on one
    device, so the walk runs on the host (frm stays host RAM)."""
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
    result contract, arc tensors split over `mesh`'s `axis` devices.
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
    B, T, _ = loglikes.shape
    S = graph.num_states
    K = max(4, min(opts.max_active, S))
    # per-shard expansion budget: same 2x-mean-degree headroom rule as
    # viterbi._token_budget, against the LOCAL arc share
    AL = sg.arcs_per_shard
    mean_deg = max(1.0, graph.num_arcs / max(1, S))
    E = int(min(AL, max(2.0 * K * mean_deg / N, 4.0 * K)))
    E = max(128, K, (E + 127) // 128 * 128)  # top_k needs E >= K
    num_frames = np.asarray(num_frames, np.int32)

    prog = _sharded_token_scan(mesh, axis, K, E, S, sg.states_per_shard)
    tok_state, tok_cost, bp_state, bp_arc, bp_cost = prog(
        jnp.asarray(sg.row_ptr), jnp.asarray(sg.packed),
        jnp.asarray(sg.lo), jnp.asarray(sg.arc_off),
        jnp.int32(graph.start), jnp.asarray(loglikes, jnp.float32),
        jnp.asarray(num_frames), jnp.float32(opts.acoustic_scale),
        jnp.float32(opts.beam),
    )
    tok_state_h = np.asarray(tok_state[0])
    tok_cost_h = np.asarray(tok_cost[0])
    bp_state_h = np.asarray(bp_state[0])
    bp_arc_h = np.asarray(bp_arc[0])
    bp_cost = bp_cost[0]
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
    frm = np.repeat(
        np.arange(S, dtype=np.int64), graph.out_degree().astype(np.int64))
    arcs = _host_backtrace(bp_state_h, bp_arc_h, frm,
                           np.maximum(end_states, 0), num_frames)
    return results_from_arcs(
        graph, arcs, end_states, use_final, costs, num_frames,
        frame_states=bp_state_h if want_lattice else None,
        frame_costs=np.asarray(bp_cost) if want_lattice else None,
    )
