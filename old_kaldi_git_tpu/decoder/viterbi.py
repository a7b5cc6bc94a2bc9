"""Batched Viterbi: dense alignment and top-K beam decoding as lax.scan.

This is the TPU re-design of the reference's token-passing decoders
(SURVEY.md §3.3 hot loop, §7.1 "batched decoder as data-parallel kernel"):

  align_batch  — reference gmm-align-compiled / FasterDecoder over small
                 per-utterance training graphs: the full state set fits, so
                 the Viterbi recursion is a dense [B, S] cost vector updated
                 by a segment-min over padded arc tensors each frame.
  decode_batch — reference LatticeFasterDecoder over a shared HCLG: dense
                 top-K active token sets [B, K]; per frame expand ≤ MD arcs
                 per token, beam-prune, dedup by next state (sort), top-K.

Both run as one jitted lax.scan over frames for a whole utterance batch;
backtraces are reconstructed on the host from stacked backpointers.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from old_kaldi_git_tpu.decoder.csr import CsrGraph
from old_kaldi_git_tpu.ops.gather_kernel import batched_table_gather
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger
from old_kaldi_git_tpu.utils.parse_options import options_dataclass

log = get_logger("viterbi")

BIG = 1e10  # pseudo-infinity that survives float32 arithmetic


@options_dataclass
class ViterbiOptions:
    beam: float = 16.0
    max_active: int = 7000
    acoustic_scale: float = 0.1


# ---------------------------------------------------------------------------
# dense alignment over per-utterance graphs
# ---------------------------------------------------------------------------

def _pad_graphs(graphs: Sequence[CsrGraph]):
    B = len(graphs)
    # round the padded state/arc dims up so successive chunks of a corpus
    # hit the same compiled _align_scan shape (padding arcs carry BIG
    # weights and never win a scatter-min)
    S = -(-max(g.num_states for g in graphs) // 64) * 64
    A = -(-max(g.num_arcs for g in graphs) // 512) * 512
    frm = np.zeros((B, A), np.int32)
    tid = np.zeros((B, A), np.int32)
    pdf = np.zeros((B, A), np.int32)
    w = np.full((B, A), BIG, np.float32)
    ns = np.zeros((B, A), np.int32)
    start = np.zeros(B, np.int32)
    final = np.full((B, S), BIG, np.float32)
    for b, g in enumerate(graphs):
        a = g.num_arcs
        # expand row_ptr to per-arc source state
        src = np.repeat(np.arange(g.num_states), np.diff(g.row_ptr))
        frm[b, :a] = src
        tid[b, :a] = g.tid
        pdf[b, :a] = g.pdf
        w[b, :a] = g.weight
        ns[b, :a] = g.nextstate
        start[b] = g.start
        fw = g.final_weight.copy()
        fw[~np.isfinite(fw)] = BIG
        final[b, : g.num_states] = fw
    return frm, tid, pdf, w, ns, start, final, S, A


@partial(jax.jit, static_argnames=("num_states",))
def _align_scan(frm, pdf, w, ns, start, loglikes, num_frames, acoustic_scale,
                num_states):
    """Returns (alpha_final [B,S], best_arc [T,B,S])."""
    B, A = frm.shape
    S = num_states
    alpha0 = jnp.full((B, S), BIG, jnp.float32)
    alpha0 = alpha0.at[jnp.arange(B), start].set(0.0)

    def scatter_min(cand, ns_row):
        return jnp.full((S,), BIG, jnp.float32).at[ns_row].min(cand)

    def step(alpha, inputs):
        ll_t, t = inputs  # ll_t: [B, P]
        # ALL three [B, A] per-arc lookups ride the one-hot Pallas gather
        # on TPU (ops/gather_kernel.py; the [B, S<=~1k] alpha table fits
        # VMEM hundreds of times over, and per-element take_along_axis
        # gathers are the serial-unit pathology); exact take_along_axis
        # fallback elsewhere
        ac = acoustic_scale * batched_table_gather(ll_t, pdf)
        cand = batched_table_gather(alpha, frm) + w - ac
        cand = jnp.minimum(cand, BIG)
        new_alpha = jax.vmap(scatter_min)(cand, ns)
        # winner arc per (b, state)
        hit = cand <= batched_table_gather(new_alpha, ns) + 1e-6
        arc_idx = jnp.where(hit & (cand < BIG), jnp.arange(A)[None, :], -1)
        best_arc = jax.vmap(
            lambda idx, ns_row: jnp.full((S,), -1, jnp.int32).at[ns_row].max(idx)
        )(arc_idx.astype(jnp.int32), ns)
        active = (t < num_frames)[:, None]
        alpha_out = jnp.where(active, new_alpha, alpha)
        return alpha_out, jnp.where(active, best_arc, -1)

    T = loglikes.shape[1]
    alpha_final, best_arcs = jax.lax.scan(
        step, alpha0, (jnp.swapaxes(loglikes, 0, 1), jnp.arange(T))
    )
    return alpha_final, best_arcs


@partial(jax.jit, static_argnames=("num_states",))
def _align_and_backtrace(frm, tid, pdf, w, ns, start, final, loglikes,
                         num_frames, acoustic_scale, num_states):
    """Fused alignment: forward scan + end-state selection + backtrace in
    ONE program, so only [T, B] transition-ids (plus [B] scores) ever cross
    the device link.  The naive split (host backtrace over D2H'd winner
    arcs) ships the full [T, B, S] tensor — tens of MB per corpus chunk
    over a tunnel measured at ~7 MB/s, which made the transfer (not the
    scan) the dominant cost of every GMM align stage.

    Returns (scores [B], tids [T, B] with -1 on inactive frames,
    ok [T, B] backtrace-success flags per active frame)."""
    T = loglikes.shape[1]
    alpha_final, best_arcs = _align_scan(
        frm, pdf, w, ns, start, loglikes, num_frames, acoustic_scale,
        num_states)
    tot = alpha_final + final  # [B, S]
    end_state = jnp.argmin(tot, axis=1).astype(jnp.int32)
    scores = jnp.take_along_axis(tot, end_state[:, None], 1)[:, 0]

    def bstep(state, inputs):
        ba_t, t = inputs  # [B, S]
        arc = jnp.take_along_axis(ba_t, state[:, None], 1)[:, 0]
        in_range = t < num_frames
        good = in_range & (arc >= 0)
        a_cl = jnp.maximum(arc, 0)[:, None]
        tid_out = jnp.where(
            good, jnp.take_along_axis(tid, a_cl, 1)[:, 0], -1)
        new_state = jnp.where(
            good, jnp.take_along_axis(frm, a_cl, 1)[:, 0], state)
        # ok is False only where an ACTIVE frame had no winner arc
        ok = good | ~in_range
        return new_state, (tid_out, ok)

    _, (tids, ok) = jax.lax.scan(
        bstep, end_state, (best_arcs, jnp.arange(T)), reverse=True)
    return scores, tids, ok


def align_batch(
    graphs: Sequence[CsrGraph],
    loglikes: np.ndarray,
    num_frames: Sequence[int],
    opts: Optional[ViterbiOptions] = None,
) -> Tuple[List[Optional[np.ndarray]], List[float]]:
    """Viterbi-align each utterance to its own graph.

    loglikes: [B, T, P]; num_frames: valid frames per utterance.
    Returns (alignments (tid arrays, None on failure), per-utt best cost).
    """
    opts = opts or ViterbiOptions()
    frm, tid, pdf, w, ns, start, final, S, A = _pad_graphs(graphs)
    B, T, _ = loglikes.shape
    num_frames = np.asarray(num_frames, np.int32)
    dev_scores, dev_tids, dev_ok = _align_and_backtrace(
        jnp.asarray(frm), jnp.asarray(tid), jnp.asarray(pdf),
        jnp.asarray(w), jnp.asarray(ns), jnp.asarray(start),
        jnp.asarray(final), jnp.asarray(loglikes, jnp.float32),
        jnp.asarray(num_frames), float(opts.acoustic_scale), S,
    )
    # only [B] + 2x[T, B] cross the device link (the winner-arc tensor is
    # [T, B, S] and stays on device; see _align_and_backtrace)
    h_scores = np.asarray(dev_scores)
    h_tids = np.asarray(dev_tids)  # [T, B]
    h_ok = np.asarray(dev_ok)

    alignments: List[Optional[np.ndarray]] = []
    scores: List[float] = []
    for b in range(B):
        score = float(h_scores[b])
        nf = int(num_frames[b])
        if score >= BIG:
            log.warning("alignment failed for utterance %d", b)
            alignments.append(None)
            scores.append(np.inf)
            continue
        if not bool(h_ok[:nf, b].all()):
            log.warning("backtrace failed for utterance %d", b)
            alignments.append(None)
            scores.append(np.inf)
            continue
        alignments.append(np.ascontiguousarray(h_tids[:nf, b]))
        scores.append(score)
    return alignments, scores


# ---------------------------------------------------------------------------
# top-K beam decode over a shared graph
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("K", "S"))
def _decode_scan(frm, pdf, w, ns, start, loglikes, num_frames,
                 acoustic_scale, beam, K, S):
    """Dense frame-synchronous beam search: alpha [B, S] over ALL graph
    states, per frame scatter-min over ALL arcs, then top-K + beam gating.

    No sorts: the expand/dedup of the token-list formulation becomes a
    dense scatter-min (exactly the alignment kernel) and max-active becomes
    lax.top_k over states.  Work per frame is O(B·A + B·S), independent of
    the word-loop fan-out that makes padded per-token expansion blow up.
    Scales to medium HCLGs (S up to ~1M); huge-LM graphs need the
    token-sparse variant with flat arc expansion (future work, cf. the GPU
    decoder literature).

    Returns (tok_state [B,K], tok_cost [B,K], bp_state [T,B,K],
    bp_arc [T,B,K]): per frame the top-K surviving states, their costs and
    winning arcs.
    """
    B = loglikes.shape[0]
    alpha0 = jnp.full((B, S), BIG, jnp.float32).at[:, start].set(0.0)
    return _decode_scan_impl(frm, pdf, w, ns, alpha0, loglikes, num_frames,
                             acoustic_scale, beam, K, S)


# NOTE: a scan-unroll knob was tried and removed — measured on the TPU
# backend, unrolling gives NO hot-path speedup at any graph size and can
# inflate XLA compile time >20x on larger graphs; keep the plain scan.


def _decode_scan_impl(frm, pdf, w, ns, alpha0, loglikes, num_frames,
                      acoustic_scale, beam, K, S):
    B, T, P = loglikes.shape
    A = frm.shape[0]
    arc_ids = jnp.arange(A, dtype=jnp.int32)

    def frame_update(alpha, ll_t, t):
        ac = acoustic_scale * ll_t[:, pdf]  # [B, A]
        cand = alpha[:, frm] + w[None, :] - ac
        cand = jnp.minimum(cand, BIG)
        new_alpha = jax.vmap(
            lambda c: jnp.full((S,), BIG, jnp.float32).at[ns].min(c)
        )(cand)
        # winning arc per state
        hit = cand <= new_alpha[:, ns] + 1e-6
        arc_src = jnp.where(hit & (cand < BIG), arc_ids[None, :], -1)
        best_arc = jax.vmap(
            lambda ai: jnp.full((S,), -1, jnp.int32).at[ns].max(ai)
        )(arc_src)
        # beam + max-active gating; when K covers all states the top_k sort
        # is pure overhead — beam-gate the dense alpha directly
        if K >= S:
            best = jnp.min(new_alpha, axis=1, keepdims=True)
            keep = new_alpha <= best + beam
            gated = jnp.where(keep, new_alpha, BIG)
            top_idx = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
            top_cost = gated
        else:
            neg_top, top_idx = jax.lax.top_k(-new_alpha, K)  # [B, K]
            top_cost = -neg_top
            best = top_cost[:, :1]
            keep = top_cost <= best + beam
            top_cost = jnp.where(keep, top_cost, BIG)
            gated = jax.vmap(
                lambda ti, tc: jnp.full((S,), BIG, jnp.float32).at[ti].set(tc)
            )(top_idx, top_cost)
        active = (t < num_frames)[:, None]
        alpha_out = jnp.where(active, gated, alpha)
        bp_state = jnp.where(active & keep, top_idx, -1)
        bp_arc = jnp.where(
            active & keep, jnp.take_along_axis(best_arc, top_idx, axis=1), -1
        )
        bp_cost = jnp.where(active & keep, top_cost, BIG)
        return alpha_out, (
            bp_state.astype(jnp.int32), bp_arc.astype(jnp.int32), bp_cost
        )

    def step(alpha, inputs):
        ll_t, t = inputs
        return frame_update(alpha, ll_t, t)

    alpha, (bp_state, bp_arc, bp_cost) = jax.lax.scan(
        step, alpha0, (jnp.swapaxes(loglikes, 0, 1), jnp.arange(T))
    )
    neg_top, top_idx = jax.lax.top_k(-alpha, K)
    return top_idx.astype(jnp.int32), -neg_top, bp_state, bp_arc, bp_cost, alpha


@jax.jit
def _backtrace_scan(bp_state, bp_arc, frm, end_state, num_frames):
    """On-device backtrace: walk the winning-arc chain backwards for every
    utterance at once.  Transfers only [T, B] arc ids to the host instead of
    the full [T, B, K] backpointer tensors (the device link may be a slow
    tunnel: 200 MB of backpointers once took 30 s to fetch)."""
    T = bp_state.shape[0]

    def step(state, inputs):
        bps_t, bpa_t, t = inputs  # [B, K], [B, K]
        match = bps_t == state[:, None]
        slot = jnp.argmax(match, axis=1)
        found = jnp.take_along_axis(match, slot[:, None], 1)[:, 0]
        arc = jnp.take_along_axis(bpa_t, slot[:, None], 1)[:, 0]
        active = (t < num_frames) & found & (arc >= 0)
        arc_out = jnp.where(active, arc, -1)
        new_state = jnp.where(active, frm[jnp.maximum(arc, 0)], state)
        return new_state, arc_out

    _, arcs_rev = jax.lax.scan(
        step, end_state, (bp_state, bp_arc, jnp.arange(T)), reverse=True
    )
    return arcs_rev  # [T, B], -1 on inactive/failed frames


@partial(jax.jit, static_argnames=("K", "S"))
def _decode_and_backtrace(frm, pdf, w, ns, start, loglikes,
                          num_frames, acoustic_scale, beam, fw, K, S):
    """Fused decode + end-token selection + backtrace in ONE program.

    Performance-shaped for the TPU backend (all measured on-chip at
    B=128/S=1050/T=998):
    * the [T, B, ·] backpointer tensors stay INTERNAL to the executable —
      as jit outputs they cost a one-time ~250 s first-fetch penalty on the
      tunneled runtime, and only [B]/[T, B] results cross the link;
    * the relaxation keeps the scatter-min/scatter-max formulation — it
      runs 0.08 s/scan hot vs 1.2 s for the padded-in-arc gather + argmin
      variant (per-element [B, S] index gathers are pathological here);
      its slow XLA compile (~2 min for this shape) is absorbed by the
      persistent compilation cache;
    * in dense mode (K == S) bp_state is the identity and per-frame costs
      are lattice-only, so only the winning-arc tensor is stored, and the
      backtrace reads it with a [B, 1] gather — no identity
      take_along_axis over [B, S] (that gather alone cost ~1.1 s/scan).
    """
    B, T, P = loglikes.shape
    A = frm.shape[0]
    alpha0 = jnp.full((B, S), BIG, jnp.float32).at[:, start].set(0.0)
    arc_ids = jnp.arange(A, dtype=jnp.int32)

    def relax(alpha, ll_t):
        ac = acoustic_scale * ll_t[:, pdf]
        cand = jnp.minimum(alpha[:, frm] + w[None, :] - ac, BIG)
        new_alpha = jax.vmap(
            lambda c: jnp.full((S,), BIG, jnp.float32).at[ns].min(c)
        )(cand)
        hit = cand <= new_alpha[:, ns] + 1e-6
        arc_src = jnp.where(hit & (cand < BIG), arc_ids[None, :], -1)
        best_arc = jax.vmap(
            lambda ai: jnp.full((S,), -1, jnp.int32).at[ns].max(ai)
        )(arc_src)
        return new_alpha, best_arc

    if K >= S:
        def step(alpha, inputs):
            ll_t, t = inputs
            new_alpha, best_arc = relax(alpha, ll_t)
            best = jnp.min(new_alpha, axis=1, keepdims=True)
            gated = jnp.where(new_alpha <= best + beam, new_alpha, BIG)
            active = (t < num_frames)[:, None]
            alpha_out = jnp.where(active, gated, alpha)
            bp_arc = jnp.where(active & (gated < BIG), best_arc, -1)
            return alpha_out, bp_arc

        alpha, bp_arc = jax.lax.scan(
            step, alpha0, (jnp.swapaxes(loglikes, 0, 1), jnp.arange(T))
        )
        total = alpha + fw[None, :]
        has_final = jnp.min(total, axis=1) < BIG
        best_total = jnp.where(has_final[:, None], total, alpha)
        end_states = jnp.argmin(best_total, axis=1).astype(jnp.int32)
        costs = jnp.take_along_axis(best_total, end_states[:, None], 1)[:, 0]

        def bstep(state, inputs):
            bpa_t, t = inputs  # [B, S]
            arc = jnp.take_along_axis(bpa_t, state[:, None], 1)[:, 0]
            active = (t < num_frames) & (arc >= 0)
            arc_out = jnp.where(active, arc, -1)
            new_state = jnp.where(active, frm[jnp.maximum(arc, 0)], state)
            return new_state, arc_out

        _, arcs_rev = jax.lax.scan(
            bstep, end_states, (bp_arc, jnp.arange(T)), reverse=True
        )
        return end_states, has_final, costs, arcs_rev

    # top-K mode (graphs too large for dense backpointers): store only the
    # [T, B, K] kept-state ids and their winning arcs (no per-frame costs —
    # those are lattice-only and the lattice path uses _decode_scan)
    def kstep(alpha, inputs):
        ll_t, t = inputs
        new_alpha, best_arc = relax(alpha, ll_t)
        neg_top, top_idx = jax.lax.top_k(-new_alpha, K)  # [B, K]
        top_cost = -neg_top
        keep = top_cost <= top_cost[:, :1] + beam
        top_cost = jnp.where(keep, top_cost, BIG)
        gated = jax.vmap(
            lambda ti, tc: jnp.full((S,), BIG, jnp.float32).at[ti].set(tc)
        )(top_idx, top_cost)
        active = (t < num_frames)[:, None]
        alpha_out = jnp.where(active, gated, alpha)
        bp_state = jnp.where(active & keep, top_idx, -1)
        bp_arc = jnp.where(
            active & keep, jnp.take_along_axis(best_arc, top_idx, axis=1), -1
        )
        return alpha_out, (bp_state.astype(jnp.int32), bp_arc.astype(jnp.int32))

    alpha, (bp_state, bp_arc) = jax.lax.scan(
        kstep, alpha0, (jnp.swapaxes(loglikes, 0, 1), jnp.arange(T))
    )
    total = alpha + fw[None, :]
    has_final = jnp.min(total, axis=1) < BIG
    best_total = jnp.where(has_final[:, None], total, alpha)
    end_states = jnp.argmin(best_total, axis=1).astype(jnp.int32)
    costs = jnp.take_along_axis(best_total, end_states[:, None], 1)[:, 0]
    arcs = _backtrace_scan(bp_state, bp_arc, frm, end_states, num_frames)
    return end_states, has_final, costs, arcs


@partial(jax.jit, static_argnames=("K", "ET", "S", "L", "D"))
def _decode_scan_tokens(tile_ptr, tiles, start, loglikes,
                        num_frames, acoustic_scale, beam, K, ET, S,
                        L=0, lattice_beam=0.0, init_tokens=None,
                        eps_hops=None, D=0):
    """TOKEN-SPARSE beam decode: per-frame work O(B·(E + E·log E)),
    independent of graph size — for graphs whose dense [B, S] alpha (or
    [T, B, S] winning-arc store) cannot fit HBM.  This is the TPU shape of
    the reference's token-passing ProcessEmitting (expand out-arcs of the
    active tokens only; src/decoder/lattice-faster-decoder.cc), with the
    hash-map dedup replaced by a lexicographic sort over (dest, cost):

      tokens [B, K] (state id, cost)  — cost-sorted, slot 0 = best
      → TILE expansion of the K states into a static budget of ET
        per-state arc tiles (csr.build_tile_graph: MD arcs per tile, one
        HBM gather per TILE — tiles beyond ET are dropped from the
        WORST tokens; graceful beam shrink, tokens are cost-sorted)
      → E = ET·MD candidate (dest, cost, arc) triples
      → lax.sort by (dest, cost): the first entry of each dest run is its
        Viterbi min (the ε-free dedup)
      → top-K + beam gate → next token set.

    Kernel shape (chip-measured; benchmarks/token_sparse_microbench.py +
    gather_variants_bench.py): the tile expansion maps slot j → owning
    token via a run-start scatter + cummax (0.36 ms — a vmapped
    searchsorted costs 20 ms); per-tile bases broadcast by exact
    delta-cumsum; the arc-data access is ONE [B,ET] gather of [MD,3]
    tiles (2.6 ms/frame at [64, 2976×4] vs 8.1 for per-arc row gathers —
    XLA's TPU gather prices per index, so fewer, fatter gathers win);
    the per-arc loglike lookup is the Pallas one-hot kernel; the [B,E]
    2-key sort is cheap (~1 ms — sorting is CHEAP on TPU at this width).

    Returns (tok_state [B,K], tok_cost [B,K], bp_state [T,B,K],
    bp_arc [T,B,K], bp_cost [T,B,K]) — same contract as _decode_scan.
    Arc ids are PADDED tile-slot ids (tile*MD + lane); callers map them
    back to graph arcs via TileGraph.pad2orig.

    L > 0 additionally emits per-frame LATTICE-ARC RECORDS into a bounded
    device buffer (SURVEY.md §7.1 "emit lattice arcs to a bounded buffer"):
    every expanded candidate whose via-cost is within `lattice_beam` of its
    destination's frame-winner AND whose destination survived the top-K
    prune is a raw-lattice arc (reference GetRawLattice keeps exactly the
    ForwardLinks between surviving tokens).  The L best (by via-cost) per
    (batch, frame) are kept as (src_slot, dst_slot, arc_id, acoustic_cost)
    — [T, B, L] each — so the host rebuilds lattices WITHOUT the loglikes
    ever leaving the device and with a transfer bounded by L, not by K·S.
    """
    B, T, P = loglikes.shape
    NT, MD, _ = tiles.shape
    E = ET * MD
    j = jnp.arange(ET, dtype=jnp.int32)

    if init_tokens is None:
        tok_state0 = jnp.full((B, K), -1, jnp.int32).at[:, 0].set(start)
        tok_cost0 = jnp.full((B, K), BIG, jnp.float32).at[:, 0].set(0.0)
    else:
        # streaming: resume from a carried token set (see
        # online.streaming.StreamingTokenDecoder)
        tok_state0, tok_cost0 = init_tokens

    def expand_md(x):
        """[B, ET] per-tile value → [B, E] per-arc value (lane repeat)."""
        return jnp.broadcast_to(
            x[:, :, None], (B, ET, MD)).reshape(B, E)

    def frame_update(tok_state, tok_cost, ll_t, t):
        live = (tok_state >= 0) & (tok_cost < BIG)
        s_cl = jnp.maximum(tok_state, 0)
        rp = tile_ptr[s_cl]  # [B, K]
        deg = jnp.where(live, tile_ptr[s_cl + 1] - rp, 0)
        cum = jnp.cumsum(deg, axis=1)  # [B, K] inclusive run ends
        prev = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), cum[:, :-1]], axis=1)
        # ALL per-token run quantities ride ONE stacked scatter-add of
        # deltas at run starts + one cumsum (scatter cost is per-index —
        # 3 separate scatters measured ~1.3x the stacked one on chip):
        #   ch0: run-end bound cum_of (deltas of cum; cum is nondecreasing
        #        and colliding empty-run starts telescope, so the cumsum
        #        equals the cummax formulation: the value of the LAST run
        #        start ≤ j — which also masks slots whose owner's run was
        #        truncated by the budget; run starts beyond ET drop)
        #   ch1: tile-id base (deltas of rp - prev)
        #   ch2: token cost base (deltas of cost BITS — telescoping is
        #        exact for arbitrary values under int32 wraparound)
        #   ch3 (L only): owning-token index k_of (deltas of k)
        def deltas(vals):
            return jnp.diff(vals, axis=1,
                            prepend=jnp.zeros((B, 1), jnp.int32))

        chans = [deltas(cum), deltas(rp - prev),
                 deltas(jax.lax.bitcast_convert_type(tok_cost, jnp.int32))]
        if L:
            chans.append(deltas(jnp.broadcast_to(
                jnp.arange(K, dtype=jnp.int32)[None, :], (B, K))))
        stacked = jnp.stack(chans, axis=-1)  # [B, K, C]
        scat = jnp.zeros((B, ET, len(chans)), jnp.int32).at[
            jnp.arange(B)[:, None], prev].add(stacked, mode="drop")
        bases = jnp.cumsum(scat, axis=1)  # [B, ET, C]
        cum_of = bases[..., 0]
        valid = j[None, :] < cum_of
        # tile id = tile_base[k_of] + j; cost rides bitcast
        tile = jnp.clip(bases[..., 1] + j[None, :], 0, NT - 1)
        base_cost = jax.lax.bitcast_convert_type(bases[..., 2], jnp.float32)
        if L:
            k_of = expand_md(bases[..., 3])
        # THE arc-data access: one [MD,3] tile per slot (per-index gather
        # cost; 3.2x over per-arc rows — benchmarks/gather_variants_bench)
        rows = jnp.take(tiles, tile, axis=0)  # [B, ET, MD, 3]
        w_arc = jax.lax.bitcast_convert_type(
            rows[..., 0].reshape(B, E), jnp.float32)
        pdf_arc = rows[..., 1].reshape(B, E)
        ns_arc = rows[..., 2].reshape(B, E)
        arc = (tile * MD)[:, :, None]
        arc = (arc + jnp.arange(MD, dtype=jnp.int32)[None, None, :]
               ).reshape(B, E)
        base_cost = expand_md(
            jax.lax.bitcast_convert_type(base_cost, jnp.int32))
        base_cost = jax.lax.bitcast_convert_type(base_cost, jnp.float32)
        valid = expand_md(valid.astype(jnp.int32)) > 0
        # one-hot Pallas kernel on TPU (~4.9x vs the element-serial
        # take_along_axis gather at [64, 12k]: 1.6 vs 7.8 ms/frame —
        # ops/gather_kernel.py); bit-exact either way
        ll_arc = batched_table_gather(ll_t, jnp.minimum(pdf_arc, P - 1))
        # tile-padding arcs carry w=BIG; a positive acoustic term could
        # drag their cost just under BIG, so they must be masked like
        # budget-invalid slots, not merely cost-gated
        valid = valid & (w_arc < BIG)
        cost = base_cost + w_arc - acoustic_scale * ll_arc
        dest = jnp.where(valid, ns_arc, S)  # sentinel sorts last
        cost = jnp.where(valid, jnp.minimum(cost, BIG), BIG)
        Ew = E
        if L and D:
            # SPLIT-EPS lattice mode: extend EVERY emit candidate by its
            # <= D eps hops BEFORE any selection (at (1+D)x sort width).
            # Lattice records must see arcs into post-hop dests, and
            # selecting over the extended set is exactly the folded
            # computation order — the cheaper two-stage hop merge below
            # (kept-top-K first, then hops) is best-path-exact but
            # cannot attribute records to hop destinations.
            d1 = jnp.clip(dest, 0, eps_hops.shape[0] - 1)
            hop = jnp.take(eps_hops, d1, axis=0)  # [B, E, D, 2]
            h_w = jax.lax.bitcast_convert_type(hop[..., 0], jnp.float32)
            h_ns = hop[..., 1]
            ok_h = (dest[:, :, None] < S) & (h_w < BIG) \
                & (cost[:, :, None] < BIG)
            h_cost = jnp.where(
                ok_h, jnp.minimum(cost[:, :, None] + h_w, BIG), BIG)
            h_state = jnp.where(ok_h, h_ns, S)
            dest = jnp.concatenate([dest, h_state.reshape(B, E * D)], 1)
            cost = jnp.concatenate([cost, h_cost.reshape(B, E * D)], 1)
            arc = jnp.concatenate(
                [arc, jnp.broadcast_to(
                    arc[:, :, None], (B, E, D)).reshape(B, E * D)], 1)
            k_of = jnp.concatenate(
                [k_of, jnp.broadcast_to(
                    k_of[:, :, None], (B, E, D)).reshape(B, E * D)], 1)
            ll_arc = jnp.concatenate(
                [ll_arc, jnp.broadcast_to(
                    ll_arc[:, :, None], (B, E, D)).reshape(B, E * D)], 1)
            Ew = E * (1 + D)
        # the lattice path needs the source slot and acoustic score of each
        # candidate post-sort; only pay the extra sort operands when L > 0
        if L:
            dest_s, cost_s, arc_s, kof_s, ll_s = jax.lax.sort(
                (dest, cost, arc, k_of, ll_arc), dimension=1, num_keys=2
            )
        else:
            dest_s, cost_s, arc_s = jax.lax.sort(
                (dest, cost, arc), dimension=1, num_keys=2
            )
        first = jnp.concatenate(
            [jnp.ones((B, 1), bool), dest_s[:, 1:] != dest_s[:, :-1]], axis=1
        )
        cand = jnp.where(first & (dest_s < S), cost_s, BIG)
        # top-K select by a second (1-key) sort and a static slice: one
        # sort (~1.1 ms at [64,14k]) replaces lax.top_k + two
        # [B,K]<-[B,E] take_along_axis gathers (~3.5 ms — per-element
        # gathers are the kernel's pathology, sorts are not)
        if L:
            sort_in = (cand, dest_s, arc_s,
                       jnp.broadcast_to(
                           jnp.arange(Ew, dtype=jnp.int32)[None, :],
                           (B, Ew)))
            new_cost, new_state, new_arc, sel = (
                x[:, :K] for x in
                jax.lax.sort(sort_in, dimension=1, num_keys=1))
        else:
            new_cost, new_state, new_arc = (
                x[:, :K] for x in
                jax.lax.sort((cand, dest_s, arc_s), dimension=1,
                             num_keys=1))
        if D and not L:
            # SPLIT-EPS backoff hops (reference ProcessNonemitting for
            # backoff-shaped graphs, csr.fst_to_split_csr_arrays): each
            # token contributes its <= D precomputed eps-closure states
            # (eps_hops[s, k] = (cumulative weight bits, k+1-hop dest),
            # BIG on missing hops) as extra candidates carrying the same
            # winning emit arc; one (1+D)K-wide dedup-merge keeps the min
            # per dest.  Exact for chains up to depth D in ONE round —
            # the host recovers hop word labels by walking the (unique)
            # eps chain from the arc's target to the recorded state.
            s1 = jnp.where(new_cost < BIG, new_state, S)
            hop = jnp.take(eps_hops, jnp.clip(s1, 0, eps_hops.shape[0] - 1),
                           axis=0)  # [B, K, D, 2]
            h_w = jax.lax.bitcast_convert_type(hop[..., 0], jnp.float32)
            h_ns = hop[..., 1]
            ok_h = (s1[:, :, None] < S) & (h_w < BIG)
            h_cost = jnp.where(
                ok_h, jnp.minimum(new_cost[:, :, None] + h_w, BIG), BIG)
            h_state = jnp.where(ok_h, h_ns, S)
            h_arc = jnp.broadcast_to(new_arc[:, :, None], (B, K, D))
            cs = jnp.concatenate([s1, h_state.reshape(B, K * D)], axis=1)
            cc = jnp.concatenate([new_cost, h_cost.reshape(B, K * D)],
                                 axis=1)
            ca = jnp.concatenate([new_arc, h_arc.reshape(B, K * D)], axis=1)
            ds2, cc2, ca2 = jax.lax.sort((cs, cc, ca), dimension=1,
                                         num_keys=2)
            fst2 = jnp.concatenate(
                [jnp.ones((B, 1), bool), ds2[:, 1:] != ds2[:, :-1]], axis=1)
            cand2 = jnp.where(fst2 & (ds2 < S), cc2, BIG)
            new_cost, new_state, new_arc = (
                x[:, :K] for x in
                jax.lax.sort((cand2, ds2, ca2), dimension=1, num_keys=1))
        # keep requires a REAL candidate: when a frame has zero valid
        # expansions everything is BIG and the sentinel dest S would
        # otherwise survive the beam gate (BIG <= BIG + beam) and escape
        # to the host as an out-of-range state id
        keep = (new_cost <= new_cost[:, :1] + beam) & (new_cost < BIG) \
            & (new_state < S)
        new_cost = jnp.where(keep, new_cost, BIG)
        new_state = jnp.where(keep, new_state, -1)
        new_arc = jnp.where(keep, new_arc, -1)
        active = (t < num_frames)[:, None]
        out_state = jnp.where(active, new_state, tok_state)
        out_cost = jnp.where(active, new_cost, tok_cost)
        bp_state = jnp.where(active, new_state, -1)
        bp_arc = jnp.where(active, new_arc, -1)
        bp_cost = jnp.where(active, new_cost, BIG)
        if not L:
            return out_state, out_cost, (bp_state, bp_arc, bp_cost)
        # ---- bounded lattice-arc emission (GetRawLattice on device) ----
        # winner of each sorted dest run sits at the run's first slot
        run_start = jax.lax.cummax(
            jnp.where(first, jnp.arange(Ew, dtype=jnp.int32)[None, :], 0),
            axis=1)  # [B, Ew]
        winner = jnp.take_along_axis(cost_s, run_start, 1)
        # surviving-token slot of each dest: scatter the kept slot index
        # at its winner's sorted position (top_k positions are distinct)
        slot_ids = jnp.where(
            keep, jnp.arange(K, dtype=jnp.int32)[None, :], -1)
        slot_of = jnp.full((B, Ew), -1, jnp.int32).at[
            jnp.arange(B)[:, None], sel].max(slot_ids)
        dst_slot = jnp.take_along_axis(slot_of, run_start, 1)
        flag = (
            (dest_s < S) & (cost_s < BIG) & (dst_slot >= 0)
            & (cost_s <= winner + lattice_beam) & active
        )
        score = jnp.where(flag, cost_s, BIG)
        neg_l, pick = jax.lax.top_k(-score, L)  # L best lattice arcs
        ok = -neg_l < BIG
        lat = (
            jnp.where(ok, jnp.take_along_axis(kof_s, pick, 1), -1),
            jnp.where(ok, jnp.take_along_axis(dst_slot, pick, 1), -1),
            jnp.where(ok, jnp.take_along_axis(arc_s, pick, 1), -1),
            jnp.where(ok, -jnp.take_along_axis(ll_s, pick, 1), 0.0),
            # post-hop destination STATE of each record: the split-eps
            # host walk (arc target -> this state) recovers backoff
            # words/weights; redundant for folded graphs but kept for
            # one record format
            jnp.where(ok, jnp.take_along_axis(dest_s, pick, 1), -1),
        )
        return out_state, out_cost, (bp_state, bp_arc, bp_cost) + lat

    def step(carry, inputs):
        tok_state, tok_cost = carry
        ll_t, t = inputs
        out_state, out_cost, ys = frame_update(tok_state, tok_cost, ll_t, t)
        return (out_state, out_cost), ys

    (tok_state, tok_cost), ys = jax.lax.scan(
        step, (tok_state0, tok_cost0),
        (jnp.swapaxes(loglikes, 0, 1), jnp.arange(T)),
    )
    return (tok_state, tok_cost) + tuple(ys)


def _token_budget(graph: CsrGraph, K: int, md: int = 4) -> int:
    """Static TILE-expansion budget ET for the token-sparse decoder: a
    1.25x multiple of the expected active tiles-per-state (headroom for
    degree skew; overflow drops tiles from the worst-cost tokens only —
    they are cost-sorted), capped at the tile count, rounded up to a
    lane-friendly multiple.  Per-frame cost is linear in E = ET·MD
    (gather/sort/loglike-lookup all scale with it), so the budget is the
    main throughput knob after K; headroom sweep measured WER-neutral
    on the minilib system (2.0x→1.5x r3, →1.25x r4)."""
    from old_kaldi_git_tpu.decoder.csr import build_tile_graph

    tg = build_tile_graph(graph, md)
    NT = tg.num_tiles
    mean_tiles = max(1.0, NT / max(1, graph.num_states))
    ET = int(min(NT, max(1.25 * K * mean_tiles, 1.25 * K)))
    return max(128, (ET + 127) // 128 * 128)


def _eps_hop_table(graph: CsrGraph):
    """[S, D, 2] int32 (cumulative-weight bits, k+1-hop destination) for a
    split-eps graph's backoff chains; BIG weight on missing hops.  Cached
    on the graph (uploaded once per decode session)."""
    cached = getattr(graph, "_eps_hops", None)
    if cached is not None:
        return cached
    S = graph.num_states
    D = max(1, int(graph.eps_depth))
    eps_ns = graph.eps_ns
    eps_w = graph.eps_w.astype(np.float64)
    hops = np.zeros((S, D, 2), np.int32)
    u = eps_ns.astype(np.int64)
    cum = np.where(u >= 0, eps_w, BIG)
    for k in range(D):
        valid = u >= 0
        wcol = np.where(valid, np.minimum(cum, BIG), BIG).astype(np.float32)
        hops[:, k, 0] = wcol.view(np.int32)
        hops[:, k, 1] = np.where(valid, u, 0)
        nxt = np.where(valid, eps_ns[np.maximum(u, 0)], -1)
        cum = np.where(
            nxt >= 0, cum + np.where(valid, eps_w[np.maximum(u, 0)], BIG),
            BIG)
        u = nxt
    dev = (jnp.asarray(hops), D)
    graph._eps_hops = dev
    return dev


def eps_walk(graph: CsrGraph, u: int, v: int):
    """(word labels, total weight) along the (unique) backoff chain
    u -> v; None if v is not reachable within eps_depth hops
    (decoder/host inconsistency)."""
    words: List[int] = []
    w = 0.0
    for _ in range(graph.eps_depth + 1):
        if u == v:
            return words, w
        nxt = int(graph.eps_ns[u])
        if nxt < 0:
            return None
        if graph.eps_olab[u]:
            words.append(int(graph.eps_olab[u]))
        w += float(graph.eps_w[u])
        u = nxt
    return (words, w) if u == v else None


def _eps_walk_words(graph: CsrGraph, u: int, v: int):
    out = eps_walk(graph, u, v)
    return None if out is None else out[0]


def _arc_src(graph: CsrGraph) -> np.ndarray:
    """arc id → source state (cached per graph)."""
    frm = getattr(graph, "_arc_src_cache", None)
    if frm is None or len(frm) != graph.num_arcs:
        frm = np.repeat(
            np.arange(graph.num_states, dtype=np.int64),
            graph.out_degree().astype(np.int64))
        graph._arc_src_cache = frm
    return frm


def split_words_for_arc_seq(
    graph: CsrGraph, arc_seq: np.ndarray, end_state: int
) -> Optional[List[int]]:
    """Word labels for a split-eps winning EMIT-arc chain ending at
    end_state: emit-arc olabels plus the backoff words recovered by
    walking the unique eps chain between each arc's target and the next
    arc's source (the kernel records only the emit arc + the post-hop
    token state).  None if a hop walk fails (decoder/host
    inconsistency).  Shared by the batch and streaming hosts."""
    frm = _arc_src(graph)
    nf = len(arc_seq)
    words: List[int] = []
    pre = _eps_walk_words(graph, graph.start, int(frm[arc_seq[0]]))
    if pre is None:
        return None
    words.extend(pre)
    for t in range(nf):
        a = int(arc_seq[t])
        words.extend(graph.arc_olabels[a])
        tgt = (int(frm[arc_seq[t + 1]]) if t + 1 < nf else int(end_state))
        hop_words = _eps_walk_words(graph, int(graph.nextstate[a]), tgt)
        if hop_words is None:
            return None
        words.extend(hop_words)
    return words


def _results_from_arcs_split(
    graph: CsrGraph,
    arcs: np.ndarray,  # [T, B] winning EMIT arc ids (-1 = dead frame)
    end_states: np.ndarray,
    use_final: np.ndarray,
    costs: np.ndarray,
    num_frames: np.ndarray,
) -> List[Optional[DecodeResult]]:
    """Host tail for SPLIT-EPS decodes: like results_from_arcs, but word
    labels on backoff arcs are recovered via split_words_for_arc_seq."""
    B = arcs.shape[1]
    results: List[Optional[DecodeResult]] = []
    for b in range(B):
        nf_b = int(num_frames[b])
        if costs[b] >= BIG:
            results.append(None)
            continue
        arc_seq = arcs[:nf_b, b]
        if (arc_seq < 0).any():
            results.append(None)
            continue
        if nf_b == 0:  # zero-frame (batch-padding) rows: empty result
            results.append(DecodeResult(
                words=[], alignment=np.zeros(0, np.int32),
                cost=float(costs[b])))
            continue
        words = split_words_for_arc_seq(graph, arc_seq,
                                        int(end_states[b]))
        if words is None:
            log.warning("split-eps backtrace walk failed for utt %d", b)
            results.append(None)
            continue
        if use_final[b]:
            words.extend(graph.final_olabels[int(end_states[b])])
        results.append(DecodeResult(
            words=words, alignment=graph.tid[arc_seq].astype(np.int32),
            cost=float(costs[b])))
    return results


@partial(jax.jit, static_argnames=("R",))
def _compact_lat_records(lat_src, lat_dst, lat_arc, lat_ac, lat_ds, R):
    """Compact the [T, B, L] lattice-record tensors to the live records
    only, ON DEVICE, before anything crosses the device link.

    Measured (noisy minilib, K=1024, auto L=2K): only ~2.8% of record
    slots are live — the full-tensor D2H was ~60 s per 16-utterance
    batch over the tunneled link and dominated the whole rescoring wall.
    Returns (packed [B, R, 6] int32: (t, src_slot, dst_slot, arc,
    ac_bits, dst_state) rows in (t, slot) order, counts [B]).  Records
    beyond R are dropped (counts[b] > R tells the host to fall back to
    fetching that utterance's full columns)."""
    T, B, L = lat_arc.shape

    def flat(x):
        return jnp.swapaxes(x, 0, 1).reshape(B, T * L)

    v = flat(lat_arc >= 0)
    pos = jnp.cumsum(v.astype(jnp.int32), axis=1) - 1
    pos = jnp.where(v & (pos < R), pos, R)  # parked row R is sliced off
    t_of = flat(jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[:, None, None], (T, B, L)))
    stacked = jnp.stack(
        [t_of, flat(lat_src), flat(lat_dst), flat(lat_arc),
         flat(jax.lax.bitcast_convert_type(lat_ac, jnp.int32)),
         flat(lat_ds)], axis=-1)  # [B, T*L, 6]
    out = jnp.full((B, R + 1, 6), -1, jnp.int32).at[
        jnp.arange(B)[:, None], pos].set(stacked, mode="drop")
    return out[:, :R], v.sum(axis=1)


def _token_lattice_from_packed(rows, nf_b, pad2orig, tok_state,
                               tok_cost) -> Optional["TokenLattice"]:
    """Host side of the compacted-record path: regroup flat (t, slot)-
    ordered record rows into the per-frame [T, L'] arrays TokenLattice
    consumers expect (L' = that utterance's max records in any frame —
    typically tens, vs the device budget L = 2K)."""
    t = rows[:, 0]
    keep = t < nf_b
    rows = rows[keep]
    t = rows[:, 0]
    if nf_b <= 0:
        return None
    per_frame = np.bincount(t, minlength=nf_b)
    Lb = max(1, int(per_frame.max()) if per_frame.size else 1)
    src = np.full((nf_b, Lb), -1, np.int32)
    dst = np.full((nf_b, Lb), -1, np.int32)
    arc = np.full((nf_b, Lb), -1, np.int32)
    ac = np.zeros((nf_b, Lb), np.float32)
    ds = np.full((nf_b, Lb), -1, np.int32)
    starts = np.zeros(nf_b + 1, np.int64)
    np.cumsum(per_frame, out=starts[1:])
    col = np.arange(len(rows), dtype=np.int64) - starts[t]
    src[t, col] = rows[:, 1]
    dst[t, col] = rows[:, 2]
    a = rows[:, 3]
    arc[t, col] = np.where(a >= 0, pad2orig[np.maximum(a, 0)], -1)
    ac[t, col] = np.ascontiguousarray(rows[:, 4]).view(np.float32)
    ds[t, col] = rows[:, 5]
    return TokenLattice(src, dst, arc, ac, tok_state, tok_cost, ds)


def decode_batch_tokens(
    graph: CsrGraph,
    loglikes: np.ndarray,
    num_frames: Sequence[int],
    opts: Optional[ViterbiOptions] = None,
    want_lattice: bool = False,
    lattice_beam: float = 10.0,
    lattice_budget: int = 0,
) -> List[Optional[DecodeResult]]:
    """Token-sparse analog of decode_batch (for graphs too large for the
    dense kernels; also selectable for testing).

    want_lattice=True emits bounded per-frame lattice-arc records on
    device (no host loglikes, transfer O(T·L) per utterance) — see
    TokenLattice / lat.lattice.lattice_from_token_records.
    lattice_budget: arcs kept per (utterance, frame); 0 → auto."""
    from old_kaldi_git_tpu.decoder.csr import build_tile_graph

    opts = opts or ViterbiOptions()
    B, T, P = loglikes.shape
    K = max(4, min(opts.max_active, graph.num_states))
    tg = build_tile_graph(graph)
    ET = _token_budget(graph, K, tg.md)
    E = ET * tg.md
    split = graph.eps_ns is not None
    L = 0
    if want_lattice:
        L = lattice_budget or min(E, max(512, 2 * K))
        L = min(E, (L + 127) // 128 * 128)
    num_frames = np.asarray(num_frames, np.int32)
    fw = np.where(np.isfinite(graph.final_weight), graph.final_weight, BIG)
    nf_dev = jnp.asarray(num_frames)
    tile_ptr_dev, tiles_dev, frm_dev = tg.device_arrays()
    eps_hops = None
    D = 0
    init_tokens = None
    if split:
        eps_hops, D = _eps_hop_table(graph)
        # the start state's eps closure must seed the INITIAL token set
        # (the kernel's hop merge only runs after each frame's expansion)
        seeds = [(graph.start, 0.0)]
        u, c = graph.start, 0.0
        while graph.eps_ns[u] >= 0 and len(seeds) <= D:
            c += float(graph.eps_w[u])
            u = int(graph.eps_ns[u])
            seeds.append((u, c))
        ts0 = np.full((B, K), -1, np.int32)
        tc0 = np.full((B, K), BIG, np.float32)
        for i, (s_i, c_i) in enumerate(seeds[:K]):
            ts0[:, i] = s_i
            tc0[:, i] = c_i
        init_tokens = (jnp.asarray(ts0), jnp.asarray(tc0))
    out = _decode_scan_tokens(
        tile_ptr_dev, tiles_dev,
        graph.start, jnp.asarray(loglikes, jnp.float32), nf_dev,
        float(opts.acoustic_scale), float(opts.beam), K, ET,
        graph.num_states, L, float(lattice_beam), init_tokens,
        eps_hops, D,
    )
    tok_state, tok_cost, bp_state, bp_arc, bp_cost = out[:5]
    tok_state_h = np.asarray(tok_state)
    tok_cost_h = np.asarray(tok_cost)
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
    arcs = np.asarray(
        _backtrace_scan(bp_state, bp_arc, frm_dev,
                        jnp.asarray(np.maximum(end_states, 0)), nf_dev)
    )
    # the kernel's arc ids are padded tile slots — map back to graph arcs
    arcs = np.where(arcs >= 0, tg.pad2orig[np.maximum(arcs, 0)], -1)
    # record-based lattices need NO [T, B, K] frame tensors on the host —
    # only the bounded [T, B, L] records plus the [B, K] final token set
    if split:
        results = _results_from_arcs_split(
            graph, arcs, end_states, use_final, costs, num_frames)
    else:
        results = results_from_arcs(
            graph, arcs, end_states, use_final, costs, num_frames,
        )
    if want_lattice:
        # compact to live records ON DEVICE (~2.8% of slots at the noisy
        # minilib operating point): the full [T, B, L] x5 D2H dominated
        # the rescoring wall over the tunneled link
        R = min(T * 64, T * L)
        packed, counts = _compact_lat_records(*out[5:], R=R)
        packed = np.asarray(packed)  # [B, R, 6] — the one lattice D2H
        counts = np.asarray(counts)
        for b, res in enumerate(results):
            if res is None:
                continue
            nf_b = int(num_frames[b])
            if counts[b] > R:
                # budget overflow (record-dense utterance): fetch this
                # utterance's full columns and build the classic way
                cols = [np.asarray(a[:, b]) for a in out[5:]]
                arc_b = np.where(
                    cols[2] >= 0,
                    tg.pad2orig[np.maximum(cols[2], 0)], -1)
                res.token_lattice = TokenLattice(
                    cols[0][:nf_b], cols[1][:nf_b], arc_b[:nf_b],
                    cols[3][:nf_b], tok_state_h[b], tok_cost_h[b],
                    cols[4][:nf_b],
                )
                continue
            res.token_lattice = _token_lattice_from_packed(
                packed[b, : counts[b]], nf_b, tg.pad2orig,
                tok_state_h[b], tok_cost_h[b])
    return results


@dataclasses.dataclass
class TokenLattice:
    """Bounded per-utterance lattice-arc records from the token-sparse
    decoder (device-emitted; see _decode_scan_tokens L > 0).  Slot ids
    refer to each frame's top-K token set; src slots at t=0 refer to the
    initial token set (slot 0 = start state)."""

    src_slot: np.ndarray  # [T, L] int32, -1 = empty record
    dst_slot: np.ndarray  # [T, L] int32
    arc: np.ndarray       # [T, L] int32 graph arc ids
    ac: np.ndarray        # [T, L] float32 unscaled acoustic costs
    final_states: np.ndarray  # [K] last-frame token state ids (-1 dead)
    final_costs: np.ndarray   # [K] their forward costs
    # post-hop destination state per record (-1 = empty); split-eps
    # lattices walk arc-target -> dst_state for backoff words/weights
    dst_state: Optional[np.ndarray] = None  # [T, L] int32


@dataclasses.dataclass
class DecodeResult:
    words: List[int]
    alignment: np.ndarray  # tids, [T]
    cost: float
    # per-frame surviving tokens (for lattice generation): [T, K] state ids
    # (-1 = dead) and their forward costs
    frame_states: Optional[np.ndarray] = None
    frame_costs: Optional[np.ndarray] = None
    # bounded device-emitted lattice arcs (token-sparse path)
    token_lattice: Optional[TokenLattice] = None


def decode_batch(
    graph: CsrGraph,
    loglikes: np.ndarray,
    num_frames: Sequence[int],
    opts: Optional[ViterbiOptions] = None,
    want_lattice: bool = False,
) -> List[Optional[DecodeResult]]:
    """Beam-decode a batch of utterances against a shared HCLG.

    The backtrace runs on device; only [T, B] winning-arc ids come back to
    the host.  want_lattice=True additionally fetches the full per-frame
    token sets (expensive over a slow device link) for lattice generation.
    """
    opts = opts or ViterbiOptions()
    B, T, P = loglikes.shape
    # three regimes by graph size (SURVEY.md §7.3 hard-part 1):
    # 1. dense (K == S, beam-only pruning): 4x faster than top-K even at
    #    ~5k states; picked whenever the [T, B, S] winning-arc tensor fits.
    # 2. top-K with dense [B, S] alpha scatter: medium graphs.
    # 3. token-sparse (decode_batch_tokens): huge graphs where even a
    #    [B, S] alpha would blow HBM — per-frame work independent of S.
    if B * graph.num_states * 4 > 2_000_000_000:
        return decode_batch_tokens(graph, loglikes, num_frames, opts,
                                   want_lattice)
    dense_ok = (
        not want_lattice
        and T * B * graph.num_states * 4 <= 4_000_000_000
    )
    K = (
        graph.num_states
        if dense_ok
        else max(4, min(opts.max_active, graph.num_states))
    )
    num_frames = np.asarray(num_frames, np.int32)
    frm = np.repeat(
        np.arange(graph.num_states, dtype=np.int32), graph.out_degree()
    )
    fw = np.where(np.isfinite(graph.final_weight), graph.final_weight, BIG)
    nf_dev = jnp.asarray(num_frames)
    frm_dev = jnp.asarray(frm)
    if want_lattice:
        # lattice generation needs the full per-frame token sets host-side;
        # pay the backpointer transfer only on this path
        tok_state, tok_cost, bp_state, bp_arc, bp_cost, _alpha = _decode_scan(
            frm_dev, jnp.asarray(graph.pdf),
            jnp.asarray(graph.weight), jnp.asarray(graph.nextstate),
            graph.start, jnp.asarray(loglikes, jnp.float32),
            nf_dev, float(opts.acoustic_scale), float(opts.beam),
            K, graph.num_states,
        )
        tok_state_h = np.asarray(tok_state)
        tok_cost_h = np.asarray(tok_cost)
        end_states = np.zeros(B, np.int32)
        costs = np.zeros(B, np.float64)
        use_final = np.zeros(B, bool)
        for b in range(B):
            total = tok_cost_h[b] + fw[tok_state_h[b]]
            if total.min() >= BIG:
                total = tok_cost_h[b]
            else:
                use_final[b] = True
            slot = int(np.argmin(total))
            costs[b] = float(total[slot])
            end_states[b] = tok_state_h[b, slot]
        arcs = np.asarray(
            _backtrace_scan(bp_state, bp_arc, frm_dev,
                            jnp.asarray(end_states), nf_dev)
        )  # [T, B]
        bp_state_h = np.asarray(bp_state)
        bp_cost_h = np.asarray(bp_cost)
    else:
        end_dev, final_dev, cost_dev, arc_dev = _decode_and_backtrace(
            frm_dev, jnp.asarray(graph.pdf),
            jnp.asarray(graph.weight), jnp.asarray(graph.nextstate),
            graph.start, jnp.asarray(loglikes, jnp.float32),
            nf_dev, float(opts.acoustic_scale), float(opts.beam),
            jnp.asarray(fw.astype(np.float32)), K, graph.num_states,
        )
        end_states = np.asarray(end_dev)
        use_final = np.asarray(final_dev)
        costs = np.asarray(cost_dev, np.float64)
        arcs = np.asarray(arc_dev)  # [T, B]
        bp_state_h = bp_cost_h = None

    return results_from_arcs(
        graph, arcs, end_states, use_final, costs, num_frames,
        frame_states=bp_state_h, frame_costs=bp_cost_h,
    )


def results_from_arcs(
    graph: CsrGraph,
    arcs: np.ndarray,  # [T, B] winning arc ids (-1 = dead frame)
    end_states: np.ndarray,  # [B]
    use_final: np.ndarray,  # [B] bool
    costs: np.ndarray,  # [B]
    num_frames: np.ndarray,  # [B]
    frame_states: Optional[np.ndarray] = None,  # [T, B, K] (lattice mode)
    frame_costs: Optional[np.ndarray] = None,
) -> List[Optional[DecodeResult]]:
    """Host tail of a batched decode: winning-arc chains → words/alignments.

    Shared between decode_batch and external fused programs (bench.py runs
    the whole pipeline as one jit and reuses this for the word extraction)."""
    B = arcs.shape[1]
    # vectorized word extraction: most arcs carry no output labels, so
    # build a cached arc→has-olabel mask once per graph and only touch the
    # (few) word-bearing arcs per utterance in Python
    mask = getattr(graph, "_olabel_mask", None)
    if mask is None or len(mask) != graph.num_arcs:
        mask = np.fromiter(
            (len(o) > 0 for o in graph.arc_olabels), bool, graph.num_arcs
        )
        graph._olabel_mask = mask
    results: List[Optional[DecodeResult]] = []
    for b in range(B):
        nf_b = int(num_frames[b])
        if costs[b] >= BIG:
            results.append(None)
            continue
        arc_seq = arcs[:nf_b, b]
        if (arc_seq < 0).any():
            results.append(None)
            continue
        tids = graph.tid[arc_seq]
        words: List[int] = []
        for a in arc_seq[mask[arc_seq]]:
            words.extend(graph.arc_olabels[a])
        if use_final[b]:
            words.extend(graph.final_olabels[int(end_states[b])])
        results.append(
            DecodeResult(
                words=words, alignment=tids.astype(np.int32),
                cost=float(costs[b]),
                frame_states=(
                    frame_states[:nf_b, b] if frame_states is not None else None
                ),
                frame_costs=(
                    frame_costs[:nf_b, b] if frame_costs is not None else None
                ),
            )
        )
    return results
