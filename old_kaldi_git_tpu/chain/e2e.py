"""End-to-end ('flat-start') chain training: generic FST numerators.

Reference parity: src/chain/chain-generic-numerator.{h,cc}
(GenericNumeratorComputation) + steps/nnet3/chain/e2e/ — LF-MMI training
without prior alignments: the numerator is the full per-utterance training
graph (any pronunciation/silence path through the transcript), not a
tolerance window around one alignment.

TPU formulation: per-utterance graphs are padded into batched arc tensors
[B, A] (src, dst, pdf, log-weight, mask) + [B, S] initial/final vectors;
one `lax.scan` over time does, per frame, an arc gather of the emission
scores and a log-space scatter-max/exp-sum (stable logsumexp) into the
destination states; jax.grad gives the occupancies.
Utterance graphs are tiny (a few states per transcript phone), so the
scatter path is cheap; the denominator stays on the dense MXU matmul
formulation of chain/loss.py.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from old_kaldi_git_tpu.chain.den_graph import DenominatorGraph
from old_kaldi_git_tpu.chain.loss import (
    ChainLossOptions,
    denominator_logprob,
)
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger

log = get_logger("chain_e2e")

NEG_INF = -1e30


@dataclasses.dataclass
class NumeratorGraphBatch:
    """Padded per-utterance numerator graphs (pdf-level, eps-free)."""

    src: np.ndarray  # [B, A] int32
    dst: np.ndarray  # [B, A] int32
    pdf: np.ndarray  # [B, A] int32
    weight: np.ndarray  # [B, A] float32 (log prob = -graph cost)
    mask: np.ndarray  # [B, A] bool
    init_lp: np.ndarray  # [B, S] float32
    final_lp: np.ndarray  # [B, S] float32

    @property
    def num_states(self) -> int:
        return self.init_lp.shape[1]

    @staticmethod
    def from_csr_graphs(graphs: Sequence) -> "NumeratorGraphBatch":
        """Batch per-utterance CsrGraph training graphs (decoder/csr
        fst_to_csr output: eps-forwarded emitting arcs + final weights)."""
        B = len(graphs)
        S = max(g.num_states for g in graphs)
        A = max(g.num_arcs for g in graphs)
        src = np.zeros((B, A), np.int32)
        dst = np.zeros((B, A), np.int32)
        pdf = np.zeros((B, A), np.int32)
        weight = np.full((B, A), NEG_INF, np.float32)
        mask = np.zeros((B, A), bool)
        init_lp = np.full((B, S), NEG_INF, np.float32)
        final_lp = np.full((B, S), NEG_INF, np.float32)
        for b, g in enumerate(graphs):
            na = g.num_arcs
            if hasattr(g, "row_ptr"):  # CsrGraph (raw training graph)
                deg = g.row_ptr[1:] - g.row_ptr[:-1]
                src[b, :na] = np.repeat(
                    np.arange(g.num_states, dtype=np.int32), deg)
                dst[b, :na] = g.nextstate
                weight[b, :na] = -g.weight  # graph cost → log prob
                fin = np.asarray(g.final_weight)
                ok = np.isfinite(fin)
                final_lp[b, :g.num_states][ok] = -fin[ok]
            else:  # SimpleNumGraph (normalized product)
                src[b, :na] = g.src
                dst[b, :na] = g.dst
                weight[b, :na] = g.weight  # already log probs
                final_lp[b, :g.num_states] = g.final_lp
            pdf[b, :na] = g.pdf
            mask[b, :na] = True
            init_lp[b, g.start] = 0.0
        return NumeratorGraphBatch(src, dst, pdf, weight, mask,
                                   init_lp, final_lp)


@dataclasses.dataclass
class SimpleNumGraph:
    """A normalized numerator graph in flat arc arrays."""

    start: int
    src: np.ndarray
    dst: np.ndarray
    pdf: np.ndarray
    weight: np.ndarray  # log probs
    final_lp: np.ndarray  # [S]
    num_states: int

    @property
    def num_arcs(self) -> int:
        return len(self.src)


def normalize_numerator_csr(csr, tm, den: DenominatorGraph) -> SimpleNumGraph:
    """Product of a per-utterance training graph with the denominator's
    normalization weights (the reference's normalization.fst composition,
    chain-supervision.cc AddWeightToSupervisionFst): every path through
    the numerator gets exactly the weight it carries inside the den graph
    — stay = loop_lp, entering a phone = loop_lp + LM advance (first frame:
    den initial prob), finals = den finals — so num ≤ den is an identity
    again and the LF-MMI objective is properly ≤ 0."""
    from collections import deque

    loop_lp = float(den.loop_log_prob)
    states: dict = {}

    def sid(ns: int, ds: int) -> int:
        key = (ns, ds)
        if key not in states:
            states[key] = len(states)
        return states[key]

    start_key = (int(csr.start), -1)
    start = sid(*start_key)
    arcs: List[Tuple[int, int, int, float]] = []
    finals: dict = {}
    seen = {start_key}
    q = deque([start_key])
    while q:
        ns, ds = q.popleft()
        me = sid(ns, ds)
        fw = csr.final_weight[ns]
        if np.isfinite(fw) and ds >= 0:
            finals[me] = float(den.final_log_probs[ds])
        for a in range(int(csr.row_ptr[ns]), int(csr.row_ptr[ns + 1])):
            dst = int(csr.nextstate[a])
            tid = int(csr.tid[a])
            pdf = int(csr.pdf[a])
            # classify by the TID, not graph topology: a minimized graph
            # can have FORWARD arcs with dst == src (e.g. repeated
            # silence); pricing those as self-loops would let numerator
            # paths outweigh their den counterpart without bound (the
            # trained model then exploits exactly that path — measured)
            if tm.is_self_loop(tid) and ds >= 0:
                w, nds = loop_lp, ds
            else:
                phone = tm.tid_to_phone(tid)
                lm = den.lm_start if ds < 0 else int(den.lm_next[ds])
                ds2 = den.arc_lookup.get((lm, phone))
                if ds2 is None:
                    # unseen n-gram: floor the LM advance like
                    # numerator_weights (-20), keeping the structural loop
                    # term so seen and unseen arcs stay comparable; the den
                    # state is unknown — stay on the current one (first
                    # frame: den state 0, arbitrary but harmless since the
                    # -20 floor dominates any subsequent weight lookups)
                    nds = ds if ds >= 0 else 0
                    w = (loop_lp - 20.0) if ds >= 0 else -20.0
                elif ds < 0:  # first frame: den initial prob, no loop term
                    nds, w = ds2, float(den.initial_log_probs[ds2])
                else:
                    nds = ds2
                    w = loop_lp + float(den.advance_lm_log_prob[ds2])
            to = sid(dst, nds)
            arcs.append((me, to, pdf, w))
            if (dst, nds) not in seen:
                seen.add((dst, nds))
                q.append((dst, nds))
    S = len(states)
    final_lp = np.full(S, NEG_INF, np.float32)
    for s, w in finals.items():
        final_lp[s] = w
    if not arcs:
        raise KaldiError("empty numerator graph")
    src, dst, pdf, w = (np.asarray(x) for x in zip(*arcs))
    return SimpleNumGraph(start, src.astype(np.int32), dst.astype(np.int32),
                          pdf.astype(np.int32), w.astype(np.float32),
                          final_lp, S)


def generic_numerator_logprob(
    logits: jnp.ndarray,  # [B, T, P]
    g: NumeratorGraphBatch,
    num_frames: jnp.ndarray,  # [B]
) -> jnp.ndarray:
    """[B] numerator log-probs: forward over each utterance's own FST
    (GenericNumeratorComputation::Forward).

    Log-space throughout: per frame, arc messages alpha[src] + w + score
    reduce into destination states by a scatter-max + exp-sum (stable
    logsumexp).  Utterance numerator log-alphas are bounded by T·max|score|
    so no per-frame rescue is needed, and — unlike a linear-space
    formulation — the gradient has no 0·inf underflow corner (measured:
    linear-space grads went NaN once trained logits grew to ~5x unit
    scale)."""
    B, T, P = logits.shape
    S = g.num_states
    src = jnp.asarray(g.src)
    dst = jnp.asarray(g.dst)
    w_log = jnp.where(jnp.asarray(g.mask), jnp.asarray(g.weight), NEG_INF)
    # [B, T, A] per-frame per-arc emission log-scores
    scores = jnp.take_along_axis(
        logits, jnp.broadcast_to(jnp.asarray(g.pdf)[:, None, :],
                                 (B, T, g.pdf.shape[1])), axis=2)
    alpha0 = jnp.asarray(g.init_lp)  # [B, S]
    brange = jnp.arange(B)[:, None]

    def step(carry, inputs):
        alpha = carry
        sc_t, t = inputs  # [B, A]
        msg = alpha[brange, src] + w_log + sc_t  # [B, A]
        mx = jnp.full((B, S), NEG_INF, logits.dtype).at[
            brange, dst].max(msg)
        mx_safe = jnp.where(mx > NEG_INF / 2, mx, 0.0)
        ssum = jnp.zeros((B, S), logits.dtype).at[brange, dst].add(
            jnp.exp(msg - mx_safe[brange, dst]))
        new_alpha = jnp.where(
            ssum > 0, mx_safe + jnp.log(jnp.maximum(ssum, 1e-30)), NEG_INF)
        active = (t < num_frames)[:, None]
        return jnp.where(active, new_alpha, alpha), None

    alpha, _ = jax.lax.scan(
        step, alpha0,
        (jnp.swapaxes(scores, 0, 1), jnp.arange(T)),
    )
    return jax.nn.logsumexp(alpha + jnp.asarray(g.final_lp), axis=1)


def chain_e2e_loss(
    logits: jnp.ndarray,
    den: DenominatorGraph,
    g: NumeratorGraphBatch,
    num_frames: jnp.ndarray,
    opts: ChainLossOptions = None,
    seq_weights: jnp.ndarray = None,  # [B] supervision weights (semisup)
) -> Tuple[jnp.ndarray, dict]:
    """Flat-start LF-MMI loss: generic numerator − dense denominator.
    train_chain_e2e always routes the numerator graphs through
    normalize_numerator_csr, so num ≤ den IS an identity (up to the −20
    unseen-n-gram floor) and the objective must stay ≤ 0 — treat a
    positive objf as a normalization regression, not as expected
    flat-start behaviour.

    seq_weights scales each sequence's contribution (the semisup recipe's
    per-egs weight: 1.0 for supervised, --unsup-egs-weight for lattice-
    supervised utterances); the objective normalizer is the weighted frame
    count so metrics stay per-frame comparable."""
    opts = opts or ChainLossOptions()
    if seq_weights is None:
        seq_weights = jnp.ones(logits.shape[0], logits.dtype)
    num = generic_numerator_logprob(logits, g, num_frames)
    den_lp = denominator_logprob(
        logits, num_frames, den, opts.leaky_hmm_coefficient)
    # floor at one weighted frame: a degenerate batch (all weights or frame
    # counts zero) clamps to per-frame scale instead of scaling up 1000x
    tot = jnp.maximum(jnp.sum(seq_weights * num_frames), 1.0)
    objf = jnp.sum(seq_weights * (num - den_lp)) / tot
    frame_mask = (
        jnp.arange(logits.shape[1])[None, :] < num_frames[:, None]
    )[..., None]
    l2 = jnp.sum(
        jnp.square(logits) * frame_mask
        * seq_weights[:, None, None]) / tot
    loss = -objf + 0.5 * opts.l2_regularize * l2
    return loss, {"objf": objf, "num": jnp.sum(seq_weights * num) / tot,
                  "den": jnp.sum(seq_weights * den_lp) / tot, "l2": l2}
