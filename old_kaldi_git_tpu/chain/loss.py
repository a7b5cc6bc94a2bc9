"""LF-MMI objective: scan-based denominator/numerator forward passes.

Parity with reference src/chain/{chain-denominator,chain-numerator,
chain-training}.{h,cc,cu}: denominator alpha recursion over the den graph
with leaky-HMM and per-frame renormalization (the overflow-rescue scheme of
chain-denominator.cc, done in log space here), tolerance-lattice numerator,
objective = (num - den)/frames with output l2 regularization.

The backward pass is jax.grad of these forwards: d(logZ)/d(logit) equals
the occupancy difference γ_num − γ_den that chain-kernels.cu computes by
hand (SURVEY.md §3.4 TPU mapping).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from old_kaldi_git_tpu.chain.den_graph import DenominatorGraph
from old_kaldi_git_tpu.utils.parse_options import options_dataclass

NEG_INF = -1e30


@options_dataclass
class ChainLossOptions:
    leaky_hmm_coefficient: float = 0.1
    l2_regularize: float = 5e-5
    xent_regularize: float = 0.1


# Above this many den-graph states the dense [S, S] transition matrix is
# not worth its memory (S=8192 -> 256 MB f32 + a [B, T, S] emission array)
# and the arc-list path takes over; mirrors the reference's O(arcs)
# recursion in chain-denominator.cu, which never materializes [S, S].
DENSE_STATE_LIMIT = 4096


def denominator_logprob(
    logits: jnp.ndarray,
    num_frames: jnp.ndarray,
    den: DenominatorGraph,
    leaky_hmm_coefficient: float = 0.1,
    dense_state_limit: int = None,
) -> jnp.ndarray:
    """[B, T, P] logits (chain outputs, unnormalized) → [B] log Z_den.

    Auto-selects between two numerically-equivalent formulations of the
    reference's chain-denominator.cu alpha recursion (linear-space f32
    probabilities with per-frame renormalization rescue):

      * dense (S ≤ dense_state_limit): one [S, S] matmul per frame — the
        MXU-shaped path, backward is also a matmul;
      * sparse (large S): gather/segment-sum over the arc list, O(A) per
        frame like the reference kernel, with a rematerialized scan body
        so the [B, A] per-frame intermediates never hit HBM as residuals.
        This is what makes realistic biphone den graphs (S ~ 30k,
        A ~ 300k) trainable at all: the dense path would need a 3.6 GB
        transition matrix and ~1 TFLOP per frame.
    """
    limit = DENSE_STATE_LIMIT if dense_state_limit is None else dense_state_limit
    if den.num_states > limit:
        return _denominator_sparse(
            logits, num_frames, den, leaky_hmm_coefficient
        )
    return _denominator_dense(logits, num_frames, den, leaky_hmm_coefficient)


def _denominator_dense(
    logits: jnp.ndarray,
    num_frames: jnp.ndarray,
    den: DenominatorGraph,
    leaky_hmm_coefficient: float = 0.1,
) -> jnp.ndarray:
    """Dense-matmul alpha recursion (small S).

    MXU formulation: every arc into state j emits pdf(j) (den-graph
    property), so one alpha step is a LINEAR-space matmul with the dense
    [S, S] transition matrix followed by a per-state emission multiply and
    per-frame renormalization — exactly the reference's
    chain-denominator.cu numerics (probabilities in f32 with per-frame
    rescue, no per-state max).  Matmuls autodiff to matmuls, so the
    backward pass stays on the MXU too; the previous scatter-logsumexp
    formulation had a serialized scatter-add in its gradient (measured
    1.6 s/step backward vs 0.06 s forward on-chip)."""
    init = jnp.asarray(den.initial_log_probs)
    S = den.num_states
    B, T, P = logits.shape
    leaky = float(leaky_hmm_coefficient)

    # dense transition matrix (linear probs); parallel arcs accumulate
    M = np.zeros((S, S), np.float32)
    np.add.at(M, (den.from_state, den.to_state), np.exp(den.log_prob))
    M_j = jnp.asarray(M)
    # per-state emission pdf (self-loop pdf == entry pdf)
    state_pdf = np.zeros(S, np.int32)
    self_loops = den.from_state == den.to_state
    state_pdf[den.from_state[self_loops]] = den.pdf[self_loops]
    # state-emission log-scores as a matmul (backward = matmul, no scatter)
    P2S = np.zeros((P, S), np.float32)
    P2S[state_pdf, np.arange(S)] = 1.0
    e_log = logits @ jnp.asarray(P2S)  # [B, T, S]
    # per-frame shift for exp() stability (reference: per-frame renorm)
    e_shift = jnp.max(e_log, axis=2, keepdims=True)  # [B, T, 1]
    e_lin = jnp.exp(e_log - e_shift)  # [B, T, S] in (0, 1]

    init_lin = jnp.exp(init)
    alpha0 = init_lin[None, :] * e_lin[:, 0]
    z0 = jnp.sum(alpha0, axis=1, keepdims=True)
    alpha0 = alpha0 / z0
    logz0 = jnp.log(z0[:, 0]) + e_shift[:, 0, 0]

    def step(carry, inputs):
        alpha, logz = carry
        e_t, sh_t, t = inputs  # [B, S], [B, 1]
        ax = (alpha @ M_j) * e_t
        if leaky > 0:
            # leaky-HMM: add leaky mass distributed by the initial probs
            ax = ax + leaky * jnp.sum(ax, axis=1, keepdims=True) * init_lin[None, :]
        z = jnp.sum(ax, axis=1, keepdims=True)
        new_alpha = ax / jnp.maximum(z, 1e-30)
        active = (t < num_frames)[:, None]
        alpha_out = jnp.where(active, new_alpha, alpha)
        logz_out = logz + jnp.where(
            active[:, 0], jnp.log(jnp.maximum(z[:, 0], 1e-30)) + sh_t[:, 0], 0.0
        )
        return (alpha_out, logz_out), None

    (alpha, logz), _ = jax.lax.scan(
        step,
        (alpha0, logz0),
        (
            jnp.swapaxes(e_lin[:, 1:], 0, 1),
            jnp.swapaxes(e_shift[:, 1:], 0, 1),
            jnp.arange(1, T),
        ),
    )
    final = jax.nn.logsumexp(
        jnp.log(jnp.maximum(alpha, 1e-30))
        + jnp.asarray(den.final_log_probs)[None, :],
        axis=1,
    )
    return logz + final


def _denominator_sparse(
    logits: jnp.ndarray,
    num_frames: jnp.ndarray,
    den: DenominatorGraph,
    leaky_hmm_coefficient: float = 0.1,
) -> jnp.ndarray:
    """Arc-list alpha recursion (large S), O(A) work per frame.

    Per frame: gather alpha at arc sources, scale by arc probability,
    segment-sum into destinations (arcs pre-sorted by destination so the
    segment-sum is a sorted reduction), multiply by the destination-state
    emission (gathered from the logits — never a [B, T, S] array).  The
    per-frame shift uses max over all pdfs, an upper bound of the dense
    path's max over used states, so exp() stays in (0, 1].  jax.checkpoint
    on the scan body keeps the [B, A] intermediates out of the residuals;
    the backward pass recomputes them and autodiffs the segment-sum to a
    gather and the alpha-gather to a scatter-add, matching the reference's
    hand-written beta/gamma kernels in cost shape
    (src/chain/chain-kernels.cu)."""
    S = den.num_states
    B, T, P = logits.shape
    leaky = float(leaky_hmm_coefficient)

    order = np.argsort(den.to_state, kind="stable")
    frm = jnp.asarray(den.from_state[order])
    to = jnp.asarray(den.to_state[order])
    w_lin = jnp.asarray(np.exp(den.log_prob[order]).astype(np.float32))
    state_pdf = np.zeros(S, np.int32)
    self_loops = den.from_state == den.to_state
    state_pdf[den.from_state[self_loops]] = den.pdf[self_loops]
    spdf = jnp.asarray(state_pdf)
    init_lin = jnp.exp(jnp.asarray(den.initial_log_probs))

    e_shift = jnp.max(logits, axis=2)  # [B, T]

    def emit(logits_t, sh_t):
        return jnp.exp(jnp.take(logits_t, spdf, axis=1) - sh_t[:, None])

    alpha0 = init_lin[None, :] * emit(logits[:, 0], e_shift[:, 0])
    z0 = jnp.sum(alpha0, axis=1, keepdims=True)
    alpha0 = alpha0 / jnp.maximum(z0, 1e-30)
    logz0 = jnp.log(jnp.maximum(z0[:, 0], 1e-30)) + e_shift[:, 0]

    @jax.checkpoint
    def step(carry, inputs):
        alpha, logz = carry
        logits_t, sh_t, t = inputs  # [B, P], [B]
        e_t = emit(logits_t, sh_t)
        contrib = jnp.take(alpha, frm, axis=1) * w_lin[None, :]  # [B, A]
        ax = (
            jax.ops.segment_sum(
                contrib.T, to, num_segments=S, indices_are_sorted=True
            ).T
            * e_t
        )
        if leaky > 0:
            ax = ax + leaky * jnp.sum(ax, axis=1, keepdims=True) * init_lin[None, :]
        z = jnp.sum(ax, axis=1, keepdims=True)
        new_alpha = ax / jnp.maximum(z, 1e-30)
        active = (t < num_frames)[:, None]
        alpha_out = jnp.where(active, new_alpha, alpha)
        logz_out = logz + jnp.where(
            active[:, 0], jnp.log(jnp.maximum(z[:, 0], 1e-30)) + sh_t, 0.0
        )
        return (alpha_out, logz_out), None

    (alpha, logz), _ = jax.lax.scan(
        step,
        (alpha0, logz0),
        (
            jnp.swapaxes(logits[:, 1:], 0, 1),
            jnp.swapaxes(e_shift[:, 1:], 0, 1),
            jnp.arange(1, T),
        ),
    )
    final = jax.nn.logsumexp(
        jnp.log(jnp.maximum(alpha, 1e-30))
        + jnp.asarray(den.final_log_probs)[None, :],
        axis=1,
    )
    return logz + final


def numerator_logprob(
    logits: jnp.ndarray,
    pdf_seq: jnp.ndarray,
    allowed: jnp.ndarray,
    num_frames: jnp.ndarray,
    seq_len: jnp.ndarray,
    advance_lp: jnp.ndarray = None,
    loop_lp: float = 0.0,
) -> jnp.ndarray:
    """Tolerance-lattice forward: [B, T, P] logits, [B, L] pdfs, [B, T, L]
    allowed mask → [B] numerator logprob.

    advance_lp [B, L] / loop_lp carry the denominator-graph transition
    weights (normalization-FST semantics): stay costs loop_lp per frame,
    entering token l costs loop_lp + advance_lp[:, l] (token 0's advance_lp
    is the den initial prob, applied at frame 0 without loop_lp)."""
    B, T, P = logits.shape
    L = pdf_seq.shape[1]
    if advance_lp is None:
        advance_lp = jnp.zeros((B, L), logits.dtype)
    scores = jnp.take_along_axis(
        logits, jnp.broadcast_to(pdf_seq[:, None, :], (B, T, L)), axis=2
    )  # [B, T, L]
    mask0 = jnp.where(allowed[:, 0], 0.0, NEG_INF)
    alpha0 = jnp.where(
        jnp.arange(L)[None, :] == 0,
        scores[:, 0] + mask0 + advance_lp[:, :1],
        NEG_INF,
    )
    z0 = jax.nn.logsumexp(alpha0, axis=1, keepdims=True)
    alpha0 = alpha0 - z0

    def step(carry, inputs):
        alpha, logz = carry
        sc_t, al_t, t = inputs  # [B, L], [B, L]
        shifted = jnp.concatenate(
            [jnp.full((B, 1), NEG_INF), alpha[:, :-1]], axis=1
        )
        new_alpha = (
            jnp.logaddexp(alpha + loop_lp, shifted + loop_lp + advance_lp)
            + sc_t
        )
        new_alpha = jnp.where(al_t, new_alpha, NEG_INF)
        z = jax.nn.logsumexp(new_alpha, axis=1, keepdims=True)
        z_safe = jnp.maximum(z, NEG_INF / 2)
        new_alpha = new_alpha - z_safe
        active = (t < num_frames)[:, None]
        alpha_out = jnp.where(active, new_alpha, alpha)
        logz_out = logz + jnp.where(active[:, 0], z_safe[:, 0], 0.0)
        return (alpha_out, logz_out), None

    (alpha, logz), _ = jax.lax.scan(
        step,
        (alpha0, z0[:, 0]),
        (
            jnp.swapaxes(scores[:, 1:], 0, 1),
            jnp.swapaxes(allowed[:, 1:], 0, 1),
            jnp.arange(1, T),
        ),
    )
    # must end at the last token
    end = jnp.take_along_axis(alpha, (seq_len - 1)[:, None], axis=1)[:, 0]
    return logz + end


def chain_loss(
    logits: jnp.ndarray,
    den: DenominatorGraph,
    pdf_seq: jnp.ndarray,
    allowed: jnp.ndarray,
    num_frames: jnp.ndarray,
    seq_len: jnp.ndarray,
    advance_lp: jnp.ndarray = None,
    opts: ChainLossOptions = None,
) -> Tuple[jnp.ndarray, dict]:
    """Per-batch LF-MMI loss (negated objective, per frame) + metrics."""
    opts = opts or ChainLossOptions()
    num = numerator_logprob(
        logits, pdf_seq, allowed, num_frames, seq_len,
        advance_lp, float(den.loop_log_prob),
    )
    den_lp = denominator_logprob(
        logits, num_frames, den, opts.leaky_hmm_coefficient
    )
    tot_frames = jnp.maximum(jnp.sum(num_frames), 1)
    objf = jnp.sum(num - den_lp) / tot_frames
    frame_mask = (
        jnp.arange(logits.shape[1])[None, :] < num_frames[:, None]
    )[..., None]
    l2 = jnp.sum(jnp.square(logits) * frame_mask) / tot_frames
    loss = -objf + 0.5 * opts.l2_regularize * l2
    return loss, {"objf": objf, "num": jnp.mean(num), "den": jnp.mean(den_lp), "l2": l2}
