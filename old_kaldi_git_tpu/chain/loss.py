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


def _scatter_logsumexp(terms: jnp.ndarray, to_state: jnp.ndarray, num_states: int):
    """[B, A] terms → [B, S] logsumexp grouped by to_state."""
    m = jnp.full((terms.shape[0], num_states), NEG_INF, terms.dtype)
    m = m.at[:, to_state].max(terms)
    m_safe = jnp.maximum(m, NEG_INF)
    gathered = m_safe[:, to_state]
    sums = jnp.zeros((terms.shape[0], num_states), terms.dtype)
    sums = sums.at[:, to_state].add(jnp.exp(terms - gathered))
    return m_safe + jnp.log(jnp.maximum(sums, 1e-30))


def denominator_logprob(
    logits: jnp.ndarray,
    num_frames: jnp.ndarray,
    den: DenominatorGraph,
    leaky_hmm_coefficient: float = 0.1,
) -> jnp.ndarray:
    """[B, T, P] logits (chain outputs, unnormalized) → [B] log Z_den."""
    frm = jnp.asarray(den.from_state)
    to = jnp.asarray(den.to_state)
    pdf = jnp.asarray(den.pdf)
    lp = jnp.asarray(den.log_prob)
    init = jnp.asarray(den.initial_log_probs)
    S = den.num_states
    B, T, P = logits.shape
    log_leaky = float(np.log(leaky_hmm_coefficient)) if leaky_hmm_coefficient > 0 else None

    # frame 0: alpha = init + emission of the state's... in this graph
    # emissions ride on arcs, so frame 0 consumes the entry arc from a
    # virtual start: alpha0[s] = init[s] + logit(pdf emitted by entering s).
    # Entering state s emits pdf of s's phone instance = pdf on its
    # self-loop arc; build a per-state pdf map from the self-loops.
    state_pdf = np.zeros(S, np.int32)
    self_loops = den.from_state == den.to_state
    state_pdf[den.from_state[self_loops]] = den.pdf[self_loops]
    state_pdf_j = jnp.asarray(state_pdf)

    alpha0 = init + logits[:, 0, :][:, state_pdf_j]  # [B, S]
    z0 = jax.nn.logsumexp(alpha0, axis=1, keepdims=True)
    alpha0 = alpha0 - z0

    def step(carry, inputs):
        alpha, logz = carry
        ll_t, t = inputs  # [B, P]
        terms = alpha[:, frm] + lp[None, :] + ll_t[:, pdf]  # [B, A]
        new_alpha = _scatter_logsumexp(terms, to, S)
        if log_leaky is not None:
            tot = jax.nn.logsumexp(new_alpha, axis=1, keepdims=True)
            new_alpha = jnp.logaddexp(new_alpha, log_leaky + init[None, :] + tot)
        z = jax.nn.logsumexp(new_alpha, axis=1, keepdims=True)
        new_alpha = new_alpha - z
        active = (t < num_frames)[:, None]
        alpha_out = jnp.where(active, new_alpha, alpha)
        logz_out = logz + jnp.where(active[:, 0], z[:, 0], 0.0)
        return (alpha_out, logz_out), None

    (alpha, logz), _ = jax.lax.scan(
        step,
        (alpha0, z0[:, 0]),
        (jnp.swapaxes(logits[:, 1:], 0, 1), jnp.arange(1, T)),
    )
    final = jax.nn.logsumexp(alpha + jnp.asarray(den.final_log_probs)[None, :], axis=1)
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
