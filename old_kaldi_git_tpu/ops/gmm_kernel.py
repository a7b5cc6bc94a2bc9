"""Batched GMM log-likelihoods as a fused Pallas matmul + log-sum-exp kernel.

Replaces the reference's per-frame DiagGmm::LogLikelihoods matvec hot loop
(SURVEY.md §3.2) and the cu-kernels softmax/row reductions: one kernel tile
computes scores for 128 frames × a block of Gaussians on the MXU and reduces
the per-pdf logsumexp in registers, writing [128 frames × pdf-block] — the
mixture dimension never touches HBM.

Layout: all pdfs' Gaussians padded to a power-of-two M (mixtures) and packed
contiguously, so each 128-lane score tile covers 128/M whole pdfs.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from old_kaldi_git_tpu.gmm.diag_gmm import AmDiagGmm

LANE = 128
TILE_T = 128
NEG = -1e30


def pack_gmm_weights(am: AmDiagGmm) -> Tuple[jnp.ndarray, int, int, int]:
    """Returns (W [G_pad, E_pad], M_pad, num_pdfs, ext_dim) where a frame's
    extended row is [x, x², 1] padded to E_pad and scores = ext @ W.T.
    Rows are packed per-pdf with M_pad mixtures (gconst -inf padding)."""
    P = am.num_pdfs
    D = am.dim
    e = 2 * D + 1
    e_pad = (e + LANE - 1) // LANE * LANE
    m_max = max(p.num_mix for p in am.pdfs)
    m_pad = 1
    while m_pad < m_max:
        m_pad *= 2
    m_pad = min(m_pad, LANE)
    if m_pad < m_max:
        raise ValueError(f"num mixtures {m_max} exceeds lane width")
    g_rows = P * m_pad
    g_pad = (g_rows + LANE - 1) // LANE * LANE
    w = np.zeros((g_pad, e_pad), np.float32)
    # padded gaussians: gconst = NEG so they vanish in the logsumexp
    w[:, 2 * D] = NEG
    for i, pdf in enumerate(am.pdfs):
        m = pdf.num_mix
        r0 = i * m_pad
        w[r0 : r0 + m, :D] = pdf.means_invvars
        w[r0 : r0 + m, D : 2 * D] = -0.5 * pdf.inv_vars
        w[r0 : r0 + m, 2 * D] = pdf.gconsts
    return jnp.asarray(w), m_pad, P, e


def _gmm_kernel(ext_ref, w_ref, ind_ref, out_ref, *, m_pad: int):
    """ext [TILE_T, E], w [m_pad·LANE, E] (gaussians of 128 pdfs),
    ind [LANE, LANE/m_pad padded to LANE] compressed group-indicator →
    out [TILE_T, LANE]: one logsumexp'd column per pdf.

    Group reduction = matmul with the indicator (Mosaic has no lane
    reshapes; the MXU does this for free).  Stabilization is per GROUP,
    not per 128-gaussian block: a temperature-8 indicator logsumexp
    gives a per-group stabilizer g̃ ∈ [group-max, group-max + 8·ln 8]
    without underflow out to ~550 nats below the block max (a
    block-max-only stabilizer floored every pdf more than ~69 nats below
    the block's best — caught by bench.verify_kernels, r5)."""
    per = LANE // m_pad  # pdfs produced per 128-lane score block

    def dot_t(a, b):  # a [T, E] · b [LANE, E]ᵀ
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    ext_f = ext_ref[:]
    # manual bf16x3 split: the MXU rounds f32 matmul inputs to bf16
    # (Mosaic ignores the precision= argument), which costs ~0.2 nats of
    # absolute score error at ~1e2 magnitudes (verify_kernels caught it
    # against the f64 oracle, r5).  hi+lo splitting recovers ~f32
    # accuracy at 3 passes — the "f32 via 3-pass bf16" rate the roofline
    # already prices in.
    ext_hi = ext_f.astype(jnp.bfloat16).astype(jnp.float32)
    ext_lo = ext_f - ext_hi
    for j in range(m_pad):
        w_blk = w_ref[j * LANE : (j + 1) * LANE, :]
        w_hi = w_blk.astype(jnp.bfloat16).astype(jnp.float32)
        w_lo = w_blk - w_hi
        scores = (dot_t(ext_hi, w_hi) + dot_t(ext_hi, w_lo)
                  + dot_t(ext_lo, w_hi))  # [TILE_T, LANE]
        m = jnp.max(scores, axis=1, keepdims=True)
        sm = scores - m
        # per-group stabilizer: 8·log Σ_group exp(sm/8) ≥ group max,
        # ≤ group max + 8·ln 8 ≈ +16.6 — so the exp below never
        # overflows and its dominant term never underflows
        f = jnp.exp(sm * 0.125)
        gf = jnp.dot(f, ind_ref[:, :per],
                     preferred_element_type=jnp.float32)  # [T, per]
        glog = 8.0 * jnp.log(jnp.maximum(gf, 1e-30))
        gb = jax.lax.dot_general(  # broadcast stabilizer back to lanes
            glog, ind_ref[:, :per],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, LANE]
        e = jnp.exp(sm - gb)
        gs = jnp.dot(e, ind_ref[:, :per],
                     preferred_element_type=jnp.float32)
        # add back EXACTLY the stabilizer that was subtracted: gb is
        # what the exponent saw (glog after the broadcast matmul's bf16
        # input rounding — up to 0.2 nats off glog at 1e2 magnitudes);
        # gb itself is bf16-representable, so this compaction matmul is
        # exact and the stabilizer cancels to the last bit.  Using glog
        # here instead left the rounding delta in the output
        # (verify_kernels, r5).
        gb_c = jnp.dot(gb, ind_ref[:, :per],
                       preferred_element_type=jnp.float32) * (1.0 / m_pad)
        out_ref[:, j * per : (j + 1) * per] = (
            jnp.log(jnp.maximum(gs, 1e-30)) + m + gb_c
        )


def gmm_loglikes_pallas(
    feats: jnp.ndarray, packed, interpret: bool = None
) -> jnp.ndarray:
    """[T, D] (or [B, T, D] flattened by caller) → [T, num_pdfs]."""
    w, m_pad, num_pdfs, e = packed
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t, d = feats.shape
    e_pad = w.shape[1]
    ext = jnp.concatenate(
        [feats, jnp.square(feats), jnp.ones((t, 1), feats.dtype)], axis=1
    )
    ext = jnp.pad(ext, ((0, 0), (0, e_pad - e)))
    t_pad = (t + TILE_T - 1) // TILE_T * TILE_T
    if t_pad != t:
        ext = jnp.pad(ext, ((0, t_pad - t), (0, 0)))
    # pad G rows so each kernel call covers exactly LANE pdfs (m_pad·LANE rows)
    g_chunk = m_pad * LANE
    g_pad = (w.shape[0] + g_chunk - 1) // g_chunk * g_chunk
    if g_pad != w.shape[0]:
        pad_w = jnp.full((g_pad - w.shape[0], e_pad), 0.0, w.dtype)
        pad_w = pad_w.at[:, 2 * ((e - 1) // 2)].set(NEG)
        w = jnp.concatenate([w, pad_w], axis=0)
    p_pad = g_pad // m_pad  # output columns (pdfs, padded)
    # compressed group-indicator: 128 gaussian lanes → LANE/m_pad pdf columns
    lanes = np.arange(LANE)
    per = LANE // m_pad
    ind = (lanes[:, None] // m_pad == np.arange(per)[None, :]).astype(np.float32)
    ind_dev = jnp.asarray(np.pad(ind, ((0, 0), (0, LANE - per))))
    out = pl.pallas_call(
        partial(_gmm_kernel, m_pad=m_pad),
        grid=(t_pad // TILE_T, g_pad // g_chunk),
        in_specs=[
            pl.BlockSpec((TILE_T, e_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_chunk, e_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE, LANE), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_T, LANE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, p_pad), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * g_pad * e_pad,
            bytes_accessed=4 * (t_pad * e_pad + g_pad * e_pad + t_pad * p_pad),
            transcendentals=t_pad * g_pad,
        ),
    )(ext, w, ind_dev)
    return out[:t, :num_pdfs]


def gmm_loglikes_reference(feats: jnp.ndarray, am: AmDiagGmm) -> jnp.ndarray:
    return am.loglikes_batch(feats[None])[0]
