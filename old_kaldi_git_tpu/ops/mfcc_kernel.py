"""Fused STFT+mel+DCT Pallas kernel.

The per-frame MFCC pipeline (power spectrum → mel filterbank → log → DCT)
becomes four chained matmuls/elementwise stages in ONE kernel invocation per
frame tile — no HBM round-trips between stages.  The DFT is expressed as two
real matmuls (frames @ C_re, frames @ C_im): at window size 512 this is
MXU-friendly and beats bandwidth-bound FFT butterflies for batched frames.

Weights are padded to lane width 128 (mel bins, cepstra) — padded mel
columns produce log(eps) which the zero-padded DCT rows annihilate.

Parity target: old_kaldi_git_tpu.feat.compute.Mfcc (equivalence-tested).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from old_kaldi_git_tpu.feat.compute import MfccOptions, dct_matrix, lifter_coeffs
from old_kaldi_git_tpu.feat.mel import mel_banks_matrix

LANE = 128
TILE_N = 128
EPS = 1e-30


def make_mfcc_weights(opts: MfccOptions = None):
    """(c_re [W, W/2], c_im, mel [W/2, 128], dct [128, 128]) float32,
    padded to lane width; dct already includes liftering."""
    opts = opts or MfccOptions()
    w = opts.frame_opts.padded_window_size
    f = w // 2  # nyquist dropped, matches feat.compute.power_spectrum
    n = np.arange(w)
    k = np.arange(f)
    ang = -2.0 * math.pi * np.outer(n, k) / w
    c_re = np.cos(ang).astype(np.float32)  # [W, F]
    c_im = np.sin(ang).astype(np.float32)
    mel, _ = mel_banks_matrix(
        opts.mel_opts, opts.frame_opts.samp_freq, w
    )  # [F, num_bins]
    nb = mel.shape[1]
    mel_pad = np.zeros((f, LANE), np.float32)
    mel_pad[:, :nb] = mel
    dct = dct_matrix(opts.num_ceps, nb)  # [C, nb]
    if opts.cepstral_lifter != 0.0:
        dct = dct * lifter_coeffs(opts.num_ceps, opts.cepstral_lifter)[:, None]
    dct_pad = np.zeros((LANE, LANE), np.float32)
    dct_pad[:nb, : opts.num_ceps] = dct.T
    return (
        jnp.asarray(c_re), jnp.asarray(c_im),
        jnp.asarray(mel_pad), jnp.asarray(dct_pad),
    )


def _mfcc_kernel(frames_ref, cre_ref, cim_ref, mel_ref, dct_ref, out_ref):
    f = frames_ref[:]  # [TILE_N, W]
    re = jnp.dot(f, cre_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(f, cim_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im  # [TILE_N, F]
    mel_e = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)
    log_mel = jnp.log(jnp.maximum(mel_e, EPS))
    out_ref[:] = jnp.dot(log_mel, dct_ref[:], preferred_element_type=jnp.float32)


def fused_mfcc_from_frames(
    frames: jnp.ndarray, weights, num_ceps: int = 13, interpret: bool = None
) -> jnp.ndarray:
    """[N, W] windowed frames → [N, num_ceps] cepstra (no energy column;
    the caller overwrites c0 with the raw log energy when use_energy)."""
    c_re, c_im, mel, dct = weights
    n, w = frames.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_pad = (n + TILE_N - 1) // TILE_N * TILE_N
    if n_pad != n:
        frames = jnp.pad(frames, ((0, n_pad - n), (0, 0)))
    f_bins = c_re.shape[1]
    out = pl.pallas_call(
        _mfcc_kernel,
        grid=(n_pad // TILE_N,),
        in_specs=[
            pl.BlockSpec((TILE_N, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, f_bins), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, f_bins), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f_bins, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, LANE), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * w * f_bins * 2 + 2 * n_pad * f_bins * LANE
            + 2 * n_pad * LANE * LANE,
            bytes_accessed=4 * (n_pad * w + 2 * w * f_bins + n_pad * LANE),
            transcendentals=n_pad * LANE,
        ),
    )(frames, c_re, c_im, mel, dct)
    return out[:n, :num_ceps]


def fused_mfcc_reference(frames: jnp.ndarray, weights, num_ceps: int = 13):
    """jnp reference of the same math (for equivalence tests)."""
    c_re, c_im, mel, dct = weights
    re = frames @ c_re
    im = frames @ c_im
    power = re * re + im * im
    log_mel = jnp.log(jnp.maximum(power @ mel, EPS))
    return (log_mel @ dct)[:, :num_ceps]
