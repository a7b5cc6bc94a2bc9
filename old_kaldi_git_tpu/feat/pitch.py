"""Kaldi-style pitch tracker + POV features, batched for TPU.

Reference parity (SURVEY.md §2.2): src/feat/pitch-functions.{h,cc}
(compute-kaldi-pitch-feats, the Ghahremani et al. 2014 tracker) and
process-kaldi-pitch-feats (POV + normalized log-pitch + delta-pitch).

TPU-first reshaping of the reference's per-frame online loop:
  * downsample to resample_freq (4 kHz) with the windowed-sinc resampler;
  * NCCF over a DENSE lag grid as one batched gather + reduction
    ([B, T, W] windows against [B, T, W] lag-shifted windows — the
    reference interpolates a sparse log-spaced lag set to save CPU flops,
    pointless on a TPU where the dense [T, L] product is a few matmuls);
  * the reference's online Viterbi over lags (cost = -nccf + penalty *
    (log lag ratio)^2) becomes a `lax.scan` over frames carrying the
    [B, L] cost front, with the [L, L] inter-lag penalty precomputed;
  * backtrace on device (same pattern as decoder/viterbi.py).

Output of compute_kaldi_pitch: [B, T, 2] = (NCCF_pov, pitch_hz);
process_pitch converts to the 3-dim feature the recipes append
(POV-feature, mean-subtracted log-pitch, delta-pitch).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from old_kaldi_git_tpu.feat.resample import linear_resample
from old_kaldi_git_tpu.utils.parse_options import options_dataclass

BIG = 1e10


@options_dataclass
class PitchOptions:
    samp_freq: float = 16000.0
    frame_shift_ms: float = 10.0
    frame_length_ms: float = 25.0
    min_f0: float = 50.0
    max_f0: float = 400.0
    resample_freq: float = 4000.0
    penalty_factor: float = 0.1
    lowpass_cutoff: float = 1000.0
    nccf_ballast: float = 7000.0
    soft_min_f0: float = 10.0


@options_dataclass
class ProcessPitchOptions:
    pitch_scale: float = 2.0
    pov_scale: float = 2.0
    delta_pitch_scale: float = 10.0
    normalization_window: int = 151  # frames, centered sliding CMN of log-pitch


def _lag_grid(opts: PitchOptions) -> np.ndarray:
    """Dense integer lags covering [1/max_f0, 1/min_f0] at resample_freq."""
    min_lag = int(math.floor(opts.resample_freq / opts.max_f0))
    max_lag = int(math.ceil(opts.resample_freq / opts.min_f0))
    return np.arange(min_lag, max_lag + 1, dtype=np.int32)


@partial(jax.jit, static_argnames=("window_size", "window_shift", "num_frames"))
def _nccf(
    wave: jnp.ndarray,  # [B, S] (downsampled)
    lags: jnp.ndarray,  # [L]
    ballast: float,
    window_size: int,
    window_shift: int,
    num_frames: int,
) -> jnp.ndarray:
    """[B, T, L] normalized cross-correlation.

    nccf(t, l) = <x_t, x_{t+l}> / sqrt((e0 + ballast) * el) where x_t is the
    window starting at t*shift and e are the window energies (reference
    pitch-functions.cc ComputeCorrelation + ballast term that suppresses
    spurious correlation in silence)."""
    B, S = wave.shape
    starts = jnp.arange(num_frames) * window_shift  # [T]
    offs = jnp.arange(window_size)  # [W]
    idx0 = starts[:, None] + offs[None, :]  # [T, W]
    idx0 = jnp.minimum(idx0, S - 1)
    x0 = wave[:, idx0]  # [B, T, W]
    # per-window DC removal (reference subtracts the mean of the outer frame)
    x0 = x0 - jnp.mean(x0, axis=-1, keepdims=True)
    e0 = jnp.sum(x0 * x0, axis=-1)  # [B, T]

    def one_lag(lag):
        idx = jnp.minimum(idx0 + lag, S - 1)  # [T, W]
        xl = wave[:, idx]
        xl = xl - jnp.mean(xl, axis=-1, keepdims=True)
        el = jnp.sum(xl * xl, axis=-1)
        dot = jnp.sum(x0 * xl, axis=-1)
        denom = jnp.sqrt((e0 + ballast) * el) + 1e-10
        return dot / denom  # [B, T]

    nccf = jax.vmap(one_lag, out_axes=-1)(lags)  # [B, T, L]
    return jnp.clip(nccf, -1.0, 1.0)


@partial(jax.jit, static_argnames=())
def _lag_viterbi(nccf: jnp.ndarray, penalty: jnp.ndarray) -> jnp.ndarray:
    """Min-cost lag track: scan over T with [B, L] cost front.

    cost[t, l] = -nccf[t, l] + min_l' (cost[t-1, l'] + penalty[l', l]);
    backtrace stored per frame, unwound on device (reference
    PitchFrameInfo::ComputeBacktraces, batch-reshaped)."""
    B, T, L = nccf.shape

    def step(front, nccf_t):
        # [B, L', 1] + [L', L] -> min over L'
        tot = front[:, :, None] + penalty[None, :, :]
        best_prev = jnp.argmin(tot, axis=1)  # [B, L]
        new_front = jnp.min(tot, axis=1) - nccf_t
        return new_front, best_prev

    init = -nccf[:, 0, :]
    front, bps = jax.lax.scan(step, init, jnp.swapaxes(nccf, 0, 1)[1:])
    last = jnp.argmin(front, axis=-1)  # [B]

    def unwind(carry, bp_t):
        lag = carry
        prev = jnp.take_along_axis(bp_t, lag[:, None], axis=1)[:, 0]
        return prev, lag

    _, lags_rev = jax.lax.scan(unwind, last, bps[::-1])
    lags = jnp.concatenate([lags_rev[::-1], last[None, :]], axis=0)  # [T, B]
    return jnp.swapaxes(lags, 0, 1)  # [B, T]


def compute_kaldi_pitch(
    wave: jnp.ndarray, opts: PitchOptions = None
) -> jnp.ndarray:
    """[B, num_samples] at opts.samp_freq → [B, T, 2] (nccf_pov, pitch_hz)."""
    opts = opts or PitchOptions()
    if wave.ndim == 1:
        wave = wave[None]
    down = linear_resample(wave, opts.samp_freq, opts.resample_freq)
    # lowpass happens inside the resampler (cutoff min(freq_in, freq_out)/2);
    # an explicit lower cutoff matches the reference's 1 kHz lowpass:
    if opts.lowpass_cutoff < 0.5 * opts.resample_freq:
        down = linear_resample(
            down, opts.resample_freq, 2.0 * opts.lowpass_cutoff
        )
        down = linear_resample(
            down, 2.0 * opts.lowpass_cutoff, opts.resample_freq
        )
    window_size = int(opts.resample_freq * 0.001 * opts.frame_length_ms)
    window_shift = int(opts.resample_freq * 0.001 * opts.frame_shift_ms)
    lags = _lag_grid(opts)
    S = down.shape[-1]
    T = max(1, 1 + (S - window_size - int(lags[-1])) // window_shift)

    # ballast scaled by mean signal energy (reference scales by
    # mean-square-energy so the suppression is amplitude-invariant)
    mse = jnp.mean(down * down, axis=-1, keepdims=True)  # [B, 1]
    window_e = mse * window_size
    ballast_pitch = opts.nccf_ballast * 1e-4 * window_e * window_e
    # POV nccf has no ballast (reference nccf_pov); the pitch ballast enters
    # the denominator as sqrt(e0*el) → sqrt((e0+b)*el), approximated with the
    # frame-average energy ratio so one NCCF evaluation serves both
    nccf_pov = _nccf(down, jnp.asarray(lags), 0.0, window_size, window_shift, T)
    nccf_pitch_raw = nccf_pov
    scale = jnp.sqrt(
        window_e[:, :, None] / (window_e[:, :, None] + ballast_pitch[:, :, None] + 1e-10)
    )
    nccf_pitch = nccf_pitch_raw * scale

    # soft-min-f0 penalty: discourage very long lags a bit
    lag_arr = jnp.asarray(lags, jnp.float32)
    soft = 1.0 - (opts.soft_min_f0 / opts.min_f0) * (
        lag_arr / float(lags[-1])
    )
    nccf_pitch = nccf_pitch * soft[None, None, :]

    log_lags = np.log(lags.astype(np.float64))
    penalty = (
        opts.penalty_factor
        * np.square(log_lags[:, None] - log_lags[None, :])
        * (opts.max_f0 / 10.0)
    ).astype(np.float32)
    best_lag_idx = _lag_viterbi(nccf_pitch, jnp.asarray(penalty))  # [B, T]
    best_lag = jnp.take(jnp.asarray(lags), best_lag_idx)  # [B, T]
    pitch_hz = opts.resample_freq / best_lag.astype(jnp.float32)
    pov = jnp.take_along_axis(nccf_pov, best_lag_idx[:, :, None], axis=2)[
        :, :, 0
    ]
    return jnp.stack([pov, pitch_hz], axis=-1)  # [B, T, 2]


def _pov_feature(nccf: jnp.ndarray) -> jnp.ndarray:
    """Reference NccfToPovFeature: 2 * ((1.0001 - nccf)^0.15 - 1)."""
    return 2.0 * (jnp.power(1.0001 - nccf, 0.15) - 1.0)


def pov_probability(nccf: jnp.ndarray) -> jnp.ndarray:
    """Reference NccfToPov: probability of voicing from the fitted
    polynomial l = -5.2+5.4e^{7.5(c-1)}+4.8c-2e^{-10c}+4.2e^{20(c-1)},
    pov = 1/(1+e^-l)."""
    c = jnp.clip(nccf, -1.0, 1.0)
    l = (
        -5.2
        + 5.4 * jnp.exp(7.5 * (c - 1.0))
        + 4.8 * c
        - 2.0 * jnp.exp(-10.0 * c)
        + 4.2 * jnp.exp(20.0 * (c - 1.0))
    )
    return 1.0 / (1.0 + jnp.exp(-l))


def process_pitch(
    pitch: jnp.ndarray, opts: ProcessPitchOptions = None
) -> jnp.ndarray:
    """[B, T, 2] (nccf, pitch_hz) → [B, T, 3] (pov, norm-log-pitch, delta):
    the process-kaldi-pitch-feats default output."""
    opts = opts or ProcessPitchOptions()
    nccf = pitch[..., 0]
    hz = jnp.maximum(pitch[..., 1], 1e-3)
    log_pitch = jnp.log(hz)
    pov = pov_probability(nccf)

    # POV-weighted sliding-window mean subtraction of log-pitch
    W = opts.normalization_window
    half = W // 2
    B, T = log_pitch.shape
    pad_lp = jnp.pad(log_pitch * pov, ((0, 0), (half, half)))
    pad_w = jnp.pad(pov, ((0, 0), (half, half)))
    kernel = jnp.ones((W,), jnp.float32)

    def smooth(x):
        return jnp.convolve(x, kernel, mode="valid")

    num = jax.vmap(smooth)(pad_lp)  # [B, T]
    den = jax.vmap(smooth)(pad_w) + 1e-8
    mean_lp = num / den
    norm_log_pitch = log_pitch - mean_lp

    delta = jnp.diff(log_pitch, axis=1, prepend=log_pitch[:, :1])
    return jnp.stack(
        [
            opts.pov_scale * _pov_feature(nccf),
            opts.pitch_scale * norm_log_pitch,
            opts.delta_pitch_scale * delta,
        ],
        axis=-1,
    )
