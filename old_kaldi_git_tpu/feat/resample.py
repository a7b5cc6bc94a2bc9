"""Sample-rate conversion.

Parity with reference src/feat/resample.h (LinearResample): bandlimited
interpolation with a Hanning-windowed sinc of num_zeros zero-crossings and
cutoff 0.99 * Nyquist of the lower rate.  Expressed as a static gather +
weight contraction so it jit-compiles with fixed shapes.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np


def _windowed_sinc(t: np.ndarray, cutoff: float, num_zeros: int) -> np.ndarray:
    """Low-pass filter value at time offsets t (seconds)."""
    support = num_zeros / (2.0 * cutoff)
    window = np.where(
        np.abs(t) < support, 0.5 + 0.5 * np.cos(math.pi * t / support), 0.0
    )
    return window * 2.0 * cutoff * np.sinc(2.0 * cutoff * t)


def resample_weights(
    num_samples_in: int,
    samp_freq_in: float,
    samp_freq_out: float,
    num_zeros: int = 6,
):
    """Precompute (indices [T_out, taps], weights [T_out, taps], T_out)."""
    cutoff = 0.99 * 0.5 * min(samp_freq_in, samp_freq_out)
    duration = num_samples_in / samp_freq_in
    num_out = int(duration * samp_freq_out)
    support = num_zeros / (2.0 * cutoff)
    taps = int(2 * support * samp_freq_in) + 2
    t_out = np.arange(num_out) / samp_freq_out  # [T_out]
    first = np.ceil((t_out - support) * samp_freq_in).astype(np.int64)
    idx = first[:, None] + np.arange(taps)[None, :]  # [T_out, taps]
    t_in = idx / samp_freq_in
    w = _windowed_sinc(t_out[:, None] - t_in, cutoff, num_zeros) / samp_freq_in
    valid = (idx >= 0) & (idx < num_samples_in)
    w = np.where(valid, w, 0.0)
    idx = np.clip(idx, 0, num_samples_in - 1)
    return idx.astype(np.int32), w.astype(np.float32), num_out


def linear_resample(
    wave: jnp.ndarray, samp_freq_in: float, samp_freq_out: float, num_zeros: int = 6
) -> jnp.ndarray:
    """[..., S_in] → [..., S_out]."""
    if samp_freq_in == samp_freq_out:
        return wave
    idx, w, _ = resample_weights(wave.shape[-1], samp_freq_in, samp_freq_out, num_zeros)
    return jnp.sum(wave[..., idx] * jnp.asarray(w), axis=-1)


def arbitrary_resample_weights(
    num_samples_in: int,
    samp_freq_in: float,
    sample_points: np.ndarray,
    filter_cutoff: float,
    num_zeros: int = 6,
):
    """Reference ArbitraryResample (src/feat/resample.h): evaluate the
    bandlimited signal at ARBITRARY time points (seconds), not a uniform
    grid — the pitch tracker uses this to sample NCCF lag functions at
    warped positions.  Returns (indices [M, taps], weights [M, taps])."""
    t_out = np.asarray(sample_points, np.float64)
    support = num_zeros / (2.0 * filter_cutoff)
    taps = int(2 * support * samp_freq_in) + 2
    first = np.ceil((t_out - support) * samp_freq_in).astype(np.int64)
    idx = first[:, None] + np.arange(taps)[None, :]  # [M, taps]
    t_in = idx / samp_freq_in
    w = _windowed_sinc(
        t_out[:, None] - t_in, filter_cutoff, num_zeros) / samp_freq_in
    valid = (idx >= 0) & (idx < num_samples_in)
    w = np.where(valid, w, 0.0)
    idx = np.clip(idx, 0, num_samples_in - 1)
    return idx.astype(np.int32), w.astype(np.float32)


def arbitrary_resample(
    wave: jnp.ndarray,
    samp_freq_in: float,
    sample_points: np.ndarray,
    filter_cutoff: Optional[float] = None,
    num_zeros: int = 6,
) -> jnp.ndarray:
    """[..., S_in] → [..., M]: bandlimited interpolation at the given time
    points (seconds).  filter_cutoff defaults to 0.99 * Nyquist."""
    if filter_cutoff is None:
        filter_cutoff = 0.99 * 0.5 * samp_freq_in
    idx, w = arbitrary_resample_weights(
        wave.shape[-1], samp_freq_in, sample_points, filter_cutoff, num_zeros)
    return jnp.sum(wave[..., idx] * jnp.asarray(w), axis=-1)
