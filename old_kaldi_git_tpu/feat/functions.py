"""Feature post-processing: deltas, splicing, sliding-window CMN.

Parity with reference src/feat/feature-functions.h (ComputeDeltas,
SpliceFrames, SlidingWindowCmn).  All functions are batched over leading axes
and expressed as gathers/matmuls/cumsums that XLA fuses; edge frames are
replicated via clipped indices exactly like the reference.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from old_kaldi_git_tpu.utils.parse_options import options_dataclass


@options_dataclass
class DeltaFeaturesOptions:
    order: int = 2
    window: int = 2


def delta_filters(opts: DeltaFeaturesOptions) -> list[np.ndarray]:
    """Per-order 1-D filters (reference DeltaFeatures ctor): order 0 = [1],
    each next order is the previous convolved with the regression kernel
    j/sum(j^2), j in [-w, w]."""
    scales = [np.array([1.0])]
    w = opts.window
    j = np.arange(-w, w + 1, dtype=np.float64)
    kernel = j / np.sum(j**2)
    for _ in range(opts.order):
        scales.append(np.convolve(scales[-1], kernel, mode="full"))
    return [s.astype(np.float32) for s in scales]


def compute_deltas(feats: jnp.ndarray, opts: DeltaFeaturesOptions = None) -> jnp.ndarray:
    """[..., T, D] → [..., T, D*(order+1)] with clipped-edge regression."""
    opts = opts or DeltaFeaturesOptions()
    t_axis = feats.shape[-2]
    outs = []
    for filt in delta_filters(opts):
        radius = (len(filt) - 1) // 2
        acc = None
        for k, coeff in enumerate(filt):
            offset = k - radius
            idx = np.clip(np.arange(t_axis) + offset, 0, t_axis - 1)
            term = feats[..., idx, :] * coeff
            acc = term if acc is None else acc + term
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)


def splice_frames(
    feats: jnp.ndarray, left_context: int = 4, right_context: int = 4
) -> jnp.ndarray:
    """[..., T, D] → [..., T, D*(l+1+r)], edges replicated
    (reference SpliceFrames)."""
    t_axis = feats.shape[-2]
    pieces = []
    for offset in range(-left_context, right_context + 1):
        idx = np.clip(np.arange(t_axis) + offset, 0, t_axis - 1)
        pieces.append(feats[..., idx, :])
    return jnp.concatenate(pieces, axis=-1)


@options_dataclass
class SlidingWindowCmnOptions:
    cmn_window: int = 600
    min_window: int = 100
    normalize_variance: bool = False
    center: bool = False


def sliding_window_cmn(
    feats: jnp.ndarray, opts: SlidingWindowCmnOptions = None
) -> jnp.ndarray:
    """Per-frame mean (and optional variance) normalization over a sliding
    window (reference SlidingWindowCmn), via cumulative sums.

    [..., T, D] → [..., T, D].  center=True uses a window centered on the
    frame; otherwise the window ends at the frame (min_window at the start).
    """
    opts = opts or SlidingWindowCmnOptions()
    t_axis = feats.shape[-2]
    t = np.arange(t_axis)
    if opts.center:
        start = t - opts.cmn_window // 2
        end = start + opts.cmn_window
        shift = np.where(start < 0, -start, 0)
        start, end = start + shift, end + shift
        shift = np.where(end > t_axis, end - t_axis, 0)
        start, end = np.maximum(start - shift, 0), np.minimum(end, t_axis)
    else:
        end = t + 1
        start = np.maximum(end - opts.cmn_window, 0)
        end = np.maximum(end, np.minimum(opts.min_window, t_axis))
    counts = (end - start).astype(np.float32)  # [T]

    zeros = jnp.zeros_like(feats[..., :1, :])
    csum = jnp.concatenate([zeros, jnp.cumsum(feats, axis=-2)], axis=-2)
    win_sum = csum[..., end, :] - csum[..., start, :]
    mean = win_sum / counts[:, None]
    out = feats - mean
    if opts.normalize_variance:
        csum2 = jnp.concatenate(
            [zeros, jnp.cumsum(jnp.square(feats), axis=-2)], axis=-2
        )
        win_sum2 = csum2[..., end, :] - csum2[..., start, :]
        var = jnp.maximum(win_sum2 / counts[:, None] - jnp.square(mean), 1e-10)
        out = out / jnp.sqrt(var)
    return out
