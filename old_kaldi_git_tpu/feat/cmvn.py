"""Per-speaker/per-utterance CMVN statistics.

Parity with reference src/transform/cmvn.h (AccCmvnStats / ApplyCmvn) and the
compute-cmvn-stats / apply-cmvn tools: stats are a [2, dim+1] matrix — row 0 =
(sum_x, count), row 1 = (sum_x^2, 0) — the on-disk format Kaldi uses, so our
cmvn.ark interoperates.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def acc_cmvn_stats(feats, weights=None) -> np.ndarray:
    """[T, D] (numpy or jax) → [2, D+1] float64 stats."""
    x = np.asarray(feats, dtype=np.float64)
    if weights is None:
        count = float(x.shape[0])
        s1 = x.sum(axis=0)
        s2 = (x**2).sum(axis=0)
    else:
        w = np.asarray(weights, dtype=np.float64)
        count = float(w.sum())
        s1 = (x * w[:, None]).sum(axis=0)
        s2 = ((x**2) * w[:, None]).sum(axis=0)
    dim = x.shape[1]
    stats = np.zeros((2, dim + 1), dtype=np.float64)
    stats[0, :dim] = s1
    stats[0, dim] = count
    stats[1, :dim] = s2
    return stats


def sum_cmvn_stats(stats_list) -> np.ndarray:
    return np.sum(np.stack([np.asarray(s, np.float64) for s in stats_list]), axis=0)


def cmvn_shift_scale(stats: np.ndarray, norm_vars: bool = False):
    """stats → (shift [D], scale [D]) so that normalized = x*scale + shift."""
    stats = np.asarray(stats, dtype=np.float64)
    dim = stats.shape[1] - 1
    count = max(stats[0, dim], 1e-10)
    mean = stats[0, :dim] / count
    if norm_vars:
        var = np.maximum(stats[1, :dim] / count - mean**2, 1e-10)
        scale = 1.0 / np.sqrt(var)
    else:
        scale = np.ones(dim)
    shift = -mean * scale
    return shift.astype(np.float32), scale.astype(np.float32)


def apply_cmvn(feats: jnp.ndarray, stats: np.ndarray, norm_vars: bool = False):
    """[..., T, D] → normalized features."""
    shift, scale = cmvn_shift_scale(stats, norm_vars)
    return feats * jnp.asarray(scale) + jnp.asarray(shift)
