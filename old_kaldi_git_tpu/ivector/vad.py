"""Energy-based voice activity detection.

Reference parity (SURVEY.md §2.7): src/ivector/voice-activity-detection.{h,cc}
ComputeVadEnergy (the compute-vad binary): a frame is voiced when its
log-energy (feature column 0, i.e. the C0/energy coefficient) exceeds
  vad_energy_threshold + vad_energy_mean_scale * mean(log_energy)
and, with vad_frames_context > 0, when at least vad_proportion_threshold of
the surrounding 2*context+1 frames pass the same test.

Batched: [B, T] energies with a validity mask; the context vote is a 1-D
box-filter, so the whole thing jits to a couple of fused elementwise ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from old_kaldi_git_tpu.utils.parse_options import options_dataclass


@options_dataclass
class VadOptions:
    vad_energy_threshold: float = 5.0
    vad_energy_mean_scale: float = 0.5
    vad_frames_context: int = 0
    vad_proportion_threshold: float = 0.6


def compute_vad_energy(
    log_energy: jnp.ndarray,  # [B, T] (feats[..., 0] of MFCC with use_energy)
    opts: VadOptions = None,
    num_frames: jnp.ndarray = None,  # [B] valid frame counts; None = all
) -> jnp.ndarray:
    """[B, T] float 0/1 voicing decisions (invalid frames forced to 0)."""
    opts = opts or VadOptions()
    if log_energy.ndim == 1:
        log_energy = log_energy[None]
    B, T = log_energy.shape
    if num_frames is None:
        mask = jnp.ones((B, T), jnp.float32)
    else:
        mask = (
            jnp.arange(T)[None, :] < jnp.asarray(num_frames)[:, None]
        ).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
    mean_e = jnp.sum(log_energy * mask, axis=1, keepdims=True) / denom
    cutoff = opts.vad_energy_threshold + opts.vad_energy_mean_scale * mean_e
    raw = (log_energy > cutoff).astype(jnp.float32) * mask
    ctx = opts.vad_frames_context
    if ctx > 0:
        kernel = jnp.ones((2 * ctx + 1,), jnp.float32)
        votes = jax.vmap(
            lambda x: jnp.convolve(x, kernel, mode="same")
        )(raw)
        counts = jax.vmap(
            lambda m: jnp.convolve(m, kernel, mode="same")
        )(mask)
        keep = votes >= opts.vad_proportion_threshold * jnp.maximum(counts, 1.0)
        raw = keep.astype(jnp.float32) * mask
    return raw
