"""Speed-of-light statements for the MFCC and GMM Pallas kernels.

BASELINE north star 4 asks for "speed-of-light" per kernel; the r3
verdict (#9) asks each kernel's BINDING resource and % of peak, in the
same style as the token-sparse roofline.  This bench times the kernels
standalone (scan-wrapped, host-fetch bounded) and prints achieved
GFLOP/s and GB/s against TPU v5e peaks:

  MXU  f32 ~ 49 TFLOP/s (bf16 197)     HBM ~ 819 GB/s

Usage: python benchmarks/kernel_roofline_bench.py
Prints one JSON line per kernel.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_F32_GFLOPS = 49_000.0
PEAK_HBM_GBS = 819.0


def timeit(fn, x, iters=20):
    """Scan-wrapped timing with a data-dependent carry perturbing the
    input each step — without it XLA hoists the loop-invariant kernel
    call out of the scan and the 'per-iter' time is fiction."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(xx):
        def step(c, _):
            y = fn(xx + c)
            return y.reshape(-1)[0] * 1e-20, y[0, 0]

        _, ys = jax.lax.scan(step, jnp.float32(0.0), None, length=iters)
        return ys.sum()

    out = many(x)
    float(np.asarray(out))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(many(x)))
        best = min(best, time.perf_counter() - t0)
    return (best - 0.022) / iters


def main():
    from old_kaldi_git_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from old_kaldi_git_tpu.feat.compute import MfccOptions
    from old_kaldi_git_tpu.ops.mfcc_kernel import (
        fused_mfcc_from_frames,
        make_mfcc_weights,
    )

    rng = np.random.default_rng(0)

    # ---- MFCC: N frames of W samples -> N x 13 ceps ----
    opts = MfccOptions()
    w = opts.frame_opts.padded_window_size
    f = w // 2
    weights = make_mfcc_weights(opts)
    N = 65536  # ~10.9 min of 16 kHz audio at 10 ms hop
    frames = jnp.asarray(rng.normal(size=(N, w)).astype(np.float32))

    def mfcc_fn(fr):
        return fused_mfcc_from_frames(fr, weights)

    sec = timeit(mfcc_fn, frames)
    # flops: 2 DFT matmuls [N,W]x[W,F] + power (3N F) + mel [N,F]x[F,128]
    # + log (N*128) + dct [N,128]x[128,128]
    flops = N * (2 * 2 * w * f + 3 * f + 2 * f * 128 + 128 + 2 * 128 * 128)
    byts = N * (w + 128) * 4  # frames in + ceps out (weights are resident)
    audio_s = N * 0.01
    print(json.dumps({
        "kernel": "fused_mfcc",
        "frames": N,
        "ms": round(sec * 1e3, 2),
        "audio_s_per_s": round(audio_s / sec, 0),
        "gflops": round(flops / sec / 1e9, 1),
        "pct_mxu_f32_peak": round(100 * flops / sec / 1e9 / PEAK_F32_GFLOPS, 2),
        "gbs": round(byts / sec / 1e9, 1),
        "pct_hbm_peak": round(100 * byts / sec / 1e9 / PEAK_HBM_GBS, 2),
    }), flush=True)

    # ---- GMM loglikes: T frames x (P pdfs * M mix) ----
    from old_kaldi_git_tpu.gmm.diag_gmm import AmDiagGmm, DiagGmm
    from old_kaldi_git_tpu.ops.gmm_kernel import (
        gmm_loglikes_pallas,
        pack_gmm_weights,
    )

    P, M, D = 2000, 8, 39  # 16k Gaussians (the r1 configuration)
    pdfs = [DiagGmm(np.ones(M) / M, rng.normal(size=(M, D)),
                    np.ones((M, D))) for _ in range(P)]
    am = AmDiagGmm(pdfs)
    packed = pack_gmm_weights(am)
    W_packed = packed[0]
    T = 6000  # 60 s batch (r1 configuration)
    x = jnp.asarray(rng.normal(size=(T, D)).astype(np.float32))

    def gmm_fn(xx):
        return gmm_loglikes_pallas(xx, packed)

    sec = timeit(gmm_fn, x)
    g_rows = W_packed.shape[0]
    e_pad = W_packed.shape[1]
    num_pdfs = P
    flops = T * (2 * g_rows * e_pad + 3 * g_rows)  # matmul + lse
    byts = (T * (D + num_pdfs) * 4 + W_packed.size * 4)
    print(json.dumps({
        "kernel": "gmm_loglikes",
        "frames": T,
        "gaussians": P * M,
        "ms": round(sec * 1e3, 2),
        "audio_s_per_s": round(T * 0.01 / sec, 0),
        "gflops": round(flops / sec / 1e9, 1),
        "pct_mxu_f32_peak": round(100 * flops / sec / 1e9 / PEAK_F32_GFLOPS, 2),
        "gbs": round(byts / sec / 1e9, 1),
        "pct_hbm_peak": round(100 * byts / sec / 1e9 / PEAK_HBM_GBS, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
