"""Timing / profiling utilities (SURVEY.md §5 tracing row).

Reference parity:
- src/base/timer.h `Timer`                  → utils.log.Timer (wall clock)
- CuDevice per-function profile accumulator
  (CuTimer + AccuProfile, PrintProfile at exit with --verbose)
                                            → `profile(name)` context manager
                                              + `print_profile()`
- cu-matrix-speed-test.cc micro-benchmarks  → `time_jitted` (min-of-N with
                                              jax.block_until_ready — the
                                              only honest way to time XLA)
- (new capability) per-kernel roofline vs speed-of-light per BASELINE
                                            → `roofline(...)`
- JAX profiler (xplane traces)              → `trace(logdir)`
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, Dict, Optional

from old_kaldi_git_tpu.utils.log import get_logger

log = get_logger("prof")


def time_jitted(fn: Callable, *args, iters: int = 4, warmup: int = 1,
                **kwargs) -> float:
    """Min-of-N wall seconds for a jitted callable, forcing completion with
    block_until_ready (async dispatch otherwise returns immediately)."""
    import jax

    for _ in range(max(warmup, 0)):
        jax.block_until_ready(fn(*args, **kwargs))
    best = float("inf")
    for _ in range(max(iters, 1)):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        best = min(best, time.perf_counter() - t0)
    return best


@dataclasses.dataclass
class _Acc:
    seconds: float = 0.0
    calls: int = 0


_PROFILE: Dict[str, _Acc] = {}


@contextlib.contextmanager
def profile(name: str, sync: bool = False):
    """Accumulate wall time under `name` (the CuDevice::AccuProfile role).
    sync=True inserts a device barrier before/after so async dispatch does
    not hide the cost (use for coarse sections, not per-op)."""
    if sync:
        import jax

        (jax.device_put(0) + 0).block_until_ready()
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            import jax

            (jax.device_put(0) + 0).block_until_ready()
        acc = _PROFILE.setdefault(name, _Acc())
        acc.seconds += time.perf_counter() - t0
        acc.calls += 1


def print_profile(reset: bool = False) -> str:
    """Formatted cumulative profile (CuDevice::PrintProfile role)."""
    lines = ["-----[ cumulative profile ]-----"]
    for name, acc in sorted(_PROFILE.items(), key=lambda kv: -kv[1].seconds):
        lines.append(f"{name}\t{acc.seconds:.4f}s\t{acc.calls} calls")
    out = "\n".join(lines)
    log.info("%s", out)
    if reset:
        _PROFILE.clear()
    return out


# TPU v5e per-chip peaks (bf16 MXU / HBM); override for other chips
PEAK_FLOPS_BF16 = 394e12
PEAK_HBM_GBS = 819e9


def roofline(flops: float, bytes_moved: float, seconds: float,
             peak_flops: float = PEAK_FLOPS_BF16,
             peak_bw: float = PEAK_HBM_GBS) -> Dict[str, float]:
    """Achieved vs speed-of-light: which roof binds and how close we are.

    Returns {achieved_tflops, achieved_gbs, frac_of_peak, bound} where
    bound is the binding roof ('compute' or 'memory') given the kernel's
    arithmetic intensity."""
    seconds = max(seconds, 1e-12)
    ai = flops / max(bytes_moved, 1.0)  # arithmetic intensity, flops/byte
    ridge = peak_flops / peak_bw
    bound = "compute" if ai >= ridge else "memory"
    sol_seconds = (flops / peak_flops) if bound == "compute" \
        else (bytes_moved / peak_bw)
    return {
        "achieved_tflops": flops / seconds / 1e12,
        "achieved_gbs": bytes_moved / seconds / 1e9,
        "frac_of_peak": sol_seconds / seconds,
        "bound": bound,
    }


@contextlib.contextmanager
def trace(logdir: str):
    """JAX profiler trace (xplane) if available; no-op otherwise."""
    try:
        import jax

        jax.profiler.start_trace(logdir)
        started = True
    except Exception as e:  # noqa: BLE001 — profiling is best-effort
        log.warning("profiler trace unavailable: %s", e)
        started = False
    try:
        yield
    finally:
        if started:
            try:
                import jax

                jax.profiler.stop_trace()
            except Exception as e:  # noqa: BLE001
                log.warning("stop_trace failed: %s", e)
