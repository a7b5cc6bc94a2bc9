"""Scaling-efficiency measurement harness.

BASELINE requires audio-seconds/s scaling efficiency measured at 1 chip /
1 host / N hosts.  This harness times a step function at increasing device
counts on whatever platform is available (virtual CPU devices in CI, chips
on a pod) and reports throughput + efficiency; multi-host runs call
jax.distributed.initialize first (SURVEY.md §2.8 P8).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from old_kaldi_git_tpu.utils.log import get_logger

log = get_logger("scaling")


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init (reference: run.pl/queue.pl job launch → one SPMD
    program per host).  No-op when single-process."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "distributed: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


@dataclasses.dataclass
class ScalingPoint:
    num_devices: int
    throughput: float  # work units per second
    efficiency: float  # vs linear scaling from the first point


def measure_scaling(
    make_step: Callable[[Mesh], Callable],
    make_batch: Callable[[int], object],
    device_counts: Sequence[int],
    work_per_batch: float,
    warmup: int = 1,
    iters: int = 5,
) -> List[ScalingPoint]:
    """For each device count N: build a ("data",) mesh over the first N
    devices, shard the batch, time `iters` step calls.

    make_step(mesh) → step(batch) (should jit internally);
    make_batch(N) → pytree of [B(N), ...] host arrays (B usually ∝ N);
    work_per_batch: units (e.g. audio seconds) per batch at N=1, scaled by N.
    """
    devices = jax.devices()
    points: List[ScalingPoint] = []
    base = None
    for n in device_counts:
        if n > len(devices):
            log.warning("skipping N=%d (only %d devices)", n, len(devices))
            continue
        mesh = Mesh(np.asarray(devices[:n]), ("data",))
        step = make_step(mesh)
        batch = make_batch(n)
        sharding = NamedSharding(mesh, P("data"))
        batch = jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        for _ in range(warmup):
            jax.block_until_ready(step(batch))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(batch)
        jax.block_until_ready(out)
        wall = (time.perf_counter() - t0) / iters
        thr = work_per_batch * n / wall
        if base is None:
            base = thr / n
        eff = thr / (n * base)
        points.append(ScalingPoint(n, thr, eff))
        log.info("N=%d: %.1f units/s, efficiency %.1f%%", n, thr, 100 * eff)
    return points
