"""Data-parallel training scaling on the virtual mesh (SURVEY §2.8 P8).

Times the jitted CE train step (the one program that replaces the
reference's N-job parallel-SGD + nnet3-average loop) over a ("data",)
mesh of N = 1/2/4/8 devices with batch ∝ N, via
parallel/scaling.measure_scaling.

Same honesty note as sharded_scaling_bench: virtual devices share one
host's cores, so efficiency here shows the sharding/collective OVERHEAD
trend, not real multi-chip scaling; on real hardware the same program
scales by XLA's gradient psum over ICI.

Usage: python benchmarks/dp_scaling_bench.py
Prints one JSON line per N.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from old_kaldi_git_tpu.models.am_nnet import AmNnet
    from old_kaldi_git_tpu.models.tdnn import make_tdnnf
    from old_kaldi_git_tpu.models.train import (
        NnetTrainOptions,
        TrainState,
        make_ce_train_step,
        make_optimizer,
    )
    from old_kaldi_git_tpu.parallel.scaling import measure_scaling

    num_pdfs, input_dim, T = 512, 40, 64
    per_dev_batch = 8
    config = make_tdnnf(input_dim, num_pdfs, hidden_dim=256,
                        bottleneck_dim=32, num_layers=4)
    am = AmNnet.init(config, seed=0)
    opts = NnetTrainOptions(minibatch_size=per_dev_batch, chunk_width=T)
    optimizer = make_optimizer(opts, num_steps=100)
    rng = np.random.default_rng(0)

    def make_step(mesh):
        params = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())),
            am.variables["params"])
        bs = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())),
            am.variables.get("batch_stats", {}))
        state = TrainState(params, bs, optimizer.init(params), 0)
        step_fn = make_ce_train_step(am.model(), optimizer)
        holder = {"state": state}

        def step(batch):
            feats, labels, mask = batch
            holder["state"], metrics = step_fn(
                holder["state"], feats, labels, mask)
            return metrics["loss"]

        return step

    def make_batch(n):
        B = per_dev_batch * n
        return (
            rng.normal(size=(B, T, input_dim)).astype(np.float32),
            rng.integers(0, num_pdfs, size=(B, T)).astype(np.int32),
            np.ones((B, T), np.float32),
        )

    frames = per_dev_batch * T
    points = measure_scaling(make_step, make_batch, (1, 2, 4, 8), frames,
                             warmup=2, iters=5)
    for p in points:
        print(json.dumps({
            "n_devices": p.num_devices,
            "frames_per_s": round(p.throughput, 0),
            "efficiency_vs_linear": round(p.efficiency, 3),
            "note": "virtual devices share host cores (overhead trend only)",
        }))


if __name__ == "__main__":
    main()
