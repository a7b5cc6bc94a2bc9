"""Graph-sharded decode: virtual-mesh scaling table (round-2 verdict #2/#4).

Runs the graph-sharded token-sparse decoder (decoder/sharded.py) over
N = 1/2/4/8 devices on a fixed synthetic HCLG and a fixed utterance
batch, recording per-shard arc storage, per-frame merge wire volume
(row-partitioned merge: all_to_all + all_gather, ~6BK(N-1)/N words per
device), and wall time.

HONESTY NOTE on the wall-clock column: with
XLA_FLAGS=--xla_force_host_platform_device_count=8 the "devices" are
threads on ONE host sharing the same cores, so wall time cannot show
real ICI scaling — it shows the overhead trend (collective + merge cost
added by sharding).  The hardware-independent facts are the per-shard
HBM footprint (what makes multi-GB graphs decodable at all) and the
gather volume per frame (what rides the ICI: [B, 3K] words per device).

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/sharded_scaling_bench.py
Prints one JSON line per N.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _NoOlabels:
    def __init__(self, n: int):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return ()


def synth_graph(S: int, deg: int, P: int, seed: int = 0):
    from old_kaldi_git_tpu.decoder.csr import CsrGraph

    rng = np.random.default_rng(seed)
    A = S * deg
    # mostly-local next states (HMM chain locality) + 10% long jumps
    src = np.repeat(np.arange(S, dtype=np.int64), deg)
    local = (src + rng.integers(1, 64, A)) % S
    far = rng.integers(0, S, A)
    take_far = rng.random(A) < 0.1
    ns = np.where(take_far, far, local).astype(np.int32)
    g = CsrGraph(
        start=0,
        row_ptr=(np.arange(S + 1, dtype=np.int64) * deg).astype(np.int32),
        tid=rng.integers(1, 100, A).astype(np.int32),
        pdf=rng.integers(0, P, A).astype(np.int32),
        weight=rng.exponential(1.0, A).astype(np.float32),
        nextstate=ns,
        final_weight=np.zeros(S, np.float32),
        arc_olabels=_NoOlabels(A),
        final_olabels=_NoOlabels(S),
    )
    g._olabel_mask = np.zeros(A, bool)
    return g


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--states", type=int, default=1_000_000)
    ap.add_argument("--degree", type=int, default=4)
    ap.add_argument("--pdfs", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--max-active", type=int, default=1024)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    # this is a VIRTUAL-mesh bench by design: force the 8-device CPU
    # platform (the axon TPU plugin self-registers and wins over the
    # JAX_PLATFORMS env var — jax.config must be updated after import,
    # same dance as tests/conftest.py)
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh

    from old_kaldi_git_tpu.decoder.sharded import (
        decode_batch_tokens_sharded,
        shard_graph,
    )
    from old_kaldi_git_tpu.decoder.viterbi import ViterbiOptions

    graph = synth_graph(args.states, args.degree, args.pdfs)
    rng = np.random.default_rng(1)
    B, T = args.batch, args.frames
    ll = rng.normal(size=(B, T, args.pdfs)).astype(np.float32)
    nf = [T] * B
    vopts = ViterbiOptions(beam=1e9, max_active=args.max_active,
                           acoustic_scale=1.0)
    devices = jax.devices()
    base_tp = None
    for n in (1, 2, 4, 8):
        if n > len(devices):
            break
        mesh = Mesh(np.asarray(devices[:n]), ("graph",))
        plan = shard_graph(graph, n)
        # warmup (compile)
        res = decode_batch_tokens_sharded(plan, ll, nf, mesh=mesh,
                                          opts=vopts)
        ok = sum(1 for r in res if r is not None)
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            decode_batch_tokens_sharded(plan, ll, nf, mesh=mesh,
                                        opts=vopts)
            best = min(best, time.perf_counter() - t0)
        tp = B * T / best  # frames of batch work per second
        if base_tp is None:
            base_tp = tp
        K = vopts.max_active
        print(json.dumps({
            "n_devices": n,
            "tiles_per_shard": int(plan.tiles_per_shard),
            "shard_tile_mb": round(
                plan.tiles_per_shard * plan.md * 12 / 1e6, 1),
            "merge_wire_words_per_frame_per_dev": int(2 * 3 * B * K * (n - 1) / max(n, 1)),
            "wall_s": round(best, 3),
            "rel_throughput": round(tp / base_tp, 3),
            "decoded": f"{ok}/{B}",
            "note": "virtual devices share host cores; see module docstring",
        }))


if __name__ == "__main__":
    main()
