"""On-chip N=1 overhead of the graph-sharded decoder (r3 verdict #5:
the sharding tax at N=1 was 2.2x; target <= 1.3x).

Runs one minilib B=64 chunk through viterbi.decode_batch_tokens and
through decoder.sharded.decode_batch_tokens_sharded on a 1-device mesh
(same K/beam), comparing wall time and verifying identical best paths.

Usage: python benchmarks/sharded_onchip_bench.py [--max-active 2048]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-active", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    from old_kaldi_git_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    from jax.sharding import Mesh

    from old_kaldi_git_tpu.decoder.sharded import (
        decode_batch_tokens_sharded,
        shard_graph,
    )
    from old_kaldi_git_tpu.decoder.viterbi import (
        ViterbiOptions,
        decode_batch_tokens,
    )
    from old_kaldi_git_tpu.recipes import minilib as ml
    from old_kaldi_git_tpu.utils.batching import pad_feature_batch

    wd = os.path.join(REPO, "exp", "minilib")
    system = ml.load_system(wd, build_missing=False)
    feats = ml.compute_feats(system.test_waves)
    by_dur = sorted(feats, key=lambda k: feats[k].shape[0])
    chunk = by_dur[: args.batch]
    keys, padded, nf = pad_feature_batch({k: feats[k] for k in chunk})
    T = padded.shape[1]
    Tb = -(-T // 128) * 128
    padded = np.pad(padded, ((0, 0), (0, Tb - T), (0, 0)))
    ll = system.am.loglikes_batch(padded)
    ll = np.asarray(ll)  # fixed input for both paths
    vopts = ViterbiOptions(beam=14.0, max_active=args.max_active,
                           acoustic_scale=1.0)

    res_u = decode_batch_tokens(system.csr, ll, nf, vopts)  # warmup
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        res_u = decode_batch_tokens(system.csr, ll, nf, vopts)
        best = min(best, time.perf_counter() - t0)
    t_unsharded = best

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("graph",))
    plan = shard_graph(system.csr, 1)
    res_s = decode_batch_tokens_sharded(plan, ll, nf, mesh=mesh,
                                        opts=vopts)  # warmup
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        res_s = decode_batch_tokens_sharded(plan, ll, nf, mesh=mesh,
                                            opts=vopts)
        best = min(best, time.perf_counter() - t0)
    t_sharded = best

    agree = sum(
        1 for a, b in zip(res_u, res_s)
        if (a is None) == (b is None) and (a is None or a.words == b.words))
    print(json.dumps({
        "unsharded_s": round(t_unsharded, 2),
        "sharded_n1_s": round(t_sharded, 2),
        "n1_overhead": round(t_sharded / t_unsharded, 2),
        "paths_agree": f"{agree}/{len(res_u)}",
        "batch": args.batch,
        "max_active": args.max_active,
    }))


if __name__ == "__main__":
    main()
