"""Token-sparse decoder throughput on a synthetic HUGE graph (10M+ states).

Closes the README perf-notes gap ("token-sparse decoder ... not yet
profiled at 10M+ states"): the dense decoder keeps a [B, S] alpha in HBM
and is auto-rejected for big S (decode_batch's 2 GB budget); the
token-sparse regime keeps only [B, K] live tokens + a static [B, E] arc
expansion, so its footprint is independent of S — this script measures
what that costs in throughput on a real chip.

The graph is synthesized directly in CSR form (a 10M-state VectorFst in
Python objects would need tens of GB): uniform out-degree, mostly-local
next states (HMM chain locality) with a 'word-jump' fraction going
anywhere, random weights.  Acoustic scores are random — beam dynamics are
not realistic; arc-expansion bandwidth and sort/dedup cost are, and those
are what bound this kernel.

Usage: python benchmarks/token_sparse_bench.py [--states 10000000] ...
Prints one JSON line per configuration.
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
    """arc_olabels stand-in: every arc is word-free (len-0 tuples) without
    materializing millions of Python tuples."""

    def __init__(self, n: int):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return ()

    def __iter__(self):
        return iter(() for _ in range(self.n))


def synth_graph(S: int, deg: int, P: int, num_tids: int,
                seed: int = 0, local_frac: float = 0.9):
    from old_kaldi_git_tpu.decoder.csr import CsrGraph

    rng = np.random.default_rng(seed)
    A = S * deg
    row_ptr = (np.arange(S + 1, dtype=np.int64) * deg).astype(np.int32)
    src = np.repeat(np.arange(S, dtype=np.int64), deg)
    local = ((src + rng.integers(1, 64, size=A)) % S).astype(np.int32)
    far = rng.integers(0, S, size=A).astype(np.int32)
    nextstate = np.where(rng.random(A) < local_frac, local, far)
    g = CsrGraph(
        start=0,
        row_ptr=row_ptr,
        tid=rng.integers(1, num_tids + 1, size=A).astype(np.int32),
        pdf=rng.integers(0, P, size=A).astype(np.int32),
        weight=rng.exponential(1.0, size=A).astype(np.float32),
        nextstate=nextstate,
        final_weight=np.zeros(S, np.float32),  # all final (throughput bench)
        arc_olabels=_NoOlabels(A),
        final_olabels=_NoOlabels(S),
    )
    g._olabel_mask = np.zeros(A, bool)  # pre-cached: no word-bearing arcs
    return g


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--states", type=int, default=10_000_000)
    ap.add_argument("--degree", type=int, default=6)
    ap.add_argument("--pdfs", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--max-active", type=int, default=7000)
    ap.add_argument("--beam", type=float, default=1e9)  # keep K saturated
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from old_kaldi_git_tpu.decoder.viterbi import (
        ViterbiOptions,
        decode_batch_tokens,
    )

    rng = np.random.default_rng(1)
    print(f"# synthesizing S={args.states} deg={args.degree} "
          f"({args.states * args.degree / 1e6:.0f}M arcs)...", flush=True)
    t0 = time.time()
    g = synth_graph(args.states, args.degree, args.pdfs, num_tids=6000)
    print(f"# graph built in {time.time() - t0:.1f}s "
          f"({(g.num_arcs * 16 + g.num_states * 8) / 1e9:.2f} GB arrays)",
          flush=True)
    loglikes = rng.normal(size=(
        args.batch, args.frames, args.pdfs)).astype(np.float32)
    nf = np.full(args.batch, args.frames, np.int32)
    opts = ViterbiOptions(beam=args.beam, max_active=args.max_active,
                          acoustic_scale=0.1)

    # warmup (compile + H2D of the graph)
    t0 = time.time()
    res = decode_batch_tokens(g, loglikes, nf, opts)
    print(f"# first call (compile+H2D+decode) {time.time() - t0:.1f}s",
          flush=True)
    assert any(r is not None for r in res)
    best = None
    for _ in range(args.iters):
        t0 = time.time()
        res = decode_batch_tokens(g, loglikes, nf, opts)
        dt = time.time() - t0  # includes host backtrace tail (end-to-end)
        best = dt if best is None else min(best, dt)
    audio_s = args.batch * args.frames * 0.01
    print(json.dumps({
        "metric": "token_sparse_decode_throughput",
        "states": args.states, "arcs": g.num_arcs,
        "batch": args.batch, "frames": args.frames,
        "max_active": args.max_active,
        "seconds_per_batch": round(best, 4),
        "value": round(audio_s / best, 1),
        "unit": "audio_sec_per_sec_per_chip",
    }), flush=True)


if __name__ == "__main__":
    main()
