"""Sparse chain-denominator throughput at TRAINING shape (real chip).

Round-2 verdict ask #5: the arc-list denominator (chain/loss.py
_denominator_sparse — the O(arcs)/frame recursion of the reference's
chain-denominator.cu) was proven correct at S=30k/A=330k but only at
B=2/T=6; a real LF-MMI minibatch is B≈32, T≈50 after frame subsampling
(reference 140-150-frame chunks / 3).  This measures value+grad seconds
per step at that shape so BASELINE.md can carry a real number.

The graph is the _random_den synthetic (self-loop per state + random
forward arcs, destination-pdf convention) at the minilib biphone scale:
S=30k states, ~330k arcs, P=2000 pdfs.

Usage: python benchmarks/chain_denominator_bench.py [--batch 32] ...
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


def random_den(S, extra_arcs, P, seed=0):
    from old_kaldi_git_tpu.chain.den_graph import DenominatorGraph

    rng = np.random.default_rng(seed)
    state_pdf = rng.integers(0, P, size=S).astype(np.int32)
    frm = np.concatenate([
        np.arange(S, dtype=np.int32),
        rng.integers(0, S, size=extra_arcs).astype(np.int32),
    ])
    to = np.concatenate([
        np.arange(S, dtype=np.int32),
        rng.integers(0, S, size=extra_arcs).astype(np.int32),
    ])
    pdf = state_pdf[to]
    log_prob = np.log(
        rng.uniform(0.2, 0.8, size=frm.shape[0])).astype(np.float32)
    init = rng.uniform(size=S)
    init /= init.sum()
    return DenominatorGraph(
        num_states=S, from_state=frm, to_state=to, pdf=pdf,
        log_prob=log_prob,
        initial_log_probs=np.log(init).astype(np.float32),
        final_log_probs=np.zeros(S, np.float32),
        num_pdfs=P,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--states", type=int, default=30_000)
    ap.add_argument("--extra-arcs", type=int, default=300_000)
    ap.add_argument("--pdfs", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--leaky", type=float, default=0.1)
    ap.add_argument("--runs", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from old_kaldi_git_tpu.chain.loss import denominator_logprob

    den = random_den(args.states, args.extra_arcs, args.pdfs)
    rng = np.random.default_rng(1)
    B, T, P = args.batch, args.frames, args.pdfs
    logits = jnp.asarray(rng.normal(size=(B, T, P)).astype(np.float32))
    nf = jnp.asarray(np.full(B, T, np.int32))

    @jax.jit
    def step(l):
        def loss(l):
            return jnp.sum(denominator_logprob(l, nf, den, args.leaky))

        return jax.value_and_grad(loss)(l)

    t0 = time.perf_counter()
    val, grad = step(logits)
    jax.block_until_ready(grad)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(args.runs):
        t0 = time.perf_counter()
        _v, g = step(logits)
        jax.block_until_ready(g)
        best = min(best, time.perf_counter() - t0)
    arcs = args.states + args.extra_arcs
    print(json.dumps({
        "metric": "sparse chain denominator value+grad s/step "
                  f"(S={args.states}, A={arcs}, P={P}, B={B}, T={T}, "
                  f"backend={jax.default_backend()})",
        "value": round(best, 4),
        "unit": "s_per_step",
        "compile_s": round(compile_s, 1),
        "arc_evals_per_s": round(arcs * T * B * 2 / best / 1e9, 2),
        "arc_evals_unit": "G arc-evals/s (fwd+bwd)",
        "objf_per_frame": round(float(val) / (B * T), 4),
    }))


if __name__ == "__main__":
    main()
