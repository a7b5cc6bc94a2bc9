"""Microbenchmark: GMM alignment — host-backtrace vs fused on-device.

BASELINE.md's r5 GMM stage table shows alignment dominating every GMM
training stage (mono: 769 s of 1,281 s).  The r5 align path D2H'd the
full [T, B, S] winner-arc tensor per corpus chunk and walked it on the
host; over the tunneled device link (~7 MB/s measured historically for
bulk D2H) the TRANSFER, not the scan, is the candidate bottleneck.

This bench times both paths at flagship-align shape (per-utterance
linear training graphs, bucketed T) so BASELINE can record the effect of
fusing the backtrace on device (_align_and_backtrace: only [T, B] tids +
[B] scores cross the link).

Usage: python benchmarks/align_bench.py
Env: AB_B (batch, default 96), AB_T (frames, 256), AB_S (states, 256),
     AB_P (pdfs, 2000), AB_ITERS (3)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from old_kaldi_git_tpu.decoder.csr import CsrGraph
from old_kaldi_git_tpu.decoder.viterbi import (
    BIG,
    ViterbiOptions,
    _align_scan,
    _pad_graphs,
    align_batch,
)

B = int(os.environ.get("AB_B", 96))
T = int(os.environ.get("AB_T", 256))
S_TARGET = int(os.environ.get("AB_S", 256))
P = int(os.environ.get("AB_P", 2000))
ITERS = int(os.environ.get("AB_ITERS", 3))


def make_graphs(rng):
    """Per-utterance training-graph shape: a linear chain of 3-state HMMs
    with self-loops (2 arcs/state), like compile_graph_from_text output."""
    graphs = []
    for _ in range(B):
        # keep S comfortably under the utterance frame count so every
        # utterance is alignable (a length-S chain needs >= S frames;
        # num_frames is drawn in [0.75, 1.0]*T below)
        S = int(S_TARGET * (0.3 + 0.4 * rng.random()))
        row_ptr = [0]
        tid, pdf, w, ns = [], [], [], []
        for s in range(S):
            tid.append(int(rng.integers(1, 4000)))
            pdf.append(int(rng.integers(0, P)))
            w.append(float(rng.random() * 0.5))
            ns.append(s)  # self loop
            deg = 1
            if s + 1 < S:
                tid.append(int(rng.integers(1, 4000)))
                pdf.append(int(rng.integers(0, P)))
                w.append(float(rng.random() * 0.5))
                ns.append(s + 1)
                deg = 2
            row_ptr.append(row_ptr[-1] + deg)
        final = np.full(S, np.inf, np.float32)
        final[S - 1] = 0.0
        graphs.append(CsrGraph(
            start=0, row_ptr=np.asarray(row_ptr, np.int32),
            tid=np.asarray(tid, np.int32), pdf=np.asarray(pdf, np.int32),
            weight=np.asarray(w, np.float32),
            nextstate=np.asarray(ns, np.int32), final_weight=final,
            arc_olabels=[(0,)] * len(tid), final_olabels=[()] * S))
    return graphs


def old_align_batch(graphs, loglikes, num_frames, opts):
    """The pre-r5-fuse path: D2H the [T, B, S] winner arcs, walk on host."""
    frm, tid, pdf, w, ns, start, final, S, A = _pad_graphs(graphs)
    num_frames = np.asarray(num_frames, np.int32)
    alpha_final, best_arcs = _align_scan(
        jnp.asarray(frm), jnp.asarray(pdf), jnp.asarray(w), jnp.asarray(ns),
        jnp.asarray(start), jnp.asarray(loglikes, jnp.float32),
        jnp.asarray(num_frames), float(opts.acoustic_scale), S)
    alpha_final = np.asarray(alpha_final)
    best_arcs = np.asarray(best_arcs)  # [T, B, S] -- THE transfer
    alignments, scores = [], []
    for b, g in enumerate(graphs):
        tot = alpha_final[b, : g.num_states] + final[b, : g.num_states]
        s = int(np.argmin(tot))
        score = float(tot[s])
        if score >= BIG:
            alignments.append(None)
            scores.append(np.inf)
            continue
        tids = []
        state = s
        for t in range(int(num_frames[b]) - 1, -1, -1):
            arc = int(best_arcs[t, b, state])
            if arc < 0:
                tids = None
                break
            tids.append(int(tid[b, arc]))
            state = int(frm[b, arc])
        if tids is None:
            alignments.append(None)
            scores.append(np.inf)
        else:
            alignments.append(np.asarray(tids[::-1], np.int32))
            scores.append(score)
    return alignments, scores


def main():
    rng = np.random.default_rng(0)
    graphs = make_graphs(rng)
    loglikes = rng.normal(size=(B, T, P)).astype(np.float32) * 2.0
    nf = np.asarray(
        [int(T * (0.75 + 0.25 * rng.random())) for _ in range(B)], np.int32)
    opts = ViterbiOptions(acoustic_scale=1.0)
    frm, _, _, _, _, _, _, S, A = _pad_graphs(graphs)
    print(f"# B={B} T={T} S(pad)={S} A(pad)={A} P={P} "
          f"bp_tensor={T * B * S * 4 / 1e6:.1f} MB")

    # device-resident loglikes, as align_all now hands them to the
    # aligner (the AM computes them on device); the old align_all did
    # np.asarray(ll) first — a [B,T,P] D2H — then align_batch re-uploaded
    ll_dev = jnp.asarray(loglikes)
    ll_dev.block_until_ready()

    def old_roundtrip(graphs, _ll, nf, opts):
        return old_align_batch(graphs, np.asarray(ll_dev), nf, opts)

    def new_fused(graphs, _ll, nf, opts):
        return align_batch(graphs, ll_dev, nf, opts)

    for name, fn in (
            ("old (ll D2H + host backtrace [T,B,S] D2H)", old_roundtrip),
            ("new (ll on device, fused backtrace)", new_fused)):
        fn(graphs, loglikes, nf, opts)  # warmup/compile
        best = float("inf")
        for _ in range(ITERS):
            t0 = time.perf_counter()
            alis, scores = fn(graphs, loglikes, nf, opts)
            best = min(best, time.perf_counter() - t0)
        ok = sum(1 for a in alis if a is not None)
        audio_s = float(nf.sum()) * 0.01
        print(f"{name:44s} {best:7.3f} s  ({audio_s / best:8.1f} audio-s/s, "
              f"{ok}/{B} aligned)")

    # equivalence spot check
    a_old, s_old = old_align_batch(graphs, loglikes, nf, opts)
    a_new, s_new = align_batch(graphs, loglikes, nf, opts)
    for b in range(B):
        assert (a_old[b] is None) == (a_new[b] is None)
        if a_old[b] is not None:
            assert np.array_equal(a_old[b], a_new[b]), b
            assert abs(s_old[b] - s_new[b]) < 1e-3 * max(1, abs(s_old[b]))
    print("equivalence: old == new on all utterances")


if __name__ == "__main__":
    main()
