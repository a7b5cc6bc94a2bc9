"""Flagship minilib evaluation: every headline row in BOTH regimes.

Produces the measured table BASELINE.md cites (r5): clean + noisy
(NOISE_EVAL) WER for CE / chain / ±iVectors, the CE K-vs-WER sweep that
picks the headline operating point, the config-5 full-LM rescoring row
with lattice oracle WER, and a B×K batching probe.

Usage:  python benchmarks/flagship_eval.py [--quick]
Prints one JSON line per measurement (greppable: ^\\{).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, runs=2):
    fn()  # warmup / compile
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return out, best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="single timed run per point")
    args = ap.parse_args()
    runs = 1 if args.quick else 2

    from old_kaldi_git_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    from old_kaldi_git_tpu.recipes import minilib as ml

    workdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "exp", "minilib")
    system = ml.load_system(workdir, build_missing=False)
    NOISE = ml.NOISE_EVAL

    # 1. CE K sweep, both regimes (headline operating-point evidence)
    for K in (2048, 1024, 512):
        (wer, audio_s), wall = timed(
            lambda: ml.decode_and_score(system, max_active=K), runs)
        nwer, _ = ml.decode_and_score(system, max_active=K, noise=NOISE)
        print(json.dumps({
            "row": "ce", "K": K, "clean_wer": round(wer, 3),
            "noisy_wer": round(nwer, 3),
            "audio_s_per_s": round(audio_s / wall, 2)}), flush=True)

    # 2. B x K batching probe (HBM headroom at K=1024 allows B=128)
    for B, K in ((128, 1024), (128, 512)):
        try:
            (wer, audio_s), wall = timed(
                lambda: ml.decode_and_score(system, max_active=K, batch=B),
                runs)
            print(json.dumps({
                "row": "ce_batch", "B": B, "K": K,
                "clean_wer": round(wer, 3),
                "audio_s_per_s": round(audio_s / wall, 2)}), flush=True)
        except Exception as e:  # OOM etc.
            print(json.dumps({"row": "ce_batch", "B": B, "K": K,
                              "error": str(e)[:200]}), flush=True)

    # 3. chain, both regimes
    (werc, audio_s), wall = timed(
        lambda: ml.decode_and_score_chain(workdir), runs)
    nwerc, _ = ml.decode_and_score_chain(workdir, noise=NOISE)
    print(json.dumps({
        "row": "chain", "K": 2048, "clean_wer": round(werc, 3),
        "noisy_wer": round(nwerc, 3),
        "audio_s_per_s": round(audio_s / wall, 2)}), flush=True)

    # 4. iVector systems, both regimes (end-to-end incl. extraction)
    (weri, audio_s), wall = timed(
        lambda: ml.decode_and_score(system, use_ivectors=True), runs)
    nweri, _ = ml.decode_and_score(system, use_ivectors=True, noise=NOISE)
    print(json.dumps({
        "row": "ce_ivec", "clean_wer": round(weri, 3),
        "noisy_wer": round(nweri, 3),
        "audio_s_per_s": round(audio_s / wall, 2)}), flush=True)
    (werci, audio_s), wall = timed(
        lambda: ml.decode_and_score_chain(workdir, use_ivectors=True), runs)
    nwerci, _ = ml.decode_and_score_chain(workdir, use_ivectors=True,
                                          noise=NOISE)
    print(json.dumps({
        "row": "chain_ivec", "clean_wer": round(werci, 3),
        "noisy_wer": round(nwerci, 3),
        "audio_s_per_s": round(audio_s / wall, 2)}), flush=True)

    # 5. config-5: full 4-gram lattice rescoring at the noisy point,
    # all utterances, with lattice oracle WER
    t0 = time.perf_counter()
    before, after = ml.rescore_and_score(
        system, noise=NOISE, full_lm_order=4, compute_oracle=True,
        max_active=1024)
    stats = ml.rescore_and_score.last_stats
    print(json.dumps({
        "row": "rescore_noisy", "before_wer": round(before, 3),
        "after_wer": round(after, 3),
        "oracle_wer": round(stats["oracle_wer"], 3),
        "num_utts": stats["num_utts"],
        "wall_s": round(time.perf_counter() - t0, 1)}), flush=True)
    # clean-regime rescoring row for completeness (no headroom expected)
    before_c, after_c = ml.rescore_and_score(
        system, full_lm_order=4, compute_oracle=True)
    stats = ml.rescore_and_score.last_stats
    print(json.dumps({
        "row": "rescore_clean", "before_wer": round(before_c, 3),
        "after_wer": round(after_c, 3),
        "oracle_wer": round(stats["oracle_wer"], 3)}), flush=True)


if __name__ == "__main__":
    main()
