"""Analytic cost model for graph-sharded decode scaling (r4 verdict #6).

Two questions the virtual-mesh walls cannot answer by themselves:

  1. WHY do the virtual N=2/4/8 walls look the way they do?  (The N
     virtual devices are threads on ONE host with `nproc` cores: N ≤
     cores parallelizes the per-shard work for real, N > cores
     oversubscribes it — the wall is a mix of genuine scaling and
     serialization, not an ICI prediction.)
  2. What WOULD the efficiency be on real chips over ICI?  (Each device
     has its own cores; only the wire and the merge-width growth cost
     anything.)

This script fits a 3-parameter model to the measured virtual walls
(validating that the accounting is right) and then predicts real-chip
scaling from the r4 on-chip per-component roofline plus published v5e
ICI parameters, with error bars over the uncertain inputs.

Model (row-partitioned merge, decoder/sharded.py):

  per-device frame time(N) = G/N            (arc-tile+loglike gathers,
                                             scatter/cumsum: ∝ local E)
                           + L(N)           (local select: 2 sorts of
                                             E/N width -> ~E/N · log(E/N))
                           + M(N)           (merge: 2 sorts of [B/N, N·K]
                                             -> ~B·K·log2(N·K) per device)
                           + W(N)           (wire: all_to_all + all_gather
                                             ~2·3BK·(N-1)/N words + hops)

  virtual wall(N) = ceil(N / cores) · [G/N + L(N) + M(N)] · T
                    (wire is a memcpy on one host — folded into M's fit)

Usage:
  python benchmarks/sharded_cost_model.py            # fit + predict
  python benchmarks/sharded_cost_model.py --measure  # re-measure walls first
Prints one JSON line with fit residuals and predictions.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ---------------------------------------------------------------------------
# measured inputs
# ---------------------------------------------------------------------------

# virtual-mesh walls (benchmarks/sharded_scaling_bench.py defaults:
# S=1M/deg4 synthetic graph, B=4, T=100, K=1024), measured r5 on this
# host (4 cores) with the row-partitioned merge; --measure re-runs them.
VIRTUAL_WALLS = {1: 1.202, 2: 1.119, 4: 0.958, 8: 1.678}
VIRTUAL_T = 100
VIRTUAL_K = 1024

# r4 on-chip per-component roofline at B=64 / K=2048 / minilib graph
# (BASELINE.md "Token-sparse kernel roofline", ms/frame).  The gathers,
# scatter and local sorts shrink with the local arc share E/N; the merge
# replaces the single-device dedup+top-K pair at N·K width.
CHIP_MS = {
    "arc_tile_gather": 4.5,   # ∝ E/N
    "loglike_gather": 2.0,    # ∝ E/N
    "scatter_cumsum": 1.1,    # ∝ E/N
    "dedup_sort": 1.1,        # local select, ∝ (E/N)·log
    "topk_sort": 1.3,         # local select, ∝ (E/N)·log
}
CHIP_B, CHIP_K = 64, 2048

# published TPU v5e interconnect numbers (jax-ml.github.io/scaling-book,
# "TPU v5e": 2D torus, ~45 GB/s one-way per link per direction; ~1 us
# per-hop latency is the usual planning number).  These carry the error
# bars below.
ICI_BW_GBPS = 45.0
ICI_HOP_US = 1.0


def virtual_model(N: int, cores: int, G: float, Lm: float, Mm: float,
                  K: int) -> float:
    """Per-frame virtual wall (seconds): oversubscription x per-device work."""
    over = math.ceil(N / cores)
    merge = Mm * (math.log2(N * K) / math.log2(2 * K)) if N > 1 else 0.0
    return over * (G / N + Lm * (1.0 / N) + merge)


def fit_virtual(walls: dict, cores: int, K: int, T: int):
    """Least-squares fit of (G, Lm, Mm) to the measured walls."""
    ns = sorted(walls)
    targets = np.asarray([walls[n] / T for n in ns])

    def resid(params):
        G, Lm, Mm = params
        pred = np.asarray(
            [virtual_model(n, cores, G, Lm, Mm, K) for n in ns])
        return pred - targets

    # coarse grid + Gauss-Newton-free polish (3 params, 4 points)
    best, best_err = None, np.inf
    for G in np.linspace(1e-4, 1.5e-2, 60):
        for Lm in np.linspace(0.0, 8e-3, 40):
            for Mm in np.linspace(0.0, 8e-3, 40):
                r = resid((G, Lm, Mm))
                e = float(r @ r)
                if e < best_err:
                    best, best_err = (G, Lm, Mm), e
    G, Lm, Mm = best
    preds = {n: virtual_model(n, cores, G, Lm, Mm, K) * T for n in ns}
    return best, preds


def chip_prediction(N: int, bw_gbps: float, hop_us: float,
                    merge_scale: float = 1.0) -> float:
    """Predicted per-frame ms on N real chips (minilib shape, B=64,
    K=2048, row-partitioned merge)."""
    e_share = (CHIP_MS["arc_tile_gather"] + CHIP_MS["loglike_gather"]
               + CHIP_MS["scatter_cumsum"]
               + CHIP_MS["dedup_sort"] + CHIP_MS["topk_sort"]) / N
    if N == 1:
        return e_share
    # merge: 2 sorts of [B/N, N*K] ~ the N=1 dedup+topk pair at N*K/(2K)
    # width growth, B/N rows
    merge = ((CHIP_MS["dedup_sort"] + CHIP_MS["topk_sort"])
             * (math.log2(N * CHIP_K) / math.log2(2 * CHIP_K))
             * merge_scale)
    # wire: all_to_all + all_gather, 3 words/candidate, f32
    words = 2 * 3 * CHIP_B * CHIP_K * (N - 1) / N
    wire_ms = words * 4 / (bw_gbps * 1e9) * 1e3
    # hops: ring/torus neighbor distance ~N/2 worst case, 2 collectives
    lat_ms = 2 * (N / 2) * hop_us * 1e-3
    return e_share + merge + wire_ms + lat_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true",
                    help="re-measure the virtual walls (runs the bench)")
    ap.add_argument("--cores", type=int, default=os.cpu_count() or 4)
    args = ap.parse_args()

    walls = dict(VIRTUAL_WALLS)
    if args.measure:
        import subprocess

        out = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__),
                          "sharded_scaling_bench.py")],
            capture_output=True, text=True, check=True).stdout
        walls = {}
        for line in out.splitlines():
            if line.startswith("{"):
                d = json.loads(line)
                walls[d["n_devices"]] = d["wall_s"]

    (G, Lm, Mm), preds = fit_virtual(walls, args.cores, VIRTUAL_K,
                                     VIRTUAL_T)
    resid_pct = {
        n: round(100 * (preds[n] - walls[n]) / walls[n], 1)
        for n in sorted(walls)
    }

    # real-chip prediction with error bars: vary ICI bandwidth and the
    # merge-cost scale +/-50%, hop latency x4
    pred = {}
    for n in (1, 2, 4, 8):
        mid = chip_prediction(n, ICI_BW_GBPS, ICI_HOP_US)
        lo = chip_prediction(n, ICI_BW_GBPS * 1.5, ICI_HOP_US,
                             merge_scale=0.5)
        hi = chip_prediction(n, ICI_BW_GBPS * 0.5, ICI_HOP_US * 4,
                             merge_scale=1.5)
        base = chip_prediction(1, ICI_BW_GBPS, ICI_HOP_US)
        pred[n] = {
            "ms_per_frame": round(mid, 2),
            "efficiency": round(base / (n * mid), 3),
            "efficiency_range": [round(base / (n * hi), 3),
                                 round(base / (n * lo), 3)],
        }

    print(json.dumps({
        "virtual_fit": {
            "gather_ms_per_frame_N1": round(G * 1e3, 3),
            "select_ms_per_frame_N1": round(Lm * 1e3, 3),
            "merge_ms_per_frame_N2": round(Mm * 1e3, 3),
            "walls_measured_s": walls,
            "walls_fitted_s": {n: round(v, 3) for n, v in preds.items()},
            "residual_pct": resid_pct,
            "cores": args.cores,
        },
        "chip_prediction_B64_K2048": pred,
        "two_host_statement": (
            "decode scale-out across hosts is data-parallel over "
            "utterances (each host decodes its shard of the test set; "
            "only WER counters cross hosts) — predicted efficiency "
            "~1.0, trivially above the >=0.8 north star.  GRAPH-sharded "
            "decode (this model) is for graphs exceeding one chip's "
            "HBM: predicted ICI efficiency above, dominated by the "
            "merge-width growth, with the wire <2% of frame time."),
        "ici_params": {"bw_gbps_per_link": ICI_BW_GBPS,
                       "hop_us": ICI_HOP_US,
                       "source": "published v5e numbers (scaling book); "
                                 "no multi-chip hardware here to verify"},
    }))


if __name__ == "__main__":
    main()
