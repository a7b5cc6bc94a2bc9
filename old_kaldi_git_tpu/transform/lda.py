"""Linear Discriminant Analysis estimation.

Parity with reference src/transform/lda-estimate.h (LdaEstimate): class =
pdf-id, accumulate per-class counts/means + global second moment, solve the
generalized eigenproblem, output the [target_dim, full_dim] transform that
whitens the within-class covariance (Kaldi convention, so downstream GMMs
see unit within-class variance).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from old_kaldi_git_tpu.utils.log import KaldiError, get_logger

log = get_logger("lda")


class LdaEstimate:
    def __init__(self, num_classes: int, dim: int):
        self.counts = np.zeros(num_classes)
        self.first = np.zeros((num_classes, dim))  # per-class Σx
        self.second = np.zeros((dim, dim))  # global Σ x xᵀ

    def accumulate(self, feats: np.ndarray, classes: np.ndarray, weights=None) -> None:
        x = np.asarray(feats, np.float64)
        c = np.asarray(classes)
        w = np.ones(len(x)) if weights is None else np.asarray(weights, np.float64)
        np.add.at(self.counts, c, w)
        np.add.at(self.first, c, x * w[:, None])
        self.second += (x * w[:, None]).T @ x

    def add(self, other: "LdaEstimate") -> None:
        self.counts += other.counts
        self.first += other.first
        self.second += other.second

    def estimate(
        self, target_dim: int, within_class_factor: float = 1.0
    ) -> np.ndarray:
        """Returns [target_dim, dim] transform (rows = discriminant dirs,
        scaled so the projected within-class covariance is identity)."""
        tot = self.counts.sum()
        if tot <= 0:
            raise KaldiError("LDA: no stats")
        dim = self.first.shape[1]
        mean = self.first.sum(axis=0) / tot
        total_cov = self.second / tot - np.outer(mean, mean)
        nz = self.counts > 0
        class_means = np.zeros_like(self.first)
        class_means[nz] = self.first[nz] / self.counts[nz, None]
        bc = (
            (self.counts[nz, None] * (class_means[nz] - mean)).T
            @ (class_means[nz] - mean)
        ) / tot
        wc = total_cov - bc
        # symmetrize + regularize
        wc = 0.5 * (wc + wc.T) + 1e-6 * np.eye(dim) * max(np.trace(wc) / dim, 1e-10)
        # W^{-1/2}
        evals, evecs = np.linalg.eigh(wc)
        evals = np.maximum(evals, 1e-10)
        w_inv_sqrt = evecs @ np.diag(evals**-0.5) @ evecs.T
        m = w_inv_sqrt @ (0.5 * (bc + bc.T)) @ w_inv_sqrt
        bevals, bevecs = np.linalg.eigh(0.5 * (m + m.T))
        order = np.argsort(bevals)[::-1][:target_dim]
        log.info(
            "LDA: kept %d dims, between-class eigs %s...",
            target_dim, np.round(bevals[order[: min(5, target_dim)]], 2),
        )
        a = (bevecs[:, order].T @ w_inv_sqrt) * within_class_factor
        return a.astype(np.float64)


def estimate_lda(
    feats_and_classes, num_classes: int, dim: int, target_dim: int
) -> np.ndarray:
    """Convenience: iterate (feats [T,D], classes [T]) pairs → transform."""
    acc = LdaEstimate(num_classes, dim)
    for feats, classes in feats_and_classes:
        acc.accumulate(feats, classes)
    return acc.estimate(target_dim)
