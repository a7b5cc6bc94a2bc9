"""PLDA backend for speaker verification.

Reference parity (SURVEY.md §2.7): src/ivector/plda.{h,cc} — the
two-covariance PLDA model (Ioffe 2006, as in Kaldi):

  x = μ + y + ε,  y ~ N(0, Φ_b) per class,  ε ~ N(0, Φ_w) per example.

* PldaEstimator: EM over per-class sufficient stats (class means/counts +
  within-class scatter), as plda.cc's two-cov EM.
* After training the model is stored DIAGONALIZED like the reference: a
  transform A with A Φ_w Aᵀ = I and A Φ_b Aᵀ = diag(ψ); scoring then works
  per-dimension.
* transform_ivector: A(x − μ) with the reference's length normalization
  (scale to sqrt(dim) / ||·|| in the transformed space).
* log_likelihood_ratio(enroll_mean, n, test): Kaldi's LogLikelihoodRatio —
  same-class predictive N(nψ/(nψ+1)·ū, I + ψ/(nψ+1)) vs different-class
  N(0, I + ψ), summed per dim.

Matrices are ivector-dim (≲600): host numpy eigensolves, per SURVEY §7.3.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import numpy as np

from old_kaldi_git_tpu.utils.log import KaldiError, get_logger

log = get_logger("plda")


@dataclasses.dataclass
class Plda:
    mean: np.ndarray  # [D]
    transform: np.ndarray  # [D, D]  (A: simultaneously diagonalizing)
    psi: np.ndarray  # [D] between-class variance in transformed space

    @property
    def dim(self) -> int:
        return self.mean.shape[0]

    def transform_ivector(
        self, ivec: np.ndarray, normalize_length: bool = True
    ) -> np.ndarray:
        """A(x − μ), then scale so E[||u||²] matches its model value
        (reference Plda::TransformIvector)."""
        u = self.transform @ (np.asarray(ivec, np.float64) - self.mean)
        if normalize_length:
            # expected squared norm under the model = sum(1 + psi)
            exp_sq = float(np.sum(1.0 + self.psi))
            u = u * np.sqrt(exp_sq / max(float(u @ u), 1e-20))
        return u

    def log_likelihood_ratio(
        self, transformed_enroll: np.ndarray, n: int, transformed_test: np.ndarray
    ) -> float:
        """Reference Plda::LogLikelihoodRatio (per-dim, diagonalized)."""
        psi = self.psi
        u_e = np.asarray(transformed_enroll, np.float64)
        u_t = np.asarray(transformed_test, np.float64)
        # same-speaker hypothesis
        m_same = (n * psi / (n * psi + 1.0)) * u_e
        v_same = 1.0 + psi / (n * psi + 1.0)
        # different-speaker hypothesis
        v_diff = 1.0 + psi
        ll_same = -0.5 * np.sum(
            np.log(2 * np.pi * v_same) + (u_t - m_same) ** 2 / v_same
        )
        ll_diff = -0.5 * np.sum(
            np.log(2 * np.pi * v_diff) + u_t ** 2 / v_diff
        )
        return float(ll_same - ll_diff)

    # -- serialization (plda.cc Write/Read framing) --------------------------
    def save(self, path: str) -> None:
        from old_kaldi_git_tpu.utils import io_funcs as iof

        with open(path, "wb") as f:
            iof.init_kaldi_output_stream(f, True)
            iof.write_token(f, "<Plda>")
            iof.write_vector(f, self.mean, dtype=np.float64)
            iof.write_matrix(f, self.transform, dtype=np.float64)
            iof.write_vector(f, self.psi, dtype=np.float64)
            iof.write_token(f, "</Plda>")

    @staticmethod
    def load(path: str) -> "Plda":
        from old_kaldi_git_tpu.utils import io_funcs as iof

        with open(path, "rb") as f:
            if not iof.init_kaldi_input_stream(f):
                raise KaldiError("Plda.load: expected binary stream")
            iof.expect_token(f, "<Plda>")
            mean = np.asarray(iof.read_vector(f), np.float64)
            transform = np.asarray(iof.read_matrix(f), np.float64)
            psi = np.asarray(iof.read_vector(f), np.float64)
            iof.expect_token(f, "</Plda>")
            return Plda(mean=mean, transform=transform, psi=psi)


def _simultaneous_diag(
    within: np.ndarray, between: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """A with A W Aᵀ = I and A B Aᵀ = diag(ψ) (reference ComputeDerivedVars:
    Cholesky-whiten W then rotate to diagonalize the whitened B)."""
    w_vals, w_vecs = np.linalg.eigh(within)
    w_vals = np.maximum(w_vals, 1e-10)
    whiten = (w_vecs * (1.0 / np.sqrt(w_vals))).T  # [D, D]
    b_w = whiten @ between @ whiten.T
    b_vals, b_vecs = np.linalg.eigh(b_w)
    order = np.argsort(b_vals)[::-1]
    a = b_vecs[:, order].T @ whiten
    psi = np.maximum(b_vals[order], 0.0)
    return a, psi


@dataclasses.dataclass
class PldaStats:
    """Per-class sufficient statistics (reference PldaStats.AddSamples)."""

    dim: int
    class_sums: List[np.ndarray] = dataclasses.field(default_factory=list)
    class_counts: List[int] = dataclasses.field(default_factory=list)
    within_scatter: np.ndarray = None
    num_examples: int = 0

    def add_samples(self, examples: np.ndarray) -> None:
        """examples: [n, D] ivectors of one class (speaker)."""
        x = np.asarray(examples, np.float64)
        if self.within_scatter is None:
            self.within_scatter = np.zeros((self.dim, self.dim))
        m = x.mean(axis=0)
        xc = x - m
        self.within_scatter += xc.T @ xc
        self.class_sums.append(x.sum(axis=0))
        self.class_counts.append(x.shape[0])
        self.num_examples += x.shape[0]


def estimate_plda(
    stats: PldaStats, num_em_iters: int = 10
) -> Plda:
    """Two-covariance EM (reference PldaEstimator::Estimate)."""
    if not stats.class_counts:
        raise KaldiError("estimate_plda: no classes")
    D = stats.dim
    counts = np.asarray(stats.class_counts, np.float64)  # [K]
    sums = np.stack(stats.class_sums)  # [K, D]
    N = float(stats.num_examples)
    K = len(stats.class_counts)
    mu = sums.sum(axis=0) / N
    means = sums / counts[:, None]  # [K, D]

    # init: within from pooled within-class scatter; between from class means
    phi_w = stats.within_scatter / max(N - K, 1.0)
    mc = means - mu
    phi_b = (mc.T * counts) @ mc / K
    phi_w += 1e-6 * np.eye(D)
    phi_b += 1e-6 * np.eye(D)

    for it in range(num_em_iters):
        inv_w = np.linalg.inv(phi_w)
        inv_b = np.linalg.inv(phi_b)
        y_acc = np.zeros((D, D))
        w_acc = stats.within_scatter.copy()  # Σ (x−m_k)(x−m_k)ᵀ is constant
        for k in range(K):
            n_k = counts[k]
            lam = inv_b + n_k * inv_w  # posterior precision of y_k
            cov = np.linalg.inv(lam)
            w_k = cov @ (inv_b @ mu + inv_w @ (n_k * means[k]))
            d = w_k - mu
            y_acc += cov + np.outer(d, d)
            # within: E[(m_k − y_k)(m_k − y_k)ᵀ] contributes n_k·(cov + dd̄ᵀ)
            dm = means[k] - w_k
            w_acc += n_k * (cov + np.outer(dm, dm))
        phi_b = y_acc / K + 1e-8 * np.eye(D)
        phi_w = w_acc / N + 1e-8 * np.eye(D)
        log.info("plda EM iter %d: tr(W)=%.4f tr(B)=%.4f", it,
                 np.trace(phi_w), np.trace(phi_b))

    a, psi = _simultaneous_diag(phi_w, phi_b)
    return Plda(mean=mu, transform=a, psi=psi)
