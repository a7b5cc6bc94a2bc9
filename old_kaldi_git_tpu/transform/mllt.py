"""MLLT / global semi-tied covariance estimation.

Parity with reference src/transform/mllt.h (MlltAccs): accumulate per-
dimension weighted scatter matrices G_i from Gaussian-level posteriors,
update the square transform row-by-row via the cofactor formula, iterate.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from old_kaldi_git_tpu.gmm.diag_gmm import AmDiagGmm
from old_kaldi_git_tpu.utils.log import get_logger

log = get_logger("mllt")


class MlltAccs:
    def __init__(self, dim: int):
        self.G = np.zeros((dim, dim, dim))  # per output dim i: [D, D]
        self.beta = 0.0

    def accumulate(
        self, am: AmDiagGmm, feats: np.ndarray, pdf_ids: np.ndarray, weights=None
    ) -> None:
        """Gaussian-level posteriors within each aligned pdf (reference
        AccumulateFromPosteriors)."""
        x = np.asarray(feats, np.float64)
        pdf_ids = np.asarray(pdf_ids)
        w = np.ones(len(x)) if weights is None else np.asarray(weights, np.float64)
        dim = x.shape[1]
        for pdf in np.unique(pdf_ids):
            sel = pdf_ids == pdf
            xs = x[sel]
            ws = w[sel]
            gmm = am.pdfs[pdf]
            post = gmm.posteriors(xs) * ws[:, None]  # [t, m]
            for m in range(gmm.num_mix):
                gamma = post[:, m]
                tot = gamma.sum()
                if tot < 1e-8:
                    continue
                diff = xs - gmm.means[m]  # [t, D]
                inv_var = 1.0 / gmm.vars[m]
                # G_i += (1/σ²_i) Σ_t γ_t diff_t diff_tᵀ
                scatter = (diff * gamma[:, None]).T @ diff  # [D, D]
                self.G += inv_var[:, None, None] * scatter[None, :, :]
                self.beta += tot

    def add(self, other: "MlltAccs") -> None:
        self.G += other.G
        self.beta += other.beta


def update_mllt(accs: MlltAccs, num_iters: int = 10) -> Tuple[np.ndarray, float]:
    """Row-wise cofactor update (reference MlltAccs::Update).
    Returns (M [D, D], objf improvement per frame)."""
    dim = accs.G.shape[0]
    m = np.eye(dim)
    g_inv = np.stack([np.linalg.inv(accs.G[i] + 1e-6 * np.eye(dim)) for i in range(dim)])

    def objf(mat):
        sign, logdet = np.linalg.slogdet(mat)
        quad = sum(mat[i] @ accs.G[i] @ mat[i] for i in range(dim))
        return accs.beta * logdet - 0.5 * quad

    start = objf(m)
    for _ in range(num_iters):
        for i in range(dim):
            # cofactor row i of current m: det(m) * (m^{-T})_i
            inv_t = np.linalg.inv(m).T
            cof = np.linalg.det(m) * inv_t[i]
            quad = cof @ g_inv[i] @ cof
            scale = np.sqrt(accs.beta / max(quad, 1e-20))
            m[i] = scale * (g_inv[i] @ cof)
    impr = (objf(m) - start) / max(accs.beta, 1.0)
    log.info("MLLT: objf improvement %.4f per frame over %d frames", impr, int(accs.beta))
    return m, impr


def transform_gmm_means(am: AmDiagGmm, m: np.ndarray) -> None:
    """After an MLLT update, means are transformed: μ ← M μ (reference
    gmm-transform-means).  In place."""
    for pdf in am.pdfs:
        pdf.means = pdf.means @ m.T
    am.invalidate()
