"""fMLLR (CMLLR) speaker-adaptive affine feature transforms.

Parity with reference src/transform/fmllr-diag-gmm.{h,cc}
(FmllrDiagGmmAccs, ComputeFmllrMatrixDiagGmmFull): accumulate K and per-row
G_i statistics from Gaussian posteriors, then the iterative row update with
cofactors, solving the per-row quadratic for the log-det step size.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from old_kaldi_git_tpu.gmm.diag_gmm import AmDiagGmm
from old_kaldi_git_tpu.utils.log import get_logger

log = get_logger("fmllr")


class FmllrAccs:
    """Per-speaker sufficient statistics for a [D, D+1] transform."""

    def __init__(self, dim: int):
        self.K = np.zeros((dim, dim + 1))
        self.G = np.zeros((dim, dim + 1, dim + 1))
        self.beta = 0.0

    def accumulate(
        self, am: AmDiagGmm, feats: np.ndarray, pdf_ids: np.ndarray, weights=None
    ) -> None:
        x = np.asarray(feats, np.float64)
        pdf_ids = np.asarray(pdf_ids)
        w = np.ones(len(x)) if weights is None else np.asarray(weights, np.float64)
        xp = np.concatenate([x, np.ones((len(x), 1))], axis=1)  # [t, D+1]
        for pdf in np.unique(pdf_ids):
            sel = pdf_ids == pdf
            xs, xps, ws = x[sel], xp[sel], w[sel]
            gmm = am.pdfs[pdf]
            post = gmm.posteriors(xs) * ws[:, None]
            for m in range(gmm.num_mix):
                gamma = post[:, m]
                tot = gamma.sum()
                if tot < 1e-8:
                    continue
                inv_var = 1.0 / gmm.vars[m]  # [D]
                mu = gmm.means[m]
                # K += Σ γ (Σ^{-1} μ) x⁺ᵀ
                gx = (xps * gamma[:, None]).sum(axis=0)  # Σ γ x⁺
                self.K += np.outer(inv_var * mu, gx)
                # G_i += (1/σ²_i) Σ γ x⁺ x⁺ᵀ
                scatter = (xps * gamma[:, None]).T @ xps
                self.G += inv_var[:, None, None] * scatter[None, :, :]
                self.beta += tot

    def accumulate_gpost(self, am: AmDiagGmm, feats: np.ndarray, gpost) -> None:
        """Accumulate from Gaussian-level posteriors
        (reference FmllrDiagGmmAccs::AccumulateFromPosteriors via
        gmm-est-fmllr-gpost): identical statistics to `accumulate`, but the
        per-Gaussian responsibilities come from the caller instead of being
        recomputed from the model — the two paths must agree exactly when
        the gpost was produced from the same model/features."""
        x = np.asarray(feats, np.float64)
        xp = np.concatenate([x, np.ones((len(x), 1))], axis=1)
        for t, frame in enumerate(gpost):
            for pdf, gamma in frame:
                gmm = am.pdfs[pdf]
                gamma = np.asarray(gamma, np.float64)
                tot = gamma.sum()
                if tot < 1e-8:
                    continue
                inv_var = 1.0 / gmm.vars  # [M, D]
                # K += Σ_m γ_m (Σ_m^{-1} μ_m) x⁺ᵀ
                self.K += np.outer(
                    (gamma[:, None] * inv_var * gmm.means).sum(axis=0), xp[t])
                # G_i += (Σ_m γ_m / σ²_{m,i}) x⁺ x⁺ᵀ
                scatter = np.outer(xp[t], xp[t])
                self.G += (gamma[:, None] * inv_var).sum(axis=0)[
                    :, None, None] * scatter[None, :, :]
                self.beta += tot

    def add(self, other: "FmllrAccs") -> None:
        self.K += other.K
        self.G += other.G
        self.beta += other.beta


def compute_fmllr_transform(
    accs: FmllrAccs, num_iters: int = 20, min_count: float = 500.0
) -> Optional[np.ndarray]:
    """Returns W [D, D+1] or None if insufficient data
    (reference ComputeFmllrMatrixDiagGmmFull)."""
    dim = accs.K.shape[0]
    if accs.beta < min_count:
        log.info("fmllr: count %.1f < min %.1f, skipping", accs.beta, min_count)
        return None
    w = np.concatenate([np.eye(dim), np.zeros((dim, 1))], axis=1)
    g_inv = np.stack(
        [np.linalg.inv(accs.G[i] + 1e-5 * np.eye(dim + 1)) for i in range(dim)]
    )

    def objf(mat):
        a = mat[:, :dim]
        sign, logdet = np.linalg.slogdet(a)
        lin = np.sum(mat * accs.K)
        quad = sum(mat[i] @ accs.G[i] @ mat[i] for i in range(dim))
        return accs.beta * logdet + lin - 0.5 * quad

    start = objf(w)
    for _ in range(num_iters):
        for i in range(dim):
            a = w[:, :dim]
            inv_t = np.linalg.inv(a).T
            cof = np.linalg.det(a) * inv_t[i]  # cofactor row of square part
            c_ext = np.concatenate([cof, [0.0]])
            gi = g_inv[i]
            p = c_ext @ gi @ c_ext
            q = c_ext @ gi @ accs.K[i]
            # maximize β log|α p + q·?| ... solve α² p + α q − β = 0 for α
            disc = q * q + 4.0 * p * accs.beta
            alpha = (-q + np.sqrt(max(disc, 0.0))) / (2.0 * max(p, 1e-20))
            w[i] = gi @ (alpha * c_ext + accs.K[i])
    impr = (objf(w) - start) / accs.beta
    log.info(
        "fmllr: objf improvement %.4f per frame over %d frames",
        impr, int(accs.beta),
    )
    return w


def apply_affine_transform(feats: np.ndarray, w: np.ndarray) -> np.ndarray:
    """[T, D] @ W ([D, D+1]): y = A x + b."""
    a = w[:, :-1]
    b = w[:, -1]
    return (np.asarray(feats) @ a.T + b).astype(np.float32)
