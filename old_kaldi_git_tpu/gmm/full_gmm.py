"""Full-covariance GMMs (the i-vector UBM model family).

Parity with reference src/gmm/{full-gmm.h,full-gmm.cc,mle-full-gmm.{h,cc}}:
FullGmm stores the natural parameters the reference caches — gconsts_,
means_invcovars_ [M, D] and inv_covars_ [M, D, D] — so a loglike is an
affine + quadratic form per component.  Batched evaluation for all frames ×
all components is two einsum contractions (MXU matmuls); the per-component
EM update (mle-full-gmm.cc: MleFullGmmUpdate) runs host-side in numpy since
it is tiny (C × D × D solves once per iteration).

Gaussian preselection (reference gmm-gselect / fgmm-gselect +
diag-gmm.h LogLikelihoodsPreselect) lives here too: top-N component indices
per frame from a (usually diagonal) selector GMM, used to sparsify the
full-cov E-step exactly like fgmm-global-acc-stats-gselect.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from old_kaldi_git_tpu.gmm.diag_gmm import DiagGmm, M_LOG_2PI
from old_kaldi_git_tpu.utils import io_funcs as iof
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger

log = get_logger("fgmm")


class FullGmm:
    """One mixture of full-covariance Gaussians."""

    def __init__(self, weights: np.ndarray, means: np.ndarray,
                 covars: np.ndarray):
        self.weights = np.asarray(weights, np.float64)  # [M]
        self.means = np.asarray(means, np.float64)  # [M, D]
        self.covars = np.asarray(covars, np.float64)  # [M, D, D]
        if (self.weights.ndim != 1 or self.means.ndim != 2
                or self.covars.ndim != 3
                or self.covars.shape[1:] != (self.dim, self.dim)):
            raise KaldiError("FullGmm: bad shapes")

    @property
    def num_mix(self) -> int:
        return self.weights.shape[0]

    @property
    def dim(self) -> int:
        return self.means.shape[1]

    # -- cached natural parameters (reference full-gmm.h accessors) ----------
    @property
    def inv_covars(self) -> np.ndarray:
        return np.linalg.inv(self.covars)  # [M, D, D]

    @property
    def means_invcovars(self) -> np.ndarray:
        return np.einsum("mde,me->md", self.inv_covars, self.means)

    @property
    def gconsts(self) -> np.ndarray:
        """log w − 0.5 (D log 2π + logdet Σ + μᵀ Σ⁻¹ μ)."""
        sign, logdet = np.linalg.slogdet(self.covars)
        if np.any(sign <= 0):
            raise KaldiError("FullGmm: non-PD covariance")
        quad = np.einsum("md,md->m", self.means, self.means_invcovars)
        return (np.log(np.maximum(self.weights, 1e-30))
                - 0.5 * (self.dim * M_LOG_2PI + logdet + quad))

    @staticmethod
    def from_diag(diag: DiagGmm) -> "FullGmm":
        """fgmm-global-init-from-diag / full-gmm.cc CopyFromDiagGmm."""
        covars = np.stack([np.diag(v) for v in diag.vars])
        return FullGmm(diag.weights.copy(), diag.means.copy(), covars)

    def to_diag(self) -> DiagGmm:
        """fgmm-global-to-gmm: keep the covariance diagonals."""
        return DiagGmm(self.weights.copy(), self.means.copy(),
                       np.stack([np.diag(c).copy() for c in self.covars]))

    # -- likelihoods ---------------------------------------------------------
    def component_loglikes(self, x: np.ndarray) -> np.ndarray:
        """[T, D] → [T, M]: gconst + xᵀ(Σ⁻¹μ) − 0.5 xᵀΣ⁻¹x."""
        x = np.asarray(x, np.float64)
        lin = x @ self.means_invcovars.T  # [T, M]
        z = np.einsum("td,mde->tme", x, self.inv_covars)
        quad = np.einsum("tme,te->tm", z, x)
        return self.gconsts[None, :] + lin - 0.5 * quad

    def loglikes(self, x: np.ndarray) -> np.ndarray:
        comp = self.component_loglikes(x)
        m = comp.max(axis=1, keepdims=True)
        return (m + np.log(np.exp(comp - m).sum(axis=1, keepdims=True)))[:, 0]

    def posteriors(self, x: np.ndarray) -> np.ndarray:
        comp = self.component_loglikes(x)
        comp -= comp.max(axis=1, keepdims=True)
        p = np.exp(comp)
        return p / p.sum(axis=1, keepdims=True)

    def component_loglikes_batch(self, x) -> jnp.ndarray:
        """jnp path: [T, D] float32 → [T, M]; both contractions are matmuls
        (the second is [T,D]·[M·D,D]ᵀ grouped), so the whole evaluation
        rides the MXU for UBM-sized M."""
        xf = jnp.asarray(x, jnp.float32)
        mi = jnp.asarray(self.means_invcovars, jnp.float32)
        ic = jnp.asarray(self.inv_covars, jnp.float32)
        gc = jnp.asarray(self.gconsts, jnp.float32)
        lin = xf @ mi.T
        # xᵀΣ⁻¹x = Σ_e (x @ Σ⁻¹[:, :, e]) * x_e  → one [T,D]@[D,M*D] matmul
        z = (xf @ ic.transpose(1, 0, 2).reshape(self.dim, -1))
        z = z.reshape(xf.shape[0], self.num_mix, self.dim)
        quad = jnp.einsum("tme,te->tm", z, xf)
        return gc[None, :] + lin - 0.5 * quad

    def posteriors_batch(self, x) -> jnp.ndarray:
        comp = self.component_loglikes_batch(x)
        p = jnp.exp(comp - jnp.max(comp, axis=1, keepdims=True))
        return p / jnp.sum(p, axis=1, keepdims=True)

    # -- serialization (Kaldi token framing) ---------------------------------
    def write(self, f) -> None:
        iof.write_token(f, "<FullGMM>")
        iof.write_vector(f, self.weights.astype(np.float32))
        iof.write_matrix(f, self.means.astype(np.float32))
        M, D = self.means.shape
        iof.write_int32(f, M)
        for c in self.covars:
            iof.write_matrix(f, c.astype(np.float32))
        iof.write_token(f, "</FullGMM>")

    @staticmethod
    def read(f) -> "FullGmm":
        iof.expect_token(f, "<FullGMM>")
        w = iof.read_vector(f)
        means = iof.read_matrix(f)
        M = iof.read_int32(f)
        covars = np.stack([iof.read_matrix(f) for _ in range(M)])
        iof.expect_token(f, "</FullGMM>")
        return FullGmm(w, means, covars)

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            iof.init_kaldi_output_stream(f, True)
            self.write(f)

    @staticmethod
    def load(path: str) -> "FullGmm":
        with open(path, "rb") as f:
            if not iof.init_kaldi_input_stream(f):
                raise KaldiError("FullGmm.load: expected binary stream")
            return FullGmm.read(f)


# ---------------------------------------------------------------------------
# Gaussian preselection (gmm-gselect): top-N component ids per frame.
# ---------------------------------------------------------------------------


def gselect(gmm, feats: np.ndarray, num_gselect: int = 20) -> np.ndarray:
    """[T, D] → int32 [T, N] top-N component indices by per-component
    loglike (reference gmmbin/gmm-gselect.cc; DiagGmm::GaussianSelection).
    Works for DiagGmm (the usual selector) or FullGmm; ranked best-first.
    """
    n = min(num_gselect, gmm.num_mix)
    if hasattr(gmm, "component_loglikes_batch"):
        comp = np.asarray(gmm.component_loglikes_batch(feats))
    elif isinstance(gmm, DiagGmm):
        comp = np.asarray(
            jnp.asarray(feats, jnp.float32) @ jnp.asarray(
                gmm.means_invvars.T, jnp.float32)
            + jnp.square(jnp.asarray(feats, jnp.float32)) @ jnp.asarray(
                -0.5 * gmm.inv_vars.T, jnp.float32)
            + jnp.asarray(gmm.gconsts, jnp.float32)[None, :])
    else:
        comp = gmm.component_loglikes(feats)
    idx = np.argpartition(-comp, n - 1, axis=1)[:, :n]
    order = np.take_along_axis(comp, idx, axis=1).argsort(axis=1)[:, ::-1]
    return np.take_along_axis(idx, order, axis=1).astype(np.int32)


def loglikes_preselect(gmm, feats: np.ndarray, gsel: np.ndarray) -> np.ndarray:
    """Total loglike per frame over only the preselected components
    (diag-gmm.cc LogLikelihoodsPreselect → logsumexp)."""
    comp = (gmm.component_loglikes(feats)
            if not hasattr(gmm, "component_loglikes_batch")
            else np.asarray(gmm.component_loglikes_batch(feats)))
    sel = np.take_along_axis(comp, gsel, axis=1)
    m = sel.max(axis=1, keepdims=True)
    return (m + np.log(np.exp(sel - m).sum(axis=1, keepdims=True)))[:, 0]


# ---------------------------------------------------------------------------
# MLE (mle-full-gmm.{h,cc})
# ---------------------------------------------------------------------------


class AccumFullGmm:
    """Sufficient statistics: occupancy, first order, full second order."""

    def __init__(self, num_mix: int, dim: int):
        self.occ = np.zeros(num_mix, np.float64)
        self.mean_acc = np.zeros((num_mix, dim), np.float64)
        self.cov_acc = np.zeros((num_mix, dim, dim), np.float64)
        self.tot_like = 0.0
        self.tot_frames = 0.0

    def accumulate(self, gmm: FullGmm, feats: np.ndarray,
                   gsel: Optional[np.ndarray] = None) -> float:
        """E-step over [T, D]; with gsel only the selected components get
        posterior mass (fgmm-global-acc-stats-gselect semantics)."""
        x = np.asarray(feats, np.float64)
        comp = np.asarray(gmm.component_loglikes_batch(x), np.float64)
        if gsel is not None:
            masked = np.full_like(comp, -np.inf)
            np.put_along_axis(masked, gsel,
                              np.take_along_axis(comp, gsel, axis=1), axis=1)
            comp = masked
        m = comp.max(axis=1, keepdims=True)
        like = (m + np.log(np.exp(comp - m).sum(axis=1, keepdims=True)))
        post = np.exp(comp - like)
        self.occ += post.sum(0)
        self.mean_acc += post.T @ x
        self.cov_acc += np.einsum("tm,td,te->mde", post, x, x, optimize=True)
        self.tot_like += float(like.sum())
        self.tot_frames += x.shape[0]
        return float(like.sum())

    def add(self, other: "AccumFullGmm") -> None:
        self.occ += other.occ
        self.mean_acc += other.mean_acc
        self.cov_acc += other.cov_acc
        self.tot_like += other.tot_like
        self.tot_frames += other.tot_frames

    def write(self, f) -> None:
        iof.init_kaldi_output_stream(f, True)
        iof.write_token(f, "<FgmmAccs>")
        M, D = self.mean_acc.shape
        iof.write_int32(f, M)
        iof.write_int32(f, D)
        iof.write_vector(f, self.occ, dtype=np.float64)
        iof.write_matrix(f, self.mean_acc, dtype=np.float64)
        iof.write_matrix(f, self.cov_acc.reshape(M * D, D), dtype=np.float64)
        iof.write_double(f, self.tot_like)
        iof.write_double(f, self.tot_frames)
        iof.write_token(f, "</FgmmAccs>")

    @staticmethod
    def read(f) -> "AccumFullGmm":
        if not iof.init_kaldi_input_stream(f):
            raise KaldiError("FgmmAccs must be binary")
        iof.expect_token(f, "<FgmmAccs>")
        M = iof.read_int32(f)
        D = iof.read_int32(f)
        accs = AccumFullGmm(M, D)
        accs.occ = np.asarray(iof.read_vector(f), np.float64)
        accs.mean_acc = np.asarray(iof.read_matrix(f), np.float64)
        accs.cov_acc = np.asarray(
            iof.read_matrix(f), np.float64).reshape(M, D, D)
        accs.tot_like = iof.read_float(f)
        accs.tot_frames = iof.read_float(f)
        iof.expect_token(f, "</FgmmAccs>")
        return accs


def mle_full_gmm_update(
    gmm: FullGmm,
    accs: AccumFullGmm,
    min_gaussian_occupancy: float = 10.0,
    variance_floor: float = 1e-3,
    remove_low_count: bool = False,
) -> FullGmm:
    """M-step (mle-full-gmm.cc MleFullGmmUpdate): starved components keep
    their old parameters (or are removed); covariances floored by eigenvalue.
    """
    M, D = accs.mean_acc.shape
    weights = gmm.weights.copy()
    means = gmm.means.copy()
    covars = gmm.covars.copy()
    tot = accs.occ.sum()
    keep = np.ones(M, bool)
    floored = 0
    for m in range(M):
        occ = accs.occ[m]
        if occ < min_gaussian_occupancy:
            keep[m] = not remove_low_count
            continue
        mean = accs.mean_acc[m] / occ
        cov = accs.cov_acc[m] / occ - np.outer(mean, mean)
        cov = 0.5 * (cov + cov.T)
        w, v = np.linalg.eigh(cov)
        if w[0] < variance_floor:
            w = np.maximum(w, variance_floor)
            cov = (v * w) @ v.T
            floored += 1
        weights[m] = occ / max(tot, 1e-10)
        means[m] = mean
        covars[m] = cov
    if not keep.all():
        weights, means, covars = weights[keep], means[keep], covars[keep]
        log.info("mle_full_gmm_update: removed %d low-count components",
                 int((~keep).sum()))
    weights = weights / weights.sum()
    if floored:
        log.info("mle_full_gmm_update: floored %d covariances", floored)
    if accs.tot_frames > 0:
        log.info("fgmm est: avg like/frame %.4f over %.0f frames",
                 accs.tot_like / accs.tot_frames, accs.tot_frames)
    return FullGmm(weights, means, covars)


def train_full_ubm(
    diag_ubm: DiagGmm,
    utt_feats: List[np.ndarray],
    num_iters: int = 4,
    num_gselect: int = 20,
    min_gaussian_occupancy: float = 10.0,
) -> FullGmm:
    """Full-cov UBM from a trained diagonal UBM, gselect-sparsified E-step —
    the reference steps/online/nnet2/train_ivector_extractor.sh convention
    (train_diag_ubm.sh → fgmm-global-* iterations)."""
    fgmm = FullGmm.from_diag(diag_ubm)
    gsels = [gselect(diag_ubm, x, num_gselect) for x in utt_feats]
    for it in range(num_iters):
        accs = AccumFullGmm(fgmm.num_mix, fgmm.dim)
        for x, gs in zip(utt_feats, gsels):
            accs.accumulate(fgmm, x, gs)
        log.info("full UBM iter %d: avg loglike %.4f", it,
                 accs.tot_like / max(accs.tot_frames, 1.0))
        fgmm = mle_full_gmm_update(
            fgmm, accs, min_gaussian_occupancy=min_gaussian_occupancy)
    return fgmm
