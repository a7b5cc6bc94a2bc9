"""Basis fMLLR: speaker adaptation with very little data.

Parity with reference src/transform/basis-fmllr-diag-gmm.{h,cc}
(BasisFmllrAccus, BasisFmllrEstimate::EstimateFmllrBasis /
ComputeTransform): instead of estimating a full [D, D+1] transform per
speaker (which needs >500 frames), express the transform as

    W(d) = W0 + sum_b d_b * B_b,      W0 = [I | 0]

where the basis matrices B_b are learned once from training-speaker fMLLR
statistics as the principal directions of the (preconditioned) per-speaker
gradient scatter, and only n << D*(D+1) coefficients d are estimated per
test speaker — n scaling with the amount of adaptation data
(reference --size-scale, default 0.2 coefficients per frame).

Design differences from the reference (documented, not accidental):
the reference preconditions with a model-derived expected Hessian
(ComputeAmDiagPrecond); here the preconditioner is the count-averaged
per-row quadratic statistics G_i accumulated from the same training data,
which is the empirical version of the same matrix. Both are block-diagonal
per row, SPD, and serve only to whiten the gradient scatter.

All of this is small, host-side linear algebra (compile-time per corpus /
per speaker), so it stays numpy per SURVEY.md §7.3 item 3.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from old_kaldi_git_tpu.transform.fmllr import FmllrAccs
from old_kaldi_git_tpu.utils.io_funcs import (
    expect_token,
    init_kaldi_input_stream,
    init_kaldi_output_stream,
    read_int32,
    read_matrix,
    write_int32,
    write_matrix,
    write_token,
)
from old_kaldi_git_tpu.utils.log import get_logger

log = get_logger("basis_fmllr")


def _identity_w(dim: int) -> np.ndarray:
    return np.concatenate([np.eye(dim), np.zeros((dim, 1))], axis=1)


def _aux_gradient(w: np.ndarray, accs: FmllrAccs) -> np.ndarray:
    """d/dW of  beta log|A| + tr(W K^T) - 1/2 sum_i w_i G_i w_i^T  at W."""
    dim = w.shape[0]
    a = w[:, :dim]
    inv_t = np.linalg.inv(a).T
    grad = np.concatenate([accs.beta * inv_t, np.zeros((dim, 1))], axis=1)
    grad += accs.K
    grad -= np.einsum("ij,ijk->ik", w, accs.G)
    return grad


def _aux_objf(w: np.ndarray, accs: FmllrAccs) -> float:
    dim = w.shape[0]
    sign, logdet = np.linalg.slogdet(w[:, :dim])
    if sign <= 0:
        return -np.inf
    quad = np.einsum("ij,ijk,ik->", w, accs.G, w)
    return accs.beta * logdet + float(np.sum(w * accs.K)) - 0.5 * quad


class BasisFmllr:
    """A learned fMLLR basis: `mats[num_bases, D, D+1]`."""

    def __init__(self, mats: np.ndarray):
        self.mats = np.asarray(mats, np.float64)

    @property
    def num_bases(self) -> int:
        return self.mats.shape[0]

    @property
    def dim(self) -> int:
        return self.mats.shape[1]

    # -- Kaldi-token serialization (<BasisFmllr> framing) -------------------
    def write(self, f) -> None:
        init_kaldi_output_stream(f, True)
        write_token(f, "<BasisFmllr>")
        write_int32(f, self.num_bases)
        for b in range(self.num_bases):
            write_matrix(f, self.mats[b].astype(np.float32))
        write_token(f, "</BasisFmllr>")

    @staticmethod
    def read(f) -> "BasisFmllr":
        init_kaldi_input_stream(f)
        expect_token(f, "<BasisFmllr>")
        n = read_int32(f)
        mats = [read_matrix(f) for _ in range(n)]
        expect_token(f, "</BasisFmllr>")
        return BasisFmllr(np.stack(mats))

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            self.write(f)

    @staticmethod
    def load(path: str) -> "BasisFmllr":
        with open(path, "rb") as f:
            return BasisFmllr.read(f)


def estimate_fmllr_basis(
    spk_accs: Sequence[FmllrAccs], num_bases: Optional[int] = None
) -> BasisFmllr:
    """Learn the basis from per-training-speaker fMLLR statistics
    (reference BasisFmllrEstimate::EstimateFmllrBasis).

    Per speaker s: gradient of the fMLLR auxiliary at W0 = [I|0],
    preconditioned row-wise by the Cholesky factor of the count-averaged
    G_i, scaled by 1/sqrt(beta_s).  The basis is the top eigenvectors of
    the scatter of these normalized gradients, mapped back through the
    preconditioner so coefficients live in a whitened space.
    """
    accs = [a for a in spk_accs if a.beta > 0]
    if not accs:
        raise ValueError("no non-empty speaker stats")
    dim = accs[0].K.shape[0]
    ncols = dim + 1
    total_beta = sum(a.beta for a in accs)
    # Row-block preconditioner: average per-frame quadratic stats.
    g_avg = sum(a.G for a in accs) / total_beta  # [D, D+1, D+1]
    chol: List[np.ndarray] = []
    chol_inv: List[np.ndarray] = []
    for i in range(dim):
        gi = g_avg[i] + 1e-6 * np.eye(ncols)
        li = np.linalg.cholesky(gi)
        chol.append(li)
        chol_inv.append(np.linalg.inv(li))
    w0 = _identity_w(dim)
    scatter = np.zeros((dim * ncols, dim * ncols))
    for a in accs:
        grad = _aux_gradient(w0, a)  # [D, D+1]
        pre = np.stack([chol_inv[i] @ grad[i] for i in range(dim)])
        v = pre.reshape(-1) / np.sqrt(a.beta)
        scatter += np.outer(v, v)
    evals, evecs = np.linalg.eigh(scatter)
    order = np.argsort(evals)[::-1]
    max_bases = min(dim * ncols, len(accs) * dim * ncols)
    n = num_bases if num_bases is not None else min(dim * ncols, 200)
    n = min(n, max_bases)
    mats = np.empty((n, dim, ncols))
    lt_inv = [np.linalg.inv(chol[i].T) for i in range(dim)]
    for b in range(n):
        v = evecs[:, order[b]].reshape(dim, ncols)
        # map back: rows were whitened by L_i, so B_i = L_i^{-T} v_i
        mats[b] = np.stack([lt_inv[i] @ v[i] for i in range(dim)])
    log.info(
        "basis-fmllr: %d bases from %d speakers (%.0f frames); "
        "top-5 eigenvalues %s",
        n, len(accs), total_beta,
        np.array2string(evals[order[:5]], precision=3),
    )
    return BasisFmllr(mats)


def compute_fmllr_basis_transform(
    accs: FmllrAccs,
    basis: BasisFmllr,
    size_scale: float = 0.2,
    num_iters: int = 10,
    min_count: float = 10.0,
) -> Optional[Tuple[np.ndarray, int, float]]:
    """Estimate the per-speaker transform in the basis
    (reference BasisFmllrEstimate::ComputeTransform).

    Number of coefficients n = min(num_bases, size_scale * beta); each
    iteration takes the exact auxiliary gradient, projects it onto the
    first n basis matrices, and does a 1-D Newton line search along the
    projected direction (the quadratic part is closed-form; the log-det
    term is handled by Newton on alpha).

    Returns (W [D, D+1], n_coeffs, objf_impr_per_frame) or None if
    beta < min_count.
    """
    if accs.beta < min_count:
        log.info("basis-fmllr: count %.1f < min %.1f", accs.beta, min_count)
        return None
    dim = basis.dim
    n = int(min(basis.num_bases, max(1.0, size_scale * accs.beta)))
    mats = basis.mats[:n]
    w = _identity_w(dim)
    start = _aux_objf(w, accs)
    for _ in range(num_iters):
        grad = _aux_gradient(w, accs)
        coeffs = np.einsum("bij,ij->b", mats, grad)
        delta = np.einsum("b,bij->ij", coeffs, mats)
        norm = np.linalg.norm(delta)
        if norm < 1e-12:
            break
        delta /= norm
        # line search: f(al) = beta log|A + al*dA| + c1*al + c2*al^2
        d_a = delta[:, :dim]
        c1 = float(np.sum(delta * accs.K)) - np.einsum(
            "ij,ijk,ik->", w, accs.G, delta)
        c2 = -0.5 * np.einsum("ij,ijk,ik->", delta, accs.G, delta)
        a = w[:, :dim]
        alpha = 0.0
        for _newton in range(10):
            m = a + alpha * d_a
            try:
                m_inv = np.linalg.inv(m)
            except np.linalg.LinAlgError:
                alpha *= 0.5
                continue
            # d/dal beta log|M| = beta tr(M^{-1} dA)
            g1 = accs.beta * np.trace(m_inv @ d_a) + c1 + 2 * c2 * alpha
            h = -accs.beta * np.trace(m_inv @ d_a @ m_inv @ d_a) + 2 * c2
            if h >= -1e-12:
                break
            step = -g1 / h
            # keep |A| positive: backtrack on sign flip
            new_alpha = alpha + step
            for _ in range(20):
                sign, _ld = np.linalg.slogdet(a + new_alpha * d_a)
                if sign > 0:
                    break
                new_alpha = (alpha + new_alpha) / 2.0
            if abs(new_alpha - alpha) < 1e-9:
                alpha = new_alpha
                break
            alpha = new_alpha
        new_w = w + alpha * delta
        if _aux_objf(new_w, accs) <= _aux_objf(w, accs):
            break
        w = new_w
    impr = (_aux_objf(w, accs) - start) / accs.beta
    log.info(
        "basis-fmllr: %d coeffs, objf impr %.4f/frame over %.0f frames",
        n, impr, accs.beta,
    )
    return w, n, impr
