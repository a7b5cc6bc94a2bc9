"""fMLLR estimation for SGMM2 models (reference src/sgmm2/fmllr-sgmm2.{h,cc}
FmllrSgmm2Stats / sgmm2bin/sgmm2-est-fmllr.cc).

Unlike the diagonal-GMM fMLLR (transform/fmllr.py), the SGMM2 pool has FULL
covariances, so the quadratic term does not decouple per row and the
reference optimizes the transform by preconditioned gradient ascent with a
line search instead of the row-cofactor loop.  Same structure here:

  auxiliary  Q(W) = beta log|det A|
             + tr(W' L) - 1/2 sum_i tr(Sigma_i^{-1} W G_i W')

with W = [A b] ([D, D+1]), x+ = [x; 1], and sufficient statistics
  beta = total occupancy
  L    = sum_i Sigma_i^{-1} C_i,  C_i = sum_t mbar_{t,i} x+_t'
         (mbar_{t,i} = sum_jm gamma_{t,jm,i} (M_i v_jm + o_i), the
          posterior-weighted adapted means)
  G_i  = sum_t gamma_i(t) x+_t x+_t'      [I, D+1, D+1]

Gradient  dQ/dW = beta [A^{-T} | 0] + L - sum_i Sigma_i^{-1} W G_i.
The ascent direction is Kronecker-preconditioned by the occupancy-averaged
covariance (left) and average feature scatter (right) — exact Newton when
all covariances coincide (the reference's pre-transform achieves the same
conditioning by a change of basis).  Each step takes an exact line search:
Q(W + tD) is quadratic in t except for the log-det, so a few guarded
Newton iterations on t suffice.

The estimated W is written as a standard [D, D+1] 'mat' table entry and
applied with the shared transform-feats tool — exactly the reference
pipeline (sgmm2-est-fmllr | transform-feats | sgmm2-latgen-faster).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from old_kaldi_git_tpu.gmm.sgmm2 import AmSgmm2
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger

log = get_logger("sgmm2_fmllr")


class FmllrSgmm2Accs:
    """Sufficient statistics for one speaker's fMLLR transform."""

    def __init__(self, model: AmSgmm2):
        I, D, _ = model.M.shape
        self.beta = 0.0
        self.L = np.zeros((D, D + 1))
        self.G = np.zeros((I, D + 1, D + 1))
        # occupancy-weighted covariance average for the preconditioner
        self.sigma_bar = np.zeros((D, D))
        self._sigma = np.linalg.inv(model.sigma_inv)  # [I, D, D]

    def accumulate(self, model: AmSgmm2, feats: np.ndarray,
                   pdf_ids: np.ndarray, weights=None,
                   spk_vec: Optional[np.ndarray] = None) -> None:
        """Posterior-weighted stats over aligned frames (posteriors from
        the CURRENT feature space — pass already-transformed feats when
        iterating, the reference's multi-pass behaviour)."""
        x = np.asarray(feats, np.float64)
        pdf_ids = np.asarray(pdf_ids)
        wts = (np.ones(len(x)) if weights is None
               else np.asarray(weights, np.float64))
        off = model.spk_offsets(spk_vec)          # [I, D] or None
        bias = model.spk_weight_bias(spk_vec)     # [I] or None
        xp = np.concatenate([x, np.ones((len(x), 1))], axis=1)  # [T, D+1]
        I = model.num_gauss
        for j in np.unique(pdf_ids):
            sel = pdf_ids == j
            xs, xps, ws = x[sel], xp[sel], wts[sel]
            post = model.component_posteriors(
                xs, int(j), off, spk_bias=bias)   # [t, Mj, I]
            post = post * ws[:, None, None]
            gi = post.sum(axis=1)                 # [t, I]
            # mbar_{t,i} = M_i (sum_m post v_jm) + gamma_i(t) o_i
            vbar = np.einsum("tmi,ms->tis", post, model.v[int(j)])
            mbar = np.einsum("ids,tis->tid", model.M, vbar)
            if off is not None:
                mbar += gi[:, :, None] * off[None, :, :]
            C = np.einsum("tid,te->ide", mbar, xps)   # [I, D, D+1]
            # L += sum_i Sigma_i^{-1} C_i (Sigma_i^{-1} symmetric)
            self.L += np.einsum("ide,idf->ef", model.sigma_inv, C)
            self.G += np.einsum("ti,td,te->ide", gi, xps, xps)
            g_i = gi.sum(axis=0)                  # [I]
            self.beta += float(g_i.sum())
            self.sigma_bar += np.einsum("i,ide->de", g_i, self._sigma)

    def add(self, other: "FmllrSgmm2Accs") -> None:
        self.beta += other.beta
        self.L += other.L
        self.G += other.G
        self.sigma_bar += other.sigma_bar


@dataclasses.dataclass
class FmllrSgmm2Options:
    num_iters: int = 10
    min_count: float = 100.0
    newton_steps: int = 5


def _aux(W, beta, L, G, sigma_inv):
    A = W[:, :-1]
    sign, logdet = np.linalg.slogdet(A)
    if sign <= 0:
        return -np.inf
    quad = np.einsum("ide,df,ifg,eg->", sigma_inv, W, G, W)
    return beta * logdet + float((W * L).sum()) - 0.5 * quad


def estimate_sgmm2_fmllr(
    model: AmSgmm2,
    accs: FmllrSgmm2Accs,
    opts: FmllrSgmm2Options = FmllrSgmm2Options(),
) -> Optional[np.ndarray]:
    """Maximize Q(W) by preconditioned gradient ascent + line search.
    Returns W [D, D+1] (None when beta < min_count: no reliable estimate,
    the caller should fall back to identity — reference behaviour)."""
    I, D, _ = model.M.shape
    if accs.beta < opts.min_count:
        return None
    W = np.concatenate([np.eye(D), np.zeros((D, 1))], axis=1)
    sigma_inv = model.sigma_inv
    # Kronecker preconditioner: avg covariance (left), avg scatter (right)
    P_left = accs.sigma_bar / accs.beta
    G_bar = accs.G.sum(axis=0) / accs.beta
    P_right = np.linalg.inv(G_bar + 1e-6 * np.trace(G_bar) / (D + 1)
                            * np.eye(D + 1))
    f = _aux(W, accs.beta, accs.L, accs.G, sigma_inv)
    for it in range(opts.num_iters):
        A = W[:, :-1]
        grad = (accs.beta
                * np.concatenate([np.linalg.inv(A).T, np.zeros((D, 1))], 1)
                + accs.L
                - np.einsum("ide,ef,ifg->dg", sigma_inv, W, accs.G))
        Dir = P_left @ grad @ P_right
        # exact line search on t: Q(W + t Dir) — quadratic except log-det
        b1 = float((Dir * accs.L).sum()
                   - np.einsum("ide,ef,ifg,dg->", sigma_inv, W, accs.G, Dir))
        b2 = float(np.einsum("ide,ef,ifg,dg->",
                             sigma_inv, Dir, accs.G, Dir))
        D_A = Dir[:, :-1]
        t = 0.0
        for _ in range(opts.newton_steps):
            M = A + t * D_A
            sign, _ = np.linalg.slogdet(M)
            if sign <= 0:
                t *= 0.5
                continue
            Minv_DA = np.linalg.solve(M, D_A)
            f1 = accs.beta * np.trace(Minv_DA) + b1 - t * b2
            f2 = -accs.beta * float((Minv_DA * Minv_DA.T).sum()) - b2
            if f2 >= -1e-12:
                break
            t_new = t - f1 / f2
            t = t_new
        # guarded apply: halve until the auxiliary does not decrease
        step = t
        for _ in range(20):
            cand = W + step * Dir
            fc = _aux(cand, accs.beta, accs.L, accs.G, sigma_inv)
            if fc >= f - 1e-9:
                W, f = cand, fc
                break
            step *= 0.5
        else:
            break  # no improving step along this direction — converged
    log.info("sgmm2 fMLLR: beta=%.1f, auxiliary/frame %.4f after %d iters",
             accs.beta, f / accs.beta, opts.num_iters)
    return W


def sgmm2_fmllr_objf_improvement(
    model: AmSgmm2, accs: FmllrSgmm2Accs, W: np.ndarray
) -> float:
    """Per-frame auxiliary improvement of W over identity (diagnostic the
    reference logs)."""
    D = model.dim
    W0 = np.concatenate([np.eye(D), np.zeros((D, 1))], axis=1)
    return (_aux(W, accs.beta, accs.L, accs.G, model.sigma_inv)
            - _aux(W0, accs.beta, accs.L, accs.G, model.sigma_inv)
            ) / max(accs.beta, 1.0)
