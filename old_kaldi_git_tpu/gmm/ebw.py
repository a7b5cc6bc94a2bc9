"""Extended Baum-Welch (EBW) updates for discriminative GMM training.

Reference parity (SURVEY.md §2.3): src/gmm/ebw-diag-gmm.{h,cc}
(UpdateEbwDiagGmm / UpdateEbwWeightsDiagGmm / IsmoothStatsDiagGmm) — the
MMI/MPE "gmm-est-gaussians-ebw" + "gmm-est-weights-ebw" path.

Mean/variance update per Gaussian (num − den differenced stats, smoothing
constant D):
    μ'  = (Δx + D μ) / (Δγ + D)
    σ²' = (Δx² + D (σ² + μ²)) / (Δγ + D) − μ'²
with D per Gaussian: start at E·γ_den/2 and grow until σ²' > 0 (the
reference's double-check loop), never below D_min.

Weight update: maximize the EBW weight auxiliary
    f(w) = Σ_m γ_num_m log w_m − Σ_m γ_den_m w_m / w_m^old
over the simplex.  The stationary condition gives
    w_m = γ_num_m / (λ + γ_den_m / w_m^old),
so we solve for λ by bisection on Σ w_m = 1 (same auxiliary function as
the reference; closed-form fixed point instead of its inner loop).

I-smoothing (IsmoothStatsDiagGmm, for MPE/MMI-tau): blend τ worth of the
num stats' own ML estimate into the num stats before differencing.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from old_kaldi_git_tpu.gmm.diag_gmm import AmDiagGmm
from old_kaldi_git_tpu.gmm.mle import AccumAmDiagGmm
from old_kaldi_git_tpu.utils.log import get_logger

log = get_logger("ebw")


@dataclasses.dataclass
class EbwOptions:
    e: float = 2.0  # D = e * gamma_den / 2 starting point
    d_min: float = 1e-3
    tau: float = 0.0  # i-smoothing on num stats
    update_weights: bool = True
    variance_floor: float = 1e-3


def ismooth_stats(acc: AccumAmDiagGmm, tau: float) -> AccumAmDiagGmm:
    """~ IsmoothStatsDiagGmm: add τ pseudo-counts of each Gaussian's own
    ML estimate to its stats (leaves zero-occupancy Gaussians untouched)."""
    if tau == 0.0:
        return acc
    out = AccumAmDiagGmm.__new__(AccumAmDiagGmm)
    occ = acc.occ
    safe = np.maximum(occ, 1e-10)
    mean_ml = acc.mean_acc / safe[..., None]
    var_ml = acc.var_acc / safe[..., None]
    mask = (occ > 1e-10)[..., None]
    out.occ = occ + tau * (occ > 1e-10)
    out.mean_acc = acc.mean_acc + np.where(mask, tau * mean_ml, 0.0)
    out.var_acc = acc.var_acc + np.where(mask, tau * var_ml, 0.0)
    out.tot_like = acc.tot_like
    out.tot_frames = acc.tot_frames
    return out


def _ebw_weights(
    w_old: np.ndarray, num_occ: np.ndarray, den_occ: np.ndarray
) -> np.ndarray:
    """Maximize Σ γn log w − Σ γd w/w_old on the simplex (per pdf)."""
    if num_occ.sum() <= 0:
        return w_old
    ratio = np.where(w_old > 0, den_occ / np.maximum(w_old, 1e-20), 0.0)
    # stationary point: w_m = γn_m / (λ + γd_m/w_old_m); positivity needs
    # λ > −min(ratio) over components with γn_m > 0, and λ may well be
    # NEGATIVE when denominator occupancy dominates — bracket from just
    # above that pole, not from 0
    active = num_occ > 0
    lam_min = -float(np.min(ratio[active])) if active.any() else 0.0

    def total(lam: float) -> float:
        return float(
            np.sum(num_occ[active] / np.maximum(lam + ratio[active], 1e-20))
        )

    # Σw → ∞ as λ → lam_min⁺ and decreases monotonically in λ
    eps = max(1e-12, abs(lam_min) * 1e-12)
    lo = lam_min + eps
    hi = max(lam_min + 1.0, float(num_occ.sum()), 1.0)
    while total(hi) > 1.0:
        hi = lam_min + (hi - lam_min) * 2.0
        if hi - lam_min > 1e15:
            break
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if total(mid) > 1.0:
            lo = mid
        else:
            hi = mid
    w = np.where(active, num_occ / np.maximum(hi + ratio, 1e-20), 0.0)
    s = w.sum()
    if s <= 0:
        return w_old
    return w / s


def ebw_update(
    am: AmDiagGmm,
    num: AccumAmDiagGmm,
    den: AccumAmDiagGmm,
    opts: Optional[EbwOptions] = None,
) -> Tuple[int, int]:
    """In-place EBW update of means/variances(/weights).

    Returns (num_gauss_updated, num_gauss_skipped)."""
    opts = opts or EbwOptions()
    num = ismooth_stats(num, opts.tau)
    updated = skipped = 0
    for pdf, gmm in enumerate(am.pdfs):
        m = gmm.num_mix
        g_num = num.occ[pdf, :m]
        g_den = den.occ[pdf, :m]
        dx = num.mean_acc[pdf, :m] - den.mean_acc[pdf, :m]
        dx2 = num.var_acc[pdf, :m] - den.var_acc[pdf, :m]
        dg = g_num - g_den
        for j in range(m):
            if g_num[j] + g_den[j] < 1e-8:
                skipped += 1
                continue
            mu = gmm.means[j]
            var = gmm.vars[j]
            d = max(opts.e * g_den[j] / 2.0, opts.d_min)
            ok = False
            for _ in range(20):  # grow D until the variance is positive
                denom = dg[j] + d
                if denom > 1e-8:
                    mu_new = (dx[j] + d * mu) / denom
                    var_new = (
                        (dx2[j] + d * (var + mu * mu)) / denom - mu_new * mu_new
                    )
                    if np.all(var_new > opts.variance_floor * 0.1):
                        ok = True
                        break
                d *= 2.0
            if not ok:
                skipped += 1
                continue
            gmm.means[j] = mu_new
            gmm.vars[j] = np.maximum(var_new, opts.variance_floor)
            updated += 1
        if opts.update_weights:
            gmm.weights[:m] = _ebw_weights(
                gmm.weights[:m].copy(), g_num, g_den
            )
    am.invalidate()
    log.info("ebw_update: %d updated, %d skipped", updated, skipped)
    return updated, skipped
