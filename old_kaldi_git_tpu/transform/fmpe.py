"""fMPE: discriminatively-trained feature-space offsets.

Reference parity: src/transform/fmpe.{h,cc} (Fmpe, FmpeOptions, FmpeStats)
and the tool set fmpe-init / gmm-fmpe-acc-stats / fmpe-sum-accs / fmpe-est /
fmpe-apply-transform.

A small 'offset GMM' (UBM-like DiagGmm) turns every frame into a sparse
high-dimensional vector: for each of the top-`num_gselect` Gaussians g with
(scaled) posterior p, the block p * [1, (x - mu_g)/sigma_g].  A learned
projection maps that vector to `num_contexts` D-dim intermediate offsets,
which a fixed context-averaging layer (e.g. {0}, {-1}, {+1}, {-2..-4},
{+2..+4}) collapses into one additive feature offset: x' = x + offset(x).

Training follows the reference's two-sided scheme: the signed MPE/MMI
posterior gradient dF/dx' is pushed back through the context layer and the
projection; positive and negative gradient parts accumulate separately and
the update is lr * (pos - neg) / (pos + neg) per element — step sizes are
scale-free, like the reference's FmpeUpdate.

Both differentials of the reference are implemented:

* the *direct* term `model_deriv_direct` — gradient of the
  discriminative objective through the features with the model fixed;
* the *indirect* term (`ModelDerivStats` + `model_deriv_indirect`, the
  gmm-get-stats-deriv role) — the objective also depends on the model
  parameters, which are ML-re-estimated FROM the fMPE features each
  outer iteration, so dF/dx_t picks up a term through the ML stats:
  with frozen component responsibilities γ_m(t),

      μ_m(x)  = Σ_t γ_m(t) x_t / Γ_m                 (ML mean map)
      σ²_m(x) = Σ_t γ_m(t) x_t² / Γ_m − μ_m²          (ML var map)
      dF/dx_t += Σ_m γ_m(t)/Γ_m · [ ∂F/∂μ_m + 2 (x_t − μ_m) ∂F/∂σ²_m ]

  where ∂F/∂μ_m, ∂F/∂σ²_m come from the signed (num − den) MPE/MMI
  stats.  Verified against finite differences of the composite
  objective F(x, λ_ML(x)) in tests (exact for M=1 components; frozen-γ
  exact in general).

The hot paths (high-dim expansion + projection) are plain dense matmuls of
shape [T, G*(D+1)] @ [G*(D+1), C*D] — MXU-friendly; the numpy code below is
the host oracle and the same arithmetic jits under jax unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from old_kaldi_git_tpu.gmm.diag_gmm import AmDiagGmm, DiagGmm
from old_kaldi_git_tpu.utils.io_funcs import (
    expect_token,
    init_kaldi_input_stream,
    init_kaldi_output_stream,
    read_float,
    read_int32,
    read_matrix,
    write_double,
    write_int32,
    write_matrix,
    write_token,
)
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger

log = get_logger("fmpe")

# default context expansion: five groups — the centre frame, +/-1, and
# averaged +/-{2,3,4} (the reference's default "" config builds a similar
# symmetric stack)
DEFAULT_CONTEXTS: Tuple[Tuple[Tuple[int, float], ...], ...] = (
    ((0, 1.0),),
    ((-1, 1.0),),
    ((1, 1.0),),
    ((-2, 1 / 3), (-3, 1 / 3), (-4, 1 / 3)),
    ((2, 1 / 3), (3, 1 / 3), (4, 1 / 3)),
)


def parse_contexts(spec: str):
    """'0/-1/1/-2,-3,-4/2,3,4' → context groups with 1/len weights."""
    groups = []
    for part in spec.split("/"):
        offs = [int(x) for x in part.split(",") if x.strip() != ""]
        if not offs:
            raise KaldiError(f"empty context group in {spec!r}")
        groups.append(tuple((o, 1.0 / len(offs)) for o in offs))
    return tuple(groups)


class Fmpe:
    """Offset-GMM + projection. proj has shape [G*(D+1), C*D]."""

    def __init__(self, gmm: DiagGmm, proj: np.ndarray,
                 contexts=DEFAULT_CONTEXTS, post_scale: float = 5.0,
                 num_gselect: int = 25):
        self.gmm = gmm
        self.proj = np.asarray(proj, np.float64)
        self.contexts = tuple(tuple(c) for c in contexts)
        self.post_scale = float(post_scale)
        self.num_gselect = int(num_gselect)
        G, D = gmm.num_mix, gmm.dim
        C = len(self.contexts)
        if self.proj.shape != (G * (D + 1), C * D):
            raise KaldiError(
                f"proj shape {self.proj.shape} != {(G * (D + 1), C * D)}")

    @staticmethod
    def init(gmm: DiagGmm, contexts=DEFAULT_CONTEXTS,
             post_scale: float = 5.0, num_gselect: int = 25) -> "Fmpe":
        G, D = gmm.num_mix, gmm.dim
        return Fmpe(gmm, np.zeros((G * (D + 1), len(contexts) * D)),
                    contexts, post_scale, num_gselect)

    @property
    def dim(self) -> int:
        return self.gmm.dim

    # -- feature expansion ------------------------------------------------------
    def expand(self, feats: np.ndarray) -> np.ndarray:
        """[T, D] → sparse-in-spirit high-dim [T, G*(D+1)]: per top-gselect
        Gaussian g, the block post_g * [1, (x-mu_g)/sigma_g]."""
        x = np.asarray(feats, np.float64)
        T, D = x.shape
        G = self.gmm.num_mix
        post = self.gmm.posteriors(x)  # [T, G]
        if self.num_gselect < G:
            kth = np.partition(post, G - self.num_gselect, axis=1)[
                :, G - self.num_gselect][:, None]
            post = np.where(post >= kth, post, 0.0)
            norm = post.sum(axis=1, keepdims=True)
            post = post / np.maximum(norm, 1e-20)
        post = post * self.post_scale
        z = (x[:, None, :] - self.gmm.means[None]) / np.sqrt(
            self.gmm.vars)[None]  # [T, G, D]
        h = np.concatenate([post[:, :, None], post[:, :, None] * z], axis=2)
        return h.reshape(T, G * (D + 1))

    def _apply_context(self, inter: np.ndarray) -> np.ndarray:
        """[T, C*D] intermediate → [T, D] offsets via the fixed context
        averaging layer."""
        T = len(inter)
        D = self.dim
        out = np.zeros((T, D))
        for c, group in enumerate(self.contexts):
            block = inter[:, c * D:(c + 1) * D]
            for off, wt in group:
                lo, hi = max(0, -off), min(T, T - off)
                out[lo:hi] += wt * block[lo + off:hi + off]
        return out

    def _apply_context_reverse(self, grad_out: np.ndarray) -> np.ndarray:
        """Adjoint of _apply_context: [T, D] → [T, C*D]."""
        T = len(grad_out)
        D = self.dim
        g = np.zeros((T, len(self.contexts) * D))
        for c, group in enumerate(self.contexts):
            for off, wt in group:
                lo, hi = max(0, -off), min(T, T - off)
                g[lo + off:hi + off, c * D:(c + 1) * D] += wt * grad_out[lo:hi]
        return g

    def offsets(self, feats: np.ndarray,
                h: Optional[np.ndarray] = None) -> np.ndarray:
        """[T, D] additive feature offsets."""
        if h is None:
            h = self.expand(feats)
        return self._apply_context(h @ self.proj)

    def apply(self, feats: np.ndarray) -> np.ndarray:
        """x' = x + offset(x)."""
        return (np.asarray(feats, np.float64) + self.offsets(feats)).astype(
            np.float32)

    # -- training ----------------------------------------------------------------
    def acc_from_deriv(self, feats: np.ndarray,
                       deriv: np.ndarray) -> "FmpeAccs":
        """Accumulate projection-gradient stats given dF/dx' [T, D]."""
        h = self.expand(feats)
        gi = self._apply_context_reverse(np.asarray(deriv, np.float64))
        grad = h.T @ gi  # [G*(D+1), C*D]
        accs = FmpeAccs.zeros_like(self)
        accs.pos += np.maximum(grad, 0.0)
        accs.neg += np.maximum(-grad, 0.0)
        return accs

    def update(self, accs: "FmpeAccs", learning_rate: float = 0.1) -> float:
        """proj += lr * (pos - neg) / (pos + neg); returns the mean |step|
        (reference FmpeStats::Update's scale-free rule)."""
        denom = accs.pos + accs.neg
        step = np.where(denom > 0,
                        learning_rate * (accs.pos - accs.neg)
                        / np.maximum(denom, 1e-20), 0.0)
        self.proj += step
        changed = float(np.abs(step).mean())
        log.info("fmpe update: mean |step| %.3e over %d params",
                 changed, step.size)
        return changed

    # -- serialization ------------------------------------------------------------
    def write(self, f) -> None:
        init_kaldi_output_stream(f, True)
        write_token(f, "<Fmpe>")
        self.gmm.write(f)
        write_matrix(f, self.proj.astype(np.float32))
        write_double(f, self.post_scale)
        write_int32(f, self.num_gselect)
        write_int32(f, len(self.contexts))
        for group in self.contexts:
            write_int32(f, len(group))
            for off, wt in group:
                write_int32(f, off)
                write_double(f, wt)
        write_token(f, "</Fmpe>")

    @staticmethod
    def read(f) -> "Fmpe":
        init_kaldi_input_stream(f)
        expect_token(f, "<Fmpe>")
        gmm = DiagGmm.read(f)
        proj = read_matrix(f)
        post_scale = read_float(f)
        num_gselect = read_int32(f)
        nc = read_int32(f)
        contexts = []
        for _ in range(nc):
            ng = read_int32(f)
            contexts.append(tuple(
                (read_int32(f), read_float(f)) for _ in range(ng)))
        expect_token(f, "</Fmpe>")
        return Fmpe(gmm, proj, tuple(contexts), post_scale, num_gselect)

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            self.write(f)

    @staticmethod
    def load(path: str) -> "Fmpe":
        with open(path, "rb") as f:
            return Fmpe.read(f)


@dataclasses.dataclass
class FmpeAccs:
    """Separated positive/negative projection-gradient accumulators."""

    pos: np.ndarray
    neg: np.ndarray

    @staticmethod
    def zeros_like(fmpe: Fmpe) -> "FmpeAccs":
        return FmpeAccs(np.zeros_like(fmpe.proj), np.zeros_like(fmpe.proj))

    def add(self, other: "FmpeAccs") -> None:
        self.pos += other.pos
        self.neg += other.neg

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            init_kaldi_output_stream(f, True)
            write_token(f, "<FmpeAccs>")
            write_matrix(f, self.pos.astype(np.float64), np.float64)
            write_matrix(f, self.neg.astype(np.float64), np.float64)
            write_token(f, "</FmpeAccs>")

    @staticmethod
    def load(path: str) -> "FmpeAccs":
        with open(path, "rb") as f:
            init_kaldi_input_stream(f)
            expect_token(f, "<FmpeAccs>")
            pos = read_matrix(f)
            neg = read_matrix(f)
            expect_token(f, "</FmpeAccs>")
            return FmpeAccs(np.asarray(pos, np.float64),
                            np.asarray(neg, np.float64))


class ModelDerivStats:
    """Per-Gaussian derivative of the discriminative objective wrt the
    model parameters, plus the ML occupancies that turn it into a
    per-frame feature derivative (reference gmmbin/gmm-get-stats-deriv).

    Accumulate over utterances with `accumulate` (signed MPE/MMI tid
    posteriors + the ML alignment), `add` partial accs, then
    `model_deriv_indirect` evaluates the indirect dF/dx per utterance."""

    def __init__(self, am: AmDiagGmm):
        self.occ_s = [np.zeros(g.num_mix) for g in am.pdfs]     # Σ w γ
        self.s1_s = [np.zeros_like(g.means) for g in am.pdfs]   # Σ w γ x
        self.s2_s = [np.zeros_like(g.means) for g in am.pdfs]   # Σ w γ x²
        self.ml_occ = [np.zeros(g.num_mix) for g in am.pdfs]    # Σ γ_ml

    def accumulate(self, am: AmDiagGmm, tm, feats: np.ndarray,
                   signed_post, ali: np.ndarray) -> None:
        x = np.asarray(feats, np.float64)
        # signed discriminative stats per Gaussian
        for t, frame in enumerate(signed_post):
            if t >= len(x):
                break
            for tid, w in frame:
                j = tm.tid_to_pdf(int(tid))
                gmm = am.pdfs[j]
                gamma = w * gmm.posteriors(x[t:t + 1])[0]  # [M] signed
                self.occ_s[j] += gamma
                self.s1_s[j] += gamma[:, None] * x[t]
                self.s2_s[j] += gamma[:, None] * x[t] ** 2
        # ML occupancies from the alignment (weight 1 per frame)
        tid2pdf = tm.tid_to_pdf_array()
        for t, tid in enumerate(np.asarray(ali)):
            if t >= len(x):
                break
            j = int(tid2pdf[int(tid)])
            self.ml_occ[j] += am.pdfs[j].posteriors(x[t:t + 1])[0]

    def add(self, other: "ModelDerivStats") -> None:
        for j in range(len(self.occ_s)):
            self.occ_s[j] += other.occ_s[j]
            self.s1_s[j] += other.s1_s[j]
            self.s2_s[j] += other.s2_s[j]
            self.ml_occ[j] += other.ml_occ[j]

    def param_derivs(self, am: AmDiagGmm):
        """(dF/dμ [M,D], dF/dσ² [M,D]) per pdf from the signed stats:
        dF/dμ_m  = (s1 − occ·μ)/σ²
        dF/dσ²_m = (s2 − 2 μ s1 + occ μ²)/(2σ⁴) − occ/(2σ²)."""
        out = []
        for j, g in enumerate(am.pdfs):
            mu, var = g.means, g.vars
            occ = self.occ_s[j][:, None]
            dmu = (self.s1_s[j] - occ * mu) / var
            dvar = ((self.s2_s[j] - 2 * mu * self.s1_s[j] + occ * mu ** 2)
                    / (2 * var ** 2) - occ / (2 * var))
            out.append((dmu, dvar))
        return out

    # -- serialization ------------------------------------------------------------
    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            init_kaldi_output_stream(f, True)
            write_token(f, "<ModelDerivStats>")
            write_int32(f, len(self.occ_s))
            for j in range(len(self.occ_s)):
                write_matrix(f, self.occ_s[j][None, :], np.float64)
                write_matrix(f, self.s1_s[j], np.float64)
                write_matrix(f, self.s2_s[j], np.float64)
                write_matrix(f, self.ml_occ[j][None, :], np.float64)
            write_token(f, "</ModelDerivStats>")

    @staticmethod
    def load(path: str, am: AmDiagGmm) -> "ModelDerivStats":
        out = ModelDerivStats(am)
        with open(path, "rb") as f:
            init_kaldi_input_stream(f)
            expect_token(f, "<ModelDerivStats>")
            if read_int32(f) != len(out.occ_s):
                raise KaldiError("stats/model pdf count mismatch")
            for j in range(len(out.occ_s)):
                out.occ_s[j] = np.asarray(read_matrix(f), np.float64)[0]
                out.s1_s[j] = np.asarray(read_matrix(f), np.float64)
                out.s2_s[j] = np.asarray(read_matrix(f), np.float64)
                out.ml_occ[j] = np.asarray(read_matrix(f), np.float64)[0]
            expect_token(f, "</ModelDerivStats>")
        return out


def model_deriv_indirect(
    am: AmDiagGmm, tm, feats: np.ndarray, ali: np.ndarray,
    stats: ModelDerivStats, min_count: float = 1e-3,
) -> np.ndarray:
    """Indirect differential [T, D]: chain rule through the ML mean/var
    maps (see module docstring).  `ali` supplies the ML alignment whose
    frozen responsibilities define the maps; Gaussians with ML occupancy
    below min_count contribute nothing (their parameters are not
    data-determined)."""
    x = np.asarray(feats, np.float64)
    deriv = np.zeros_like(x)
    pd = stats.param_derivs(am)
    tid2pdf = tm.tid_to_pdf_array()
    for t, tid in enumerate(np.asarray(ali)):
        if t >= len(x):
            break
        j = int(tid2pdf[int(tid)])
        g = am.pdfs[j]
        gamma = g.posteriors(x[t:t + 1])[0]  # [M]
        occ = np.maximum(stats.ml_occ[j], min_count)
        ok = stats.ml_occ[j] >= min_count
        dmu, dvar = pd[j]
        contrib = (dmu + 2.0 * (x[t] - g.means) * dvar) / occ[:, None]
        deriv[t] += ((gamma * ok)[:, None] * contrib).sum(axis=0)
    return deriv


def model_deriv_direct(
    am: AmDiagGmm, tm, feats: np.ndarray, signed_post,
) -> np.ndarray:
    """Direct differential dF/dx [T, D] from signed tid posteriors
    (gmm-fmpe-acc-stats' direct term): for each (tid, w) at frame t,
    w * sum_m gamma_m(x_t) (mu_m - x_t) / sigma2_m with gamma from the pdf's
    own Gaussian responsibilities."""
    x = np.asarray(feats, np.float64)
    deriv = np.zeros_like(x)
    for t, frame in enumerate(signed_post):
        if t >= len(x):
            break
        for tid, w in frame:
            pdf = tm.tid_to_pdf(int(tid))
            gmm = am.pdfs[pdf]
            gamma = gmm.posteriors(x[t:t + 1])[0]  # [M]
            deriv[t] += w * (gamma[:, None] * (gmm.means - x[t])
                             / gmm.vars).sum(axis=0)
    return deriv
