"""Diagonal-covariance GMMs, stored array-first.

Parity with reference src/gmm/{diag-gmm.h,am-diag-gmm.h}: DiagGmm keeps
gconsts_, inv_vars_, means_invvars_ exactly like the reference (loglikes are
an affine function of [x, x²]); AmDiagGmm stacks every pdf's Gaussians into
padded [num_pdfs, max_mix, D] tensors so batched likelihood evaluation for
all frames × all pdfs is one matmul + masked logsumexp on the MXU
(SURVEY.md §7.2 M3).
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from old_kaldi_git_tpu.utils import io_funcs as iof
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger

log = get_logger("gmm")

M_LOG_2PI = math.log(2.0 * math.pi)


class DiagGmm:
    """One mixture of diagonal Gaussians (a single pdf)."""

    def __init__(self, weights: np.ndarray, means: np.ndarray, variances: np.ndarray):
        self.weights = np.asarray(weights, np.float64)  # [M]
        self.means = np.asarray(means, np.float64)  # [M, D]
        self.vars = np.asarray(variances, np.float64)  # [M, D]
        if not (self.weights.ndim == 1 and self.means.ndim == 2 and self.vars.ndim == 2):
            raise KaldiError("DiagGmm: bad shapes")

    @property
    def num_mix(self) -> int:
        return self.weights.shape[0]

    @property
    def dim(self) -> int:
        return self.means.shape[1]

    # reference representation: gconsts, means_invvars, inv_vars
    @property
    def inv_vars(self) -> np.ndarray:
        return 1.0 / self.vars

    @property
    def means_invvars(self) -> np.ndarray:
        return self.means / self.vars

    @property
    def gconsts(self) -> np.ndarray:
        """log(weight) - 0.5*(D log 2π + Σ log var + Σ μ²/σ²)."""
        return (
            np.log(np.maximum(self.weights, 1e-30))
            - 0.5
            * (
                self.dim * M_LOG_2PI
                + np.log(self.vars).sum(axis=1)
                + (self.means**2 / self.vars).sum(axis=1)
            )
        )

    def component_loglikes(self, x: np.ndarray) -> np.ndarray:
        """[T, D] → [T, M] per-component loglikes."""
        x = np.asarray(x, np.float64)
        return (
            self.gconsts[None, :]
            + x @ self.means_invvars.T
            - 0.5 * (x**2) @ self.inv_vars.T
        )

    def loglikes(self, x: np.ndarray) -> np.ndarray:
        """[T, D] → [T] total loglikes (logsumexp over components)."""
        comp = self.component_loglikes(x)
        m = comp.max(axis=1, keepdims=True)
        return (m + np.log(np.exp(comp - m).sum(axis=1, keepdims=True)))[:, 0]

    def posteriors(self, x: np.ndarray) -> np.ndarray:
        comp = self.component_loglikes(x)
        comp -= comp.max(axis=1, keepdims=True)
        p = np.exp(comp)
        return p / p.sum(axis=1, keepdims=True)

    # -- serialization (reference diag-gmm.cc Write/Read byte layout) --------
    def write(self, f) -> None:
        """<DiagGMM> <GCONSTS> FV <WEIGHTS> FV <MEANS_INVVARS> FM
        <INV_VARS> FM </DiagGMM> — the exact reference field order and
        natural-parameter storage (gconsts_, means_invvars_, inv_vars_),
        so reference-trained final.mdl files and ours are interchangeable."""
        iof.write_token(f, "<DiagGMM>")
        iof.write_token(f, "<GCONSTS>")
        iof.write_vector(f, self.gconsts.astype(np.float32))
        iof.write_token(f, "<WEIGHTS>")
        iof.write_vector(f, self.weights.astype(np.float32))
        iof.write_token(f, "<MEANS_INVVARS>")
        iof.write_matrix(f, self.means_invvars.astype(np.float32))
        iof.write_token(f, "<INV_VARS>")
        iof.write_matrix(f, self.inv_vars.astype(np.float32))
        iof.write_token(f, "</DiagGMM>")

    @staticmethod
    def read(f) -> "DiagGmm":
        iof.expect_token(f, "<DiagGMM>")
        tok = iof.read_token(f)
        if tok == "<GCONSTS>":
            iof.read_vector(f)  # recomputed from the moments below
            tok = iof.read_token(f)
        if tok != "<WEIGHTS>":  # (reference also accepts gconst-less files)
            raise KaldiError(f"DiagGmm.read: expected <WEIGHTS>, got {tok!r}")
        w = iof.read_vector(f).astype(np.float64)
        iof.expect_token(f, "<MEANS_INVVARS>")
        means_invvars = iof.read_matrix(f).astype(np.float64)
        iof.expect_token(f, "<INV_VARS>")
        inv_vars = iof.read_matrix(f).astype(np.float64)
        iof.expect_token(f, "</DiagGMM>")
        variances = 1.0 / inv_vars
        means = means_invvars * variances
        return DiagGmm(w, means, variances)

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            iof.init_kaldi_output_stream(f, True)
            self.write(f)

    @staticmethod
    def load(path: str) -> "DiagGmm":
        with open(path, "rb") as f:
            if not iof.init_kaldi_input_stream(f):
                raise KaldiError("DiagGmm.load: expected binary stream")
            return DiagGmm.read(f)


class AmDiagGmm:
    """All pdfs' GMMs, plus padded stacked tensors for TPU evaluation."""

    def __init__(self, pdfs: List[DiagGmm]):
        self.pdfs = pdfs
        self._stacked = None

    @property
    def num_pdfs(self) -> int:
        return len(self.pdfs)

    @property
    def dim(self) -> int:
        return self.pdfs[0].dim

    @property
    def num_gauss(self) -> int:
        return sum(p.num_mix for p in self.pdfs)

    def invalidate(self) -> None:
        self._stacked = None

    # -- init (reference gmm-init-mono: one Gaussian per pdf from global stats)
    @staticmethod
    def init_mono(num_pdfs: int, glob_mean: np.ndarray, glob_var: np.ndarray,
                  perturb: float = 0.0, seed: int = 0) -> "AmDiagGmm":
        rng = np.random.default_rng(seed)
        pdfs = []
        for _ in range(num_pdfs):
            mean = glob_mean.copy()
            if perturb > 0:
                mean = mean + perturb * np.sqrt(glob_var) * rng.normal(size=mean.shape)
            pdfs.append(DiagGmm(np.ones(1), mean[None, :], glob_var[None, :].copy()))
        return AmDiagGmm(pdfs)

    # -- stacked tensors --------------------------------------------------------
    def stacked(self):
        """Returns (W [P*M, 2D+1] float32, mask [P, M] bool, max_mix) where a
        frame row is [x, x², 1] and scores = frames @ W.T reshaped [.., P, M].
        """
        if self._stacked is None:
            P = self.num_pdfs
            # bucket the mixture dim to the next power of two: every GMM
            # training iteration mixes up (num_mix grows a little each
            # time), and an exact-max M would change the [P*M, 2D+1]
            # operand shape — and thus force a fresh XLA compile through
            # the (slow, queued) tunneled compile service — at EVERY
            # iteration.  Padded rows carry gconst -1e30 so they vanish
            # in the logsumexp regardless of M.  (Measured: mono align
            # walls grew 13 s → 40-116 s per pass purely from these
            # recompiles.)
            M = max(p.num_mix for p in self.pdfs)
            M = 1 << (M - 1).bit_length()
            D = self.dim
            W = np.full((P, M, 2 * D + 1), 0.0, dtype=np.float64)
            mask = np.zeros((P, M), dtype=bool)
            for i, pdf in enumerate(self.pdfs):
                m = pdf.num_mix
                W[i, :m, :D] = pdf.means_invvars
                W[i, :m, D : 2 * D] = -0.5 * pdf.inv_vars
                W[i, :m, 2 * D] = pdf.gconsts
                mask[i, :m] = True
            # padded rows get gconst -inf so they vanish in logsumexp
            W[~mask, 2 * D] = -1e30
            self._stacked = (
                jnp.asarray(W.reshape(P * M, 2 * D + 1), jnp.float32),
                jnp.asarray(mask),
                M,
            )
        return self._stacked

    def loglikes_batch(self, feats: jnp.ndarray) -> jnp.ndarray:
        """[..., T, D] float → [..., T, num_pdfs] loglikes (jit-able)."""
        W, mask, M = self.stacked()
        return _loglikes_stacked(feats, W, self.num_pdfs)

    def loglikes_numpy(self, feats: np.ndarray) -> np.ndarray:
        """CPU oracle for tests: [T, D] → [T, num_pdfs]."""
        return np.stack([p.loglikes(feats) for p in self.pdfs], axis=1)

    # -- serialization (reference am-diag-gmm.cc: no outer wrapper token) ----
    def write(self, f) -> None:
        iof.write_token(f, "<DIMENSION>")
        iof.write_int32(f, self.dim)
        iof.write_token(f, "<NUMPDFS>")
        iof.write_int32(f, self.num_pdfs)
        for pdf in self.pdfs:
            pdf.write(f)

    @staticmethod
    def read(f) -> "AmDiagGmm":
        iof.expect_token(f, "<DIMENSION>")
        dim = iof.read_int32(f)
        iof.expect_token(f, "<NUMPDFS>")
        n = iof.read_int32(f)
        pdfs = []
        for _ in range(n):
            g = DiagGmm.read(f)
            if g.dim != dim:
                raise KaldiError(
                    f"AmDiagGmm.read: pdf dim {g.dim} != header dim {dim}"
                )
            pdfs.append(g)
        return AmDiagGmm(pdfs)


class AmGmmModel:
    """(TransitionModel, AmDiagGmm) bundle — the `final.mdl` equivalent."""

    def __init__(self, tm, am: AmDiagGmm):
        self.tm = tm
        self.am = am

    def write(self, f) -> None:
        """final.mdl byte layout: TransitionModel then AmDiagGmm, no extra
        wrapper (reference gmm-init-* / gmm-est output files)."""
        self.tm.write(f)
        self.am.write(f)

    @staticmethod
    def read(f) -> "AmGmmModel":
        from old_kaldi_git_tpu.hmm.transition_model import TransitionModel

        tm = TransitionModel.read(f)
        am = AmDiagGmm.read(f)
        return AmGmmModel(tm, am)

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            iof.init_kaldi_output_stream(f, True)
            self.write(f)

    @staticmethod
    def load(path: str) -> "AmGmmModel":
        with open(path, "rb") as f:
            if not iof.init_kaldi_input_stream(f):
                raise KaldiError("AmGmmModel.load: expected binary stream")
            return AmGmmModel.read(f)


@partial(jax.jit, static_argnames=("P",))
def _loglikes_stacked(x: jnp.ndarray, W: jnp.ndarray, P: int) -> jnp.ndarray:
    """AmDiagGmm.loglikes_batch body as ONE fused program (a GMM align
    pass calls this per corpus chunk; eager per-op dispatch over a
    tunneled backend costs more than the compute)."""
    M = W.shape[0] // P
    ext = jnp.concatenate(
        [x, jnp.square(x), jnp.ones(x.shape[:-1] + (1,), x.dtype)], axis=-1
    )
    # HIGHEST: default TPU matmul rounds inputs to bf16, costing
    # ~0.3 nats of absolute loglike error at ~1e2 magnitudes
    # (bench.verify_kernels vs the f64 host oracle, r5); the
    # contraction K = 2D+1 is far below the 128-lane MXU width, so
    # extra passes are nearly free here
    comp = jnp.matmul(ext, W.T, precision=jax.lax.Precision.HIGHEST)
    comp = comp.reshape(comp.shape[:-1] + (P, M))
    cmax = jnp.max(comp, axis=-1, keepdims=True)
    return cmax[..., 0] + jnp.log(jnp.sum(jnp.exp(comp - cmax), axis=-1))
