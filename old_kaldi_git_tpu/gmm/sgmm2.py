"""SGMM2: subspace Gaussian mixture acoustic models.

Reference parity: src/sgmm2/am-sgmm2.{h,cc} (AmSgmm2),
estimate-am-sgmm2.{h,cc} (MleAmSgmm2Accs / MleAmSgmm2Updater) and the
sgmm2bin tool family (sgmm2-init, sgmm2-acc-stats, sgmm2-est,
sgmm2-align-compiled, sgmm2-latgen-faster, sgmm2-info).

Model (Povey et al., "The subspace Gaussian mixture model", 2011):
a shared pool of I full-covariance Gaussians; per Gaussian a phonetic
subspace M_i [D, S] and a weight projection w_i [S]; per pdf j a set of
substate vectors v_jm [S] with substate weights c_jm.  Then

  mean_jmi  = M_i v_jm
  w_jmi     = softmax_i(w_i . v_jm)
  p(x|j)    = sum_m c_jm sum_i w_jmi N(x; mean_jmi, Sigma_i)

Per-frame evaluation factorizes into shared per-Gaussian terms
  a_i(x) = C_i - 0.5 x' Sigma_i^{-1} x       (frame-dependent, state-free)
  z_i(x) = M_i' Sigma_i^{-1} x               [S]
and per-(j,m,i) constants -0.5 v' H_i v with H_i = M_i' Sigma_i^{-1} M_i,
so scoring is a batch of dense einsums over [T, I, S] x [JM, S] — exactly
the MXU-shaped computation the TPU wants (no per-Gaussian scalar loops).

Speaker subspace (reference src/sgmm2/am-sgmm2.cc speaker-space code,
estimate-am-sgmm2.cc UpdateN, fmllr-sgmm2 aside): optional per-Gaussian
speaker projections N_i [D, T] with a per-speaker vector v_s [T], so the
adapted mean is  mean_jmi(s) = M_i v_jm + N_i v_s.  Scoring subtracts the
per-Gaussian offset o_i = N_i v_s from the features before the shared
quadratic/projection terms (mathematically exact, keeps the einsum
factorization); v_s is estimated per speaker by a closed-form solve over
the speaker's aligned frames (`estimate_spk_vector`, the
sgmm2-est-spkvecs role) and N_i by the Y_N Q_N^{-1} system (flag 'N').

Symmetric SGMM (reference estimate-am-sgmm2.cc UpdateU, the u_i
speaker-dependent weight term of Povey et al. 2011 sec. "symmetric
SGMM"): optional per-Gaussian weight projections u_i [T_spk] so the
mixture weights themselves become speaker-dependent,

  w_jmi(s) = exp(w_i . v_jm + u_i . v_s) / sum_i' exp(w_i' . v_jm + u_i' . v_s)

The per-speaker log-weight bias b_i(s) = u_i . v_s shifts every
substate's pre-softmax weight row identically, so scoring re-normalizes
the cached [JM, I] weight logits once per speaker (exact, no per-frame
cost).  u_i is estimated from per-speaker occupancy vs expected-weight
stats (a_u gradient, Q_u quadratic with the reference's max(gamma, what)
safeguard), flag 'u'; the v_s solve gains the matching weight-term
gradient/curvature when u is present.

Scope notes vs the reference (documented, deliberate):
- SGMM fMLLR is omitted; feature-side adaptation in this build goes
  through the shared fMLLR/basis/regtree machinery instead.
- the v_jm update solves the means term exactly (sum_i gamma H_i) v = y_jm
  and then refreshes the weight projections; the reference folds a
  second-order weight term into the same solve.
Both cut model capacity slightly but keep every training/decoding tool
functional; the EM auxiliary is asserted non-decreasing in tests.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from old_kaldi_git_tpu.gmm.full_gmm import FullGmm
from old_kaldi_git_tpu.utils.io_funcs import (
    expect_token,
    init_kaldi_input_stream,
    init_kaldi_output_stream,
    read_int32,
    read_matrix,
    read_vector,
    write_int32,
    write_matrix,
    write_token,
    write_vector,
)
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger

log = get_logger("sgmm2")


class AmSgmm2:
    """Shared Gaussian pool + per-state substate vectors."""

    def __init__(self, M: np.ndarray, w: np.ndarray, sigma_inv: np.ndarray,
                 v: List[np.ndarray], c: List[np.ndarray],
                 ubm: Optional[FullGmm] = None,
                 N: Optional[np.ndarray] = None,
                 u: Optional[np.ndarray] = None):
        self.M = np.asarray(M, np.float64)              # [I, D, S]
        self.w = np.asarray(w, np.float64)              # [I, S]
        self.sigma_inv = np.asarray(sigma_inv, np.float64)  # [I, D, D]
        self.v = [np.asarray(x, np.float64) for x in v]  # per pdf [Mj, S]
        self.c = [np.asarray(x, np.float64) for x in c]  # per pdf [Mj]
        self.ubm = ubm
        # speaker subspace [I, D, Tspk] (None: no speaker adaptation)
        self.N = None if N is None else np.asarray(N, np.float64)
        # symmetric-SGMM speaker weight projections [I, Tspk] (optional)
        self.u = None if u is None else np.asarray(u, np.float64)
        self._shared = None
        self._stacked = None

    # -- shapes -------------------------------------------------------------
    @property
    def num_gauss(self) -> int:
        return self.M.shape[0]

    @property
    def dim(self) -> int:
        return self.M.shape[1]

    @property
    def phn_dim(self) -> int:
        return self.M.shape[2]

    @property
    def num_pdfs(self) -> int:
        return len(self.v)

    @property
    def num_substates(self) -> int:
        return sum(len(x) for x in self.v)

    @property
    def spk_dim(self) -> int:
        return 0 if self.N is None else self.N.shape[2]

    def invalidate(self) -> None:
        self._shared = None
        self._stacked = None

    # -- init ------------------------------------------------------------------
    @staticmethod
    def init(ubm: FullGmm, num_pdfs: int,
             phn_dim: Optional[int] = None) -> "AmSgmm2":
        """sgmm2-init: M_i = [mu_i | I_D] (so v = e1 reproduces the UBM
        mean), w_i = 0, Sigma_i from the UBM, one substate per pdf."""
        I, D = ubm.num_mix, ubm.dim
        S = phn_dim or D + 1
        if S < 1 or S > D + 1:
            raise KaldiError(f"phn_dim must be in [1, D+1], got {S}")
        M = np.zeros((I, D, S))
        M[:, :, 0] = ubm.means
        M[:, :, 1:] = np.broadcast_to(np.eye(D)[:, :S - 1], (I, D, S - 1))
        sigma_inv = np.stack([
            np.linalg.inv(ubm.covars[i] + 1e-6 * np.eye(D)) for i in range(I)
        ])
        v0 = np.zeros(S)
        v0[0] = 1.0
        v = [v0[None, :].copy() for _ in range(num_pdfs)]
        c = [np.ones(1) for _ in range(num_pdfs)]
        return AmSgmm2(M, np.zeros((I, S)), sigma_inv, v, c, ubm)

    def init_speaker_subspace(self, spk_dim: int,
                              symmetric: bool = False) -> None:
        """sgmm2-init --spk-space-dim: N_i = first `spk_dim` identity
        columns (so v_s directly offsets the leading feature dims at init;
        EM rotates it into the real speaker directions).  With
        `symmetric` (sgmm2-init --symmetric role) also allocates the
        speaker weight projections u_i = 0 (no bias until flag 'u'
        training moves them)."""
        I, D, _ = self.M.shape
        if spk_dim < 1 or spk_dim > D:
            raise KaldiError(f"spk_dim must be in [1, D], got {spk_dim}")
        self.N = np.broadcast_to(
            np.eye(D)[:, :spk_dim], (I, D, spk_dim)).copy()
        if symmetric:
            self.u = np.zeros((I, spk_dim))
        self.invalidate()

    def spk_offsets(self, spk_vec: Optional[np.ndarray]) -> Optional[np.ndarray]:
        """Per-Gaussian mean offsets o_i = N_i v_s  [I, D] (None ≡ zeros)."""
        if self.N is None or spk_vec is None:
            return None
        vs = np.asarray(spk_vec, np.float64)
        if vs.shape != (self.spk_dim,):
            raise KaldiError(
                f"speaker vector dim {vs.shape} vs spk_dim {self.spk_dim}")
        return np.einsum("idt,t->id", self.N, vs)

    def spk_weight_bias(self, spk_vec: Optional[np.ndarray]
                        ) -> Optional[np.ndarray]:
        """Symmetric-SGMM per-Gaussian log-weight bias b_i = u_i . v_s
        [I] (None when the model is not symmetric or no speaker vec)."""
        if self.u is None or spk_vec is None:
            return None
        vs = np.asarray(spk_vec, np.float64)
        if vs.shape != (self.spk_dim,):
            raise KaldiError(
                f"speaker vector dim {vs.shape} vs spk_dim {self.spk_dim}")
        return self.u @ vs

    def spk_logweights(self, spk_bias: Optional[np.ndarray]) -> np.ndarray:
        """[JM, I] normalized log mixture weights, re-normalized with the
        speaker bias when given (exact: the bias shifts every substate's
        logit row identically, only the softmax normalizer moves)."""
        _, _, _, _, aw, logw = self._stacked_states()
        if spk_bias is None:
            return logw
        a = aw + np.asarray(spk_bias, np.float64)[None, :]
        return a - _logsumexp(a, axis=1, keepdims=True)

    # -- shared precomputations ---------------------------------------------------
    def shared(self):
        """(H [I,S,S], C [I] log-normalizers, MtSi [I,S,D]) cached."""
        if self._shared is None:
            I, D, S = self.M.shape
            MtSi = np.einsum("ids,ide->ise", self.M, self.sigma_inv)  # M'Σ⁻¹
            H = np.einsum("isd,idt->ist", MtSi, self.M)
            sign, logdet = np.linalg.slogdet(self.sigma_inv)
            if not (sign > 0).all():
                raise KaldiError("Sigma_inv not positive definite")
            C = -0.5 * (D * np.log(2 * np.pi) - logdet)
            self._shared = (H, C, MtSi)
        return self._shared

    def _stacked_states(self):
        """(V [JM,S], logc [JM], owner [JM], bilin [JM,I], aw [JM,I] raw
        weight logits, logw [JM,I] normalized); cached — these are
        feature-independent per-state constants rebuilt only after
        invalidate() (the decode path calls loglikes per utterance).  The
        raw logits are kept so symmetric-SGMM speaker biases can
        re-normalize without rebuilding (spk_logweights)."""
        if getattr(self, "_stacked", None) is not None:
            return self._stacked
        H, _, _ = self.shared()
        V = np.concatenate(self.v, axis=0)
        logc = np.concatenate([
            np.log(np.maximum(cj / max(cj.sum(), 1e-20), 1e-20))
            for cj in self.c])
        owner = np.concatenate([
            np.full(len(vj), j) for j, vj in enumerate(self.v)])
        # -1/2 v' H_i v  [JM, I]
        bilin = -0.5 * np.einsum("ms,ist,mt->mi", V, H, V)
        aw = V @ self.w.T  # [JM, I]
        logw = aw - _logsumexp(aw, axis=1, keepdims=True)
        self._stacked = (V, logc, owner.astype(np.int64), bilin, aw, logw)
        return self._stacked

    # -- evaluation -----------------------------------------------------------------
    def frame_terms(self, feats: np.ndarray,
                    spk_offsets: Optional[np.ndarray] = None):
        """a [T, I] frame quadratic terms and z [T, I, S] projections.
        With speaker offsets o [I, D] the terms are those of the shifted
        features x - o_i (exact: N(x; Mv + o, Σ) = N(x - o; Mv, Σ))."""
        x = np.asarray(feats, np.float64)
        H, C, MtSi = self.shared()
        quad = np.einsum("td,ide,te->ti", x, self.sigma_inv, x)
        a = C[None, :] - 0.5 * quad
        z = np.einsum("isd,td->tis", MtSi, x)
        if spk_offsets is not None:
            o = np.asarray(spk_offsets, np.float64)  # [I, D]
            sig_o = np.einsum("ide,ie->id", self.sigma_inv, o)  # Σ⁻¹o
            a = a + x @ sig_o.T - 0.5 * np.einsum("id,id->i", o, sig_o)[None]
            z = z - np.einsum("isd,id->is", MtSi, o)[None]
        return a, z

    def loglikes_numpy(self, feats: np.ndarray, chunk: int = 256,
                       spk_vec: Optional[np.ndarray] = None) -> np.ndarray:
        """[T, D] → [T, num_pdfs] (DecodableAmSgmm2 role; dense over the
        Gaussian pool — gselect pruning matters for I >> 100, the batched
        einsum is already the TPU-friendly form).  `spk_vec` applies the
        speaker subspace (decode with sgmm2-est-spkvecs output)."""
        x = np.asarray(feats, np.float64)
        off = self.spk_offsets(spk_vec)
        V, logc, owner, bilin, _, _ = self._stacked_states()
        logw = self.spk_logweights(self.spk_weight_bias(spk_vec))
        J = self.num_pdfs
        out = np.empty((len(x), J))
        for lo in range(0, len(x), chunk):
            a, z = self.frame_terms(x[lo:lo + chunk], off)
            # [t, jm, i]
            s = (a[:, None, :] + np.einsum("tis,ms->tmi", z, V)
                 + (bilin + logw + logc[:, None])[None, :, :])
            comp = _logsumexp(s, axis=2)  # [t, jm]
            for j in range(J):
                sel = owner == j
                out[lo:lo + len(a), j] = _logsumexp(comp[:, sel], axis=1)
        return out

    def loglikes_batch(self, feats, spk_vecs=None) -> np.ndarray:
        """[B, T, D] → [B, T, num_pdfs]: the decodable contract shared with
        AmDiagGmm (feeds the batched aligner/decoder).  Host einsums here;
        the same arithmetic jits unchanged if the SGMM2 path ever becomes
        hot (it is not in any BASELINE config).  `spk_vecs` is an optional
        per-utterance list of speaker vectors (None entries = unadapted)."""
        x = np.asarray(feats, np.float64)
        return np.stack([
            self.loglikes_numpy(
                x[b], spk_vec=None if spk_vecs is None else spk_vecs[b])
            for b in range(len(x))
        ])

    def component_posteriors(self, feats: np.ndarray, pdf: int,
                             spk_offsets: Optional[np.ndarray] = None,
                             spk_bias: Optional[np.ndarray] = None
                             ) -> np.ndarray:
        """[T, Mj, I] responsibilities within one pdf.  `spk_bias` [I] is
        the symmetric-SGMM log-weight bias (spk_weight_bias)."""
        x = np.asarray(feats, np.float64)
        a, z = self.frame_terms(x, spk_offsets)
        H, _, _ = self.shared()
        V = self.v[pdf]
        cj = self.c[pdf] / max(self.c[pdf].sum(), 1e-20)
        bilin = -0.5 * np.einsum("ms,ist,mt->mi", V, H, V)
        aw = V @ self.w.T
        if spk_bias is not None:
            aw = aw + np.asarray(spk_bias, np.float64)[None, :]
        logw = aw - _logsumexp(aw, axis=1, keepdims=True)
        s = (a[:, None, :] + np.einsum("tis,ms->tmi", z, V)
             + (bilin + logw + np.log(np.maximum(cj, 1e-20))[:, None])[None])
        flat = s.reshape(len(x), -1)
        flat = flat - _logsumexp(flat, axis=1, keepdims=True)
        return np.exp(flat).reshape(s.shape)

    # -- serialization -----------------------------------------------------------
    def write(self, f) -> None:
        write_token(f, "<AmSgmm2>")
        write_int32(f, self.num_gauss)
        write_int32(f, self.dim)
        write_int32(f, self.phn_dim)
        write_int32(f, self.num_pdfs)
        for i in range(self.num_gauss):
            write_matrix(f, self.M[i].astype(np.float32))
        write_matrix(f, self.w.astype(np.float32))
        for i in range(self.num_gauss):
            write_matrix(f, self.sigma_inv[i].astype(np.float32))
        for j in range(self.num_pdfs):
            write_matrix(f, self.v[j].astype(np.float32))
            write_vector(f, self.c[j].astype(np.float32))
        write_int32(f, self.spk_dim)
        if self.N is not None:
            for i in range(self.num_gauss):
                write_matrix(f, self.N[i].astype(np.float32))
        write_int32(f, 1 if self.u is not None else 0)
        if self.u is not None:
            write_matrix(f, self.u.astype(np.float32))
        write_int32(f, 1 if self.ubm is not None else 0)
        if self.ubm is not None:
            self.ubm.write(f)
        write_token(f, "</AmSgmm2>")

    @staticmethod
    def read(f) -> "AmSgmm2":
        expect_token(f, "<AmSgmm2>")
        I = read_int32(f)
        D = read_int32(f)
        S = read_int32(f)
        J = read_int32(f)
        M = np.stack([read_matrix(f) for _ in range(I)])
        w = read_matrix(f)
        sigma_inv = np.stack([read_matrix(f) for _ in range(I)])
        v, c = [], []
        for _ in range(J):
            v.append(np.asarray(read_matrix(f), np.float64))
            c.append(np.asarray(read_vector(f), np.float64))
        spk_dim = read_int32(f)
        N = (np.stack([read_matrix(f) for _ in range(I)])
             if spk_dim > 0 else None)
        u = (np.asarray(read_matrix(f), np.float64)
             if read_int32(f) else None)
        ubm = FullGmm.read(f) if read_int32(f) else None
        expect_token(f, "</AmSgmm2>")
        out = AmSgmm2(M, w, sigma_inv, v, c, ubm, N=N, u=u)
        if out.dim != D or out.phn_dim != S:
            raise KaldiError("inconsistent AmSgmm2 header")
        return out


def _logsumexp(a: np.ndarray, axis: int, keepdims: bool = False) -> np.ndarray:
    m = np.max(a, axis=axis, keepdims=True)
    m = np.where(np.isfinite(m), m, 0.0)
    out = m + np.log(np.sum(np.exp(a - m), axis=axis, keepdims=True))
    return out if keepdims else np.squeeze(out, axis=axis)


# ---------------------------------------------------------------------------
# EM
# ---------------------------------------------------------------------------


class MleAmSgmm2Accs:
    """Sufficient statistics (MleAmSgmm2Accs): per-substate gamma/y, shared
    Y/Q/S scatter per Gaussian."""

    def __init__(self, model: AmSgmm2):
        I, D, S = model.M.shape
        self.gamma = [np.zeros((len(vj), I)) for vj in model.v]
        self.y = [np.zeros((len(vj), S)) for vj in model.v]
        self.Y = np.zeros((I, D, S))
        self.Q = np.zeros((I, S, S))
        self.S = np.zeros((I, D, D))
        # speaker-subspace stats (UpdateN system): N_i = Y_N_i Q_N_i^{-1}
        T_spk = model.spk_dim
        self.Y_N = np.zeros((I, D, T_spk)) if T_spk else None
        self.Q_N = np.zeros((I, T_spk, T_spk)) if T_spk else None
        # symmetric-SGMM stats (UpdateU): a_u gradient rows, Q_u quadratic
        has_u = model.u is not None
        self.a_u = np.zeros((I, T_spk)) if has_u and T_spk else None
        self.Q_u = np.zeros((I, T_spk, T_spk)) if has_u and T_spk else None
        self.total_frames = 0.0
        self.total_like = 0.0

    def accumulate(self, model: AmSgmm2, feats: np.ndarray,
                   pdf_ids: np.ndarray, weights=None,
                   spk_vec: Optional[np.ndarray] = None) -> None:
        """Accumulate one utterance (or one speaker's worth) of aligned
        frames.  With `spk_vec` (and a model speaker subspace) the phonetic
        stats are collected on the speaker-shifted features x - N_i v_s
        (exact canonicalization), and Y_N/Q_N collect the UpdateN system."""
        x = np.asarray(feats, np.float64)
        pdf_ids = np.asarray(pdf_ids)
        wts = (np.ones(len(x)) if weights is None
               else np.asarray(weights, np.float64))
        off = model.spk_offsets(spk_vec)  # [I, D] or None
        bias = model.spk_weight_bias(spk_vec)  # [I] or None
        _, z = model.frame_terms(x, off)
        ll = model.loglikes_numpy(x, spk_vec=spk_vec)
        vs = None if spk_vec is None else np.asarray(spk_vec, np.float64)
        # symmetric-SGMM per-call (≡ per-speaker) weight stats
        collect_u = (self.a_u is not None and vs is not None)
        gamma_i_s = np.zeros(model.num_gauss) if collect_u else None
        what_i_s = np.zeros(model.num_gauss) if collect_u else None
        for j in np.unique(pdf_ids):
            sel = pdf_ids == j
            xs, zs, ws = x[sel], z[sel], wts[sel]
            post = model.component_posteriors(
                xs, int(j), off, spk_bias=bias)  # [t, Mj, I]
            post = post * ws[:, None, None]
            g = post.sum(axis=0)  # [Mj, I]
            self.gamma[j] += g
            self.y[j] += np.einsum("tmi,tis->ms", post, zs)
            self.Y += np.einsum("tmi,td,ms->ids", post, xs, model.v[j])
            self.Q += np.einsum("mi,ms,mt->ist", g, model.v[j], model.v[j])
            # RAW data scatter: the covariance M-step re-centres it exactly
            # around the UPDATED means via S - MY' - YM' + MQM' (the
            # reference UpdateVars identity), so mean movement between
            # E and M steps cannot corrupt the variances
            gi = post.sum(axis=1)  # [t, I]
            self.S += np.einsum("ti,td,te->ide", gi, xs, xs)
            if off is not None:
                # shift Y and S to the speaker-canonical features x - o_i
                gv = g.T @ model.v[j]          # [I, S] Σ_m γ_mi v_jm
                gsum = g.sum(axis=0)           # [I]
                xw = np.einsum("ti,td->id", gi, xs)  # [I, D]
                self.Y -= np.einsum("id,is->ids", off, gv)
                self.S -= (np.einsum("id,ie->ide", off, xw)
                           + np.einsum("id,ie->ide", xw, off))
                self.S += gsum[:, None, None] * np.einsum(
                    "id,ie->ide", off, off)
                # UpdateN system: residual vs the UNSHIFTED phonetic mean
                r = xw - np.einsum("ids,is->id", model.M, gv)  # [I, D]
                self.Y_N += np.einsum("id,t->idt", r, vs)
                self.Q_N += gsum[:, None, None] * np.outer(vs, vs)[None]
            if collect_u:
                # observed per-Gaussian occupancy for this speaker, and
                # the model-expected weight mass: sum_m gamma_jm. w_jmi(s)
                gamma_i_s += g.sum(axis=0)
                aw_j = model.v[int(j)] @ model.w.T + bias[None, :]
                wjmi = np.exp(aw_j - _logsumexp(aw_j, axis=1, keepdims=True))
                what_i_s += (g.sum(axis=1)[:, None] * wjmi).sum(axis=0)
            self.total_like += float(
                (ll[sel, j] * ws).sum())
            self.total_frames += float(ws.sum())
        if collect_u:
            # dQ/du_i = sum_s (gamma_i(s) - what_i(s)) v_s ; curvature with
            # the reference's max(gamma, what) safeguard (UpdateU)
            self.a_u += np.outer(gamma_i_s - what_i_s, vs)
            self.Q_u += (np.maximum(gamma_i_s, what_i_s)[:, None, None]
                         * np.outer(vs, vs)[None])

    def add(self, other: "MleAmSgmm2Accs") -> None:
        for j in range(len(self.gamma)):
            self.gamma[j] += other.gamma[j]
            self.y[j] += other.y[j]
        self.Y += other.Y
        self.Q += other.Q
        self.S += other.S
        if self.Y_N is not None and other.Y_N is not None:
            self.Y_N += other.Y_N
            self.Q_N += other.Q_N
        if self.a_u is not None and other.a_u is not None:
            self.a_u += other.a_u
            self.Q_u += other.Q_u
        self.total_frames += other.total_frames
        self.total_like += other.total_like

    # -- serialization ----------------------------------------------------------
    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            init_kaldi_output_stream(f, True)
            write_token(f, "<Sgmm2Accs>")
            write_int32(f, len(self.gamma))
            for j in range(len(self.gamma)):
                write_matrix(f, self.gamma[j], np.float64)
                write_matrix(f, self.y[j], np.float64)
            for name, arr in (("Y", self.Y), ("Q", self.Q), ("S", self.S)):
                write_token(f, f"<{name}>")
                for i in range(len(arr)):
                    write_matrix(f, arr[i], np.float64)
            write_int32(f, 0 if self.Y_N is None else self.Y_N.shape[2])
            if self.Y_N is not None:
                for name, arr in (("YN", self.Y_N), ("QN", self.Q_N)):
                    write_token(f, f"<{name}>")
                    for i in range(len(arr)):
                        write_matrix(f, arr[i], np.float64)
            write_int32(f, 0 if self.a_u is None else 1)
            if self.a_u is not None:
                write_token(f, "<AU>")
                write_matrix(f, self.a_u, np.float64)
                write_token(f, "<QU>")
                for i in range(len(self.Q_u)):
                    write_matrix(f, self.Q_u[i], np.float64)
            write_vector(f, np.asarray(
                [self.total_frames, self.total_like]), np.float64)
            write_token(f, "</Sgmm2Accs>")

    @staticmethod
    def load(path: str, model: AmSgmm2) -> "MleAmSgmm2Accs":
        out = MleAmSgmm2Accs(model)
        with open(path, "rb") as f:
            init_kaldi_input_stream(f)
            expect_token(f, "<Sgmm2Accs>")
            J = read_int32(f)
            if J != model.num_pdfs:
                raise KaldiError("acc/model pdf mismatch")
            for j in range(J):
                g = np.asarray(read_matrix(f), np.float64)
                if g.shape != out.gamma[j].shape:
                    raise KaldiError(
                        f"acc pdf {j}: {g.shape[0]} substates in file, "
                        f"model has {out.gamma[j].shape[0]} — accs must "
                        "come from the same substate topology")
                out.gamma[j] = g
                out.y[j] = np.asarray(read_matrix(f), np.float64)
            for name, arr in (("Y", out.Y), ("Q", out.Q), ("S", out.S)):
                expect_token(f, f"<{name}>")
                for i in range(len(arr)):
                    arr[i] = read_matrix(f)
            t_spk = read_int32(f)
            if t_spk:
                if out.Y_N is None or out.Y_N.shape[2] != t_spk:
                    raise KaldiError("acc/model speaker-subspace mismatch")
                for name, arr in (("YN", out.Y_N), ("QN", out.Q_N)):
                    expect_token(f, f"<{name}>")
                    for i in range(len(arr)):
                        arr[i] = read_matrix(f)
            if read_int32(f):
                if out.a_u is None:
                    raise KaldiError("acc has symmetric-SGMM stats but "
                                     "model has no u (not symmetric)")
                expect_token(f, "<AU>")
                out.a_u = np.asarray(read_matrix(f), np.float64)
                expect_token(f, "<QU>")
                for i in range(len(out.Q_u)):
                    out.Q_u[i] = read_matrix(f)
            tots = read_vector(f)
            out.total_frames, out.total_like = float(tots[0]), float(tots[1])
            expect_token(f, "</Sgmm2Accs>")
        return out


@dataclasses.dataclass
class Sgmm2UpdateOptions:
    """Like the reference's --update-flags.  IMPORTANT: 'v' (state vectors)
    and 'M' (subspace matrices) must not be updated from the SAME stats —
    both moves correct the same mean discrepancy and the combined step
    overshoots (measured: likelihood diverges within 3 iterations on
    synthetic data).  Alternate them across iterations instead
    (train_sgmm2's schedule): even iterations 'vwc', odd 'MS'."""

    update_flags: str = "vwc"
    min_gaussian_occupancy: float = 10.0
    min_substate_occupancy: float = 2.0
    cov_floor: float = 1e-3
    w_newton_steps: int = 3


def alternating_flags(iteration: int) -> str:
    """The stable per-iteration update schedule (see Sgmm2UpdateOptions)."""
    return "vwc" if iteration % 2 == 0 else "MS"


def sgmm2_update(model: AmSgmm2, accs: MleAmSgmm2Accs,
                 opts: Sgmm2UpdateOptions = Sgmm2UpdateOptions()) -> float:
    """M-step (MleAmSgmm2Updater::Update).  Returns avg like/frame of the
    accumulated data under the PRE-update model (for progress logs)."""
    I, D, S = model.M.shape
    flags = opts.update_flags
    if "v" in flags and "M" in flags:
        log.warning("updating 'v' and 'M' from the same stats overshoots "
                    "(see Sgmm2UpdateOptions); use alternating_flags()")
    H, _, _ = model.shared()

    if "v" in flags:
        for j in range(model.num_pdfs):
            for m in range(len(model.v[j])):
                g = accs.gamma[j][m]  # [I]
                if g.sum() < opts.min_substate_occupancy:
                    continue
                A = np.einsum("i,ist->st", g, H)
                model.v[j][m] = np.linalg.solve(
                    A + 1e-6 * np.eye(S), accs.y[j][m])

    if "M" in flags:
        for i in range(I):
            occ = sum(float(accs.gamma[j][:, i].sum())
                      for j in range(model.num_pdfs))
            if occ < opts.min_gaussian_occupancy:
                continue
            model.M[i] = accs.Y[i] @ np.linalg.inv(
                accs.Q[i] + 1e-6 * np.eye(S))

    if "S" in flags:
        for i in range(I):
            occ = sum(float(accs.gamma[j][:, i].sum())
                      for j in range(model.num_pdfs))
            if occ < opts.min_gaussian_occupancy:
                continue
            # exact re-centring around the (possibly just-updated) M_i with
            # the v's the stats were collected under:
            # sum gamma (x - Mv)(x - Mv)' = S - MY' - YM' + MQM'
            Mi = model.M[i]
            cov = (accs.S[i] - Mi @ accs.Y[i].T - accs.Y[i] @ Mi.T
                   + Mi @ accs.Q[i] @ Mi.T) / occ
            cov = 0.5 * (cov + cov.T) + opts.cov_floor * np.eye(D)
            model.sigma_inv[i] = np.linalg.inv(cov)

    if "N" in flags and model.N is not None:
        if accs.Y_N is None:
            raise KaldiError("flag 'N' needs speaker-subspace stats "
                             "(accumulate with spk_vec)")
        T_spk = model.spk_dim
        for i in range(I):
            occ = float(np.trace(accs.Q_N[i]))  # Σ γ |v_s|² proxy for data
            if occ < 1e-8:
                continue
            model.N[i] = accs.Y_N[i] @ np.linalg.inv(
                accs.Q_N[i] + 1e-6 * np.eye(T_spk))

    if "u" in flags and model.u is not None:
        if accs.a_u is None:
            raise KaldiError("flag 'u' needs symmetric-SGMM stats "
                             "(accumulate with spk_vec on a symmetric "
                             "model)")
        T_spk = model.spk_dim
        for i in range(I):
            occ = float(np.trace(accs.Q_u[i]))  # Σ max(γ,ŵ) |v_s|²
            if occ < 1e-8:
                continue
            # Newton-ish step on the weight auxiliary with the
            # max(gamma, what) curvature safeguard (reference UpdateU);
            # the smoothing term bounds the step for ill-conditioned
            # speaker-vector scatter
            model.u[i] += np.linalg.solve(
                accs.Q_u[i] + (1e-6 + 1e-2 * occ / T_spk) * np.eye(T_spk),
                accs.a_u[i])

    if "w" in flags:
        _update_weight_projections(model, accs, opts.w_newton_steps)

    if "c" in flags:
        for j in range(model.num_pdfs):
            g = accs.gamma[j].sum(axis=1)  # [Mj]
            tot = g.sum()
            if tot > 0:
                model.c[j] = np.maximum(g / tot, 1e-8)

    model.invalidate()
    avg = (accs.total_like / accs.total_frames
           if accs.total_frames else float("nan"))
    log.info("sgmm2-est: avg like/frame %.4f over %.0f frames "
             "(%d substates)", avg, accs.total_frames, model.num_substates)
    return avg


def _update_weight_projections(model: AmSgmm2, accs: MleAmSgmm2Accs,
                               steps: int) -> None:
    """Gradient steps with halving on the weight auxiliary
    F(w) = sum_jmi gamma_jmi log softmax_i(w_i . v_jm)."""
    V = np.concatenate(model.v, axis=0)  # [JM, S]
    G = np.concatenate(accs.gamma, axis=0)  # [JM, I]
    tot = G.sum(axis=1, keepdims=True)  # [JM, 1]

    def aux(w):
        a = V @ w.T
        logw = a - _logsumexp(a, axis=1, keepdims=True)
        return float((G * logw).sum())

    w = model.w.copy()
    f0 = aux(w)
    for _ in range(steps):
        a = V @ w.T
        logw = a - _logsumexp(a, axis=1, keepdims=True)
        # dF/dw_i = sum_jm (gamma_jmi - gamma_jm. * w_jmi) v_jm
        coef = G - tot * np.exp(logw)  # [JM, I]
        grad = coef.T @ V  # [I, S]
        denom = max(float(tot.sum()), 1.0)
        step = 1.0
        while step > 1e-4:
            cand = w + step * grad / denom
            if aux(cand) >= f0 - 1e-9:
                w = cand
                f0 = aux(w)
                break
            step *= 0.5
    model.w = w


def estimate_spk_vector(model: AmSgmm2, feats: np.ndarray,
                        pdf_ids: np.ndarray, weights=None,
                        num_iters: int = 2,
                        min_count: float = 10.0) -> np.ndarray:
    """Per-speaker vector v_s (sgmm2-est-spkvecs role): closed-form solve
    of the speaker-subspace auxiliary over the speaker's aligned frames,

        (Σ_i γ_i N_i'Σ⁻¹N_i) v_s = Σ_i N_i'Σ⁻¹ Σ_t γ_ti (x_t − M_i v̄_i)

    iterated because the posteriors themselves depend on v_s (2 iterations
    match the reference's default behaviour of re-estimating once per
    decode pass).  Returns zeros when the speaker has < min_count frames
    of occupancy (no reliable estimate)."""
    if model.N is None:
        raise KaldiError("model has no speaker subspace")
    x = np.asarray(feats, np.float64)
    pdf_ids = np.asarray(pdf_ids)
    wts = (np.ones(len(x)) if weights is None
           else np.asarray(weights, np.float64))
    I, D, _ = model.M.shape
    T_spk = model.spk_dim
    NtSi = np.einsum("idt,ide->ite", model.N, model.sigma_inv)  # N'Σ⁻¹
    H_spk = np.einsum("ite,ieu->itu", NtSi, model.N)  # [I, T_spk, T_spk]
    vs = np.zeros(T_spk)
    for _ in range(max(1, num_iters)):
        off = model.spk_offsets(vs)
        bias = model.spk_weight_bias(vs)
        lhs = np.zeros((T_spk, T_spk))
        rhs = np.zeros(T_spk)
        tot = 0.0
        gamma_i = np.zeros(I)
        what_i = np.zeros(I)
        for j in np.unique(pdf_ids):
            sel = pdf_ids == j
            xs, ws = x[sel], wts[sel]
            post = model.component_posteriors(xs, int(j), off,
                                              spk_bias=bias)
            post = post * ws[:, None, None]
            g = post.sum(axis=0)                    # [Mj, I]
            gi = post.sum(axis=1)                   # [t, I]
            gsum = g.sum(axis=0)                    # [I]
            xw = np.einsum("ti,td->id", gi, xs)     # [I, D]
            gv = g.T @ model.v[j]                   # [I, S]
            r = xw - np.einsum("ids,is->id", model.M, gv)  # [I, D]
            lhs += np.einsum("i,itu->tu", gsum, H_spk)
            rhs += np.einsum("ite,ie->t", NtSi, r)
            tot += float(gsum.sum())
            if model.u is not None:
                gamma_i += gsum
                aw_j = model.v[j] @ model.w.T + bias[None, :]
                wjmi = np.exp(aw_j - _logsumexp(aw_j, axis=1,
                                                keepdims=True))
                what_i += (g.sum(axis=1)[:, None] * wjmi).sum(axis=0)
        if tot < min_count:
            return np.zeros(T_spk)
        if model.u is not None:
            # symmetric term: the mean part is exactly quadratic in v_s,
            # the weight part is linearized at the current vs (Newton):
            #   (lhs + H_w) v = rhs + g_w + H_w vs
            g_w = model.u.T @ (gamma_i - what_i)
            H_w = np.einsum("i,it,iu->tu", np.maximum(gamma_i, what_i),
                            model.u, model.u)
            lhs += H_w
            rhs += g_w + H_w @ vs
        vs = np.linalg.solve(lhs + 1e-6 * np.eye(T_spk), rhs)
    return vs


def split_substates(model: AmSgmm2, accs: MleAmSgmm2Accs,
                    target: int, perturb: float = 0.01,
                    seed: int = 0) -> None:
    """Grow toward `target` total substates by splitting the
    highest-occupancy substates (MleAmSgmm2Updater::SplitSubstates):
    duplicate v with a small perturbation, halve c."""
    rng = np.random.default_rng(seed)
    occ = [accs.gamma[j].sum(axis=1) for j in range(model.num_pdfs)]
    while model.num_substates < target:
        best = max(
            ((j, m) for j in range(model.num_pdfs)
             for m in range(len(occ[j]))),
            key=lambda jm: occ[jm[0]][jm[1]],
        )
        j, m = best
        if occ[j][m] <= 0:
            break
        d = perturb * rng.standard_normal(model.phn_dim)
        v0 = model.v[j][m]
        model.v[j] = np.vstack([model.v[j], v0 + d])
        model.v[j][m] = v0 - d
        cj = model.c[j].copy()
        half = cj[m] / 2
        cj[m] = half
        model.c[j] = np.append(cj, half)
        occ[j][m] /= 2
        occ[j] = np.append(occ[j], occ[j][m])
    model.invalidate()
    log.info("split to %d substates", model.num_substates)


# ---------------------------------------------------------------------------
# (TransitionModel, AmSgmm2) bundle — the sgmm2 `final.mdl` equivalent
# ---------------------------------------------------------------------------


class Sgmm2Model:
    def __init__(self, tm, sgmm: AmSgmm2):
        self.tm = tm
        self.sgmm = sgmm

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            init_kaldi_output_stream(f, True)
            self.tm.write(f)
            self.sgmm.write(f)

    @staticmethod
    def load(path: str) -> "Sgmm2Model":
        from old_kaldi_git_tpu.hmm.transition_model import TransitionModel

        with open(path, "rb") as f:
            init_kaldi_input_stream(f)
            tm = TransitionModel.read(f)
            sgmm = AmSgmm2.read(f)
        return Sgmm2Model(tm, sgmm)
