"""UBM training and i-vector extraction.

Parity with reference src/ivector/ivector-extractor.{h,cc} +
src/gmm full-UBM training as used by steps/online/nnet2/train_ivector_extractor.sh:

  train_ubm              — EM for a diagonal UBM on pooled frames (the
                           reference uses a full-cov UBM; diagonal is the
                           common fast path and what the posteriors need)
  IvectorExtractor       — T-matrix model: supervector offset = T·w,
                           posterior precision L = I + Σ_c γ_c Tᵀ Σ⁻¹ T
  train_ivector_extractor— EM over utterance stats (E: posterior over w;
                           M: per-Gaussian weighted least squares for T)
  extract_ivector        — MAP point estimate of w from zeroth/first-order
                           stats; prior offset convention (first coordinate)
                           omitted — we keep the zero-mean prior form.

Stats accumulation is batched jnp (einsums on the MXU); the small per-
Gaussian solves run in numpy (SURVEY.md §7.2 M9).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from old_kaldi_git_tpu.gmm.diag_gmm import DiagGmm
from old_kaldi_git_tpu.utils.log import get_logger

log = get_logger("ivector")


def train_ubm(
    feats: np.ndarray,
    num_gauss: int = 64,
    num_iters: int = 10,
    seed: int = 0,
) -> DiagGmm:
    """EM for a diagonal UBM on pooled frames [N, D]."""
    rng = np.random.default_rng(seed)
    x = np.asarray(feats, np.float64)
    n, d = x.shape
    # init: global stats + perturbed means
    gmean, gvar = x.mean(0), x.var(0) + 1e-3
    means = gmean + 0.5 * np.sqrt(gvar) * rng.standard_normal((num_gauss, d))
    gmm = DiagGmm(np.ones(num_gauss) / num_gauss, means,
                  np.tile(gvar, (num_gauss, 1)))
    prev = -np.inf
    for it in range(num_iters):
        post = gmm.posteriors(x)  # [N, C]
        counts = post.sum(0) + 1e-8
        new_means = post.T @ x / counts[:, None]
        new_vars = post.T @ (x**2) / counts[:, None] - new_means**2
        new_vars = np.maximum(new_vars, 1e-3)
        weights = counts / counts.sum()
        gmm = DiagGmm(weights, new_means, new_vars)
        like = float(gmm.loglikes(x).mean())
        log.info("UBM iter %d: avg loglike %.4f", it, like)
        prev = like
    return gmm


@dataclasses.dataclass
class IvectorExtractor:
    ubm: DiagGmm  # DiagGmm or FullGmm (reference uses full-cov; §2.7)
    T: np.ndarray  # [C, D, R]

    @property
    def ivector_dim(self) -> int:
        return self.T.shape[2]

    # -- serialization (ivector-extractor-init / final.ie equivalent) --------
    def save(self, path: str) -> None:
        from old_kaldi_git_tpu.gmm.full_gmm import FullGmm
        from old_kaldi_git_tpu.utils import io_funcs as iof

        with open(path, "wb") as f:
            iof.init_kaldi_output_stream(f, True)
            iof.write_token(f, "<IvectorExtractor>")
            iof.write_int32(f, 1 if isinstance(self.ubm, FullGmm) else 0)
            self.ubm.write(f)
            c, d, r = self.T.shape
            iof.write_int32(f, r)
            iof.write_matrix(f, self.T.reshape(c * d, r).astype(np.float64),
                             dtype=np.float64)
            iof.write_token(f, "</IvectorExtractor>")

    @staticmethod
    def load(path: str) -> "IvectorExtractor":
        from old_kaldi_git_tpu.gmm.full_gmm import FullGmm
        from old_kaldi_git_tpu.utils import io_funcs as iof
        from old_kaldi_git_tpu.utils.log import KaldiError

        with open(path, "rb") as f:
            if not iof.init_kaldi_input_stream(f):
                raise KaldiError("IvectorExtractor.load: expected binary")
            iof.expect_token(f, "<IvectorExtractor>")
            kind = iof.read_int32(f)
            ubm = FullGmm.read(f) if kind == 1 else DiagGmm.read(f)
            r = iof.read_int32(f)
            flat = iof.read_matrix(f)
            c, d = ubm.num_mix, ubm.dim
            T = np.asarray(flat, np.float64).reshape(c, d, r)
            iof.expect_token(f, "</IvectorExtractor>")
            return IvectorExtractor(ubm, T)


def _utt_stats(ubm: DiagGmm, feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(gamma [C], F [C, D]) zeroth/centered-first-order stats."""
    post = ubm.posteriors(np.asarray(feats, np.float64))  # [T, C]
    gamma = post.sum(0)
    f = post.T @ np.asarray(feats, np.float64) - gamma[:, None] * ubm.means
    return gamma, f


def _sigma_inv_T(ext: "IvectorExtractor") -> np.ndarray:
    """Σ_c⁻¹ T_c [C, D, R] for a diagonal OR full-covariance UBM (the
    reference IvectorExtractor uses a full-cov UBM; ivector-extractor.cc
    keeps Sigma_inv_M_ in exactly this layout)."""
    if hasattr(ext.ubm, "covars"):  # FullGmm
        return np.einsum("cde,cer->cdr", ext.ubm.inv_covars, ext.T,
                         optimize=True)
    return ext.T / ext.ubm.vars[:, :, None]


def _precomputed(ext: "IvectorExtractor"):
    """(Σ⁻¹T [C, D, R], W = TᵀΣ⁻¹T [C, R, R]) cached on the extractor —
    both depend only on (T, Σ) and were being recomputed per online
    update (the r4 3.3x end-to-end iVector tax was mostly this)."""
    cache = getattr(ext, "_precomp", None)
    if cache is None:
        sit = _sigma_inv_T(ext)
        W = np.einsum("cdr,cds->crs", ext.T, sit, optimize=True)
        cache = (sit, W)
        ext._precomp = cache
    return cache


def _posterior(ext: IvectorExtractor, gamma: np.ndarray, f: np.ndarray):
    """Gaussian posterior over w: (mean, precision L)."""
    c, d, r = ext.T.shape
    sit, W = _precomputed(ext)
    # L = I + Σ_c γ_c T_cᵀ Σ_c⁻¹ T_c
    L = np.eye(r) + np.einsum("c,crs->rs", gamma, W, optimize=True)
    b = f.reshape(-1) @ sit.reshape(-1, r)
    mean = np.linalg.solve(L, b)
    return mean, L


def extract_ivector(ext: IvectorExtractor, feats: np.ndarray) -> np.ndarray:
    gamma, f = _utt_stats(ext.ubm, feats)
    mean, _ = _posterior(ext, gamma, f)
    return mean.astype(np.float32)


def init_ivector_extractor(ubm, ivector_dim: int = 32,
                           seed: int = 0) -> IvectorExtractor:
    """Random T init (reference ivector-extractor-init)."""
    rng = np.random.default_rng(seed)
    c, d = ubm.means.shape
    return IvectorExtractor(
        ubm, 0.1 * rng.standard_normal((c, d, ivector_dim)))


def acc_ivector_extractor_stats(
    ext: IvectorExtractor, utt_feats: Sequence[np.ndarray]
) -> Tuple[np.ndarray, np.ndarray, float]:
    """E-step map job (reference ivector-extractor-acc-stats):
    A_c = Σ_u γ_uc E[w wᵀ], B_c = Σ_u f_uc E[w]ᵀ; returns (A, B, aux)."""
    c, d, r = ext.T.shape
    A = np.zeros((c, r, r))
    B = np.zeros((c, d, r))
    tot_auxf = 0.0
    for x in utt_feats:
        gamma, f = _utt_stats(ext.ubm, x)
        mean, L = _posterior(ext, gamma, f)
        cov = np.linalg.inv(L)
        ww = cov + np.outer(mean, mean)
        A += gamma[:, None, None] * ww[None]
        B += f[:, :, None] * mean[None, None, :]
        tot_auxf += float(mean @ mean)
    return A, B, tot_auxf


def est_ivector_extractor(
    ext: IvectorExtractor, A: np.ndarray, B: np.ndarray
) -> IvectorExtractor:
    """M-step (reference IvectorExtractorStats::Update): per-gaussian row
    solve T_c = B_c A_c⁻¹ (Σ⁻¹ cancels in the stationarity condition, so
    the update is covariance-free)."""
    T = ext.T.copy()
    for ci in range(T.shape[0]):
        try:
            T[ci] = np.linalg.solve(A[ci].T, B[ci].T).T
        except np.linalg.LinAlgError:
            pass
    return IvectorExtractor(ext.ubm, T)


def train_ivector_extractor(
    ubm: DiagGmm,
    utt_feats: Sequence[np.ndarray],
    ivector_dim: int = 32,
    num_iters: int = 5,
    seed: int = 0,
) -> IvectorExtractor:
    """EM for T (reference IvectorExtractorStats::Update); ubm may be a
    DiagGmm or a FullGmm."""
    ext = init_ivector_extractor(ubm, ivector_dim, seed)
    for it in range(num_iters):
        A, B, tot_auxf = acc_ivector_extractor_stats(ext, utt_feats)
        ext = est_ivector_extractor(ext, A, B)
        log.info("ivector iter %d: mean |w|² %.4f", it,
                 tot_auxf / max(len(utt_feats), 1))
    return ext


def extract_ivectors_per_spk(
    ext: IvectorExtractor,
    feats: Dict[str, np.ndarray],
    utt2spk: Optional[Dict[str, str]] = None,
) -> Dict[str, np.ndarray]:
    """Per-speaker (or per-utterance) i-vectors from pooled stats."""
    groups: Dict[str, list] = {}
    for utt, x in feats.items():
        spk = (utt2spk or {}).get(utt, utt)
        groups.setdefault(spk, []).append(x)
    out = {}
    for spk, xs in groups.items():
        gamma = None
        f = None
        for x in xs:
            g1, f1 = _utt_stats(ext.ubm, x)
            gamma = g1 if gamma is None else gamma + g1
            f = f1 if f is None else f + f1
        mean, _ = _posterior(ext, gamma, f)
        out[spk] = mean.astype(np.float32)
    return out


def extract_online_ivectors(
    ext: IvectorExtractor,
    feats: np.ndarray,
    period: int = 10,
    stats_scale: float = 1.0,
    max_count: float = 0.0,
) -> np.ndarray:
    """Online i-vectors: [T, D] feats → [T, ivec_dim], re-estimated every
    `period` frames from CUMULATIVE stats up to that frame.

    ~ online2/online-ivector-feature.cc OnlineIvectorFeature: the chain
    recipes append this (repeated across each period) to the acoustic
    features; max_count > 0 caps the stats weight so early frames keep
    adapting (reference --max-count).

    Vectorized over the update points: one whole-utterance UBM posterior
    pass, per-chunk stats reduced with a single einsum, cumulative sums
    over chunks, then ONE batched [N, R, R] solve for all N updates —
    the per-chunk Python loop cost 3.3x of the r4 end-to-end decode
    headline.  Bit-for-bit it differs from the sequential reference loop
    only in fp summation order (~1e-12 relative)."""
    T = feats.shape[0]
    R = ext.ivector_dim
    if T == 0:
        return np.zeros((0, R), np.float32)
    sit, W = _precomputed(ext)
    C, D, _ = ext.T.shape
    x = np.asarray(feats, np.float64)
    post = ext.ubm.posteriors(x)  # [T, C]
    N = -(-T // period)
    pad = N * period - T
    if pad:
        x = np.concatenate([x, np.zeros((pad, D))])
        post = np.concatenate([post, np.zeros((pad, C))])
    xr = x.reshape(N, period, D)
    pr = post.reshape(N, period, C)
    g_chunk = pr.sum(1)  # [N, C]
    f_chunk = (np.einsum("npc,npd->ncd", pr, xr, optimize=True)
               - g_chunk[:, :, None] * ext.ubm.means)
    g = np.cumsum(g_chunk, 0)  # [N, C]  stats up to each update point
    f = np.cumsum(f_chunk, 0)  # [N, C, D]
    # reference order: the posterior scale applies DURING accumulation,
    # and --max-count caps the SCALED count
    if stats_scale != 1.0:
        g = g * stats_scale
        f = f * stats_scale
    if max_count > 0:
        count = g.sum(1)
        scale = np.where(count > max_count,
                         max_count / np.maximum(count, 1e-300), 1.0)
        g = g * scale[:, None]
        f = f * scale[:, None, None]
    L = np.eye(R) + np.einsum("nc,crs->nrs", g, W, optimize=True)
    b = f.reshape(N, C * D) @ sit.reshape(C * D, R)
    w = np.linalg.solve(L, b[..., None])[..., 0]  # [N, R] batched
    return np.repeat(w.astype(np.float32), period, axis=0)[:T]


def append_ivectors(
    feats: Dict[str, np.ndarray],
    ext: IvectorExtractor,
    period: int = 10,
) -> Dict[str, np.ndarray]:
    """{utt: [T, D]} → {utt: [T, D + ivec_dim]} with online i-vectors
    appended — the chain/nnet3 recipes' input convention (features +
    online iVectors, reference steps/nnet3/chain/train.py --online-ivector-dir)."""
    out = {}
    for k, x in feats.items():
        iv = extract_online_ivectors(ext, x, period)
        out[k] = np.concatenate([x, iv], axis=1).astype(np.float32)
    return out


class OnlineIvectorExtractor:
    """Streaming counterpart of extract_online_ivectors
    (~ online2/online-ivector-feature.cc OnlineIvectorFeature).

    Feed feature frames incrementally with accept(); frames come back with
    their online i-vector appended once the period they fall in is
    complete (a bounded ≤ period−1 frame hold-back — the batch function
    gives frames [p, p+period) the i-vector estimated from cumulative
    stats THROUGH that period, so the period must be full before its
    frames are final).  input_finished() flushes the trailing partial
    period.  For any chunking of the input the concatenated outputs equal
    extract_online_ivectors on the whole utterance exactly."""

    def __init__(
        self,
        ext: IvectorExtractor,
        period: int = 10,
        stats_scale: float = 1.0,
        max_count: float = 0.0,
    ):
        self.ext = ext
        self.period = int(period)
        self.stats_scale = float(stats_scale)
        self.max_count = float(max_count)
        self._buf: Optional[np.ndarray] = None  # pending (< period) frames
        self._gamma = None
        self._f = None

    @property
    def ivector_dim(self) -> int:
        return self.ext.ivector_dim

    def _estimate(self) -> np.ndarray:
        g, f = self._gamma, self._f
        if self.stats_scale != 1.0:
            g, f = g * self.stats_scale, f * self.stats_scale
        count = float(g.sum())
        if self.max_count > 0 and count > self.max_count:
            scale = self.max_count / count
            g, f = g * scale, f * scale
        mean, _ = _posterior(self.ext, g, f)
        return mean.astype(np.float32)

    def _consume(self, chunk: np.ndarray) -> np.ndarray:
        g1, f1 = _utt_stats(self.ext.ubm, chunk)
        self._gamma = g1 if self._gamma is None else self._gamma + g1
        self._f = f1 if self._f is None else self._f + f1
        iv = self._estimate()
        return np.broadcast_to(iv, (chunk.shape[0], iv.shape[0])).copy()

    def accept(self, frames: np.ndarray) -> np.ndarray:
        """[n, D] new frames → [m, ivec_dim] i-vectors for the m ≤ n+pending
        frames whose period completed (in input order).

        Frames keep their dtype (the stats math promotes to float64 inside
        _utt_stats), so the batch-equality claim holds for any input dtype."""
        frames = np.asarray(frames)
        if self._buf is not None and self._buf.size:
            frames = np.concatenate([self._buf, frames])
            self._buf = None
        n_full = (frames.shape[0] // self.period) * self.period
        self._buf = frames[n_full:]
        out = [
            self._consume(frames[s : s + self.period])
            for s in range(0, n_full, self.period)
        ]
        if not out:
            return np.zeros((0, self.ivector_dim), np.float32)
        return np.concatenate(out)

    def input_finished(self) -> np.ndarray:
        """Flush the trailing partial period (if any)."""
        if self._buf is None or not self._buf.size:
            return np.zeros((0, self.ivector_dim), np.float32)
        tail = self._buf
        self._buf = None
        return self._consume(tail)
