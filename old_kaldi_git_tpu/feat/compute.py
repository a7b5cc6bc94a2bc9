"""Offline feature computers: MFCC, filterbank, spectrogram, PLP.

Parity with reference src/feat/feature-{mfcc,fbank,spectrogram,plp}.h and
feature-common.h (OfflineFeatureTpl).  Array-first: each computer maps
[B, num_samples] (+ optional per-utterance sample counts) → [B, T, D] with a
validity mask derived from counts; the whole pipeline is jit-able and batched.

The spectrum path (window → rfft → power → mel matmul → log → DCT matmul)
is expressed so XLA maps the matmuls onto the MXU; the fused Pallas version
lives in old_kaldi_git_tpu.ops.mfcc_kernel and must match these references
(tested in tests/test_feat.py).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from old_kaldi_git_tpu.feat.mel import MelBanksOptions, mel_banks_matrix
from old_kaldi_git_tpu.feat.window import (
    FrameExtractionOptions,
    extract_frames,
    num_frames,
)
from old_kaldi_git_tpu.utils.parse_options import options_dataclass

EPSILON = jnp.finfo(jnp.float32).tiny


def dct_matrix(num_rows: int, num_cols: int) -> np.ndarray:
    """Orthonormal DCT-II (reference src/matrix/matrix-functions.cc
    ComputeDctMatrix): row 0 = sqrt(1/N), row k = sqrt(2/N) cos(pi k (2n+1)/2N)."""
    n = np.arange(num_cols)
    k = np.arange(num_rows)[:, None]
    mat = np.sqrt(2.0 / num_cols) * np.cos(math.pi * k * (2 * n + 1) / (2 * num_cols))
    mat[0] = np.sqrt(1.0 / num_cols)
    return mat.astype(np.float32)


def lifter_coeffs(num_ceps: int, q: float) -> np.ndarray:
    """Reference ComputeLifterCoeffs: 1 + 0.5*Q*sin(pi*i/Q)."""
    i = np.arange(num_ceps)
    return (1.0 + 0.5 * q * np.sin(math.pi * i / q)).astype(np.float32)


_DFT_CACHE: dict = {}


def _dft_matrices(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT as two [N, N//2+1] matmul operands (cos, -sin), cached per N.

    Feature windows are 256-2048 points, so the matmul form runs on the MXU
    and — unlike jnp.fft.rfft — fuses into the surrounding graph without
    pathological XLA compile times on the TPU backend (observed 315 s for the
    fused MFCC graph with rfft vs 2 s with matmuls)."""
    if n not in _DFT_CACHE:
        t = np.arange(n)
        k = np.arange(n // 2 + 1)[:, None]
        ang = 2.0 * np.pi * k * t / n
        _DFT_CACHE[n] = (
            np.cos(ang).astype(np.float32).T,
            (-np.sin(ang)).astype(np.float32).T,
        )
    return _DFT_CACHE[n]


def real_spectrum(frames: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[..., N] → (real, imag) each [..., N//2+1], rfft semantics via matmul."""
    cos, msin = _dft_matrices(frames.shape[-1])
    return frames @ cos, frames @ msin


def power_spectrum(frames: jnp.ndarray) -> jnp.ndarray:
    """[..., padded_N] windowed frames → [..., padded_N//2] power spectrum
    (nyquist bin dropped, matching MelBanks)."""
    re, im = real_spectrum(frames)
    power = jnp.square(re) + jnp.square(im)
    return power[..., :-1]


# ---------------------------------------------------------------------------
# options
# ---------------------------------------------------------------------------

def _frame_opts():
    return FrameExtractionOptions()


def _mel_opts(num_bins: int):
    return lambda: MelBanksOptions(num_bins=num_bins)


@options_dataclass
class MfccOptions:
    frame_opts: FrameExtractionOptions = dataclasses.field(default_factory=_frame_opts)
    mel_opts: MelBanksOptions = dataclasses.field(default_factory=_mel_opts(23))
    num_ceps: int = 13
    use_energy: bool = True
    energy_floor: float = 0.0
    raw_energy: bool = True
    cepstral_lifter: float = 22.0


@options_dataclass
class FbankOptions:
    frame_opts: FrameExtractionOptions = dataclasses.field(default_factory=_frame_opts)
    mel_opts: MelBanksOptions = dataclasses.field(default_factory=_mel_opts(23))
    use_energy: bool = False
    energy_floor: float = 0.0
    raw_energy: bool = True
    use_log_fbank: bool = True
    use_power: bool = True


@options_dataclass
class SpectrogramOptions:
    frame_opts: FrameExtractionOptions = dataclasses.field(default_factory=_frame_opts)
    energy_floor: float = 0.0
    raw_energy: bool = True


@options_dataclass
class PlpOptions:
    frame_opts: FrameExtractionOptions = dataclasses.field(default_factory=_frame_opts)
    mel_opts: MelBanksOptions = dataclasses.field(default_factory=_mel_opts(23))
    lpc_order: int = 12
    num_ceps: int = 13
    use_energy: bool = True
    energy_floor: float = 0.0
    raw_energy: bool = True
    compress_factor: float = 0.33333
    cepstral_lifter: float = 22.0
    cepstral_scale: float = 1.0


# ---------------------------------------------------------------------------
# computers
# ---------------------------------------------------------------------------

class _BaseComputer:
    """Shared framing + batched __call__ plumbing."""

    def __init__(self, opts):
        self.opts = opts
        self.frame_opts: FrameExtractionOptions = opts.frame_opts

    @property
    def dim(self) -> int:
        raise NotImplementedError

    def _compute(self, frames, log_energy):
        raise NotImplementedError

    def __call__(
        self,
        wave: jnp.ndarray,
        *,
        dither_key: Optional[jax.Array] = None,
        vtln_warp: float = 1.0,
    ) -> jnp.ndarray:
        """[..., num_samples] → [..., T, dim].  T from the padded length;
        use num_frames(actual_samples) to mask."""
        self._vtln = vtln_warp
        frames, log_energy = extract_frames(
            wave, self.frame_opts, dither_key=dither_key
        )
        return self._compute(frames, log_energy)

    def num_frames(self, num_samples: int) -> int:
        return num_frames(num_samples, self.frame_opts)


class Mfcc(_BaseComputer):
    """Reference src/feat/feature-mfcc.h MfccComputer."""

    def __init__(self, opts: MfccOptions = None):
        super().__init__(opts or MfccOptions())
        o = self.opts
        self._mel_cache = {}
        self._dct = jnp.asarray(
            dct_matrix(o.num_ceps, o.mel_opts.num_bins).T
        )  # [num_bins, num_ceps]
        self._lifter = (
            jnp.asarray(lifter_coeffs(o.num_ceps, o.cepstral_lifter))
            if o.cepstral_lifter != 0.0
            else None
        )

    @property
    def dim(self) -> int:
        return self.opts.num_ceps

    def _mel(self, vtln_warp: float) -> jnp.ndarray:
        if vtln_warp not in self._mel_cache:
            w, _ = mel_banks_matrix(
                self.opts.mel_opts,
                self.frame_opts.samp_freq,
                self.frame_opts.padded_window_size,
                vtln_warp,
            )
            # cache host-side: a jnp array materialized under an active jit
            # trace would be a tracer, leaking into later traces
            self._mel_cache[vtln_warp] = np.asarray(w, np.float32)
        return self._mel_cache[vtln_warp]

    def _compute(self, frames, log_energy):
        o = self.opts
        power = power_spectrum(frames)
        mel_energies = power @ self._mel(getattr(self, "_vtln", 1.0))
        log_mel = jnp.log(jnp.maximum(mel_energies, EPSILON))
        ceps = log_mel @ self._dct
        if self._lifter is not None:
            ceps = ceps * self._lifter
        if o.use_energy:
            if o.energy_floor > 0.0:
                log_energy = jnp.maximum(log_energy, math.log(o.energy_floor))
            ceps = ceps.at[..., 0].set(log_energy)
        return ceps


class Fbank(_BaseComputer):
    """Reference src/feat/feature-fbank.h FbankComputer."""

    def __init__(self, opts: FbankOptions = None):
        super().__init__(opts or FbankOptions())
        self._mel_cache = {}

    @property
    def dim(self) -> int:
        return self.opts.mel_opts.num_bins + int(self.opts.use_energy)

    def _mel(self, vtln_warp: float) -> jnp.ndarray:
        if vtln_warp not in self._mel_cache:
            w, _ = mel_banks_matrix(
                self.opts.mel_opts,
                self.frame_opts.samp_freq,
                self.frame_opts.padded_window_size,
                vtln_warp,
            )
            # cache host-side: a jnp array materialized under an active jit
            # trace would be a tracer, leaking into later traces
            self._mel_cache[vtln_warp] = np.asarray(w, np.float32)
        return self._mel_cache[vtln_warp]

    def _compute(self, frames, log_energy):
        o = self.opts
        power = power_spectrum(frames)
        if not o.use_power:
            power = jnp.sqrt(power)
        mel_energies = power @ self._mel(getattr(self, "_vtln", 1.0))
        if o.use_log_fbank:
            mel_energies = jnp.log(jnp.maximum(mel_energies, EPSILON))
        if o.use_energy:
            if o.energy_floor > 0.0:
                log_energy = jnp.maximum(log_energy, math.log(o.energy_floor))
            mel_energies = jnp.concatenate(
                [log_energy[..., None], mel_energies], axis=-1
            )
        return mel_energies


class Spectrogram(_BaseComputer):
    """Reference src/feat/feature-spectrogram.h: log power spectrum with the
    raw log-energy in column 0."""

    def __init__(self, opts: SpectrogramOptions = None):
        super().__init__(opts or SpectrogramOptions())

    @property
    def dim(self) -> int:
        return self.frame_opts.padded_window_size // 2 + 1

    def _compute(self, frames, log_energy):
        re, im = real_spectrum(frames)
        power = jnp.square(re) + jnp.square(im)
        log_power = jnp.log(jnp.maximum(power, EPSILON))
        o = self.opts
        if o.energy_floor > 0.0:
            log_energy = jnp.maximum(log_energy, math.log(o.energy_floor))
        return log_power.at[..., 0].set(log_energy)


def _idft_bases(n_bases: int, dimension: int) -> np.ndarray:
    """Reference src/feat/feature-functions.cc InitIdftBases: cosine bases
    mapping a symmetric spectrum of `dimension` points to autocorrelations."""
    k = np.arange(n_bases)[:, None]
    j = np.arange(dimension)[None, :]
    base = np.cos(math.pi * k * j / (dimension - 1))
    base[:, 0] *= 0.5
    base[:, -1] *= 0.5
    return (base / (dimension - 1)).astype(np.float64)


def _durbin(autocorr: jnp.ndarray, order: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Levinson-Durbin over [..., order+1] autocorrelations → (lpc [..., order],
    residual energy [...]).  Reference src/feat/feature-functions.cc Durbin.
    Static Python loop (order is small and fixed)."""
    r = autocorr
    err = r[..., 0]
    a = jnp.zeros(r.shape[:-1] + (order,), dtype=r.dtype)
    for i in range(order):
        acc = r[..., i + 1]
        for j in range(i):
            acc = acc - a[..., j] * r[..., i - j]
        k = acc / jnp.maximum(err, 1e-20)
        new_a = a
        for j in range(i):
            new_a = new_a.at[..., j].set(a[..., j] - k * a[..., i - 1 - j])
        new_a = new_a.at[..., i].set(k)
        a = new_a
        err = err * (1.0 - k * k)
    return a, err


def _lpc_to_cepstrum(lpc: jnp.ndarray, err: jnp.ndarray, num_ceps: int) -> jnp.ndarray:
    """LPC coefficients → cepstra (reference Lpc2Cepstrum); c0 = ln(residual)."""
    order = lpc.shape[-1]
    ceps = [0.5 * jnp.log(jnp.maximum(err, 1e-20))]
    for n in range(1, num_ceps):
        if n <= order:
            c = lpc[..., n - 1]
        else:
            c = jnp.zeros_like(err)
        for k in range(1, n):
            if n - k <= order:
                c = c + (k / n) * ceps[k] * lpc[..., n - k - 1]
        ceps.append(c)
    return jnp.stack(ceps, axis=-1)


class Plp(_BaseComputer):
    """Reference src/feat/feature-plp.h PlpComputer: mel spectrum →
    equal-loudness weighting → cube-root compression → IDFT → LPC → cepstra."""

    def __init__(self, opts: PlpOptions = None):
        super().__init__(opts or PlpOptions())
        o = self.opts
        w, centers = mel_banks_matrix(
            o.mel_opts, self.frame_opts.samp_freq, self.frame_opts.padded_window_size
        )
        self._mel = jnp.asarray(w)
        # equal-loudness curve at filter centers (reference GetEqualLoudnessVector)
        fsq = centers.astype(np.float64) ** 2
        fsub = fsq / (fsq + 1.6e5)
        eql = fsub * fsub * ((fsq + 1.44e6) / (fsq + 9.61e6))
        self._eql = jnp.asarray(eql.astype(np.float32))
        self._idft = jnp.asarray(
            _idft_bases(o.lpc_order + 1, o.mel_opts.num_bins + 2).T.astype(np.float32)
        )
        self._lifter = (
            jnp.asarray(lifter_coeffs(o.num_ceps, o.cepstral_lifter))
            if o.cepstral_lifter != 0.0
            else None
        )

    @property
    def dim(self) -> int:
        return self.opts.num_ceps

    def _compute(self, frames, log_energy):
        o = self.opts
        power = power_spectrum(frames)
        mel_energies = power @ self._mel  # [..., num_bins]
        weighted = mel_energies * self._eql
        compressed = jnp.power(jnp.maximum(weighted, EPSILON), o.compress_factor)
        # duplicate endpoints to form the symmetric spectrum of num_bins+2 pts
        spec = jnp.concatenate(
            [compressed[..., :1], compressed, compressed[..., -1:]], axis=-1
        )
        autocorr = spec @ self._idft  # [..., lpc_order+1]
        lpc, err = _durbin(autocorr, o.lpc_order)
        ceps = _lpc_to_cepstrum(lpc, err, o.num_ceps)
        if self._lifter is not None:
            ceps = ceps * self._lifter
        if o.cepstral_scale != 1.0:
            ceps = ceps * o.cepstral_scale
        if o.use_energy:
            if o.energy_floor > 0.0:
                log_energy = jnp.maximum(log_energy, math.log(o.energy_floor))
            ceps = ceps.at[..., 0].set(log_energy)
        return ceps
