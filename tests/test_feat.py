"""M1 tests: feature extraction vs naive references and invariants."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from old_kaldi_git_tpu.feat import (
    Fbank,
    FbankOptions,
    FrameExtractionOptions,
    Mfcc,
    MfccOptions,
    Plp,
    PlpOptions,
    Spectrogram,
    DeltaFeaturesOptions,
    MelBanksOptions,
    compute_deltas,
    mel_banks_matrix,
    num_frames,
    splice_frames,
    sliding_window_cmn,
    SlidingWindowCmnOptions,
    acc_cmvn_stats,
    apply_cmvn,
    linear_resample,
)
from old_kaldi_git_tpu.feat.compute import dct_matrix
from old_kaldi_git_tpu.feat.window import extract_frames, feature_window


def _wave(n=16000, freq=300.0, sr=16000.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    return (
        5000 * np.sin(2 * math.pi * freq * t) + 100 * rng.normal(size=n)
    ).astype(np.float32)


def test_num_frames():
    opts = FrameExtractionOptions()
    assert opts.window_size == 400 and opts.window_shift == 160
    assert opts.padded_window_size == 512
    assert num_frames(16000, opts) == 1 + (16000 - 400) // 160
    assert num_frames(399, opts) == 0
    opts2 = FrameExtractionOptions(snip_edges=False)
    assert num_frames(16000, opts2) == 100


def test_window_shapes_and_values():
    opts = FrameExtractionOptions(dither=0.0)
    w = feature_window(opts)
    assert w.shape == (400,)
    assert w[0] == pytest.approx(0.0, abs=1e-6)  # povey window starts at 0
    assert np.max(w) == pytest.approx(1.0, abs=1e-4)
    frames, log_e = extract_frames(jnp.asarray(_wave()), opts)
    assert frames.shape == (98, 512)
    assert log_e.shape == (98,)
    assert np.all(np.isfinite(np.asarray(frames)))


def test_mel_banks_partition():
    w, centers = mel_banks_matrix(MelBanksOptions(num_bins=23), 16000.0, 512)
    assert w.shape == (256, 23)
    assert np.all(w >= 0) and np.all(w <= 1.0 + 1e-6)
    # interior fft bins between first and last filter edges sum to ~1
    row_sums = w.sum(axis=1)
    interior = row_sums[20:200]
    np.testing.assert_allclose(interior, 1.0, atol=0.05)
    assert np.all(np.diff(centers) > 0)


def test_mel_banks_vtln_moves_centers():
    w1, _ = mel_banks_matrix(MelBanksOptions(num_bins=23), 16000.0, 512, 1.0)
    w2, _ = mel_banks_matrix(MelBanksOptions(num_bins=23), 16000.0, 512, 1.1)
    assert not np.allclose(w1, w2)


def test_dct_orthonormal():
    d = dct_matrix(13, 23).astype(np.float64)
    np.testing.assert_allclose(d @ d.T, np.eye(13), atol=1e-5)


def test_mfcc_basic():
    opts = MfccOptions()
    opts.frame_opts.dither = 0.0
    mfcc = Mfcc(opts)
    wave = jnp.asarray(_wave())
    feats = np.asarray(mfcc(wave))
    assert feats.shape == (98, 13)
    assert np.all(np.isfinite(feats))
    # c0 replaced by raw log energy (use_energy default): large positive
    assert np.all(feats[:, 0] > 5.0)
    # deterministic without dither
    np.testing.assert_array_equal(feats, np.asarray(mfcc(wave)))


def test_mfcc_batched_equals_single():
    opts = MfccOptions()
    opts.frame_opts.dither = 0.0
    mfcc = Mfcc(opts)
    waves = np.stack([_wave(seed=i) for i in range(3)])
    batched = np.asarray(mfcc(jnp.asarray(waves)))
    for i in range(3):
        single = np.asarray(mfcc(jnp.asarray(waves[i])))
        np.testing.assert_allclose(batched[i], single, rtol=1e-4, atol=1e-4)


def test_mfcc_tone_frequency_sensitivity():
    """A 300 Hz vs 3000 Hz tone must differ strongly in cepstra."""
    opts = MfccOptions(use_energy=False)
    opts.frame_opts.dither = 0.0
    mfcc = Mfcc(opts)
    f1 = np.asarray(mfcc(jnp.asarray(_wave(freq=300.0))))
    f2 = np.asarray(mfcc(jnp.asarray(_wave(freq=3000.0))))
    assert np.abs(f1.mean(0) - f2.mean(0)).max() > 1.0


def test_fbank():
    opts = FbankOptions()
    opts.frame_opts.dither = 0.0
    fbank = Fbank(opts)
    feats = np.asarray(fbank(jnp.asarray(_wave())))
    assert feats.shape == (98, 23)
    louder = np.asarray(fbank(jnp.asarray(_wave() * 2)))
    # log-energies shift by ~log(4) when amplitude doubles
    assert np.median(louder - feats) == pytest.approx(math.log(4.0), abs=0.2)


def test_spectrogram():
    spec = Spectrogram()
    spec.frame_opts.dither = 0.0
    feats = np.asarray(spec(jnp.asarray(_wave())))
    assert feats.shape == (98, 257)
    # peak bin near 300 Hz: bin = 300/16000*512 = 9.6
    peak = np.argmax(feats[:, 1:].mean(0)) + 1
    assert 8 <= peak <= 12


def test_plp():
    opts = PlpOptions()
    opts.frame_opts.dither = 0.0
    plp = Plp(opts)
    feats = np.asarray(plp(jnp.asarray(_wave())))
    assert feats.shape == (98, 13)
    assert np.all(np.isfinite(feats))
    f2 = np.asarray(plp(jnp.asarray(_wave(freq=2000.0))))
    assert np.abs(feats[:, 1:].mean(0) - f2[:, 1:].mean(0)).max() > 0.1


def test_deltas_match_naive():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(20, 4)).astype(np.float32)
    out = np.asarray(compute_deltas(jnp.asarray(x), DeltaFeaturesOptions(order=1, window=2)))
    assert out.shape == (20, 8)
    # naive first-order delta at interior frame
    t = 10
    denom = sum(j * j for j in range(1, 3))
    naive = sum(j * (x[t + j] - x[t - j]) for j in range(1, 3)) / (2 * denom)
    np.testing.assert_allclose(out[t, 4:], naive, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out[:, :4], x, atol=1e-6)


def test_splice():
    x = np.arange(5, dtype=np.float32)[:, None]
    out = np.asarray(splice_frames(jnp.asarray(x), 1, 1))
    np.testing.assert_array_equal(out[:, 1], x[:, 0])
    np.testing.assert_array_equal(out[0], [0, 0, 1])  # left edge replicated
    np.testing.assert_array_equal(out[4], [3, 4, 4])  # right edge replicated


def test_sliding_window_cmn():
    rng = np.random.default_rng(4)
    x = (rng.normal(size=(50, 3)) + 5.0).astype(np.float32)
    out = np.asarray(
        sliding_window_cmn(jnp.asarray(x), SlidingWindowCmnOptions(cmn_window=100, center=True))
    )
    # window covers everything → global mean subtraction
    np.testing.assert_allclose(out, x - x.mean(0), atol=1e-4)
    out2 = np.asarray(
        sliding_window_cmn(
            jnp.asarray(x),
            SlidingWindowCmnOptions(cmn_window=100, center=True, normalize_variance=True),
        )
    )
    np.testing.assert_allclose(out2.std(0), 1.0, atol=0.05)


def test_cmvn_stats():
    rng = np.random.default_rng(5)
    x = (rng.normal(size=(100, 6)) * 3 + 7).astype(np.float32)
    stats = acc_cmvn_stats(x)
    assert stats.shape == (2, 7) and stats[0, 6] == 100
    out = np.asarray(apply_cmvn(jnp.asarray(x), stats, norm_vars=True))
    np.testing.assert_allclose(out.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(out.std(0), 1.0, atol=1e-2)


def test_linear_resample():
    sr_in, sr_out = 16000.0, 8000.0
    t = np.arange(16000) / sr_in
    wave = np.sin(2 * math.pi * 440.0 * t).astype(np.float32)
    out = np.asarray(linear_resample(jnp.asarray(wave), sr_in, sr_out))
    assert abs(out.shape[0] - 8000) <= 1
    t_out = np.arange(out.shape[0]) / sr_out
    expected = np.sin(2 * math.pi * 440.0 * t_out)
    # ignore filter edge effects
    sl = slice(100, -100)
    corr = np.corrcoef(out[sl], expected[sl])[0, 1]
    assert corr > 0.999
    assert np.abs(out[sl]).max() == pytest.approx(1.0, abs=0.02)


def test_pitch_tracks_sine():
    """Pure tones at known f0 come back within a few Hz; noise gets low POV."""
    from old_kaldi_git_tpu.feat.pitch import (
        PitchOptions, compute_kaldi_pitch, pov_probability, process_pitch,
    )

    sr = 16000.0
    t = np.arange(int(sr * 1.0)) / sr
    rng = np.random.default_rng(0)
    f0s = [100.0, 200.0, 320.0]
    waves = [np.sin(2 * np.pi * f0 * t).astype(np.float32) * 5000 for f0 in f0s]
    waves.append(rng.normal(size=t.shape).astype(np.float32) * 500)  # unvoiced
    batch = np.stack(waves)
    out = np.asarray(compute_kaldi_pitch(jnp.asarray(batch), PitchOptions()))
    assert out.shape[0] == 4 and out.shape[2] == 2
    Tn = out.shape[1]
    mid = slice(Tn // 4, 3 * Tn // 4)
    for i, f0 in enumerate(f0s):
        est = np.median(out[i, mid, 1])
        assert abs(est - f0) < 0.05 * f0, (f0, est)
        # voiced: high NCCF
        assert np.median(out[i, mid, 0]) > 0.8
    # noise: NCCF clearly lower than tones
    assert np.median(out[3, mid, 0]) < np.min(
        [np.median(out[i, mid, 0]) for i in range(3)]
    )
    pov = np.asarray(pov_probability(jnp.asarray(out[..., 0])))
    assert np.median(pov[0, mid]) > np.median(pov[3, mid])

    feats = np.asarray(process_pitch(jnp.asarray(out)))
    assert feats.shape == (4, Tn, 3)
    assert np.isfinite(feats).all()
    # normalized log pitch of a constant tone ~ 0
    assert abs(np.median(feats[0, mid, 1])) < 0.2


def test_pitch_octave_stability():
    """The Viterbi lag penalty keeps the track from octave-jumping when the
    NCCF momentarily favors a harmonic."""
    from old_kaldi_git_tpu.feat.pitch import PitchOptions, compute_kaldi_pitch

    sr = 16000.0
    t = np.arange(int(sr * 0.8)) / sr
    # strong 120 Hz + weak burst of 240 Hz in the middle
    w = np.sin(2 * np.pi * 120 * t)
    mid = (t > 0.35) & (t < 0.45)
    w = w + 0.6 * np.sin(2 * np.pi * 240 * t) * mid
    out = np.asarray(
        compute_kaldi_pitch(jnp.asarray(w[None].astype(np.float32) * 5000))
    )
    Tn = out.shape[1]
    est = out[0, Tn // 5: 4 * Tn // 5, 1]
    assert np.percentile(np.abs(est - 120.0), 90) < 15.0


def test_fft_convolve_matches_numpy():
    from old_kaldi_git_tpu.feat.signal import fft_convolve

    rng = np.random.default_rng(0)
    sig = rng.normal(size=20000).astype(np.float32)
    ker = rng.normal(size=1234).astype(np.float32)
    got = fft_convolve(sig, ker)
    want = np.convolve(sig.astype(np.float64), ker.astype(np.float64))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_reverberate_and_noise():
    from old_kaldi_git_tpu.feat.signal import add_noise, reverberate

    rng = np.random.default_rng(1)
    sig = rng.normal(size=8000).astype(np.float32) * 1000
    # delta RIR at a delay: shift_output realigns, so output ≈ input (power
    # normalized)
    rir = np.zeros(400, np.float32)
    rir[100] = 1.0
    out = reverberate(sig, rir)
    assert out.shape == sig.shape
    np.testing.assert_allclose(out, sig, rtol=1e-3, atol=1.0)
    # real reverb changes the signal but keeps power
    rir2 = np.exp(-np.arange(800) / 200.0).astype(np.float32) * \
        rng.normal(size=800).astype(np.float32)
    out2 = reverberate(sig, rir2)
    assert np.mean(out2 ** 2) == pytest.approx(np.mean(sig ** 2), rel=0.01)
    assert np.abs(out2 - sig).mean() > 1.0

    noisy = add_noise(sig, rng.normal(size=3000).astype(np.float32), 10.0)
    p_sig = np.mean(sig.astype(np.float64) ** 2)
    p_noise = np.mean((noisy - sig).astype(np.float64) ** 2)
    assert 10 * np.log10(p_sig / p_noise) == pytest.approx(10.0, abs=0.3)


def test_arbitrary_resample():
    """ArbitraryResample role (src/feat/resample.h): bandlimited evaluation
    at non-uniform time points reconstructs a pure tone, and at a uniform
    grid it matches linear_resample."""
    from old_kaldi_git_tpu.feat.resample import arbitrary_resample

    sr_in = 4000.0
    t = np.arange(4000) / sr_in
    wave = np.sin(2 * math.pi * 113.0 * t).astype(np.float32)
    rng = np.random.default_rng(0)
    pts = np.sort(rng.uniform(0.1, 0.9, size=200))  # interior, random
    out = np.asarray(arbitrary_resample(jnp.asarray(wave), sr_in, pts))
    expected = np.sin(2 * math.pi * 113.0 * pts)
    np.testing.assert_allclose(out, expected, atol=2e-3)
    # uniform grid == linear_resample (same cutoff convention)
    sr_out = 2000.0
    lin = np.asarray(linear_resample(jnp.asarray(wave), sr_in, sr_out))
    grid = np.arange(lin.shape[0]) / sr_out
    uni = np.asarray(arbitrary_resample(
        jnp.asarray(wave), sr_in, grid,
        filter_cutoff=0.99 * 0.5 * sr_out))
    np.testing.assert_allclose(uni, lin, atol=1e-5)
    # batched input broadcasts
    two = np.stack([wave, 0.5 * wave])
    outb = np.asarray(arbitrary_resample(jnp.asarray(two), sr_in, pts))
    np.testing.assert_allclose(outb[1], 0.5 * outb[0], atol=1e-6)
