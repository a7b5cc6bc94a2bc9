"""Pallas kernel equivalence tests (interpret mode on CPU; the reference's
CuMatrix-vs-Matrix oracle pattern)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from old_kaldi_git_tpu.feat.compute import Mfcc, MfccOptions
from old_kaldi_git_tpu.feat.window import extract_frames
from old_kaldi_git_tpu.gmm.diag_gmm import AmDiagGmm, DiagGmm
from old_kaldi_git_tpu.ops import (
    fused_mfcc_from_frames,
    fused_mfcc_reference,
    gmm_loglikes_pallas,
    gmm_loglikes_reference,
    make_mfcc_weights,
    pack_gmm_weights,
)


def test_fused_mfcc_matches_feat_pipeline():
    """Pallas MFCC == the jnp feat pipeline (no energy, no dither)."""
    opts = MfccOptions(use_energy=False)
    opts.frame_opts.dither = 0.0
    rng = np.random.default_rng(0)
    wave = jnp.asarray((rng.normal(size=8000) * 1000).astype(np.float32))
    frames, _ = extract_frames(wave, opts.frame_opts)
    weights = make_mfcc_weights(opts)
    ref = np.asarray(fused_mfcc_reference(frames, weights))
    # the jnp reference of the kernel must equal the production pipeline
    mfcc = Mfcc(opts)
    pipeline = np.asarray(mfcc(wave))
    np.testing.assert_allclose(ref, pipeline, rtol=1e-3, atol=1e-3)
    # the kernel (interpret mode on CPU) must equal its reference
    out = np.asarray(fused_mfcc_from_frames(frames, weights))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def test_fused_mfcc_ragged_tile():
    """Frame counts not divisible by the tile size are padded correctly."""
    opts = MfccOptions(use_energy=False)
    opts.frame_opts.dither = 0.0
    rng = np.random.default_rng(1)
    wave = jnp.asarray((rng.normal(size=5000) * 500).astype(np.float32))
    frames, _ = extract_frames(wave, opts.frame_opts)
    assert frames.shape[0] % 128 != 0
    weights = make_mfcc_weights(opts)
    out = np.asarray(fused_mfcc_from_frames(frames, weights))
    ref = np.asarray(fused_mfcc_reference(frames, weights))
    assert out.shape == ref.shape == (frames.shape[0], 13)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def test_gmm_kernel_matches_reference():
    rng = np.random.default_rng(2)
    pdfs = []
    for i in range(37):  # odd pdf count → padding exercised
        m = 1 + int(rng.integers(1, 6))
        pdfs.append(
            DiagGmm(
                np.abs(rng.random(m)) + 0.1,
                rng.normal(size=(m, 13)) * 2,
                0.3 + rng.random((m, 13)),
            )
        )
    for p in pdfs:
        p.weights = p.weights / p.weights.sum()
    am = AmDiagGmm(pdfs)
    feats = jnp.asarray(rng.normal(size=(200, 13)).astype(np.float32))
    packed = pack_gmm_weights(am)
    out = np.asarray(gmm_loglikes_pallas(feats, packed))
    ref = np.asarray(gmm_loglikes_reference(feats, am))
    assert out.shape == ref.shape == (200, 37)
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)
