"""VAD + PLDA tests (SURVEY §2.7 ivector subsystem)."""

import jax.numpy as jnp
import numpy as np

from old_kaldi_git_tpu.ivector.plda import Plda, PldaStats, estimate_plda
from old_kaldi_git_tpu.ivector.vad import VadOptions, compute_vad_energy


def test_vad_energy_basic():
    rng = np.random.default_rng(0)
    # speech frames: high energy; silence: low
    e = np.full((2, 100), 1.0)
    e[0, 40:70] = 12.0
    e[1, :20] = 14.0
    vad = np.asarray(compute_vad_energy(jnp.asarray(e), VadOptions(
        vad_energy_threshold=5.0, vad_energy_mean_scale=0.5)))
    assert vad[0, 50] == 1.0 and vad[0, 10] == 0.0
    assert vad[1, 5] == 1.0 and vad[1, 50] == 0.0
    # context smoothing fills isolated holes / strips isolated spikes
    e2 = np.full((1, 60), 1.0)
    e2[0, 30] = 20.0  # single spike
    v2 = np.asarray(compute_vad_energy(jnp.asarray(e2), VadOptions(
        vad_energy_threshold=5.0, vad_energy_mean_scale=0.0,
        vad_frames_context=2, vad_proportion_threshold=0.6)))
    assert v2[0, 30] == 0.0  # lone spike voted out


def test_vad_mask_respects_num_frames():
    e = np.full((1, 50), 10.0)
    vad = np.asarray(compute_vad_energy(
        jnp.asarray(e), VadOptions(vad_energy_threshold=1.0,
                                   vad_energy_mean_scale=0.0),
        num_frames=np.array([30])))
    assert vad[0, :30].all() and not vad[0, 30:].any()


def _synth_speakers(rng, num_spk=20, per_spk=10, dim=8):
    between = rng.normal(size=(dim, dim)); between = between @ between.T / dim
    within = 0.1 * np.eye(dim)
    mu = rng.normal(size=dim) * 3
    data = {}
    for k in range(num_spk):
        y = rng.multivariate_normal(mu, between)
        data[k] = rng.multivariate_normal(y, within, size=per_spk)
    return data


def test_plda_separates_speakers():
    rng = np.random.default_rng(1)
    data = _synth_speakers(rng)
    dim = 8
    stats = PldaStats(dim)
    for k, x in data.items():
        stats.add_samples(x)
    plda = estimate_plda(stats, num_em_iters=5)
    # psi sorted descending, nonnegative
    assert (np.diff(plda.psi) <= 1e-9).all() and (plda.psi >= 0).all()

    # score: enroll on first half, test on second half
    same_scores, diff_scores = [], []
    enrolled = {}
    for k, x in data.items():
        e = plda.transform_ivector(x[:5].mean(axis=0))
        enrolled[k] = e
    for k, x in data.items():
        for t in x[5:]:
            ut = plda.transform_ivector(t)
            same_scores.append(plda.log_likelihood_ratio(enrolled[k], 5, ut))
            other = (k + 1) % len(data)
            diff_scores.append(plda.log_likelihood_ratio(enrolled[other], 5, ut))
    same, diff = np.array(same_scores), np.array(diff_scores)
    # strong separation: EER proxy — same-speaker scores dominate
    assert np.median(same) > np.median(diff) + 5.0
    assert (same > diff).mean() > 0.95


def test_plda_llr_n_scaling():
    """More enrollment examples sharpen the same-speaker distribution."""
    rng = np.random.default_rng(2)
    data = _synth_speakers(rng, num_spk=10, per_spk=20)
    stats = PldaStats(8)
    for k, x in data.items():
        stats.add_samples(x)
    plda = estimate_plda(stats, num_em_iters=5)
    gains = []
    for k, x in data.items():
        u1 = plda.transform_ivector(x[:1].mean(axis=0))
        u10 = plda.transform_ivector(x[:10].mean(axis=0))
        for t in x[10:]:
            ut = plda.transform_ivector(t)
            s1 = plda.log_likelihood_ratio(u1, 1, ut)
            s10 = plda.log_likelihood_ratio(u10, 10, ut)
            gains.append(s10 - s1)
    # on average, 10-example enrollment scores true trials higher than
    # 1-example enrollment (sharper same-speaker predictive)
    assert np.mean(gains) > 0.0
