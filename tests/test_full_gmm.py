"""Full-covariance GMM + gselect + full-cov i-vector tests.

Covers parity targets SURVEY §2.3 (full-gmm.h / mle-full-gmm.cc),
gmm-gselect / fgmm-global-* tool semantics, and the §2.7 note that the
reference IvectorExtractor uses a full-covariance UBM.
"""

import io

import numpy as np
import pytest

from old_kaldi_git_tpu.gmm.diag_gmm import DiagGmm
from old_kaldi_git_tpu.gmm.full_gmm import (
    AccumFullGmm,
    FullGmm,
    gselect,
    loglikes_preselect,
    mle_full_gmm_update,
    train_full_ubm,
)
from old_kaldi_git_tpu.ivector.extractor import (
    IvectorExtractor,
    acc_ivector_extractor_stats,
    est_ivector_extractor,
    extract_ivector,
    init_ivector_extractor,
    train_ivector_extractor,
    train_ubm,
)


def _rand_full_gmm(rng, m=3, d=4):
    w = rng.dirichlet(np.ones(m))
    means = rng.standard_normal((m, d))
    a = rng.standard_normal((m, d, d)) * 0.3
    covars = np.einsum("mde,mfe->mdf", a, a) + 0.5 * np.eye(d)
    return FullGmm(w, means, covars)


def test_full_gmm_matches_scipy_style_density():
    rng = np.random.default_rng(0)
    gmm = _rand_full_gmm(rng)
    x = rng.standard_normal((7, 4))
    comp = gmm.component_loglikes(x)
    # manual per-component multivariate normal log-density
    for mi in range(gmm.num_mix):
        diff = x - gmm.means[mi]
        icv = np.linalg.inv(gmm.covars[mi])
        _, logdet = np.linalg.slogdet(gmm.covars[mi])
        ref = (np.log(gmm.weights[mi])
               - 0.5 * (4 * np.log(2 * np.pi) + logdet)
               - 0.5 * np.einsum("td,de,te->t", diff, icv, diff))
        np.testing.assert_allclose(comp[:, mi], ref, rtol=1e-10, atol=1e-10)


def test_full_gmm_batch_matches_host_path():
    rng = np.random.default_rng(1)
    gmm = _rand_full_gmm(rng, m=5, d=6)
    x = rng.standard_normal((11, 6)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(gmm.component_loglikes_batch(x)),
        gmm.component_loglikes(x), rtol=2e-4, atol=2e-4)
    post = np.asarray(gmm.posteriors_batch(x))
    np.testing.assert_allclose(post.sum(1), 1.0, rtol=1e-5)


def test_full_from_diag_roundtrip_density():
    """With diagonal covariances FullGmm must equal DiagGmm exactly."""
    rng = np.random.default_rng(2)
    diag = DiagGmm(rng.dirichlet(np.ones(4)), rng.standard_normal((4, 3)),
                   0.5 + rng.random((4, 3)))
    full = FullGmm.from_diag(diag)
    x = rng.standard_normal((9, 3))
    np.testing.assert_allclose(full.loglikes(x), diag.loglikes(x),
                               rtol=1e-8, atol=1e-8)
    back = full.to_diag()
    np.testing.assert_allclose(back.vars, diag.vars)


def test_gselect_ranked_topn():
    rng = np.random.default_rng(3)
    diag = DiagGmm(rng.dirichlet(np.ones(16)),
                   rng.standard_normal((16, 5)) * 3, 0.5 + rng.random((16, 5)))
    x = rng.standard_normal((20, 5)).astype(np.float32)
    gsel = gselect(diag, x, num_gselect=4)
    assert gsel.shape == (20, 4)
    # exact check against a brute-force per-component loglike
    full = FullGmm.from_diag(diag)
    ref = full.component_loglikes(x)
    for t in range(20):
        want = np.argsort(-ref[t])[:4]
        assert set(gsel[t]) == set(want)
        # ranked best-first
        got = ref[t][gsel[t]]
        assert np.all(np.diff(got) <= 1e-9)
    # preselect loglike with all components == full loglike
    gall = gselect(diag, x, num_gselect=16)
    np.testing.assert_allclose(loglikes_preselect(full, x, gall),
                               full.loglikes(x), rtol=1e-5, atol=1e-5)


def test_full_ubm_em_learns_correlation():
    """EM on correlated data: full-cov UBM should beat its diagonal seed."""
    rng = np.random.default_rng(4)
    rot = np.linalg.qr(rng.standard_normal((4, 4)))[0]
    z = rng.standard_normal((1500, 4)) * np.array([2.0, 1.0, 0.3, 0.1])
    x = (z @ rot.T + np.array([1.0, -1.0, 0.0, 2.0])).astype(np.float64)
    diag = train_ubm(x, num_gauss=2, num_iters=4, seed=0)
    full = train_full_ubm(diag, [x[:750], x[750:]], num_iters=4,
                          num_gselect=2)
    assert full.loglikes(x).mean() > FullGmm.from_diag(diag).loglikes(x).mean()
    # covariances became genuinely non-diagonal
    off = np.abs(full.covars - np.stack(
        [np.diag(np.diag(c)) for c in full.covars])).max()
    assert off > 0.05


def test_mle_full_update_starved_components_kept_or_removed():
    rng = np.random.default_rng(5)
    gmm = _rand_full_gmm(rng, m=3, d=2)
    accs = AccumFullGmm(3, 2)
    x = rng.standard_normal((200, 2)) + 5.0
    accs.accumulate(gmm, x)
    # starve component with least mass by zeroing its stats
    dead = int(np.argmin(accs.occ))
    accs.occ[dead] = 0.0
    kept = mle_full_gmm_update(gmm, accs, min_gaussian_occupancy=1.0)
    assert kept.num_mix == 3
    np.testing.assert_allclose(kept.means[dead], gmm.means[dead])
    removed = mle_full_gmm_update(gmm, accs, min_gaussian_occupancy=1.0,
                                  remove_low_count=True)
    assert removed.num_mix == 2


def test_fgmm_accs_io_roundtrip():
    rng = np.random.default_rng(6)
    gmm = _rand_full_gmm(rng, m=2, d=3)
    accs = AccumFullGmm(2, 3)
    accs.accumulate(gmm, rng.standard_normal((50, 3)))
    buf = io.BytesIO()
    accs.write(buf)
    buf.seek(0)
    back = AccumFullGmm.read(buf)
    np.testing.assert_allclose(back.occ, accs.occ)
    np.testing.assert_allclose(back.cov_acc, accs.cov_acc, rtol=1e-12)
    assert back.tot_like == pytest.approx(accs.tot_like)
    # summation (fgmm-global-sum-accs role)
    back.add(accs)
    np.testing.assert_allclose(back.occ, 2 * accs.occ)


def test_gmm_and_full_gmm_file_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    full = _rand_full_gmm(rng)
    full.save(str(tmp_path / "f.ubm"))
    loaded = FullGmm.load(str(tmp_path / "f.ubm"))
    np.testing.assert_allclose(loaded.covars, full.covars, rtol=1e-6,
                               atol=1e-6)
    diag = full.to_diag()
    diag.save(str(tmp_path / "d.ubm"))
    dl = DiagGmm.load(str(tmp_path / "d.ubm"))
    np.testing.assert_allclose(dl.means, diag.means, rtol=1e-6, atol=1e-6)


def test_ivector_extractor_io_roundtrip(tmp_path):
    rng = np.random.default_rng(8)
    full = _rand_full_gmm(rng, m=4, d=3)
    ext = init_ivector_extractor(full, ivector_dim=5, seed=1)
    ext.save(str(tmp_path / "final.ie"))
    back = IvectorExtractor.load(str(tmp_path / "final.ie"))
    assert isinstance(back.ubm, FullGmm)
    np.testing.assert_allclose(back.T, ext.T, rtol=1e-12)
    x = rng.standard_normal((60, 3))
    np.testing.assert_allclose(extract_ivector(back, x),
                               extract_ivector(ext, x), rtol=1e-5, atol=1e-5)
    # diag-UBM variant
    ext2 = init_ivector_extractor(full.to_diag(), ivector_dim=5)
    ext2.save(str(tmp_path / "d.ie"))
    back2 = IvectorExtractor.load(str(tmp_path / "d.ie"))
    assert isinstance(back2.ubm, DiagGmm)
    np.testing.assert_allclose(back2.T, ext2.T, rtol=1e-12)


def test_ivector_training_with_full_cov_ubm():
    """train_ivector_extractor over a FullGmm UBM: the map/reduce split
    (acc + est) must equal the one-call path, and i-vectors separate
    the two synthetic 'speakers'."""
    rng = np.random.default_rng(9)
    d = 6
    shift = rng.standard_normal(d)
    utts_a = [rng.standard_normal((80, d)) + 0.9 * shift for _ in range(4)]
    utts_b = [rng.standard_normal((80, d)) - 0.9 * shift for _ in range(4)]
    utts = utts_a + utts_b
    diag = train_ubm(np.concatenate(utts), num_gauss=4, num_iters=3)
    full = train_full_ubm(diag, utts, num_iters=2)
    ext = train_ivector_extractor(full, utts, ivector_dim=2, num_iters=3)

    # split-job accumulation == joint accumulation
    ext0 = init_ivector_extractor(full, ivector_dim=2, seed=0)
    a1, b1, _ = acc_ivector_extractor_stats(ext0, utts[:4])
    a2, b2, _ = acc_ivector_extractor_stats(ext0, utts[4:])
    aj, bj, _ = acc_ivector_extractor_stats(ext0, utts)
    np.testing.assert_allclose(a1 + a2, aj, rtol=1e-9)
    np.testing.assert_allclose(b1 + b2, bj, rtol=1e-9)
    est = est_ivector_extractor(ext0, a1 + a2, b1 + b2)
    assert est.T.shape == ext0.T.shape

    iva = np.stack([extract_ivector(ext, u) for u in utts_a])
    ivb = np.stack([extract_ivector(ext, u) for u in utts_b])
    within = max(iva.std(0).max(), ivb.std(0).max())
    between = np.linalg.norm(iva.mean(0) - ivb.mean(0))
    assert between > 2.0 * within
