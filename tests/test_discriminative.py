"""MPE/sMBR signed lattice posteriors + fMPE feature transform tests
(reference src/lat/lattice-functions.cc LatticeForwardBackwardMpeVariants,
src/transform/fmpe.{h,cc})."""

import numpy as np
import pytest

from old_kaldi_git_tpu.lat.discriminative import forward_backward_mpe_variants
from old_kaldi_git_tpu.lat.lattice import Lattice, LatticeArc


class _FakeTm:
    """tid == phone; pdf = tid - 1 (tids are 1-based)."""

    def tid_to_phone(self, t):
        return int(t)

    def tid_to_pdf(self, t):
        return int(t) - 1

    def tid_to_pdf_array(self, max_tid: int = 64):
        return np.arange(-1, max_tid, dtype=np.int64)


def _two_path_lattice(cost_a=0.0, cost_b=0.0, frames=2):
    """Two parallel linear paths: path A emits tid 1 every frame, path B
    tid 2.  Per-arc acoustic costs cost_a / cost_b."""
    lat = Lattice()
    states_a = [lat.add_state() for _ in range(frames)]
    states_b = [lat.add_state() for _ in range(frames - 1)]
    end = lat.add_state()
    lat.start = states_a[0]
    chain_a = states_a + [end]
    chain_b = [states_a[0]] + states_b + [end]
    for i in range(frames):
        lat.arcs[chain_a[i]].append(
            LatticeArc(1, 0, 0.0, cost_a, chain_a[i + 1]))
        lat.arcs[chain_b[i]].append(
            LatticeArc(2, 0, 0.0, cost_b, chain_b[i + 1]))
    lat.finals[end] = (0.0, 0.0)
    return lat


def test_mpe_post_signs_and_zero_sum():
    """Equal-cost paths: correct-phone arcs get +0.5·(acc−avg), wrong −;
    per-frame signed mass sums to zero."""
    lat = _two_path_lattice()
    post, acc = forward_backward_mpe_variants(
        lat, _FakeTm(), ref_alignment=[1, 1], criterion="mpfe", ac_scale=1.0)
    assert acc == pytest.approx(1.0)  # E[path acc] = 0.5*2 + 0.5*0
    assert len(post) == 2
    for frame in post:
        d = dict(frame)
        assert d[1] == pytest.approx(0.5)   # 0.5 * (2 - 1)
        assert d[2] == pytest.approx(-0.5)
        assert sum(d.values()) == pytest.approx(0.0, abs=1e-9)


def test_mpe_post_weighting_follows_likelihood():
    """Cheaper correct path → its positive mass shrinks (already likely);
    per-frame zero-sum still holds."""
    lat = _two_path_lattice(cost_a=0.0, cost_b=2.0)
    post, acc = forward_backward_mpe_variants(
        lat, _FakeTm(), [1, 1], ac_scale=1.0)
    p_a = 1.0 / (1.0 + np.exp(-4.0))  # path A posterior (2 frames, cost 2)
    assert acc == pytest.approx(2 * p_a)
    d = dict(post[0])
    # gamma_a * (2 - avg) with avg = 2*p_a
    assert d[1] == pytest.approx(p_a * (2 - 2 * p_a))
    assert d[1] + d[2] == pytest.approx(0.0, abs=1e-9)
    assert d[1] > 0 > d[2]


def test_mpe_vs_smbr_criterion():
    """tids 1 and 3 share pdf? No — pdf = tid-1, so distinct; but make a
    ref where phone differs yet pdf matches to split the criteria."""

    class Tm(_FakeTm):
        def tid_to_pdf(self, t):
            return 0  # every tid shares one pdf

    lat = _two_path_lattice()
    post_mpe, acc_mpe = forward_backward_mpe_variants(
        lat, Tm(), [1, 1], criterion="mpfe", ac_scale=1.0)
    post_smbr, acc_smbr = forward_backward_mpe_variants(
        lat, Tm(), [1, 1], criterion="smbr", ac_scale=1.0)
    assert acc_mpe == pytest.approx(1.0)
    assert acc_smbr == pytest.approx(2.0)  # all arcs pdf-correct
    assert post_smbr[0] == [] or all(
        w == pytest.approx(0.0, abs=1e-9) for _, w in post_smbr[0])


def test_mpe_silence_phones_score_zero():
    lat = _two_path_lattice()
    post, acc = forward_backward_mpe_variants(
        lat, _FakeTm(), [1, 1], silence_phones=[1], ac_scale=1.0)
    # the only matching phone is silence → all accuracies 0 → no signal
    assert acc == pytest.approx(0.0)
    for frame in post:
        for _, w in frame:
            assert w == pytest.approx(0.0, abs=1e-9)


# ---------------------------------------------------------------------------
# fMPE
# ---------------------------------------------------------------------------


def _toy_setup(rng, dim=3, num_pdfs=3, ubm_gauss=8):
    from old_kaldi_git_tpu.gmm.diag_gmm import AmDiagGmm, DiagGmm

    pdfs = [DiagGmm(np.ones(1), rng.normal(size=(1, dim)) * 2,
                    0.5 + rng.random((1, dim))) for _ in range(num_pdfs)]
    am = AmDiagGmm(pdfs)
    ubm = DiagGmm(np.full(ubm_gauss, 1 / ubm_gauss),
                  rng.normal(size=(ubm_gauss, dim)) * 2,
                  0.5 + rng.random((ubm_gauss, dim)))
    return am, ubm


def test_fmpe_context_adjoint():
    """<C u, v> == <u, C^T v> for the context layer."""
    from old_kaldi_git_tpu.transform.fmpe import Fmpe

    rng = np.random.default_rng(0)
    _, ubm = _toy_setup(rng)
    f = Fmpe.init(ubm)
    T, D, C = 9, ubm.dim, len(f.contexts)
    u = rng.normal(size=(T, C * D))
    v = rng.normal(size=(T, D))
    lhs = np.sum(f._apply_context(u) * v)
    rhs = np.sum(u * f._apply_context_reverse(v))
    assert lhs == pytest.approx(rhs, rel=1e-10)


def test_fmpe_update_improves_objective():
    """One acc/update step on a fixed signed posterior must increase
    F = sum_t sum_(tid,w) w * loglike_{pdf(tid)}(x'_t)."""
    from old_kaldi_git_tpu.transform.fmpe import (
        Fmpe,
        model_deriv_direct,
    )

    rng = np.random.default_rng(1)
    am, ubm = _toy_setup(rng)
    fmpe = Fmpe.init(ubm)
    tm = _FakeTm()
    T = 40
    x = rng.normal(size=(T, am.dim)) * 2
    # signed post: pull toward pdf 0, away from pdf 1 (tids are 1-based)
    post = [[(1, 1.0), (2, -1.0)] for _ in range(T)]

    def objf(feats):
        ll = am.loglikes_numpy(feats)
        return float(sum(w * ll[t, tm.tid_to_pdf(tid)]
                         for t in range(T) for tid, w in post[t]))

    f0 = objf(x + fmpe.offsets(x))
    deriv = model_deriv_direct(am, tm, x + fmpe.offsets(x), post)
    accs = fmpe.acc_from_deriv(x, deriv)
    step = fmpe.update(accs, learning_rate=0.02)
    assert step > 0
    f1 = objf(x + fmpe.offsets(x))
    assert f1 > f0


def test_fmpe_indirect_differential_matches_fd():
    """The composite objective F(x, λ_ML(x)) — model ML-re-estimated from
    the (fMPE) features each outer iteration — has gradient
    direct + indirect.  With single-component pdfs the chain rule through
    the ML mean/var maps is exact: check against central finite
    differences of the full composite."""
    from old_kaldi_git_tpu.gmm.diag_gmm import AmDiagGmm, DiagGmm
    from old_kaldi_git_tpu.transform.fmpe import (
        ModelDerivStats,
        model_deriv_direct,
        model_deriv_indirect,
    )

    rng = np.random.default_rng(7)
    D, J, T = 2, 2, 24
    tm = _FakeTm()
    ali = np.asarray([1 + (t % J) for t in range(T)])  # tids 1..J
    x0 = rng.normal(size=(T, D)) * 1.5
    signed_post = [[(1 + rng.integers(0, J), float(rng.normal()))]
                   for _ in range(T)]

    def ml_model(x):
        pdfs = []
        for j in range(J):
            sel = x[ali == j + 1]
            mu = sel.mean(axis=0)
            var = (sel ** 2).mean(axis=0) - mu ** 2
            pdfs.append(DiagGmm(np.ones(1), mu[None], var[None]))
        return AmDiagGmm(pdfs)

    def F(x):
        am = ml_model(x)
        ll = am.loglikes_numpy(x)
        return float(sum(w * ll[t, tm.tid_to_pdf(tid)]
                         for t in range(T)
                         for tid, w in signed_post[t]))

    am0 = ml_model(x0)
    stats = ModelDerivStats(am0)
    stats.accumulate(am0, tm, x0, signed_post, ali)
    total = (model_deriv_direct(am0, tm, x0, signed_post)
             + model_deriv_indirect(am0, tm, x0, ali, stats))

    eps = 1e-5
    for t, d in [(0, 0), (3, 1), (11, 0), (17, 1), (23, 0)]:
        xp = x0.copy(); xp[t, d] += eps
        xm = x0.copy(); xm[t, d] -= eps
        fd = (F(xp) - F(xm)) / (2 * eps)
        assert total[t, d] == pytest.approx(fd, rel=2e-4, abs=1e-6), (
            t, d, fd, total[t, d])
    # and the direct term ALONE must not match (the indirect part is a
    # real contribution on this problem)
    direct = model_deriv_direct(am0, tm, x0, signed_post)
    t, d = 3, 1
    xp = x0.copy(); xp[t, d] += eps
    xm = x0.copy(); xm[t, d] -= eps
    fd = (F(xp) - F(xm)) / (2 * eps)
    assert abs(direct[t, d] - fd) > 100 * abs(total[t, d] - fd)


def test_fmpe_indirect_stats_sum(tmp_path):
    """ModelDerivStats: two half accumulations sum to the whole; save/load
    round-trips."""
    from old_kaldi_git_tpu.transform.fmpe import ModelDerivStats

    rng = np.random.default_rng(8)
    am, _ = _toy_setup(rng)
    tm = _FakeTm()
    T = 20
    x = rng.normal(size=(T, am.dim))
    post = [[(1 + rng.integers(0, 3), float(rng.normal()))]
            for _ in range(T)]
    ali = np.asarray([1 + (t % 3) for t in range(T)])
    whole = ModelDerivStats(am)
    whole.accumulate(am, tm, x, post, ali)
    a = ModelDerivStats(am)
    a.accumulate(am, tm, x[:12], post[:12], ali[:12])
    b = ModelDerivStats(am)
    b.accumulate(am, tm, x[12:], post[12:], ali[12:])
    a.add(b)
    for j in range(3):
        np.testing.assert_allclose(a.s1_s[j], whole.s1_s[j], rtol=1e-10)
        np.testing.assert_allclose(a.ml_occ[j], whole.ml_occ[j], rtol=1e-10)
    p = str(tmp_path / "dstats")
    whole.save(p)
    back = ModelDerivStats.load(p, am)
    for j in range(3):
        np.testing.assert_allclose(back.s2_s[j], whole.s2_s[j], rtol=1e-10)
        np.testing.assert_allclose(back.occ_s[j], whole.occ_s[j], rtol=1e-10)


def test_fmpe_serialization_roundtrip(tmp_path):
    from old_kaldi_git_tpu.transform.fmpe import Fmpe, FmpeAccs

    rng = np.random.default_rng(2)
    _, ubm = _toy_setup(rng)
    f = Fmpe.init(ubm, post_scale=3.0, num_gselect=4)
    f.proj[:] = rng.normal(size=f.proj.shape)
    p = str(tmp_path / "fmpe")
    f.save(p)
    f2 = Fmpe.load(p)
    np.testing.assert_allclose(f2.proj, f.proj, atol=1e-6)
    assert f2.post_scale == pytest.approx(3.0)
    assert f2.num_gselect == 4
    assert f2.contexts == f.contexts
    x = rng.normal(size=(12, ubm.dim))
    np.testing.assert_allclose(f2.apply(x), f.apply(x), atol=1e-4)

    a = FmpeAccs.zeros_like(f)
    a.pos += rng.random(a.pos.shape)
    a.neg += rng.random(a.neg.shape)
    ap = str(tmp_path / "accs")
    a.save(ap)
    a2 = FmpeAccs.load(ap)
    np.testing.assert_allclose(a2.pos, a.pos, atol=1e-12)
    np.testing.assert_allclose(a2.neg, a.neg, atol=1e-12)


def test_fmpe_gselect_sparsity():
    """num_gselect keeps only the top-N Gaussian blocks nonzero."""
    from old_kaldi_git_tpu.transform.fmpe import Fmpe

    rng = np.random.default_rng(3)
    _, ubm = _toy_setup(rng, ubm_gauss=10)
    f = Fmpe.init(ubm, num_gselect=3)
    x = rng.normal(size=(5, ubm.dim))
    h = f.expand(x)
    D1 = ubm.dim + 1
    nonzero_blocks = (np.abs(h.reshape(5, 10, D1)).sum(axis=2) > 0).sum(axis=1)
    assert (nonzero_blocks <= 3).all()


# ---------------------------------------------------------------------------
# nnet3 discriminative sequence training
# (reference src/nnet3/nnet-discriminative-training.{h,cc})
# ---------------------------------------------------------------------------


def _nnet_system(rng, D=6, P=2):
    from old_kaldi_git_tpu.models.am_nnet import AmNnet
    from old_kaldi_git_tpu.models.tdnn import TdnnConfig, TdnnLayerSpec

    cfg = TdnnConfig(D, P, (TdnnLayerSpec("tdnn", 16, (-1, 0, 1)),))
    am = AmNnet.init(cfg, seed=0)
    am.log_priors = np.log(np.full(P, 1.0 / P, np.float32))
    return am


def test_discriminative_grad_zero_sum_per_frame():
    from old_kaldi_git_tpu.models.discriminative import discriminative_grad

    rng = np.random.default_rng(0)
    tm = _FakeTm()
    T, P = 4, 2
    ll = rng.normal(size=(T, P))
    for crit in ("mmi", "smbr", "mpfe"):
        lat = _two_path_lattice(frames=T)
        g, objf = discriminative_grad(tm, ll, [1] * T, lat, criterion=crit)
        assert g.shape == (T, P)
        np.testing.assert_allclose(g.sum(axis=1), 0.0, atol=1e-9)
        assert np.isfinite(objf)


def test_nnet3_discriminative_training_improves():
    """Two-path lattices, reference path = pdf 0: sequence training must
    raise the objective (expected accuracy / MMI) on the training data."""
    import jax.numpy as jnp

    from old_kaldi_git_tpu.models.discriminative import (
        DiscriminativeOptions,
        compute_discriminative_objf,
        train_discriminative,
    )

    rng = np.random.default_rng(1)
    tm = _FakeTm()
    am = _nnet_system(rng)
    T = 12
    feats, alis, lats = {}, {}, {}
    for u in range(8):
        feats[f"u{u}"] = rng.normal(
            size=(T, 6)).astype(np.float32) + 0.5
        alis[f"u{u}"] = np.full(T, 1, np.int32)  # ref = tid 1 = pdf 0
        lats[f"u{u}"] = _two_path_lattice(frames=T)

    for crit in ("smbr", "mmi"):
        opts = DiscriminativeOptions(
            criterion=crit, num_epochs=4, minibatch_size=4,
            learning_rate=0.05, acoustic_scale=1.0)
        before = compute_discriminative_objf(
            am, feats, alis, lats, tm, opts)
        am2 = train_discriminative(am, feats, alis, lats, tm, opts)
        after = compute_discriminative_objf(
            am2, feats, alis, lats, tm, opts)
        assert after > before + 1e-3, (crit, before, after)
        # trained model scores pdf 0 above pdf 1 on this data
        ll = np.asarray(am2.loglikes_batch(
            jnp.asarray(feats["u0"][None])))[0]
        assert (ll[:, 0] > ll[:, 1]).mean() > 0.8
