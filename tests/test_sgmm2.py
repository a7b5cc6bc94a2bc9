"""SGMM2 tests (reference src/sgmm2/am-sgmm2{,-test}.cc,
estimate-am-sgmm2.{h,cc}): brute-force likelihood oracle, EM monotonicity
under the alternating update schedule, substate splitting, serialization,
and the CLI chain."""

import numpy as np
import pytest

from old_kaldi_git_tpu.gmm.full_gmm import FullGmm
from old_kaldi_git_tpu.gmm.sgmm2 import (
    AmSgmm2,
    MleAmSgmm2Accs,
    Sgmm2UpdateOptions,
    alternating_flags,
    sgmm2_update,
    split_substates,
)


def _ubm(rng, I=5, D=3):
    covs = []
    for _ in range(I):
        a = rng.normal(size=(D, D)) * 0.2
        covs.append(np.eye(D) + a @ a.T)
    return FullGmm(np.full(I, 1 / I), rng.normal(size=(I, D)) * 2,
                   np.stack(covs))


def _data(rng, J, D, n=200, sep=3.0):
    X = np.concatenate([rng.normal(size=(n, D)) + sep * j for j in range(J)])
    return X, np.repeat(np.arange(J), n)


def test_sgmm2_loglikes_match_bruteforce():
    """The einsum evaluation equals the direct per-(j,m,i) formula."""
    rng = np.random.default_rng(0)
    ubm = _ubm(rng)
    m = AmSgmm2.init(ubm, num_pdfs=2)
    # make it non-trivial: random v's, two substates, random w
    m.v = [rng.normal(size=(2, m.phn_dim)), rng.normal(size=(1, m.phn_dim))]
    m.c = [np.asarray([0.3, 0.7]), np.ones(1)]
    m.w = rng.normal(size=m.w.shape) * 0.5
    m.invalidate()
    X = rng.normal(size=(7, m.dim))
    got = m.loglikes_numpy(X)

    I, D, S = m.M.shape
    sigma = np.linalg.inv(m.sigma_inv)
    want = np.zeros_like(got)
    for t in range(len(X)):
        for j in range(m.num_pdfs):
            total = 0.0
            cj = m.c[j] / m.c[j].sum()
            for mm in range(len(m.v[j])):
                v = m.v[j][mm]
                logits = m.w @ v
                wts = np.exp(logits - logits.max())
                wts = wts / wts.sum()
                for i in range(I):
                    mu = m.M[i] @ v
                    diff = X[t] - mu
                    e = -0.5 * diff @ m.sigma_inv[i] @ diff
                    norm = np.sqrt(
                        (2 * np.pi) ** D * np.linalg.det(sigma[i]))
                    total += cj[mm] * wts[i] * np.exp(e) / norm
            want[t, j] = np.log(total)
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_sgmm2_init_reproduces_ubm_means():
    """v = e1 and M_i = [mu_i | I] → state means equal UBM means."""
    rng = np.random.default_rng(1)
    ubm = _ubm(rng)
    m = AmSgmm2.init(ubm, num_pdfs=3)
    for j in range(3):
        mu = np.einsum("ids,s->id", m.M, m.v[j][0])
        np.testing.assert_allclose(mu, ubm.means, atol=1e-12)


def test_sgmm2_em_monotone_alternating():
    """Avg like/frame is non-decreasing under the vwc/MS alternation and
    the trained model classifies its own data."""
    rng = np.random.default_rng(2)
    ubm = _ubm(rng, I=6, D=4)
    J = 3
    m = AmSgmm2.init(ubm, J)
    X, pdfs = _data(rng, J, 4)
    hist = []
    for it in range(6):
        acc = MleAmSgmm2Accs(m)
        acc.accumulate(m, X, pdfs)
        hist.append(sgmm2_update(m, acc, Sgmm2UpdateOptions(
            update_flags=alternating_flags(it))))
    for a, b in zip(hist, hist[1:]):
        assert b >= a - 1e-6, hist
    assert hist[-1] > hist[0] + 1.0  # actually learned something
    ll = m.loglikes_numpy(X[::7])
    assert (ll.argmax(1) == pdfs[::7]).mean() > 0.9


def test_sgmm2_substate_split_improves():
    """Bimodal data within one pdf, Gaussian pool FROZEN ('vwc' updates
    only, so the substate vectors must do the modeling): one substate can
    only shift all pool means rigidly, so splitting to two substates must
    buy real likelihood."""
    rng = np.random.default_rng(3)
    ubm = _ubm(rng, I=4, D=3)
    m = AmSgmm2.init(ubm, num_pdfs=1)
    X = np.concatenate([rng.normal(size=(200, 3)) - 3,
                        rng.normal(size=(200, 3)) + 3])
    pdfs = np.zeros(len(X), int)

    def em(model, iters):
        last = None
        for _ in range(iters):
            acc = MleAmSgmm2Accs(model)
            acc.accumulate(model, X, pdfs)
            last = sgmm2_update(model, acc, Sgmm2UpdateOptions(
                update_flags="vwc"))
        return last, acc

    base, acc = em(m, 8)
    split_substates(m, acc, target=2, perturb=0.2)
    assert m.num_substates == 2
    after, _ = em(m, 8)
    assert after > base + 0.3, (base, after)
    # the two substate vectors ended up modeling different modes
    mu = np.einsum("ids,ms->mid", m.M, m.v[0]).mean(axis=1)  # [2, D]
    assert np.linalg.norm(mu[0] - mu[1]) > 2.0


def test_sgmm2_accs_sum_equals_single_pass():
    rng = np.random.default_rng(4)
    ubm = _ubm(rng)
    m = AmSgmm2.init(ubm, 2)
    X, pdfs = _data(rng, 2, 3, n=60)
    whole = MleAmSgmm2Accs(m)
    whole.accumulate(m, X, pdfs)
    a = MleAmSgmm2Accs(m)
    b = MleAmSgmm2Accs(m)
    a.accumulate(m, X[:50], pdfs[:50])
    b.accumulate(m, X[50:], pdfs[50:])
    a.add(b)
    np.testing.assert_allclose(a.Y, whole.Y, rtol=1e-9)
    np.testing.assert_allclose(a.S, whole.S, rtol=1e-9)
    for j in range(2):
        np.testing.assert_allclose(a.gamma[j], whole.gamma[j], rtol=1e-9)
        np.testing.assert_allclose(a.y[j], whole.y[j], rtol=1e-9)
    assert a.total_frames == pytest.approx(whole.total_frames)


def test_sgmm2_serialization_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    ubm = _ubm(rng)
    m = AmSgmm2.init(ubm, 2)
    m.v[0] = rng.normal(size=(2, m.phn_dim))
    m.c[0] = np.asarray([0.4, 0.6])
    m.w = rng.normal(size=m.w.shape)
    m.invalidate()
    p = str(tmp_path / "sgmm")
    with open(p, "wb") as f:
        m.write(f)
    with open(p, "rb") as f:
        m2 = AmSgmm2.read(f)
    X = rng.normal(size=(5, m.dim))
    np.testing.assert_allclose(
        m2.loglikes_numpy(X), m.loglikes_numpy(X), atol=1e-3)

    acc = MleAmSgmm2Accs(m)
    X2, pdfs2 = _data(rng, 2, m.dim, n=30)
    acc.accumulate(m, X2, pdfs2)
    ap = str(tmp_path / "accs")
    acc.save(ap)
    acc2 = MleAmSgmm2Accs.load(ap, m)
    np.testing.assert_allclose(acc2.Y, acc.Y, rtol=1e-12)
    np.testing.assert_allclose(acc2.gamma[0], acc.gamma[0], rtol=1e-12)
    assert acc2.total_like == pytest.approx(acc.total_like)


def test_sgmm2_spk_adapted_loglikes_match_bruteforce():
    """With a speaker subspace, loglikes(spk_vec) equal the direct formula
    with means M_i v_jm + N_i v_s."""
    rng = np.random.default_rng(10)
    ubm = _ubm(rng)
    m = AmSgmm2.init(ubm, num_pdfs=2)
    m.v = [rng.normal(size=(2, m.phn_dim)), rng.normal(size=(1, m.phn_dim))]
    m.c = [np.asarray([0.3, 0.7]), np.ones(1)]
    m.w = rng.normal(size=m.w.shape) * 0.5
    m.init_speaker_subspace(2)
    m.N = rng.normal(size=m.N.shape) * 0.5  # non-trivial projections
    m.invalidate()
    vs = rng.normal(size=2)
    X = rng.normal(size=(5, m.dim))
    got = m.loglikes_numpy(X, spk_vec=vs)

    I, D, S = m.M.shape
    sigma = np.linalg.inv(m.sigma_inv)
    off = np.einsum("idt,t->id", m.N, vs)
    want = np.zeros_like(got)
    for t in range(len(X)):
        for j in range(m.num_pdfs):
            total = 0.0
            cj = m.c[j] / m.c[j].sum()
            for mm in range(len(m.v[j])):
                v = m.v[j][mm]
                logits = m.w @ v
                wts = np.exp(logits - logits.max())
                wts = wts / wts.sum()
                for i in range(I):
                    mu = m.M[i] @ v + off[i]
                    diff = X[t] - mu
                    e = -0.5 * diff @ m.sigma_inv[i] @ diff
                    norm = np.sqrt(
                        (2 * np.pi) ** D * np.linalg.det(sigma[i]))
                    total += cj[mm] * wts[i] * np.exp(e) / norm
            want[t, j] = np.log(total)
    np.testing.assert_allclose(got, want, rtol=1e-8)
    # zero speaker vector ≡ unadapted
    np.testing.assert_allclose(
        m.loglikes_numpy(X, spk_vec=np.zeros(2)), m.loglikes_numpy(X),
        rtol=1e-12)


def test_sgmm2_spk_vector_estimation_recovers_offset():
    """Data generated with a known offset inside the speaker subspace:
    estimate_spk_vector recovers it and adaptation buys likelihood."""
    from old_kaldi_git_tpu.gmm.sgmm2 import estimate_spk_vector

    rng = np.random.default_rng(11)
    ubm = _ubm(rng, I=5, D=4)
    J = 3
    m = AmSgmm2.init(ubm, J)
    m.init_speaker_subspace(2)  # N_i = identity cols 0,1
    v_true = np.asarray([1.5, -2.0])
    n = 120
    pdfs = np.repeat(np.arange(J), n)
    # sample from each pdf's dominant Gaussian + the speaker offset
    X = []
    for j in range(J):
        mu = np.einsum("ids,s->id", m.M, m.v[j][0])  # [I, D] = UBM means
        i = j % m.num_gauss
        X.append(mu[i] + np.concatenate([v_true, np.zeros(2)])
                 + 0.3 * rng.normal(size=(n, 4)))
    X = np.concatenate(X)
    vs = estimate_spk_vector(m, X, pdfs, num_iters=3)
    assert np.linalg.norm(vs - v_true) < 0.5, vs
    ll_un = m.loglikes_numpy(X)[np.arange(len(X)), pdfs].mean()
    ll_ad = m.loglikes_numpy(X, spk_vec=vs)[np.arange(len(X)), pdfs].mean()
    assert ll_ad > ll_un + 0.5, (ll_un, ll_ad)


def test_sgmm2_update_N_improves_adapted_likelihood():
    """Accumulating with per-speaker vectors and updating N ('N' flag)
    raises the speaker-adapted likelihood."""
    from old_kaldi_git_tpu.gmm.sgmm2 import estimate_spk_vector

    rng = np.random.default_rng(12)
    ubm = _ubm(rng, I=4, D=4)
    J = 2
    m = AmSgmm2.init(ubm, J)
    m.init_speaker_subspace(2)
    # two speakers with different true offsets NOT exactly in the initial
    # subspace span direction magnitudes
    offs = {"s0": np.asarray([2.0, 0.5, 0.8, 0.0]),
            "s1": np.asarray([-1.0, 1.5, -0.6, 0.0])}
    data = {}
    n = 100
    for spk, off in offs.items():
        pdfs = np.repeat(np.arange(J), n)
        X = []
        for j in range(J):
            mu = np.einsum("ids,s->id", m.M, m.v[j][0])
            i = j % m.num_gauss
            X.append(mu[i] + off + 0.3 * rng.normal(size=(n, 4)))
        data[spk] = (np.concatenate(X), pdfs)

    def adapted_like(model):
        tot, cnt = 0.0, 0
        for spk, (X, pdfs) in data.items():
            vs = estimate_spk_vector(model, X, pdfs)
            ll = model.loglikes_numpy(X, spk_vec=vs)
            tot += ll[np.arange(len(X)), pdfs].sum()
            cnt += len(X)
        return tot / cnt

    before = adapted_like(m)
    acc = MleAmSgmm2Accs(m)
    for spk, (X, pdfs) in data.items():
        vs = estimate_spk_vector(m, X, pdfs)
        acc.accumulate(m, X, pdfs, spk_vec=vs)
    assert acc.Y_N is not None and np.abs(acc.Y_N).sum() > 0
    sgmm2_update(m, acc, Sgmm2UpdateOptions(update_flags="N"))
    after = adapted_like(m)
    assert after >= before - 1e-9, (before, after)
    # and a full alternating pass including N keeps improving
    for it, flags in enumerate(["vwc", "MS", "N"]):
        acc = MleAmSgmm2Accs(m)
        for spk, (X, pdfs) in data.items():
            vs = estimate_spk_vector(m, X, pdfs)
            acc.accumulate(m, X, pdfs, spk_vec=vs)
        sgmm2_update(m, acc, Sgmm2UpdateOptions(update_flags=flags))
    final = adapted_like(m)
    assert final > before, (before, final)


def test_sgmm2_spk_serialization_roundtrip(tmp_path):
    rng = np.random.default_rng(13)
    ubm = _ubm(rng)
    m = AmSgmm2.init(ubm, 2)
    m.init_speaker_subspace(2)
    m.N = rng.normal(size=m.N.shape)
    m.invalidate()
    p = str(tmp_path / "sgmm_spk")
    with open(p, "wb") as f:
        m.write(f)
    with open(p, "rb") as f:
        m2 = AmSgmm2.read(f)
    assert m2.spk_dim == 2
    vs = rng.normal(size=2)
    X = rng.normal(size=(4, m.dim))
    np.testing.assert_allclose(
        m2.loglikes_numpy(X, spk_vec=vs), m.loglikes_numpy(X, spk_vec=vs),
        atol=1e-3)
    # accs with speaker stats round-trip
    acc = MleAmSgmm2Accs(m)
    acc.accumulate(m, X, np.zeros(4, int), spk_vec=vs)
    ap = str(tmp_path / "accs_spk")
    acc.save(ap)
    acc2 = MleAmSgmm2Accs.load(ap, m)
    np.testing.assert_allclose(acc2.Y_N, acc.Y_N, rtol=1e-12)
    np.testing.assert_allclose(acc2.Q_N, acc.Q_N, rtol=1e-12)


def test_sgmm2_spk_accs_shift_consistency():
    """Accumulating with spk_vec equals accumulating UNADAPTED stats on a
    model whose point of view is the shifted features: the speaker-
    canonical Y/S/y/gamma from (X, v_s) must match plain stats collected
    on X when N v_s happens to be a GLOBAL shift (N_i identical), where
    x - o is the same for every Gaussian."""
    rng = np.random.default_rng(14)
    ubm = _ubm(rng, I=4, D=3)
    m = AmSgmm2.init(ubm, 2)
    m.init_speaker_subspace(2)
    # identical N_i for all i → offset is Gaussian-independent
    N0 = rng.normal(size=(3, 2))
    m.N = np.broadcast_to(N0, m.N.shape).copy()
    m.invalidate()
    vs = rng.normal(size=2)
    off = N0 @ vs
    X, pdfs = _data(rng, 2, 3, n=40)
    a = MleAmSgmm2Accs(m)
    a.accumulate(m, X, pdfs, spk_vec=vs)
    b = MleAmSgmm2Accs(m)
    b.accumulate(m, X - off, pdfs)
    np.testing.assert_allclose(a.Y, b.Y, rtol=1e-8)
    np.testing.assert_allclose(a.S, b.S, rtol=1e-7)
    for j in range(2):
        np.testing.assert_allclose(a.gamma[j], b.gamma[j], rtol=1e-8)
        np.testing.assert_allclose(a.y[j], b.y[j], rtol=1e-8)


def test_sgmm2_recipe_runs(tmp_path):
    """recipes/sgmm2.train_sgmm2 with fixed alignments: runs the
    alternating EM schedule end-to-end and the result round-trips."""
    from old_kaldi_git_tpu.fst.lang import Lang, Lexicon
    from old_kaldi_git_tpu.gmm.diag_gmm import AmDiagGmm, AmGmmModel, DiagGmm
    from old_kaldi_git_tpu.gmm.sgmm2 import Sgmm2Model
    from old_kaldi_git_tpu.hmm.topology import HmmTopology
    from old_kaldi_git_tpu.hmm.transition_model import TransitionModel
    from old_kaldi_git_tpu.recipes.sgmm2 import Sgmm2TrainOptions, train_sgmm2
    from old_kaldi_git_tpu.tree.context_dep import monophone_context_dependency

    rng = np.random.default_rng(0)
    lex = Lexicon.from_dict({"yes": "Y EH S", "no": "N OW"})
    lang = Lang(lex, silence_phone="SIL", sil_prob=0.5)
    phones = lang.real_phone_ids
    topo = HmmTopology.standard(phones, silence_phones=[lang.silence_id])
    cd = monophone_context_dependency(
        phones, {p: topo.num_pdf_classes(p) for p in phones})
    tm = TransitionModel(cd, topo)
    D = 4
    am = AmDiagGmm([
        DiagGmm(np.ones(1), rng.normal(size=(1, D)) * 2,
                0.5 + rng.random((1, D)))
        for _ in range(cd.num_pdfs)])
    base = AmGmmModel(tm, am)
    tid2pdf = tm.tid_to_pdf_array()
    # frames sampled from each pdf's own Gaussian; alignment = self-loop tids
    self_loops = {}
    for tid in range(1, tm.num_tids + 1):
        self_loops.setdefault(int(tid2pdf[tid]), tid)
    feats, alis = {}, {}
    for u in range(6):
        pdf_seq = rng.choice(cd.num_pdfs, size=30)
        feats[f"u{u}"] = np.stack([
            am.pdfs[p].means[0]
            + np.sqrt(am.pdfs[p].vars[0]) * rng.normal(size=D)
            for p in pdf_seq]).astype(np.float32)
        alis[f"u{u}"] = np.asarray(
            [self_loops[int(p)] for p in pdf_seq], np.int32)

    model = train_sgmm2(base, feats, alis, opts=Sgmm2TrainOptions(
        num_iters=4, num_ubm_gauss=8,
        total_substates=cd.num_pdfs + 4))
    assert isinstance(model, Sgmm2Model)
    assert model.sgmm.num_substates >= cd.num_pdfs + 4
    ll = model.sgmm.loglikes_numpy(feats["u0"])
    assert ll.shape == (30, cd.num_pdfs) and np.isfinite(ll).all()
    p = str(tmp_path / "sgmm.mdl")
    model.save(p)
    m2 = Sgmm2Model.load(p)
    np.testing.assert_allclose(
        m2.sgmm.loglikes_numpy(feats["u0"]), ll, atol=1e-3)


def test_sgmm2_symmetric_loglikes_match_bruteforce():
    """Symmetric SGMM: with u_i and a speaker vector, the mixture weights
    become softmax_i(w_i.v_jm + u_i.v_s) and the means gain N_i v_s; the
    einsum path must equal the direct per-(j,m,i) formula (reference
    am-sgmm2.cc speaker-dependent weights)."""
    rng = np.random.default_rng(20)
    ubm = _ubm(rng)
    m = AmSgmm2.init(ubm, num_pdfs=2)
    m.v = [rng.normal(size=(2, m.phn_dim)), rng.normal(size=(1, m.phn_dim))]
    m.c = [np.asarray([0.4, 0.6]), np.ones(1)]
    m.w = rng.normal(size=m.w.shape) * 0.5
    m.init_speaker_subspace(2, symmetric=True)
    m.N = rng.normal(size=m.N.shape) * 0.5
    m.u = rng.normal(size=m.u.shape) * 0.7
    m.invalidate()
    vs = rng.normal(size=2)
    X = rng.normal(size=(5, m.dim))
    got = m.loglikes_numpy(X, spk_vec=vs)

    I, D, S = m.M.shape
    sigma = np.linalg.inv(m.sigma_inv)
    off = np.einsum("idt,t->id", m.N, vs)
    bias = m.u @ vs
    want = np.zeros_like(got)
    for t in range(len(X)):
        for j in range(m.num_pdfs):
            total = 0.0
            cj = m.c[j] / m.c[j].sum()
            for mm in range(len(m.v[j])):
                v = m.v[j][mm]
                logits = m.w @ v + bias
                wts = np.exp(logits - logits.max())
                wts = wts / wts.sum()
                for i in range(I):
                    mu = m.M[i] @ v + off[i]
                    diff = X[t] - mu
                    e = -0.5 * diff @ m.sigma_inv[i] @ diff
                    norm = np.sqrt(
                        (2 * np.pi) ** D * np.linalg.det(sigma[i]))
                    total += cj[mm] * wts[i] * np.exp(e) / norm
            want[t, j] = np.log(total)
    np.testing.assert_allclose(got, want, rtol=1e-8)
    # u = 0 or vs = 0 degrades to the plain speaker-subspace model
    m0 = AmSgmm2(m.M, m.w, m.sigma_inv, m.v, m.c, N=m.N)
    np.testing.assert_allclose(
        m.loglikes_numpy(X, spk_vec=np.zeros(2)), m0.loglikes_numpy(X),
        rtol=1e-12)


def test_sgmm2_symmetric_u_update_improves_adapted_likelihood():
    """Two speakers whose Gaussian usage is biased in opposite subspace
    directions: accumulating with spk vectors and updating 'u' must raise
    the total speaker-adapted likelihood (EM step on the weight term,
    reference estimate-am-sgmm2.cc UpdateU)."""
    rng = np.random.default_rng(21)
    ubm = _ubm(rng, I=4, D=4)
    J = 2
    m = AmSgmm2.init(ubm, J)
    m.init_speaker_subspace(2, symmetric=True)
    spk_vecs = {"s0": np.asarray([1.2, -0.5]),
                "s1": np.asarray([-0.8, 0.9])}
    # speaker-dependent component usage: each speaker draws from a
    # different dominant Gaussian of the pool for the same pdf
    n = 150
    data = {}
    for k, (spk, _) in enumerate(spk_vecs.items()):
        pdfs = np.repeat(np.arange(J), n)
        X = []
        for j in range(J):
            i = (j + k) % m.num_gauss
            mu = m.M[i] @ m.v[j][0]
            X.append(mu + 0.4 * rng.normal(size=(n, 4)))
        data[spk] = (np.concatenate(X), pdfs)

    def adapted_ll():
        tot = 0.0
        for spk, (X, pdfs) in data.items():
            ll = m.loglikes_numpy(X, spk_vec=spk_vecs[spk])
            tot += float(ll[np.arange(len(X)), pdfs].sum())
        return tot

    ll0 = adapted_ll()
    accs = MleAmSgmm2Accs(m)
    assert accs.a_u is not None
    for spk, (X, pdfs) in data.items():
        accs.accumulate(m, X, pdfs, spk_vec=spk_vecs[spk])
    sgmm2_update(m, accs, Sgmm2UpdateOptions(update_flags="u"))
    assert np.abs(m.u).sum() > 0  # the update moved u
    ll1 = adapted_ll()
    assert ll1 > ll0, (ll0, ll1)
    # a second EM iteration must not decrease it either
    accs2 = MleAmSgmm2Accs(m)
    for spk, (X, pdfs) in data.items():
        accs2.accumulate(m, X, pdfs, spk_vec=spk_vecs[spk])
    sgmm2_update(m, accs2, Sgmm2UpdateOptions(update_flags="u"))
    assert adapted_ll() >= ll1 - 1e-6


def test_sgmm2_symmetric_spk_vector_estimation():
    """estimate_spk_vector on a symmetric model includes the weight term:
    it still recovers a known mean offset, and adaptation helps."""
    from old_kaldi_git_tpu.gmm.sgmm2 import estimate_spk_vector

    rng = np.random.default_rng(22)
    ubm = _ubm(rng, I=5, D=4)
    J = 3
    m = AmSgmm2.init(ubm, J)
    m.init_speaker_subspace(2, symmetric=True)
    m.u = 0.3 * rng.normal(size=m.u.shape)
    m.invalidate()
    v_true = np.asarray([1.0, -1.5])
    n = 120
    pdfs = np.repeat(np.arange(J), n)
    X = []
    for j in range(J):
        i = j % m.num_gauss
        mu = m.M[i] @ m.v[j][0]
        X.append(mu + np.concatenate([v_true, np.zeros(2)])
                 + 0.3 * rng.normal(size=(n, 4)))
    X = np.concatenate(X)
    vs = estimate_spk_vector(m, X, pdfs, num_iters=3)
    assert np.all(np.isfinite(vs))
    assert np.linalg.norm(vs - v_true) < 0.7, vs
    ll_un = m.loglikes_numpy(X)[np.arange(len(X)), pdfs].mean()
    ll_ad = m.loglikes_numpy(X, spk_vec=vs)[np.arange(len(X)), pdfs].mean()
    assert ll_ad > ll_un, (ll_un, ll_ad)


def test_sgmm2_symmetric_serialization_roundtrip(tmp_path):
    """Model u and acc a_u/Q_u survive save/load; loglikes identical."""
    from old_kaldi_git_tpu.gmm.sgmm2 import Sgmm2Model
    from old_kaldi_git_tpu.hmm.topology import HmmTopology
    from old_kaldi_git_tpu.hmm.transition_model import TransitionModel
    from old_kaldi_git_tpu.tree.context_dep import (
        monophone_context_dependency,
    )

    rng = np.random.default_rng(23)
    ubm = _ubm(rng)
    m = AmSgmm2.init(ubm, num_pdfs=3)
    m.init_speaker_subspace(2, symmetric=True)
    m.u = rng.normal(size=m.u.shape)
    m.invalidate()
    phones = [1, 2, 3]
    topo = HmmTopology.standard(phones)
    cd = monophone_context_dependency(
        phones, {p: topo.num_pdf_classes(p) for p in phones})
    tm = TransitionModel(cd, topo)
    p = str(tmp_path / "sym.mdl")
    Sgmm2Model(tm, m).save(p)
    m2 = Sgmm2Model.load(p).sgmm
    assert m2.u is not None
    np.testing.assert_allclose(m2.u, m.u, atol=1e-6)
    X = rng.normal(size=(4, m.dim))
    vs = rng.normal(size=2)
    np.testing.assert_allclose(
        m2.loglikes_numpy(X, spk_vec=vs), m.loglikes_numpy(X, spk_vec=vs),
        atol=1e-4)

    accs = MleAmSgmm2Accs(m)
    accs.accumulate(m, X, np.zeros(4, np.int64), spk_vec=vs)
    ap = str(tmp_path / "sym.acc")
    accs.save(ap)
    accs2 = MleAmSgmm2Accs.load(ap, m)
    np.testing.assert_allclose(accs2.a_u, accs.a_u, rtol=1e-12)
    np.testing.assert_allclose(accs2.Q_u, accs.Q_u, rtol=1e-12)


def test_sgmm2_fmllr_recovers_affine_distortion():
    """fMLLR for SGMM2 (reference fmllr-sgmm2.cc): data generated from the
    model then pushed through a known affine distortion; the estimated W
    must (a) raise the auxiliary, (b) approximately invert the distortion,
    and (c) raise the per-frame likelihood of the transformed features."""
    from old_kaldi_git_tpu.gmm.sgmm2_fmllr import (
        FmllrSgmm2Accs,
        FmllrSgmm2Options,
        estimate_sgmm2_fmllr,
        sgmm2_fmllr_objf_improvement,
    )

    rng = np.random.default_rng(30)
    ubm = _ubm(rng, I=4, D=3)
    J = 3
    m = AmSgmm2.init(ubm, J)
    # distinct per-pdf vectors: fMLLR given an alignment is only
    # identifiable when the pdf means differ (at init all v are equal and
    # the posteriors are not pinned by the alignment)
    m.v = [2.0 * rng.normal(size=(1, m.phn_dim)) for _ in range(J)]
    m.invalidate()
    n = 300
    pdfs = np.repeat(np.arange(J), n)
    # sample from each pdf's dominant Gaussian WITH the model covariance —
    # ML fMLLR rescales any data/model variance mismatch through log|det A|
    # (that is correct behaviour, not a bug), so recovery of the inverse
    # distortion needs model-matched scatter
    sigma = np.linalg.inv(m.sigma_inv)
    chol = np.linalg.cholesky(sigma)
    X_model = []
    for j in range(J):
        i = int(np.argmax(m.w @ m.v[j][0]))  # dominant by weight
        mu = m.M[i] @ m.v[j][0]
        X_model.append(
            mu + rng.normal(size=(n, 3)) @ chol[i].T)
    X_model = np.concatenate(X_model)
    # observed = distorted model-space features
    A0 = np.eye(3) + 0.25 * rng.normal(size=(3, 3))
    b0 = np.asarray([0.8, -0.5, 0.3])
    X_obs = X_model @ A0.T + b0

    accs = FmllrSgmm2Accs(m)
    accs.accumulate(m, X_obs, pdfs)
    W = estimate_sgmm2_fmllr(m, accs, FmllrSgmm2Options(num_iters=20))
    assert W is not None
    impr = sgmm2_fmllr_objf_improvement(m, accs, W)
    assert impr > 0.1, impr
    # W should approximately invert the distortion
    comp = W[:, :3] @ A0  # ≈ I
    off = W[:, :3] @ b0 + W[:, 3]  # ≈ 0
    assert np.abs(comp - np.eye(3)).max() < 0.25, comp
    assert np.abs(off).max() < 0.4, off
    # likelihood of transformed features beats the untransformed ones
    X_ad = X_obs @ W[:, :3].T + W[:, 3]
    ll_un = m.loglikes_numpy(X_obs)[np.arange(len(X_obs)), pdfs].mean()
    ll_ad = m.loglikes_numpy(X_ad)[np.arange(len(X_ad)), pdfs].mean()
    assert ll_ad > ll_un + 0.2, (ll_un, ll_ad)
    # low-count guard returns None
    small = FmllrSgmm2Accs(m)
    small.accumulate(m, X_obs[:5], pdfs[:5])
    assert estimate_sgmm2_fmllr(m, small) is None


def test_sgmm2_fmllr_accs_sum_and_speaker_terms():
    """Acc addition is linear, and speaker offsets/symmetric bias thread
    through accumulation without breaking the estimate."""
    from old_kaldi_git_tpu.gmm.sgmm2_fmllr import (
        FmllrSgmm2Accs,
        estimate_sgmm2_fmllr,
    )

    rng = np.random.default_rng(31)
    ubm = _ubm(rng, I=4, D=3)
    m = AmSgmm2.init(ubm, 2)
    m.init_speaker_subspace(2, symmetric=True)
    m.u = 0.2 * rng.normal(size=m.u.shape)
    m.invalidate()
    X = rng.normal(size=(120, 3)) * 1.5
    pdfs = np.repeat(np.arange(2), 60)
    vs = rng.normal(size=2)
    whole = FmllrSgmm2Accs(m)
    whole.accumulate(m, X, pdfs, spk_vec=vs)
    a = FmllrSgmm2Accs(m)
    a.accumulate(m, X[:50], pdfs[:50], spk_vec=vs)
    b = FmllrSgmm2Accs(m)
    b.accumulate(m, X[50:], pdfs[50:], spk_vec=vs)
    a.add(b)
    np.testing.assert_allclose(a.L, whole.L, rtol=1e-10)
    np.testing.assert_allclose(a.G, whole.G, rtol=1e-10)
    assert a.beta == pytest.approx(whole.beta)
    W = estimate_sgmm2_fmllr(m, whole)
    assert W is not None and np.isfinite(W).all()
