"""M5 tests: LDA, MLLT, fMLLR units + triphone/LDA+MLLT/SAT E2E."""

import numpy as np
import pytest

from old_kaldi_git_tpu.gmm.diag_gmm import AmDiagGmm, DiagGmm
from old_kaldi_git_tpu.transform.fmllr import (
    FmllrAccs,
    apply_affine_transform,
    compute_fmllr_transform,
)
from old_kaldi_git_tpu.transform.lda import LdaEstimate
from old_kaldi_git_tpu.transform.mllt import MlltAccs, update_mllt


def test_lda_separates_classes():
    """Two classes separated along one axis; LDA dim-1 must align with it."""
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(500, 5)) * [1, 1, 1, 1, 1]
    x1 = rng.normal(size=(500, 5)) + [4, 0, 0, 0, 0]
    lda = LdaEstimate(2, 5)
    lda.accumulate(x0, np.zeros(500, int))
    lda.accumulate(x1, np.ones(500, int))
    a = lda.estimate(2)
    assert a.shape == (2, 5)
    # the first discriminant direction is dominated by dim 0
    d0 = np.abs(a[0]) / np.linalg.norm(a[0])
    assert d0[0] > 0.8
    # projected within-class covariance ≈ identity
    proj = np.concatenate([(x0 - x0.mean(0)) @ a.T, (x1 - x1.mean(0)) @ a.T])
    cov = np.cov(proj.T)
    np.testing.assert_allclose(np.diag(cov), 1.0, atol=0.15)


def _toy_am(rng, num_pdfs=3, dim=4):
    pdfs = [
        DiagGmm(np.ones(1), rng.normal(size=(1, dim)) * 2, 0.5 + rng.random((1, dim)))
        for _ in range(num_pdfs)
    ]
    return AmDiagGmm(pdfs)


def test_mllt_identity_when_diag():
    """Data generated from the model's own diagonal Gaussians → MLLT ≈ I
    (nothing to gain)."""
    rng = np.random.default_rng(1)
    am = _toy_am(rng)
    feats, pdfs = [], []
    for pdf in range(3):
        g = am.pdfs[pdf]
        feats.append(g.means[0] + np.sqrt(g.vars[0]) * rng.normal(size=(400, 4)))
        pdfs.append(np.full(400, pdf))
    feats = np.concatenate(feats)
    pdfs = np.concatenate(pdfs)
    accs = MlltAccs(4)
    accs.accumulate(am, feats, pdfs)
    m, impr = update_mllt(accs)
    assert impr < 0.05
    np.testing.assert_allclose(np.abs(np.diag(m)), 1.0, atol=0.15)


def test_mllt_recovers_rotation_gain():
    """Correlated data (rotated) → MLLT finds a transform with positive gain."""
    rng = np.random.default_rng(2)
    am = _toy_am(rng)
    theta = 0.6
    rot = np.eye(4)
    rot[0, 0], rot[0, 1], rot[1, 0], rot[1, 1] = (
        np.cos(theta), -np.sin(theta), np.sin(theta), np.cos(theta),
    )
    feats, pdfs = [], []
    for pdf in range(3):
        g = am.pdfs[pdf]
        raw = np.sqrt(g.vars[0]) * rng.normal(size=(400, 4)) * [2.0, 0.3, 1, 1]
        feats.append(g.means[0] + raw @ rot.T)
        pdfs.append(np.full(400, pdf))
    accs = MlltAccs(4)
    accs.accumulate(am, np.concatenate(feats), np.concatenate(pdfs))
    m, impr = update_mllt(accs)
    assert impr > 0.05


def test_fmllr_recovers_affine_shift():
    """Features shifted+scaled away from the model; fMLLR must undo it and
    improve the likelihood."""
    rng = np.random.default_rng(3)
    am = _toy_am(rng)
    feats, pdfs = [], []
    for pdf in range(3):
        g = am.pdfs[pdf]
        feats.append(g.means[0] + np.sqrt(g.vars[0]) * rng.normal(size=(300, 4)))
        pdfs.append(np.full(300, pdf))
    clean = np.concatenate(feats)
    pdfs = np.concatenate(pdfs)
    # corrupt: y = 1.3 x + 0.8
    corrupted = 1.3 * clean + 0.8
    accs = FmllrAccs(4)
    accs.accumulate(am, corrupted, pdfs)
    w = compute_fmllr_transform(accs, min_count=10.0)
    assert w is not None
    restored = apply_affine_transform(corrupted, w)
    # restored should be close to clean in distribution: compare likelihoods
    def tot_like(x):
        return sum(
            am.pdfs[p].loglikes(x[pdfs == p]).sum() for p in range(3)
        )
    assert tot_like(restored) > tot_like(corrupted) + 100
    # the recovered square part should invert the 1.3 scaling
    np.testing.assert_allclose(np.diag(w[:, :4]), 1 / 1.3, atol=0.1)


@pytest.mark.slow
def test_triphone_pipeline_e2e():
    """BASELINE config 2 shape: mono → tri (deltas) → LDA+MLLT → SAT,
    each stage decodes the synthetic yesno test set at low WER."""
    from old_kaldi_git_tpu.decoder.csr import fst_to_csr
    from old_kaldi_git_tpu.decoder.graph import mkgraph
    from old_kaldi_git_tpu.fst.lang import make_unigram_grammar_fst
    from old_kaldi_git_tpu.recipes.decode import DecodeOptions, decode_dataset, score_hyps
    from old_kaldi_git_tpu.recipes.gmm_common import GmmTrainOptions
    from old_kaldi_git_tpu.recipes.mono import train_mono
    from old_kaldi_git_tpu.recipes.triphone import (
        estimate_fmllr_per_speaker,
        splice_numpy,
        train_deltas,
        train_lda_mllt,
    )
    from old_kaldi_git_tpu.recipes.yesno import (
        compute_feats,
        compute_static_feats,
        make_corpus,
        make_lang,
    )
    from old_kaldi_git_tpu.transform.fmllr import apply_affine_transform

    train_waves, train_text, test_waves, test_text = make_corpus(24, 8)
    train_feats = compute_feats(train_waves)
    test_feats = compute_feats(test_waves)
    lang = make_lang()
    fast = GmmTrainOptions(num_iters=8, totgauss=60, realign_iters=(1, 2, 3, 4, 6))
    mono_model, mono_ali = train_mono(train_feats, train_text, lang, fast)

    # tri1: deltas
    tri_model, tri_tree, tri_ali = train_deltas(
        train_feats, train_text, lang, mono_model, mono_ali,
        num_leaves=60, opts=fast,
    )
    assert tri_tree.num_pdfs >= mono_model.am.num_pdfs
    g = make_unigram_grammar_fst(list(train_text.values()), lang.words)
    hclg = mkgraph(lang, g, tri_tree, tri_model.tm)
    csr = fst_to_csr(hclg, tri_model.tm.tid_to_pdf_array())
    hyps = decode_dataset(tri_model, csr, lang, test_feats, DecodeOptions(beam=20.0))
    tri_stats = score_hyps(test_text, hyps)
    assert tri_stats.wer <= 5.0, f"tri1 {tri_stats.report()}"

    # tri2: LDA+MLLT on statics
    train_static = compute_static_feats(train_waves)
    test_static = compute_static_feats(test_waves)
    res = train_lda_mllt(
        train_static, train_text, lang, tri_model, tri_ali,
        num_leaves=60, target_dim=20, mllt_iters=(2, 4), opts=fast,
    )
    hclg2 = mkgraph(lang, g, res.ctx_dep, res.model.tm)
    csr2 = fst_to_csr(hclg2, res.model.tm.tid_to_pdf_array())
    test_lda = {
        k: (splice_numpy(v) @ res.transform.T).astype(np.float32)
        for k, v in test_static.items()
    }
    hyps2 = decode_dataset(res.model, csr2, lang, test_lda, DecodeOptions(beam=20.0))
    lda_stats = score_hyps(test_text, hyps2)
    assert lda_stats.wer <= 5.0, f"tri2b {lda_stats.report()}"

    # fMLLR decode pass (transform estimation on test alignments = unsupervised
    # two-pass adaptation, reference gmm-est-fmllr decode flow)
    utt2spk = {k: k.split("_")[0] for k in test_lda}
    from old_kaldi_git_tpu.decoder.viterbi import ViterbiOptions
    first_pass_ali = {}
    # align test utts to their own 1-best using decode results as supervision
    hyp_texts = {k: v for k, v in hyps2.items() if v}
    from old_kaldi_git_tpu.decoder.graph import GraphCompiler
    gc = GraphCompiler(lang, res.ctx_dep, res.model.tm)
    from old_kaldi_git_tpu.recipes.gmm_common import align_all, pad_feats
    keys, fp, nf = pad_feats({k: test_lda[k] for k in hyp_texts})
    graphs = [
        fst_to_csr(gc.compile_graph_from_text(hyp_texts[k]),
                   res.model.tm.tid_to_pdf_array())
        for k in keys
    ]
    alis, _ = align_all(res.model.am, graphs, fp, nf, ViterbiOptions(beam=32.0))
    ali_map = {k: a for k, a in zip(keys, alis) if a is not None}
    transforms = estimate_fmllr_per_speaker(
        res.model, test_lda, ali_map, utt2spk, min_count=50.0
    )
    assert transforms, "no fMLLR transforms estimated"
    adapted = {
        k: apply_affine_transform(v, transforms[utt2spk[k]])
        if utt2spk[k] in transforms else v
        for k, v in test_lda.items()
    }
    hyps3 = decode_dataset(res.model, csr2, lang, adapted, DecodeOptions(beam=20.0))
    sat_stats = score_hyps(test_text, hyps3)
    assert sat_stats.wer <= 5.0, f"fmllr decode {sat_stats.report()}"


# ---------------------------------------------------------------------------
# basis-fMLLR (reference src/transform/basis-fmllr-diag-gmm.{h,cc}) + gpost
# ---------------------------------------------------------------------------


def _affine_corrupt(rng, clean, scale_spread=0.15, shift_spread=0.5):
    d = clean.shape[1]
    a = np.eye(d) + scale_spread * rng.normal(size=(d, d)) / np.sqrt(d)
    b = shift_spread * rng.normal(size=d)
    return clean @ a.T + b


def _speaker_data(rng, am, frames_per_pdf):
    feats, pdfs = [], []
    for pdf in range(am.num_pdfs):
        g = am.pdfs[pdf]
        feats.append(
            g.means[0] + np.sqrt(g.vars[0]) * rng.normal(
                size=(frames_per_pdf, am.dim)))
        pdfs.append(np.full(frames_per_pdf, pdf))
    return np.concatenate(feats), np.concatenate(pdfs)


def test_basis_fmllr_tiny_data_beats_full():
    """With ~45 adaptation frames, full fMLLR refuses (min-count) while
    basis-fMLLR (few coefficients) still improves the likelihood —
    the reference's motivating use case."""
    from old_kaldi_git_tpu.transform.basis_fmllr import (
        compute_fmllr_basis_transform,
        estimate_fmllr_basis,
    )

    rng = np.random.default_rng(7)
    am = _toy_am(rng, num_pdfs=3, dim=4)
    # training speakers: each sees the model through its own affine channel
    spk_accs = []
    for _ in range(12):
        clean, pdfs = _speaker_data(rng, am, 200)
        corrupted = _affine_corrupt(rng, clean)
        acc = FmllrAccs(4)
        acc.accumulate(am, corrupted, pdfs)
        spk_accs.append(acc)
    basis = estimate_fmllr_basis(spk_accs)
    assert basis.dim == 4 and basis.num_bases >= 10

    # test speaker: 45 frames only
    clean, pdfs = _speaker_data(rng, am, 15)
    corrupted = _affine_corrupt(rng, clean)
    acc = FmllrAccs(4)
    acc.accumulate(am, corrupted, pdfs)
    assert compute_fmllr_transform(acc, min_count=500.0) is None
    res = compute_fmllr_basis_transform(acc, basis)
    assert res is not None
    w, n, impr = res
    assert 1 <= n <= basis.num_bases
    assert impr > 0.01  # per-frame auxiliary gain
    restored = apply_affine_transform(corrupted, w)

    def tot_like(x):
        return sum(
            am.pdfs[p].loglikes(x[pdfs == p]).sum() for p in range(3))

    assert tot_like(restored) > tot_like(corrupted)


def test_basis_fmllr_ample_data_approaches_full():
    from old_kaldi_git_tpu.transform.basis_fmllr import (
        compute_fmllr_basis_transform,
        estimate_fmllr_basis,
    )
    from old_kaldi_git_tpu.transform.fmllr import FmllrAccs as FA

    rng = np.random.default_rng(11)
    am = _toy_am(rng, num_pdfs=3, dim=4)
    spk_accs = []
    for _ in range(10):
        clean, pdfs = _speaker_data(rng, am, 250)
        acc = FA(4)
        acc.accumulate(am, _affine_corrupt(rng, clean), pdfs)
        spk_accs.append(acc)
    basis = estimate_fmllr_basis(spk_accs)

    clean, pdfs = _speaker_data(rng, am, 400)
    corrupted = _affine_corrupt(rng, clean)
    acc = FA(4)
    acc.accumulate(am, corrupted, pdfs)
    from old_kaldi_git_tpu.transform.basis_fmllr import _aux_objf
    w_full = compute_fmllr_transform(acc, min_count=10.0)
    full_gain = _aux_objf(w_full, acc) - _aux_objf(
        np.concatenate([np.eye(4), np.zeros((4, 1))], axis=1), acc)
    res = compute_fmllr_basis_transform(acc, basis, num_iters=20)
    assert res is not None
    w_b, n, impr = res
    assert impr * acc.beta > 0.6 * full_gain


def test_gpost_path_matches_post_path():
    """gmm-post-to-gpost → accumulate_gpost must produce exactly the stats
    of the direct posterior path (same model, same features)."""
    from old_kaldi_git_tpu.hmm.posterior import post_to_gpost

    class _TM:  # trivial tid→pdf map: tid-1 == pdf
        def tid_to_pdf(self, tid):
            return tid - 1

    rng = np.random.default_rng(3)
    # 2-mix GMMs so gpost vectors are non-trivial
    pdfs_list = [
        DiagGmm(np.array([0.6, 0.4]), rng.normal(size=(2, 4)) * 2,
                0.5 + rng.random((2, 4)))
        for _ in range(3)
    ]
    am = AmDiagGmm(pdfs_list)
    clean, pdfs = _speaker_data(rng, am, 50)
    post = [[(int(p) + 1, 0.7)] for p in pdfs]

    acc_direct = FmllrAccs(4)
    acc_direct.accumulate(
        am, clean, pdfs, weights=np.full(len(pdfs), 0.7))

    gpost = post_to_gpost(post, _TM(), am, clean)
    acc_g = FmllrAccs(4)
    acc_g.accumulate_gpost(am, clean, gpost)

    np.testing.assert_allclose(acc_g.K, acc_direct.K, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(acc_g.G, acc_direct.G, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(acc_g.beta, acc_direct.beta, rtol=1e-6)


def test_gpost_holder_roundtrip(tmp_path):
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    rng = np.random.default_rng(0)
    gp = [
        [(2, rng.random(3).astype(np.float32)),
         (5, rng.random(2).astype(np.float32))],
        [],
        [(0, rng.random(1).astype(np.float32))],
    ]
    p = tmp_path / "g.ark"
    with TableWriter(f"ark:{p}", "gpost") as w:
        w["utt1"] = gp
    got = dict(SequentialTableReader(f"ark:{p}", "gpost"))["utt1"]
    assert len(got) == 3 and len(got[0]) == 2 and got[1] == []
    assert got[0][0][0] == 2
    np.testing.assert_allclose(got[0][1][1], gp[0][1][1], rtol=1e-6)


def test_basis_fmllr_serialization_roundtrip(tmp_path):
    from old_kaldi_git_tpu.transform.basis_fmllr import BasisFmllr

    rng = np.random.default_rng(1)
    b = BasisFmllr(rng.normal(size=(6, 4, 5)))
    path = str(tmp_path / "fmllr.basis")
    b.save(path)
    b2 = BasisFmllr.load(path)
    np.testing.assert_allclose(b2.mats, b.mats, atol=1e-6)


# ---------------------------------------------------------------------------
# LVTLN (reference src/transform/lvtln.{h,cc})
# ---------------------------------------------------------------------------


def test_lvtln_selects_matching_class():
    from old_kaldi_git_tpu.transform.lvtln import (
        LinearVtln,
        select_lvtln_transform,
        train_lvtln_class,
    )

    rng = np.random.default_rng(5)
    dim = 4
    am = _toy_am(rng, num_pdfs=3, dim=dim)
    warps = [0.9, 1.0, 1.1]
    # true per-warp distortions (identity at warp 1.0)
    dists = [np.eye(dim) + 0.2 * rng.normal(size=(dim, dim)) / np.sqrt(dim)
             for _ in range(3)]
    dists[1] = np.eye(dim)
    lv = LinearVtln.init(dim, warps)
    clean, _pdfs = _speaker_data(rng, am, 400)
    for c, d_mat in enumerate(dists):
        # pairs: (warped feats, unwarped feats) → A_c ≈ distortion⁻¹
        lv.set_transform(c, train_lvtln_class([(clean @ d_mat.T, clean)]))
    np.testing.assert_allclose(lv.mats[1], np.eye(dim), atol=1e-6)
    np.testing.assert_allclose(lv.mats[0] @ dists[0], np.eye(dim), atol=1e-4)

    # speaker distorted with warp-1.1's map → class 2 must win
    x, pdfs = _speaker_data(rng, am, 80)
    corrupted = x @ dists[2].T
    acc = FmllrAccs(dim)
    acc.accumulate(am, corrupted, pdfs)
    w, warp, c, impr = select_lvtln_transform(acc, lv)
    assert c == 2 and warp == 1.1
    assert impr > 0
    restored = apply_affine_transform(corrupted, w)

    def tot_like(y):
        return sum(am.pdfs[p].loglikes(y[pdfs == p]).sum() for p in range(3))

    assert tot_like(restored) > tot_like(corrupted)
    # undistorted speaker → identity class 1, tiny improvement only
    acc2 = FmllrAccs(dim)
    acc2.accumulate(am, x, pdfs)
    _w2, warp2, c2, _i2 = select_lvtln_transform(acc2, lv)
    assert c2 == 1 and warp2 == 1.0


def test_lvtln_serialization(tmp_path):
    from old_kaldi_git_tpu.transform.lvtln import LinearVtln

    rng = np.random.default_rng(0)
    lv = LinearVtln(rng.normal(size=(5, 3, 3)), [0.9, 0.95, 1.0, 1.05, 1.1])
    p = str(tmp_path / "0.lvtln")
    lv.save(p)
    lv2 = LinearVtln.load(p)
    np.testing.assert_allclose(lv2.mats, lv.mats, atol=1e-6)
    assert lv2.warps == pytest.approx(lv.warps)


# ---------------------------------------------------------------------------
# Regression-tree MLLR / fMLLR (reference src/transform/regression-tree.{h,cc},
# regtree-{fmllr,mllr}-diag-gmm.{h,cc})
# ---------------------------------------------------------------------------


def _two_group_am(rng, dim=4, per_group=3):
    """Gaussians in two well-separated mean clusters so a 2-leaf regression
    tree must split them: pdfs [0, per_group) near +5, rest near -5."""
    from old_kaldi_git_tpu.gmm.diag_gmm import AmDiagGmm, DiagGmm

    pdfs = []
    for g, center in enumerate((5.0, -5.0)):
        for _ in range(per_group):
            pdfs.append(DiagGmm(
                np.ones(1),
                center + rng.normal(size=(1, dim)),
                0.5 + rng.random((1, dim)),
            ))
    return AmDiagGmm(pdfs)


def _grouped_speaker(rng, am, frames_per_pdf, n_groups=2):
    feats, pdfs, group = [], [], []
    per_group = am.num_pdfs // n_groups
    for pdf in range(am.num_pdfs):
        g = am.pdfs[pdf]
        feats.append(g.means[0] + np.sqrt(g.vars[0]) * rng.normal(
            size=(frames_per_pdf, am.dim)))
        pdfs.append(np.full(frames_per_pdf, pdf))
        group.append(np.full(frames_per_pdf, pdf // per_group))
    return np.concatenate(feats), np.concatenate(pdfs), np.concatenate(group)


def test_regtree_build_and_serialization(tmp_path):
    from old_kaldi_git_tpu.transform.regtree import RegressionTree

    rng = np.random.default_rng(0)
    am = _two_group_am(rng)
    tree = RegressionTree.build(am, num_baseclasses=2, seed=1)
    assert tree.num_baseclasses == 2
    assert tree.num_nodes == 3 and tree.root == 2
    assert tree.parents[tree.root] == tree.root
    # the two mean clusters land in different leaves
    leaf_of_pdf = [tree.gauss2bclass[p][0] for p in range(am.num_pdfs)]
    assert len(set(leaf_of_pdf[:3])) == 1 and len(set(leaf_of_pdf[3:])) == 1
    assert leaf_of_pdf[0] != leaf_of_pdf[3]
    p = str(tmp_path / "tree")
    tree.save(p)
    t2 = RegressionTree.load(p)
    np.testing.assert_array_equal(t2.parents, tree.parents)
    for a, b in zip(t2.gauss2bclass, tree.gauss2bclass):
        np.testing.assert_array_equal(a, b)


def test_regtree_mllr_per_class_beats_global():
    """Two mean-shifted Gaussian groups: 2-class MLLR must beat both the
    unadapted model and a single global MLLR transform."""
    from old_kaldi_git_tpu.transform.regtree import (
        RegressionTree,
        RegtreeMllrAccs,
        apply_mllr_to_model,
        estimate_regtree_mllr,
    )

    rng = np.random.default_rng(3)
    am = _two_group_am(rng)
    tree = RegressionTree.build(am, num_baseclasses=2, seed=1)
    x, pdfs, grp = _grouped_speaker(rng, am, 200)
    shift = np.where(grp[:, None] == 0, 1.5, -2.0)  # opposite per group
    x = x + shift

    def tot_like(m):
        return sum(m.pdfs[p].loglikes(x[pdfs == p]).sum()
                   for p in range(am.num_pdfs))

    acc = RegtreeMllrAccs(am.dim, tree.num_baseclasses)
    acc.accumulate(am, tree, x, pdfs)
    xf2 = estimate_regtree_mllr(acc, tree, min_count=50.0)
    assert xf2.num_xforms == 2
    # leaves hold 600 frames each, the root 1200: min_count=1000 forces the
    # walk past the leaves to a single real root transform
    xf1 = estimate_regtree_mllr(acc, tree, min_count=1000.0)
    assert xf1.num_xforms == 1
    # and a fully data-starved tree falls back to identity
    xf_id = estimate_regtree_mllr(acc, tree, min_count=1e9)
    np.testing.assert_allclose(xf_id.xforms[0][:, :-1], np.eye(am.dim))
    ll0 = tot_like(am)
    ll1 = tot_like(apply_mllr_to_model(am, tree, xf1))
    ll2 = tot_like(apply_mllr_to_model(am, tree, xf2))
    assert ll2 > ll1 > ll0
    # per-class adapted means track the true shifts
    m2 = apply_mllr_to_model(am, tree, xf2)
    np.testing.assert_allclose(
        m2.pdfs[0].means[0] - am.pdfs[0].means[0], 1.5, atol=0.3)
    np.testing.assert_allclose(
        m2.pdfs[3].means[0] - am.pdfs[3].means[0], -2.0, atol=0.3)


def test_regtree_fmllr_per_class_beats_global():
    """Two differently-distorted feature groups: per-class fMLLR recovers
    both distortions; global fMLLR can only compromise."""
    from old_kaldi_git_tpu.transform.regtree import (
        RegressionTree,
        RegtreeFmllrAccs,
        estimate_regtree_fmllr,
        regtree_fmllr_loglikes,
    )

    rng = np.random.default_rng(4)
    am = _two_group_am(rng)
    tree = RegressionTree.build(am, num_baseclasses=2, seed=1)
    x, pdfs, grp = _grouped_speaker(rng, am, 250)
    dists = [np.eye(am.dim) + 0.25 * rng.normal(size=(am.dim, am.dim))
             / np.sqrt(am.dim) for _ in range(2)]
    y = x.copy()
    for g in range(2):
        sel = grp == g
        y[sel] = x[sel] @ dists[g].T + (0.5 if g else -0.5)

    acc = RegtreeFmllrAccs(am.dim, tree.num_baseclasses)
    acc.accumulate(am, tree, y, pdfs)
    xf2 = estimate_regtree_fmllr(acc, tree, min_count=50.0)
    assert xf2.num_xforms == 2
    # 750/leaf, 1500 at root: min_count=1200 yields one real global transform
    xf1 = estimate_regtree_fmllr(acc, tree, min_count=1200.0)
    assert xf1.num_xforms == 1

    def tot_like(ll):
        return ll[np.arange(len(pdfs)), pdfs].sum()

    ll0 = tot_like(am.loglikes_numpy(y))
    ll1 = tot_like(regtree_fmllr_loglikes(am, tree, xf1, y))
    ll2 = tot_like(regtree_fmllr_loglikes(am, tree, xf2, y))
    assert ll2 > ll1 > ll0


def test_regtree_xform_serialization(tmp_path):
    from old_kaldi_git_tpu.transform.regtree import RegtreeTransform

    rng = np.random.default_rng(0)
    xf = RegtreeTransform("fmllr", rng.normal(size=(2, 3, 4)),
                          [0, 1, 1, 0])
    p = str(tmp_path / "xf")
    xf.save(p)
    x2 = RegtreeTransform.load(p)
    assert x2.kind == "fmllr"
    np.testing.assert_allclose(x2.xforms, xf.xforms, atol=1e-6)
    np.testing.assert_array_equal(x2.bclass2xform, xf.bclass2xform)
    np.testing.assert_allclose(x2.logdets, xf.logdets, atol=1e-5)
