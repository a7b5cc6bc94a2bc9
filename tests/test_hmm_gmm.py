"""M3 tests: topology, transition model, trees, GMMs, H construction."""

import io
import math

import numpy as np
import pytest

from old_kaldi_git_tpu.fst.lang import Lang, Lexicon
from old_kaldi_git_tpu.gmm.diag_gmm import AmDiagGmm, AmGmmModel, DiagGmm
from old_kaldi_git_tpu.gmm.mle import (
    AccumAmDiagGmm,
    MleDiagGmmOptions,
    mixup,
    mle_am_diag_gmm_update,
)
from old_kaldi_git_tpu.hmm.hmm_utils import (
    add_self_loops,
    alignment_to_phones,
    make_h_transducer,
    phone_window_to_fst,
    split_to_phones,
)
from old_kaldi_git_tpu.hmm.topology import NO_PDF, HmmTopology
from old_kaldi_git_tpu.hmm.transition_model import TransitionModel
from old_kaldi_git_tpu.tree.context_dep import (
    ContextDependency,
    monophone_context_dependency,
)
from old_kaldi_git_tpu.tree.event_map import KEY_PDF_CLASS


def _mono_setup():
    phones = [1, 2, 3]
    topo = HmmTopology.standard(phones, silence_phones=[1])
    cd = monophone_context_dependency(
        phones, {p: topo.num_pdf_classes(p) for p in phones}
    )
    tm = TransitionModel(cd, topo)
    return phones, topo, cd, tm


def test_topology_roundtrip():
    topo = HmmTopology.standard([1, 2, 3], silence_phones=[1])
    text = topo.write_text()
    back = HmmTopology.read_text(text)
    assert back.phones == [1, 2, 3]
    assert back.num_pdf_classes(1) == 5  # silence
    assert back.num_pdf_classes(2) == 3
    assert back.write_text() == text


def test_mono_tree():
    phones, topo, cd, tm = _mono_setup()
    # pdfs distinct per (phone, pdf-class)
    seen = set()
    for p in phones:
        for pc in range(topo.num_pdf_classes(p)):
            pdf = cd.compute([p], pc)
            assert pdf not in seen
            seen.add(pdf)
    assert cd.num_pdfs == 5 + 3 + 3


def test_tree_io_roundtrip():
    _, _, cd, _ = _mono_setup()
    buf = io.BytesIO()
    cd.write(buf)
    buf.seek(0)
    back = ContextDependency.read(buf)
    assert back.num_pdfs == cd.num_pdfs
    assert back.compute([2], 1) == cd.compute([2], 1)


def test_transition_model_mappings():
    phones, topo, cd, tm = _mono_setup()
    assert tm.num_tids > 0
    for tid in range(1, tm.num_tids + 1):
        ts = tm.tid_to_tstate(tid)
        phone, hmm_state, pdf = tm.tuples[ts]
        assert tm.tid_to_phone(tid) == phone
        assert tm.tid_to_pdf(tid) == pdf
        assert cd.compute([phone], topo.topology_for_phone(phone)[hmm_state].pdf_class) == pdf
        # pair round-trip
        assert tm.pair_to_tid(ts, tm.tid_to_tindex(tid)) == tid
    arr = tm.tid_to_pdf_array()
    assert arr[0] == -1 and len(arr) == tm.num_tids + 1


def test_transition_model_io_and_update():
    _, _, _, tm = _mono_setup()
    stats = np.zeros(tm.num_tids + 1)
    stats[1] = 90.0
    stats[2] = 10.0
    tm.mle_update(stats)
    assert math.exp(tm.log_probs[1]) == pytest.approx(0.9, abs=0.01)
    buf = io.BytesIO()
    tm.write(buf)
    buf.seek(0)
    back = TransitionModel.read(buf)
    assert back.num_tids == tm.num_tids
    np.testing.assert_allclose(back.log_probs, tm.log_probs, atol=1e-6)
    assert back.tuples == tm.tuples


def test_h_transducer_and_self_loops():
    phones, topo, cd, tm = _mono_setup()
    ilabel_info = [[], [2], [3], [-1]]  # eps, phone 2, phone 3, disambig #1
    ha, disambig_tids = make_h_transducer(ilabel_info, cd, tm)
    assert len(disambig_tids) == 1
    # no self-loops yet
    for s in ha.states():
        for a in ha.arcs[s]:
            assert a.nextstate != s or a.ilabel > tm.num_tids
    hclg = add_self_loops(ha, tm, self_loop_scale=1.0, disambig_tids=disambig_tids)
    loops = sum(
        1 for s in hclg.states() for a in hclg.arcs[s] if a.nextstate == s and a.ilabel <= tm.num_tids and a.ilabel > 0
    )
    assert loops > 0


def test_self_loop_path_probability():
    """With scales (1,1) a complete path with per-state durations (d0,d1,d2)
    must carry probability Π p_self^(d_j-1) * (1-p_self) — reorder semantics
    put each state's self-loop at the arc destination, so conservation is
    per-path, not per-state."""
    import math as m

    phones, topo, cd, tm = _mono_setup()
    piece = phone_window_to_fst([2], cd, tm, transition_scale=1.0)
    full = add_self_loops(piece, tm, self_loop_scale=1.0)
    durations = (2, 1, 3)
    # walk: fwd from state, then (d-1) self-loops at the destination
    total_w = 0.0
    state = full.start
    for d in durations:
        fwd = next(a for a in full.arcs[state] if a.nextstate != state)
        total_w += fwd.weight
        state = fwd.nextstate
        loop = next((a for a in full.arcs[state] if a.nextstate == state), None)
        assert loop is not None
        total_w += (d - 1) * loop.weight
    total_w += full.finals[state]
    expected = 1.0
    for d in durations:
        expected *= (0.75 ** (d - 1)) * 0.25
    assert m.exp(-total_w) == pytest.approx(expected, rel=1e-4)


def test_split_to_phones_roundtrip():
    phones, topo, cd, tm = _mono_setup()
    # reordered-convention alignment for phone 2: fwd(s0), loop(s0), fwd(s1),
    # fwd(s2) — durations (2,1,1)
    ts0 = tm.tuple_to_tstate(2, 0, cd.compute([2], 0))
    ts1 = tm.tuple_to_tstate(2, 1, cd.compute([2], 1))
    ts2 = tm.tuple_to_tstate(2, 2, cd.compute([2], 2))
    ali = [
        tm.pair_to_tid(ts0, 1),          # 0 → 1 (forward is index 1)
        tm.self_loop_tid(ts0),           # reordered self-loop of state 0
        tm.pair_to_tid(ts1, 1),          # 1 → 2
        tm.pair_to_tid(ts2, 1),          # 2 → final
    ]
    segs = split_to_phones(tm, ali)
    assert len(segs) == 1 and len(segs[0]) == 4
    assert alignment_to_phones(tm, ali) == [2]
    ali2 = ali + ali
    assert alignment_to_phones(tm, ali2) == [2, 2]


def test_diag_gmm_loglikes_vs_naive():
    rng = np.random.default_rng(0)
    gmm = DiagGmm(
        np.array([0.3, 0.7]),
        rng.normal(size=(2, 4)),
        0.5 + rng.random(size=(2, 4)),
    )
    x = rng.normal(size=(10, 4))
    ll = gmm.loglikes(x)
    # naive
    from scipy.stats import multivariate_normal

    naive = np.zeros((10, 2))
    for m in range(2):
        naive[:, m] = multivariate_normal(
            gmm.means[m], np.diag(gmm.vars[m])
        ).logpdf(x) + np.log(gmm.weights[m])
    expected = np.log(np.exp(naive).sum(axis=1))
    np.testing.assert_allclose(ll, expected, rtol=1e-6)


def test_am_stacked_matches_numpy():
    rng = np.random.default_rng(1)
    pdfs = []
    for i in range(5):
        m = 1 + i % 3
        pdfs.append(
            DiagGmm(np.ones(m) / m, rng.normal(size=(m, 6)), 0.5 + rng.random((m, 6)))
        )
    am = AmDiagGmm(pdfs)
    x = rng.normal(size=(2, 7, 6)).astype(np.float32)
    batch = np.asarray(am.loglikes_batch(x))
    for b in range(2):
        ref = am.loglikes_numpy(x[b].astype(np.float64))
        np.testing.assert_allclose(batch[b], ref, rtol=1e-3, atol=1e-3)


def test_mle_em_increases_likelihood():
    """EM on a 2-mixture GMM increases total data likelihood (reference
    mle-diag-gmm-test oracle)."""
    rng = np.random.default_rng(2)
    data = np.concatenate(
        [rng.normal(-2, 0.5, size=(200, 3)), rng.normal(2.0, 1.0, size=(200, 3))]
    )
    am = AmDiagGmm([DiagGmm(np.ones(1), data.mean(0)[None], data.var(0)[None])])
    am = mixup(am, 2, perturb_factor=0.1)
    prev = -np.inf
    for it in range(5):
        accs = AccumAmDiagGmm(am)
        like = accs.accumulate(am, data, np.zeros(len(data), int))
        assert like > prev - 1e-6, f"iter {it}: {like} < {prev}"
        prev = like
        am = mle_am_diag_gmm_update(
            am, accs, MleDiagGmmOptions(min_gaussian_occupancy=1.0)
        )
    # means recovered
    means = np.sort(am.pdfs[0].means[:, 0])
    assert means[0] == pytest.approx(-2.0, abs=0.3)
    assert means[1] == pytest.approx(2.0, abs=0.3)


def test_model_io_roundtrip(tmp_path):
    phones, topo, cd, tm = _mono_setup()
    rng = np.random.default_rng(3)
    am = AmDiagGmm.init_mono(cd.num_pdfs, rng.normal(size=4), np.ones(4))
    model = AmGmmModel(tm, am)
    p = str(tmp_path / "final.mdl")
    model.save(p)
    back = AmGmmModel.load(p)
    assert back.tm.num_tids == tm.num_tids
    assert back.am.num_pdfs == am.num_pdfs
    x = rng.normal(size=(3, 4))
    np.testing.assert_allclose(
        back.am.loglikes_numpy(x), am.loglikes_numpy(x), rtol=1e-5
    )


def test_ebw_update_moves_toward_num():
    """EBW: with den stats at the model and num stats displaced, means move
    toward the num statistics and the update never produces bad variances."""
    from old_kaldi_git_tpu.gmm.diag_gmm import AmDiagGmm, DiagGmm
    from old_kaldi_git_tpu.gmm.ebw import EbwOptions, ebw_update
    from old_kaldi_git_tpu.gmm.mle import AccumAmDiagGmm

    rng = np.random.default_rng(0)
    gmms = [
        DiagGmm(np.array([0.5, 0.5]), rng.normal(size=(2, 3)),
                np.ones((2, 3)))
        for _ in range(2)
    ]
    am = AmDiagGmm(gmms)
    num = AccumAmDiagGmm(am)
    den = AccumAmDiagGmm(am)
    target = am.pdfs[0].means[0] + 1.0
    # num: 10 frames at target for pdf0/mix0; den: 5 frames at current mean
    num.occ[0, 0] = 10.0
    num.mean_acc[0, 0] = 10.0 * target
    num.var_acc[0, 0] = 10.0 * (target**2 + 0.5)
    den.occ[0, 0] = 5.0
    cur = am.pdfs[0].means[0].copy()
    den.mean_acc[0, 0] = 5.0 * cur
    den.var_acc[0, 0] = 5.0 * (cur**2 + 1.0)
    before = am.pdfs[0].means[0].copy()
    updated, skipped = ebw_update(am, num, den, EbwOptions(update_weights=False))
    after = am.pdfs[0].means[0]
    assert updated >= 1
    # moved strictly toward the target
    assert np.all(np.abs(target - after) < np.abs(target - before))
    assert np.all(am.pdfs[0].vars > 0)


def test_ebw_weight_update_optimizes_auxf():
    from old_kaldi_git_tpu.gmm.ebw import _ebw_weights

    w_old = np.array([0.5, 0.3, 0.2])
    num = np.array([10.0, 1.0, 1.0])
    den = np.array([2.0, 2.0, 2.0])
    w = _ebw_weights(w_old, num, den)
    assert w.shape == w_old.shape and abs(w.sum() - 1.0) < 1e-6
    assert (w >= 0).all()

    def auxf(wv):
        return float(np.sum(num * np.log(wv)) - np.sum(den * wv / w_old))

    # better than the old weights and than random simplex points
    assert auxf(w) >= auxf(w_old) - 1e-9
    rng = np.random.default_rng(0)
    for _ in range(50):
        r = rng.dirichlet(np.ones(3))
        assert auxf(w) >= auxf(r) - 1e-6


def test_mmi_training_improves_yesno():
    """MMI iterations keep (or reach) 0% WER and increase the num-den margin."""
    from old_kaldi_git_tpu.decoder.csr import fst_to_csr
    from old_kaldi_git_tpu.decoder.graph import mkgraph
    from old_kaldi_git_tpu.fst.lang import make_unigram_grammar_fst
    from old_kaldi_git_tpu.recipes.decode import (
        DecodeOptions, decode_dataset, score_hyps,
    )
    from old_kaldi_git_tpu.recipes.mmi import MmiTrainOptions, train_mmi
    from old_kaldi_git_tpu.recipes.mono import MonoTrainOptions, train_mono
    from old_kaldi_git_tpu.recipes.yesno import (
        compute_feats, make_corpus, make_lang,
    )
    from old_kaldi_git_tpu.tree.context_dep import monophone_context_dependency

    tw, tt, sw, st = make_corpus(24, 8)
    tf, sf = compute_feats(tw), compute_feats(sw)
    lang = make_lang()
    model, ali = train_mono(
        tf, tt, lang, MonoTrainOptions(num_iters=10, totgauss=80)
    )
    g = make_unigram_grammar_fst(list(tt.values()), lang.words)
    phones = lang.real_phone_ids
    topo = model.tm.topo
    cd = monophone_context_dependency(
        phones, {p: topo.num_pdf_classes(p) for p in phones}
    )
    csr = fst_to_csr(mkgraph(lang, g, cd, model.tm), model.tm.tid_to_pdf_array())
    model = train_mmi(
        model, csr, lang, tf, ali,
        MmiTrainOptions(num_iters=2, acoustic_scale=0.2, beam=20.0,
                        tau=20.0),
    )
    hyps = decode_dataset(model, csr, lang, sf, DecodeOptions(beam=20.0,
                                                              acoustic_scale=0.2))
    stats = score_hyps(st, hyps)
    assert stats.wer == 0.0, stats.report()


def test_ebw_weights_negative_lambda_regime():
    """Denominator-dominated stats need a negative multiplier: the solver
    must still find the simplex maximizer (regression for a bracket that
    started at 0 and silently returned near-arbitrary weights)."""
    from old_kaldi_git_tpu.gmm.ebw import _ebw_weights

    w_old = np.array([0.5, 0.5])
    num = np.array([0.3, 0.1])
    den = np.array([5.0, 1.0])
    w = _ebw_weights(w_old, num, den)
    assert abs(w.sum() - 1.0) < 1e-6 and (w >= 0).all()

    def auxf(wv):
        return float(np.sum(num * np.log(np.maximum(wv, 1e-20)))
                     - np.sum(den * wv / w_old))

    # beats the old weights and a dense sweep of simplex points
    assert auxf(w) >= auxf(w_old) - 1e-9
    grid = np.linspace(0.001, 0.999, 999)
    best = max(auxf(np.array([g, 1 - g])) for g in grid)
    assert auxf(w) >= best - 1e-6
