"""M4 tests: CSR conversion, batched alignment, batched beam decode, E2E."""

import numpy as np
import pytest

from old_kaldi_git_tpu.decoder.csr import fst_to_csr
from old_kaldi_git_tpu.decoder.graph import GraphCompiler, mkgraph
from old_kaldi_git_tpu.decoder.viterbi import (
    ViterbiOptions,
    align_batch,
    decode_batch,
)
from old_kaldi_git_tpu.fst.algorithms import shortest_path
from old_kaldi_git_tpu.fst.lang import Lang, Lexicon, make_unigram_grammar_fst
from old_kaldi_git_tpu.fst.vector_fst import Arc, VectorFst
from old_kaldi_git_tpu.hmm.topology import HmmTopology
from old_kaldi_git_tpu.hmm.transition_model import TransitionModel
from old_kaldi_git_tpu.tree.context_dep import monophone_context_dependency


def _toy_system():
    lex = Lexicon.from_dict({"yes": "Y EH S", "no": "N OW"})
    lang = Lang(lex, silence_phone="SIL", sil_prob=0.5)
    phones = lang.real_phone_ids
    topo = HmmTopology.standard(phones, silence_phones=[lang.silence_id])
    cd = monophone_context_dependency(
        phones, {p: topo.num_pdf_classes(p) for p in phones}
    )
    tm = TransitionModel(cd, topo)
    return lang, topo, cd, tm


def test_csr_eps_forwarding():
    fst = VectorFst()
    s = [fst.add_state() for _ in range(4)]
    fst.set_start(s[0])
    fst.add_arc(s[0], Arc(0, 7, 0.5, s[1]))  # eps arc with word output
    fst.add_arc(s[1], Arc(3, 0, 1.0, s[2]))  # emitting tid 3
    fst.add_arc(s[2], Arc(4, 8, 0.25, s[3]))
    fst.set_final(s[3], 0.125)
    tid2pdf = np.array([-1, 0, 0, 1, 2], np.int32)
    csr = fst_to_csr(fst, tid2pdf)
    # state 0's closed arcs: tid 3 with eps weight folded + olabel 7 collected
    arcs0 = range(csr.row_ptr[0], csr.row_ptr[1])
    assert [csr.tid[a] for a in arcs0] == [3]
    a0 = csr.row_ptr[0]
    assert csr.weight[a0] == pytest.approx(1.5)
    assert csr.arc_olabels[a0] == (7,)
    assert csr.pdf[a0] == 1
    assert np.isfinite(csr.final_weight[s[3]])


def _simulate_loglikes(tm, cd, lang, phone_seq, frames_per_phone=4, sep=8.0):
    """Construct fake loglikes where the correct pdf wins at each frame."""
    num_pdfs = cd.num_pdfs
    topo = tm.topo
    rows = []
    for phone in phone_seq:
        entry = topo.topology_for_phone(phone)
        emitting = [st.pdf_class for st in entry if st.pdf_class >= 0]
        # dwell in each emitting state
        per_state = max(1, frames_per_phone // len(emitting))
        for pc in emitting:
            pdf = cd.compute([phone], pc)
            for _ in range(per_state):
                row = np.full(num_pdfs, -sep, np.float32)
                row[pdf] = 0.0
                rows.append(row)
    return np.stack(rows)


def test_align_batch_recovers_phones():
    lang, topo, cd, tm = _toy_system()
    gc = GraphCompiler(lang, cd, tm)
    tid2pdf = tm.tid_to_pdf_array()
    transcripts = [["yes"], ["no"], ["yes", "no"]]
    graphs = [fst_to_csr(gc.compile_graph_from_text(t), tid2pdf) for t in transcripts]

    def phone_ids(words):
        m = {"yes": ["Y", "EH", "S"], "no": ["N", "OW"]}
        return [lang.phones[p] for w in words for p in m[w]]

    lls = [
        _simulate_loglikes(tm, cd, lang, phone_ids(t), frames_per_phone=6)
        for t in transcripts
    ]
    T = max(l.shape[0] for l in lls)
    B = len(lls)
    loglikes = np.full((B, T, cd.num_pdfs), -20.0, np.float32)
    nf = np.zeros(B, np.int32)
    for i, l in enumerate(lls):
        loglikes[i, : l.shape[0]] = l
        nf[i] = l.shape[0]
    alis, scores = align_batch(graphs, loglikes, nf, ViterbiOptions(acoustic_scale=1.0))
    from old_kaldi_git_tpu.hmm.hmm_utils import alignment_to_phones

    for i, t in enumerate(transcripts):
        assert alis[i] is not None
        assert len(alis[i]) == nf[i]
        got = alignment_to_phones(tm, alis[i])
        want = phone_ids(t)
        # silence is optional; strip it
        got = [p for p in got if p != lang.silence_id]
        assert got == want, f"utt {i}: {got} vs {want}"


def test_decode_batch_recovers_words():
    lang, topo, cd, tm = _toy_system()
    g = make_unigram_grammar_fst([["yes"], ["no"], ["yes", "no"]], lang.words)
    hclg = mkgraph(lang, g, cd, tm)
    csr = fst_to_csr(hclg, tm.tid_to_pdf_array())

    def phone_ids(words):
        m = {"yes": ["Y", "EH", "S"], "no": ["N", "OW"]}
        return [lang.phones[p] for w in words for p in m[w]]

    cases = [["yes"], ["no", "yes"], ["no", "no", "no"]]
    lls = [_simulate_loglikes(tm, cd, lang, phone_ids(c), frames_per_phone=6) for c in cases]
    T = max(l.shape[0] for l in lls)
    loglikes = np.full((len(cases), T, cd.num_pdfs), -20.0, np.float32)
    nf = np.zeros(len(cases), np.int32)
    for i, l in enumerate(lls):
        loglikes[i, : l.shape[0]] = l
        nf[i] = l.shape[0]
    results = decode_batch(
        csr, loglikes, nf, ViterbiOptions(beam=30.0, max_active=200, acoustic_scale=1.0)
    )
    for case, res in zip(cases, results):
        assert res is not None
        words = [lang.words[w] for w in res.words]
        assert words == case, f"{words} vs {case}"
        assert len(res.alignment) == _simulate_loglikes(
            tm, cd, lang, phone_ids(case), frames_per_phone=6
        ).shape[0]


def test_token_sparse_decoder_matches_dense():
    """decode_batch_tokens (huge-graph path) agrees with the dense kernels
    on words, alignment and cost; with ample E/K it is exact Viterbi."""
    from old_kaldi_git_tpu.decoder.viterbi import decode_batch_tokens

    lang, topo, cd, tm = _toy_system()
    g = make_unigram_grammar_fst([["yes"], ["no"], ["yes", "no"]], lang.words)
    hclg = mkgraph(lang, g, cd, tm)
    csr = fst_to_csr(hclg, tm.tid_to_pdf_array())

    def phone_ids(words):
        m = {"yes": ["Y", "EH", "S"], "no": ["N", "OW"]}
        return [lang.phones[p] for w in words for p in m[w]]

    cases = [["yes"], ["no", "yes"], ["no", "no", "no"]]
    lls = [_simulate_loglikes(tm, cd, lang, phone_ids(c), frames_per_phone=6,
                              sep=2.0) for c in cases]
    T = max(l.shape[0] for l in lls)
    loglikes = np.full((len(cases), T, cd.num_pdfs), -20.0, np.float32)
    nf = np.zeros(len(cases), np.int32)
    for i, l in enumerate(lls):
        loglikes[i, : l.shape[0]] = l
        nf[i] = l.shape[0]
    opts = ViterbiOptions(beam=30.0, max_active=200, acoustic_scale=1.0)
    dense = decode_batch(csr, loglikes, nf, opts)
    sparse = decode_batch_tokens(csr, loglikes, nf, opts)
    for d, s in zip(dense, sparse):
        assert d is not None and s is not None
        assert s.words == d.words
        assert np.array_equal(s.alignment, d.alignment)
        assert s.cost == pytest.approx(d.cost, abs=1e-3)
    # lattices: the sparse path emits bounded device records; the rebuilt
    # lattice must carry the decoder's best path (reference GetRawLattice
    # invariant).  loglikes never reach the host reconstruction.
    from old_kaldi_git_tpu.lat.lattice import (
        lattice_best_path,
        lattice_from_token_records,
    )

    sparse_lat = decode_batch_tokens(csr, loglikes, nf, opts,
                                     want_lattice=True, lattice_beam=20.0)
    for i, res in enumerate(sparse_lat):
        assert res.token_lattice is not None
        lat = lattice_from_token_records(csr, res.token_lattice)
        assert lat is not None
        words, _tids, cost = lattice_best_path(lat, 1.0, 1.0)
        assert words == res.words
        assert cost == pytest.approx(res.cost, abs=0.1)
    # random dense-degree graph at K >= S: token-sparse must be EXACT
    # Viterbi (this regime caught a denormal-flush bug in the packed arc
    # gather: int32 bit patterns must never ride in f32 carriers)
    rng = np.random.default_rng(0)
    S, deg, P = 500, 4, 20
    row_ptr = (np.arange(S + 1) * deg).astype(np.int32)
    nxt = ((np.repeat(np.arange(S), deg)
            + rng.integers(1, 50, S * deg)) % S).astype(np.int32)
    from old_kaldi_git_tpu.decoder.csr import CsrGraph

    rnd = CsrGraph(
        start=0, row_ptr=row_ptr,
        tid=rng.integers(1, 100, S * deg).astype(np.int32),
        pdf=rng.integers(0, P, S * deg).astype(np.int32),
        weight=rng.exponential(1.0, S * deg).astype(np.float32),
        nextstate=nxt, final_weight=np.zeros(S, np.float32),
        arc_olabels=[() for _ in range(S * deg)],
        final_olabels=[() for _ in range(S)])
    ll2 = rng.normal(size=(3, 40, P)).astype(np.float32)
    nf2 = np.full(3, 40, np.int32)
    o2 = ViterbiOptions(beam=1e9, max_active=512, acoustic_scale=0.1)
    d2 = decode_batch(rnd, ll2, nf2, o2)
    s2 = decode_batch_tokens(rnd, ll2, nf2, o2)
    for d, s in zip(d2, s2):
        assert s.cost == pytest.approx(d.cost, abs=1e-3)
        assert np.array_equal(s.alignment, d.alignment)

    # tight expansion budget degrades gracefully (drops worst tokens' arcs)
    import old_kaldi_git_tpu.decoder.viterbi as vit

    orig = vit._token_budget
    vit._token_budget = lambda g, K, md=4: 128  # 128 tiles
    try:
        tight = decode_batch_tokens(csr, loglikes, nf, opts)
    finally:
        vit._token_budget = orig
    assert [t.words for t in tight] == [d.words for d in dense]


def test_decode_respects_graph_prior():
    """With uninformative acoustics the decoder must follow graph costs."""
    lang, topo, cd, tm = _toy_system()
    # grammar heavily favoring "yes"
    g = make_unigram_grammar_fst([["yes"]] * 9 + [["no"]], lang.words)
    hclg = mkgraph(lang, g, cd, tm)
    csr = fst_to_csr(hclg, tm.tid_to_pdf_array())
    # acoustics flat across speech phones, silence unlikely → the decoder
    # must emit words, and the grammar prior should pick "yes"
    loglikes = np.zeros((1, 12, cd.num_pdfs), np.float32)
    for pc in range(topo.num_pdf_classes(lang.silence_id)):
        loglikes[:, :, cd.compute([lang.silence_id], pc)] = -10.0
    res = decode_batch(csr, loglikes, [12], ViterbiOptions(beam=30.0, max_active=500))[0]
    assert res is not None
    words = [lang.words[w] for w in res.words]
    assert all(w == "yes" for w in words) and len(words) >= 1


def test_yesno_e2e():
    """BASELINE config 1: synthetic yesno, mono GMM, expect %WER 0.00."""
    from old_kaldi_git_tpu.recipes.mono import MonoTrainOptions
    from old_kaldi_git_tpu.recipes.yesno import run_yesno

    stats = run_yesno(
        num_train=20,
        num_test=8,
        train_opts=MonoTrainOptions(
            num_iters=10, totgauss=60, realign_iters=(1, 2, 3, 4, 5, 6, 8)
        ),
    )
    assert stats.ref_len > 0
    assert stats.wer == 0.0, stats.report()


def test_token_sparse_dead_beam_returns_none():
    """Regression: an utterance whose token set dies (graph path shorter
    than the utterance) must yield None, not an out-of-range sentinel
    state crash on the host."""
    from old_kaldi_git_tpu.decoder.csr import CsrGraph
    from old_kaldi_git_tpu.decoder.viterbi import decode_batch_tokens

    # 2 states, a single emitting arc 0→1, no arcs out of state 1
    g = CsrGraph(
        start=0,
        row_ptr=np.array([0, 1, 1], np.int32),
        tid=np.array([1], np.int32),
        pdf=np.array([0], np.int32),
        weight=np.array([0.5], np.float32),
        nextstate=np.array([1], np.int32),
        final_weight=np.array([np.inf, 0.0], np.float32),
        arc_olabels=[(7,)],
        final_olabels=[(), ()],
    )
    ll = np.zeros((1, 4, 2), np.float32)
    res = decode_batch_tokens(g, ll, [4], ViterbiOptions(beam=10.0,
                                                         max_active=4))
    assert res == [None]
    # a one-frame utterance on the same graph still decodes
    res1 = decode_batch_tokens(g, ll[:, :1], [1],
                               ViterbiOptions(beam=10.0, max_active=4))
    assert res1[0] is not None and res1[0].words == [7]


def test_split_eps_decode_matches_folded():
    """Backoff-shaped graph (<=1 eps out-arc per state, depth 2): the
    split-eps decode (emit tiles + hop merge + host eps walk) must agree
    with the folded-closure decode on words, alignment, and cost."""
    from old_kaldi_git_tpu.decoder.csr import (
        fst_to_csr,
        fst_to_split_csr_arrays,
    )
    from old_kaldi_git_tpu.decoder.viterbi import decode_batch_tokens
    from old_kaldi_git_tpu.fst.vector_fst import Arc, VectorFst

    rng = np.random.default_rng(7)
    S, P = 40, 12
    fst = VectorFst()
    for _ in range(S):
        fst.add_state()
    fst.start = 0
    # ring of emitting arcs + backoff eps chains: state 3k -> 3k+1 -> 3k+2
    for s in range(S):
        for _ in range(3):
            tid = int(rng.integers(1, P + 1))
            fst.add_arc(s, Arc(tid, int(rng.integers(0, 5)),
                               float(rng.exponential(0.5)),
                               int(rng.integers(0, S))))
        if s % 3 != 2 and s + 1 < S:  # eps chain in the triple (depth <= 2)
            fst.add_arc(s, Arc(0, int(rng.integers(0, 3)),
                               float(rng.exponential(0.3)), s + 1))
    for s in range(0, S, 5):
        fst.set_final(s, float(rng.exponential(0.2)))
    tid_to_pdf = np.arange(P + 1, dtype=np.int32)  # tid t -> pdf t-1 (toy)
    tid_to_pdf[1:] = np.arange(P)
    folded = fst_to_csr(fst, tid_to_pdf)

    n = fst.num_states
    counts = np.asarray([len(a) for a in fst.arcs], np.int64)
    row_ptr = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=row_ptr[1:])
    il = np.zeros(int(row_ptr[-1]), np.int32)
    ol = np.zeros_like(il)
    w = np.zeros(len(il), np.float32)
    ns = np.zeros_like(il)
    i = 0
    for lst in fst.arcs:
        for a in lst:
            il[i], ol[i], w[i], ns[i] = (a.ilabel, a.olabel, a.weight,
                                         a.nextstate)
            i += 1
    from old_kaldi_git_tpu.fst.vector_fst import INF

    finals = np.asarray([f if f != INF else np.inf for f in fst.finals],
                        np.float32)
    split = fst_to_split_csr_arrays(
        fst.start, row_ptr.astype(np.int32), il, ol, w, ns, finals,
        tid_to_pdf)
    assert split.eps_depth == 2
    assert split.num_arcs < folded.num_arcs  # the fold duplicates

    ll = rng.normal(size=(4, 25, P)).astype(np.float32)
    nf = np.asarray([25, 25, 17, 9], np.int32)
    o = ViterbiOptions(beam=1e9, max_active=64, acoustic_scale=0.7)
    rf = decode_batch_tokens(folded, ll, nf, o)
    rs = decode_batch_tokens(split, ll, nf, o)
    for a, b in zip(rf, rs):
        assert (a is None) == (b is None)
        if a is None:
            continue
        assert b.cost == pytest.approx(a.cost, abs=1e-3)
        assert b.words == a.words
        assert np.array_equal(b.alignment, a.alignment)


def test_fused_align_matches_host_backtrace():
    """The fused on-device align+backtrace (_align_and_backtrace) must
    reproduce the reference host walk over _align_scan's [T,B,S] winner
    arcs exactly (scores, per-frame tids, and failure flags)."""
    import jax.numpy as jnp

    from old_kaldi_git_tpu.decoder.csr import CsrGraph
    from old_kaldi_git_tpu.decoder.viterbi import (
        BIG,
        _align_and_backtrace,
        _align_scan,
        _pad_graphs,
    )

    rng = np.random.default_rng(7)
    P = 11
    graphs = []
    for _ in range(5):
        S = int(rng.integers(3, 12))
        # linear-ish random graph with self-loops (training-graph shape)
        row_ptr = [0]
        tid, pdf, w, ns = [], [], [], []
        for s in range(S):
            deg = 2 if s + 1 < S else 1
            # self loop
            tid.append(int(rng.integers(1, 40)))
            pdf.append(int(rng.integers(0, P)))
            w.append(float(rng.random()))
            ns.append(s)
            if s + 1 < S:
                tid.append(int(rng.integers(1, 40)))
                pdf.append(int(rng.integers(0, P)))
                w.append(float(rng.random()))
                ns.append(s + 1)
            row_ptr.append(row_ptr[-1] + deg)
        final = np.full(S, np.inf, np.float32)
        final[S - 1] = 0.5
        graphs.append(CsrGraph(
            start=0,
            row_ptr=np.asarray(row_ptr, np.int32),
            tid=np.asarray(tid, np.int32), pdf=np.asarray(pdf, np.int32),
            weight=np.asarray(w, np.float32),
            nextstate=np.asarray(ns, np.int32),
            final_weight=final,
            arc_olabels=[(0,)] * len(tid),
            final_olabels=[()] * S))
    B = len(graphs)
    T = 16
    loglikes = rng.normal(size=(B, T, P)).astype(np.float32)
    nf = np.asarray([16, 13, 16, 5, 9], np.int32)
    frm, tid, pdf, w, ns, start, final, S, A = _pad_graphs(graphs)
    args = (jnp.asarray(frm), jnp.asarray(pdf), jnp.asarray(w),
            jnp.asarray(ns), jnp.asarray(start))
    alpha_final, best_arcs = _align_scan(
        *args, jnp.asarray(loglikes), jnp.asarray(nf), 1.0, S)
    alpha_final = np.asarray(alpha_final)
    best_arcs = np.asarray(best_arcs)
    d_scores, d_tids, d_ok = _align_and_backtrace(
        jnp.asarray(frm), jnp.asarray(tid), jnp.asarray(pdf),
        jnp.asarray(w), jnp.asarray(ns), jnp.asarray(start),
        jnp.asarray(final), jnp.asarray(loglikes), jnp.asarray(nf), 1.0, S)
    d_scores, d_tids, d_ok = map(np.asarray, (d_scores, d_tids, d_ok))
    for b, g in enumerate(graphs):
        tot = alpha_final[b, : g.num_states] + final[b, : g.num_states]
        s = int(np.argmin(tot))
        score = float(tot[s])
        if score >= BIG:
            assert d_scores[b] >= BIG
            continue
        assert d_scores[b] == pytest.approx(score, rel=1e-6)
        # reference host walk
        tids_ref, state, failed = [], s, False
        for t in range(int(nf[b]) - 1, -1, -1):
            arc = int(best_arcs[t, b, state])
            if arc < 0:
                failed = True
                break
            tids_ref.append(int(tid[b, arc]))
            state = int(frm[b, arc])
        if failed:
            assert not d_ok[: int(nf[b]), b].all()
            continue
        assert d_ok[: int(nf[b]), b].all()
        assert d_tids[: int(nf[b]), b].tolist() == tids_ref[::-1]
        # frames beyond nf are inactive
        assert (d_tids[int(nf[b]):, b] == -1).all()


def test_native_csr_compile_matches_python_path():
    """GraphCompiler.compile_csr_from_text (handle-resident native
    pipeline, L converted once) must produce graphs equivalent to the
    Python-path fst_to_csr(compile_graph_from_text(...)): identical
    state/arc counts and identical alignments + scores."""
    from old_kaldi_git_tpu.decoder.csr import fst_to_csr
    from old_kaldi_git_tpu.decoder.graph import GraphCompiler

    lang, topo, cd, tm = _toy_system()
    gc = GraphCompiler(lang, cd, tm)
    tid2pdf = tm.tid_to_pdf_array()
    transcripts = [["yes"], ["no"], ["yes", "no"], ["no", "yes", "no"]]
    g_old = [fst_to_csr(gc.compile_graph_from_text(t), tid2pdf)
             for t in transcripts]
    g_new = [gc.compile_csr_from_text(t) for t in transcripts]
    for a, b in zip(g_old, g_new):
        assert (a.num_states, a.num_arcs) == (b.num_states, b.num_arcs)

    def phone_ids(words):
        m = {"yes": ["Y", "EH", "S"], "no": ["N", "OW"]}
        return [lang.phones[p] for w in words for p in m[w]]

    lls = [_simulate_loglikes(tm, cd, lang, phone_ids(t), frames_per_phone=6)
           for t in transcripts]
    T = max(l.shape[0] for l in lls)
    B = len(lls)
    loglikes = np.full((B, T, cd.num_pdfs), -20.0, np.float32)
    nf = np.zeros(B, np.int32)
    for i, l in enumerate(lls):
        loglikes[i, : l.shape[0]] = l
        nf[i] = l.shape[0]
    a1, s1 = align_batch(g_old, loglikes, nf,
                         ViterbiOptions(acoustic_scale=1.0))
    a2, s2 = align_batch(g_new, loglikes, nf,
                         ViterbiOptions(acoustic_scale=1.0))
    for i in range(B):
        assert a1[i] is not None and a2[i] is not None
        assert np.array_equal(a1[i], a2[i])
        assert s1[i] == pytest.approx(s2[i], abs=1e-3)
