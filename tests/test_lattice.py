"""Lattice + ARPA tests: generation, prune/nbest/posteriors, LM rescoring."""

import math

import numpy as np
import pytest

from old_kaldi_git_tpu.decoder.csr import fst_to_csr
from old_kaldi_git_tpu.decoder.graph import mkgraph
from old_kaldi_git_tpu.decoder.viterbi import ViterbiOptions, decode_batch
from old_kaldi_git_tpu.fst.lang import Lang, Lexicon, make_unigram_grammar_fst
from old_kaldi_git_tpu.hmm.topology import HmmTopology
from old_kaldi_git_tpu.hmm.transition_model import TransitionModel
from old_kaldi_git_tpu.lat.lattice import (
    confusion_network,
    lattice_arc_posteriors,
    lattice_best_path,
    lattice_from_decode,
    lattice_nbest,
    lattice_prune,
    lattice_word_posteriors,
    rescore_nbest,
)
from old_kaldi_git_tpu.lm.arpa import ArpaLm, arpa_to_fst, parse_arpa
from old_kaldi_git_tpu.tree.context_dep import monophone_context_dependency

ARPA_TEXT = """
\\data\\
ngram 1=4
ngram 2=3

\\1-grams:
-0.5\t<s>\t-0.30103
-0.60206\tyes\t-0.30103
-0.60206\tno\t-0.30103
-0.5\t</s>

\\2-grams:
-0.30103\t<s> yes
-0.30103\tyes no
-0.17609\tno </s>

\\end\\
"""


def test_arpa_parse_and_score():
    lm = parse_arpa(ARPA_TEXT)
    assert lm.order == 2
    # P(yes|<s>) direct bigram
    assert lm.logprob("yes", ("<s>",)) == pytest.approx(-0.30103 * math.log(10))
    # P(yes|no) backs off: bo(no) + P(yes)
    expected = (-0.30103 + -0.60206) * math.log(10)
    assert lm.logprob("yes", ("no",)) == pytest.approx(expected)
    s = lm.score_sequence(["yes", "no"])
    want = math.log(10) * (-0.30103 + -0.30103 + -0.17609)
    assert s == pytest.approx(want)


def test_arpa_to_fst_equivalent_scores():
    lm = parse_arpa(ARPA_TEXT)
    lex = Lexicon.from_dict({"yes": "Y EH S", "no": "N OW"})
    lang = Lang(lex, silence_phone="SIL")
    g = arpa_to_fst(lm, lang.words)
    assert g.num_states > 0
    # score of "yes no" through G must match the ARPA score: compose a
    # linear acceptor and find the shortest path (backoff arcs are #0:eps)
    from old_kaldi_git_tpu.fst.algorithms import compose, rm_symbols, shortest_path
    from old_kaldi_git_tpu.fst.vector_fst import linear_fst

    acc = linear_fst([lang.words["yes"], lang.words["no"]])
    # G's input side has #0 backoff labels: treat them as eps for scoring
    g2 = g.copy()
    rm_symbols(g2, [lang.word_disambig_id], side="input")
    acc.arcsort("olabel")
    c = compose(acc, g2)
    w, _, _ = shortest_path(c)
    assert w == pytest.approx(-lm.score_sequence(["yes", "no"]), abs=1e-4)


def _decode_system():
    lex = Lexicon.from_dict({"yes": "Y EH S", "no": "N OW"})
    lang = Lang(lex, silence_phone="SIL", sil_prob=0.5)
    phones = lang.real_phone_ids
    topo = HmmTopology.standard(phones, silence_phones=[lang.silence_id])
    cd = monophone_context_dependency(
        phones, {p: topo.num_pdf_classes(p) for p in phones}
    )
    tm = TransitionModel(cd, topo)
    g = make_unigram_grammar_fst([["yes"], ["no"]], lang.words)
    hclg = mkgraph(lang, g, cd, tm)
    csr = fst_to_csr(hclg, tm.tid_to_pdf_array())
    return lang, topo, cd, tm, csr


def _fake_loglikes(tm, cd, lang, words_phones, frames_per_phone=5, sep=4.0):
    topo = tm.topo
    num_pdfs = cd.num_pdfs
    rows = []
    for phone in words_phones:
        entry = topo.topology_for_phone(phone)
        emitting = [st.pdf_class for st in entry if st.pdf_class >= 0]
        per = max(1, frames_per_phone // len(emitting))
        for pc in emitting:
            pdf = cd.compute([phone], pc)
            for _ in range(per):
                row = np.full(num_pdfs, -sep, np.float32)
                row[pdf] = 0.0
                rows.append(row)
    return np.stack(rows)


def test_lattice_generation_and_best_path():
    lang, topo, cd, tm, csr = _decode_system()
    phones = [lang.phones[p] for p in ("Y", "EH", "S")]
    ll = _fake_loglikes(tm, cd, lang, phones, sep=2.0)  # weak separation
    T = ll.shape[0]
    res = decode_batch(
        csr, ll[None], [T], ViterbiOptions(beam=30.0, max_active=100, acoustic_scale=1.0),
        want_lattice=True,
    )[0]
    assert res is not None and res.frame_states is not None
    lat = lattice_from_decode(
        csr, ll, res.frame_states, res.frame_costs,
        acoustic_scale=1.0, lattice_beam=20.0,
    )
    assert lat is not None and lat.num_arcs > 0
    words, tids, cost = lattice_best_path(lat, lm_scale=1.0, ac_scale=1.0)
    assert [lang.words[w] for w in words] == ["yes"]
    # best path through the lattice must equal the decoder's best cost
    assert cost == pytest.approx(res.cost, abs=0.1)
    assert len(tids) == T


def test_token_record_lattice_matches_host_reconstruction():
    """The token-sparse decoder's device-emitted bounded arc records
    rebuild the same raw lattice as the legacy host path (which needs the
    full loglikes matrix): same best path/cost and the same n-best set
    when budgets don't bind (reference GetRawLattice parity)."""
    from old_kaldi_git_tpu.decoder.viterbi import decode_batch_tokens
    from old_kaldi_git_tpu.lat.lattice import lattice_from_token_records

    lang, topo, cd, tm, csr = _decode_system()
    phones = [lang.phones[p] for p in ("Y", "EH", "S")]
    ll = _fake_loglikes(tm, cd, lang, phones, sep=2.0)
    T = ll.shape[0]
    vopts = ViterbiOptions(beam=30.0, max_active=csr.num_states,
                           acoustic_scale=1.0)
    # legacy host path (dense scan + loglikes on host)
    res_host = decode_batch(csr, ll[None], [T], vopts, want_lattice=True)[0]
    lat_host = lattice_from_decode(
        csr, ll, res_host.frame_states, res_host.frame_costs,
        acoustic_scale=1.0, lattice_beam=20.0,
    )
    # device path: bounded records, no host loglikes
    res_dev = decode_batch_tokens(csr, ll[None], [T], vopts,
                                  want_lattice=True, lattice_beam=20.0)[0]
    assert res_dev is not None and res_dev.token_lattice is not None
    lat_dev = lattice_from_token_records(csr, res_dev.token_lattice)
    assert lat_dev is not None and lat_dev.num_arcs > 0

    wh, th, ch = lattice_best_path(lat_host, 1.0, 1.0)
    wd, td, cdv = lattice_best_path(lat_dev, 1.0, 1.0)
    assert wd == wh and list(td) == list(th)
    assert cdv == pytest.approx(ch, abs=1e-3)
    assert cdv == pytest.approx(res_dev.cost, abs=0.1)
    # n-best hypothesis sets agree (costs within float tolerance)
    nh = lattice_nbest(lat_host, 5, lm_scale=1.0, ac_scale=1.0)
    nd = lattice_nbest(lat_dev, 5, lm_scale=1.0, ac_scale=1.0)
    hyp_h = [(tuple(w), round(c, 2)) for w, c in nh]
    hyp_d = [(tuple(w), round(c, 2)) for w, c in nd]
    assert hyp_d == hyp_h


def test_lattice_nbest_and_posteriors():
    lang, topo, cd, tm, csr = _decode_system()
    phones = [lang.phones[p] for p in ("Y", "EH", "S")]
    ll = _fake_loglikes(tm, cd, lang, phones, sep=1.0)  # ambiguous
    T = ll.shape[0]
    res = decode_batch(
        csr, ll[None], [T], ViterbiOptions(beam=40.0, max_active=200, acoustic_scale=1.0),
        want_lattice=True,
    )[0]
    lat = lattice_from_decode(
        csr, ll, res.frame_states, res.frame_costs, 1.0, lattice_beam=30.0
    )
    nbest = lattice_nbest(lat, 5, lm_scale=1.0, ac_scale=1.0)
    assert 1 <= len(nbest) <= 5
    assert nbest[0][1] <= nbest[-1][1]
    # best of nbest == best path
    words, _, cost = lattice_best_path(lat, 1.0, 1.0)
    assert nbest[0][0] == words
    assert nbest[0][1] == pytest.approx(cost, abs=1e-3)
    # posteriors normalized: outgoing arc posts from start sum to ~1
    post = lattice_arc_posteriors(lat, 1.0, 1.0)
    assert sum(post[lat.start]) == pytest.approx(1.0, abs=1e-3)
    wp = lattice_word_posteriors(lat, 1.0, 1.0)
    assert all(0 <= v <= 1.5 for v in wp.values())
    cn = confusion_network(lat, 1.0, 1.0)
    assert len(cn) >= 1


def test_lattice_nbest_paths_linear_union():
    from old_kaldi_git_tpu.lat.lattice import (
        lattice_nbest_paths,
        lattice_union,
        linear_lattice_from_path,
    )

    lang, topo, cd, tm, csr = _decode_system()
    phones = [lang.phones[p] for p in ("Y", "EH", "S")]
    ll = _fake_loglikes(tm, cd, lang, phones, sep=1.0)
    T = ll.shape[0]
    res = decode_batch(
        csr, ll[None], [T],
        ViterbiOptions(beam=40.0, max_active=200, acoustic_scale=1.0),
        want_lattice=True,
    )[0]
    lat = lattice_from_decode(
        csr, ll, res.frame_states, res.frame_costs, 1.0, lattice_beam=30.0
    )
    nbest = lattice_nbest(lat, 5, lm_scale=1.0, ac_scale=1.0)
    paths = lattice_nbest_paths(lat, 5, lm_scale=1.0, ac_scale=1.0)
    assert len(paths) >= 1
    # path costs ranked and the best agrees with lattice_best_path
    costs = []
    for arcs, (fg, fac) in paths:
        c = sum(a.graph_cost + a.acoustic_cost for a in arcs) + fg + fac
        costs.append(c)
    assert costs == sorted(costs)
    assert costs[0] == pytest.approx(nbest[0][1], abs=1e-3)
    # linear lattice of path i reproduces its words and cost
    lins = [linear_lattice_from_path(arcs, fin) for arcs, fin in paths]
    w0, _, c0 = lattice_best_path(lins[0], 1.0, 1.0)
    words, _, cost = lattice_best_path(lat, 1.0, 1.0)
    assert w0 == words and c0 == pytest.approx(cost, abs=1e-3)
    # union of all linear paths has the same best path as the lattice
    uni = lattice_union(lins)
    wu, _, cu = lattice_best_path(uni, 1.0, 1.0)
    assert wu == words and cu == pytest.approx(cost, abs=1e-3)


def test_lattice_prune_keeps_best():
    lang, topo, cd, tm, csr = _decode_system()
    phones = [lang.phones[p] for p in ("N", "OW")]
    ll = _fake_loglikes(tm, cd, lang, phones, sep=1.5)
    T = ll.shape[0]
    res = decode_batch(
        csr, ll[None], [T], ViterbiOptions(beam=40.0, max_active=200, acoustic_scale=1.0),
        want_lattice=True,
    )[0]
    lat = lattice_from_decode(csr, ll, res.frame_states, res.frame_costs, 1.0, 30.0)
    big = lat.num_arcs
    pruned = lattice_prune(lat, lattice_beam=1.0, lm_scale=1.0, ac_scale=1.0)
    assert 0 < pruned.num_arcs <= big
    w1, _, c1 = lattice_best_path(lat, 1.0, 1.0)
    w2, _, c2 = lattice_best_path(pruned, 1.0, 1.0)
    assert w1 == w2 and c1 == pytest.approx(c2, abs=1e-3)


def test_rescore_nbest_changes_ranking():
    nbest = [([1], 10.0), ([2], 10.5)]
    old = lambda words: 0.0
    # new LM strongly prefers word 2
    new = lambda words: 0.0 if words == [2] else 5.0
    out = rescore_nbest(nbest, old, new)
    assert out[0][0] == [2]


def test_decode_biglm_rescoring():
    """Big-LM capability: decode on a weak-LM graph, exactly swap in a
    stronger LM on the determinized lattices; identity rescoring (old=new)
    must reproduce the lattice best path."""
    from old_kaldi_git_tpu.lm.arpa import parse_arpa
    from old_kaldi_git_tpu.recipes.decode import (
        DecodeOptions, decode_biglm, decode_dataset, score_hyps,
    )
    from old_kaldi_git_tpu.recipes.mono import MonoTrainOptions, train_mono
    from old_kaldi_git_tpu.recipes.yesno import (
        compute_feats, make_corpus, make_lang,
    )
    from old_kaldi_git_tpu.tree.context_dep import monophone_context_dependency

    tw, tt, sw, st = make_corpus(20, 6)
    tf, sf = compute_feats(tw), compute_feats(sw)
    lang = make_lang()
    model, _ = train_mono(tf, tt, lang,
                          MonoTrainOptions(num_iters=10, totgauss=80))
    g = make_unigram_grammar_fst(list(tt.values()), lang.words)
    phones = lang.real_phone_ids
    topo = model.tm.topo
    cd = monophone_context_dependency(
        phones, {p: topo.num_pdf_classes(p) for p in phones}
    )
    csr = fst_to_csr(mkgraph(lang, g, cd, model.tm), model.tm.tid_to_pdf_array())

    # uniform unigram "old" LM and a corpus bigram "new" LM over yes/no
    flat = r"""
\data\
ngram 1=4
\1-grams:
-0.5 yes
-0.5 no
-0.5 </s>
-99 <s>
\end\
"""
    counts = {}
    for words in tt.values():
        seq = ["<s>"] + list(words) + ["</s>"]
        for a, b in zip(seq, seq[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    import math as _math
    tot = {}
    for (a, b), c in counts.items():
        tot[a] = tot.get(a, 0) + c
    lines = ["\\data\\", f"ngram 1=4", f"ngram 2={len(counts)}", "\\1-grams:",
             "-0.5 yes -0.3", "-0.5 no -0.3", "-0.5 </s>", "-99 <s> -0.3",
             "\\2-grams:"]
    for (a, b), c in sorted(counts.items()):
        lines.append(f"{_math.log10(c / tot[a]):.4f} {a} {b}")
    lines.append("\\end\\")
    old_lm = parse_arpa(flat)
    new_lm = parse_arpa("\n".join(lines))

    base = score_hyps(st, decode_dataset(
        model, csr, lang, sf, DecodeOptions(beam=20.0, acoustic_scale=1.0)))
    hyps = decode_biglm(
        model, csr, lang, sf, old_lm, new_lm,
        DecodeOptions(beam=20.0, acoustic_scale=1.0), lattice_beam=10.0,
    )
    resc = score_hyps(st, hyps)
    assert resc.wer <= base.wer + 1e-9
    # identity rescoring keeps the lattice best path
    same = decode_biglm(
        model, csr, lang, sf, old_lm, old_lm,
        DecodeOptions(beam=20.0, acoustic_scale=1.0),
    )
    from old_kaldi_git_tpu.recipes.decode import decode_dataset_with_lattices
    clats = decode_dataset_with_lattices(
        model, csr, lang, sf, DecodeOptions(beam=20.0, acoustic_scale=1.0),
        determinize=True,
    )
    for k, clat in clats.items():
        words, _, _ = clat.best_path(1.0, 1.0)
        assert same[k] == [lang.words[w] for w in words]


def test_rnnlm_trains_and_rescore():
    """LSTM LM learns corpus regularities; n-best rescoring prefers
    sentences the LM likes."""
    from old_kaldi_git_tpu.lm.rnnlm import (
        RnnLmOptions, rescore_nbest_rnnlm, train_rnnlm,
    )

    rng = np.random.default_rng(0)
    # a strict pattern: word 1 is always followed by word 2
    seqs = []
    for _ in range(200):
        s = []
        for _ in range(rng.integers(2, 6)):
            if s and s[-1] == 1:
                s.append(2)
            else:
                s.append(int(rng.integers(1, 5)))
        seqs.append(s)
    lm = train_rnnlm(seqs, num_words=4, opts=RnnLmOptions(num_epochs=15))
    lp_good = lm.logprobs_batch([[1, 2, 3]])[0]
    lp_bad = lm.logprobs_batch([[1, 4, 3]])[0]
    assert lp_good > lp_bad + 1.0  # "1 2" strongly preferred over "1 4"

    nbest = [([1, 4, 3], 10.0), ([1, 2, 3], 10.5)]  # acoustically worse
    resc = rescore_nbest_rnnlm(nbest, lm, old_lm_score=lambda w: 0.0,
                               rnnlm_scale=1.0)
    assert resc[0][0] == [1, 2, 3]  # LM flips the ranking


def test_lattice_oracle_depth_post():
    from old_kaldi_git_tpu.lat.lattice import (
        lattice_depth, lattice_from_decode, lattice_oracle, lattice_to_post,
    )

    lang, topo, cd, tm, csr = _decode_system()
    phones = [lang.phones[p] for p in ("Y", "EH", "S")]
    ll = _fake_loglikes(tm, cd, lang, phones, sep=2.0)
    T = ll.shape[0]
    res = decode_batch(
        csr, ll[None], [T],
        ViterbiOptions(beam=30.0, max_active=100, acoustic_scale=1.0),
        want_lattice=True,
    )[0]
    lat = lattice_from_decode(
        csr, ll, res.frame_states, res.frame_costs, 1.0, 20.0
    )
    yes = lang.words["yes"]
    no = lang.words["no"]
    # the lattice contains "yes": oracle vs ["yes"] is 0
    d, words = lattice_oracle(lat, [yes])
    assert d == 0 and words == [yes]
    # vs ["no"]: at most 1 edit; vs ["no","no"]: at most 2
    d1, _ = lattice_oracle(lat, [no])
    assert 0 <= d1 <= 1
    d2, _ = lattice_oracle(lat, [no, no])
    assert d1 <= d2 <= d1 + 1

    assert lattice_depth(lat) >= 1.0
    posts = lattice_to_post(lat, tm, 1.0, 1.0)
    assert len(posts) == T
    for frame in posts:
        tot = sum(p for _, p in frame)
        assert 0.0 < tot <= 1.0 + 1e-4


def test_split_eps_lattice_matches_folded():
    """Lattice generation over a SPLIT-EPS (backoff-shaped) graph must
    agree with the folded-closure graph's lattices: same 1-best
    words/alignment/cost from the rebuilt lattices, and the same oracle
    error counts (r5 — split-eps lattices were a guarded gap; the kernel
    extends every emit candidate by its eps hops before selection, and
    the host walk folds backoff words/weights into the lattice arcs)."""
    import numpy as np

    from old_kaldi_git_tpu.decoder.viterbi import (
        ViterbiOptions,
        decode_batch_tokens,
    )
    from old_kaldi_git_tpu.lat.lattice import (
        lattice_best_path,
        lattice_from_token_records,
        lattice_oracle,
    )
    from tests.test_online import _backoff_split_system

    folded, split, _t2p = _backoff_split_system()
    P = 12
    rng = np.random.default_rng(11)
    ll = rng.normal(size=(3, 25, P)).astype(np.float32)
    nf = np.asarray([25, 17, 9], np.int32)
    o = ViterbiOptions(beam=1e9, max_active=64, acoustic_scale=0.7)
    rf = decode_batch_tokens(folded, ll, nf, o, want_lattice=True,
                             lattice_beam=1e9)
    rs = decode_batch_tokens(split, ll, nf, o, want_lattice=True,
                             lattice_beam=1e9)
    checked = 0
    for a, b in zip(rf, rs):
        assert (a is None) == (b is None)
        if a is None:
            continue
        assert b.words == a.words
        assert np.array_equal(b.alignment, a.alignment)
        assert b.cost == pytest.approx(a.cost, abs=1e-3)
        la = lattice_from_token_records(folded, a.token_lattice)
        lb = lattice_from_token_records(split, b.token_lattice)
        assert la is not None and lb is not None
        wa, ta, ca = lattice_best_path(la, 1.0, 1.0)
        wb, tb, cb = lattice_best_path(lb, 1.0, 1.0)
        assert list(wb) == list(wa) == list(a.words)
        assert list(tb) == list(ta)
        assert cb == pytest.approx(ca, abs=1e-3)
        # oracle agreement on an arbitrary "reference"
        ref = list(a.words[:2]) + [3]
        ea, _ = lattice_oracle(la, ref)
        eb, _ = lattice_oracle(lb, ref)
        assert ea == eb
        checked += 1
    assert checked >= 2
