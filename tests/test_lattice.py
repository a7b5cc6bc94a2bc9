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
