"""N-gram LM estimation (kaldi_lm / SRILM role, SURVEY.md §1 L0) +
compatibility with the existing ARPA/G.fst plumbing."""

import math

import numpy as np
import pytest

from old_kaldi_git_tpu.lm.arpa import BOS, EOS, ArpaLm, parse_arpa
from old_kaldi_git_tpu.lm.ngram import (
    count_ngrams,
    estimate_ngram_lm,
    perplexity,
    prune_ngram_lm,
    write_arpa,
)


def _corpus(n=500, seed=0):
    """Markov-structured sentences over a small vocab.  The transition
    matrix is FIXED (seed 0) so different `seed`s give train/held-out
    samples from the same distribution."""
    vocab = [f"w{i}" for i in range(20)]
    trans = np.random.default_rng(0).dirichlet(np.ones(20) * 0.3, size=20)
    rng = np.random.default_rng(seed)
    sents = []
    for _ in range(n):
        w = int(rng.integers(0, 20))
        sent = [vocab[w]]
        for _ in range(int(rng.integers(2, 9))):
            w = int(rng.choice(20, p=trans[w]))
            sent.append(vocab[w])
        sents.append(sent)
    return sents, vocab


def test_count_ngrams_hand_checked():
    counts = count_ngrams([["a", "b", "a"]], 2)
    assert counts[0] == {("a",): 2, ("b",): 1, (EOS,): 1}
    assert counts[1] == {
        (BOS, "a"): 1, ("a", "b"): 1, ("b", "a"): 1, ("a", EOS): 1,
    }


def _check_normalized(lm: ArpaLm, vocab, histories):
    """sum_w p(w|h) over vocab + </s> must be 1 for every history."""
    events = list(vocab) + [EOS]
    for h in histories:
        s = sum(math.exp(lm.logprob(w, h)) for w in events)
        assert abs(s - 1.0) < 1e-3, (h, s)


def test_trigram_normalized_and_learns():
    sents, vocab = _corpus()
    lm = estimate_ngram_lm(sents, order=3, vocab=vocab)
    # normalization at empty, unigram, and bigram histories
    hists = [(), ("w0",), (BOS,), ("w0", "w1"), ("w3", "w3")]
    _check_normalized(lm, vocab, hists)
    # the Markov corpus must be much more predictable under the trigram
    # than under a unigram model
    uni = estimate_ngram_lm(sents, order=1, vocab=vocab)
    ppl3 = perplexity(lm, sents[:50])
    ppl1 = perplexity(uni, sents[:50])
    assert ppl3 < 0.8 * ppl1, (ppl3, ppl1)
    # held-out sentences from the same generator also improve
    held, _ = _corpus(50, seed=1)
    assert perplexity(lm, held) < 0.95 * perplexity(uni, held)


def test_pruning_keeps_normalization_and_shrinks():
    sents, vocab = _corpus()
    lm = estimate_ngram_lm(sents, order=3, vocab=vocab, cutoffs=(0, 0, 0))
    pruned = prune_ngram_lm(lm, threshold=3e-6)
    assert len(pruned.ngrams) < len(lm.ngrams)
    _check_normalized(pruned, vocab, [(), ("w0",), ("w0", "w1")])
    # pruned model stays close on held-out data
    held, _ = _corpus(50, seed=2)
    assert perplexity(pruned, held) < 1.5 * perplexity(lm, held)


def test_arpa_roundtrip(tmp_path):
    sents, vocab = _corpus(100)
    lm = estimate_ngram_lm(sents, order=2, vocab=vocab)
    p = str(tmp_path / "lm.arpa")
    write_arpa(lm, p)
    lm2 = parse_arpa(open(p).read())
    assert lm2.order == 2
    for g, (lp, bo) in lm.ngrams.items():
        lp2, bo2 = lm2.ngrams[g]
        assert abs(lp - lp2) < 1e-4 and abs(bo - bo2) < 1e-4


def test_g_fst_scores_match_lm():
    """arpa_to_fst over an estimated LM: the G acceptor's path weight for a
    sentence equals the LM log-prob (the backoff-arc construction is exact
    for deterministic-path queries via best path)."""
    from old_kaldi_git_tpu.fst.lang import Lang, Lexicon
    from old_kaldi_git_tpu.lm.arpa import arpa_to_fst

    sents, vocab = _corpus(200)
    lm = estimate_ngram_lm(sents, order=2, vocab=vocab)
    lex = Lexicon.from_dict({w: "ph" for w in vocab})
    lang = Lang(lex, silence_phone="SIL", sil_prob=0.0)
    g = arpa_to_fst(lm, lang.words)
    assert g.num_states > 1
    # score one sentence by walking G greedily (backoff arcs = #0)
    from old_kaldi_git_tpu.fst.algorithms import fst_sentence_cost

    sent = sents[0]
    ids = [lang.words[w] for w in sent]
    cost = fst_sentence_cost(g, ids, backoff_ilabel=lang.words["#0"])
    assert cost == pytest.approx(-lm.score_sequence(sent), abs=1e-3)
