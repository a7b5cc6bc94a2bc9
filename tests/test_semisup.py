"""Semi-supervised chain (lattice-supervised LF-MMI) — the fork's
specialty (SURVEY.md §8.4; chain-supervision-splitter role)."""

import numpy as np
import pytest

import jax.numpy as jnp

from old_kaldi_git_tpu.fst.lang import make_unigram_grammar_fst
from old_kaldi_git_tpu.recipes.chain import (
    ChainTrainOptions,
    decode_chain,
    make_chain_decode_graph,
    train_chain_e2e,
)
from old_kaldi_git_tpu.recipes.decode import score_hyps
from old_kaldi_git_tpu.recipes.semisup import (
    SemisupOptions,
    decode_chain_lattices,
    train_chain_semisup,
)
from old_kaldi_git_tpu.recipes.yesno import compute_feats, make_corpus, make_lang


def _seed_system(n_sup=12, n_unsup=12, n_test=6, epochs=30):
    train_waves, train_text, test_waves, test_text = make_corpus(
        n_sup + n_unsup, n_test)
    keys = sorted(train_text)
    sup_keys, unsup_keys = keys[:n_sup], keys[n_sup:]
    feats = compute_feats(train_waves)
    sup_feats = {k: feats[k] for k in sup_keys}
    sup_text = {k: train_text[k] for k in sup_keys}
    unsup_feats = {k: feats[k] for k in unsup_keys}
    lang = make_lang()
    seed = train_chain_e2e(
        sup_feats, sup_text, lang,
        ChainTrainOptions(num_epochs=epochs, minibatch_size=8,
                          hidden_dim=128, bottleneck_dim=32, num_layers=3,
                          initial_lr=2e-3, final_lr=4e-4),
    )
    g = make_unigram_grammar_fst(list(train_text.values()), lang.words)
    graph = make_chain_decode_graph(seed, lang, g)
    return (seed, lang, graph, sup_feats, sup_text, unsup_feats,
            compute_feats(test_waves), test_text)


def test_lattice_numerator_bounded_by_denominator():
    """A lattice numerator is a weighted subset of denominator paths, so
    num ≤ den must hold on ANY logits (the normalization-product
    invariant carried over from e2e training graphs)."""
    from old_kaldi_git_tpu.chain.e2e import (
        NumeratorGraphBatch,
        generic_numerator_logprob,
    )
    from old_kaldi_git_tpu.chain.loss import denominator_logprob
    from old_kaldi_git_tpu.chain.semisup import lattice_to_numerator

    (seed, lang, graph, _sf, _st, unsup_feats, _tf, _tt) = _seed_system(
        n_sup=8, n_unsup=4, n_test=2, epochs=6)
    lats = decode_chain_lattices(seed, graph, unsup_feats, beam=14.0,
                                 lattice_beam=6.0)
    assert lats, "decode produced no lattices"
    graphs = [lattice_to_numerator(lats[k], seed.tm, seed.den,
                                   lattice_lm_scale=0.0)
              for k in sorted(lats)]
    g = NumeratorGraphBatch.from_csr_graphs(graphs)
    nf = np.array([lats[k].state_time[
        max(range(lats[k].num_states), key=lats[k].state_time.__getitem__)
    ] + 1 for k in sorted(lats)], np.int32)
    T = int(nf.max())
    rng = np.random.default_rng(0)
    logits = jnp.asarray(
        rng.normal(size=(len(graphs), T, seed.ctx_dep.num_pdfs)).astype(
            np.float32))
    num = generic_numerator_logprob(logits, g, jnp.asarray(nf))
    den = denominator_logprob(logits, jnp.asarray(nf), seed.den, 0.0)
    assert np.all(np.asarray(num) <= np.asarray(den) + 1e-3), (num, den)
    # with lattice LM scores folded in, the numerator can only go down
    graphs_lm = [lattice_to_numerator(lats[k], seed.tm, seed.den,
                                      lattice_lm_scale=0.5)
                 for k in sorted(lats)]
    g_lm = NumeratorGraphBatch.from_csr_graphs(graphs_lm)
    num_lm = generic_numerator_logprob(logits, g_lm, jnp.asarray(nf))
    assert np.all(np.asarray(num_lm) <= np.asarray(num) + 1e-3)


def test_lattice_numerator_folds_epsilon_arcs():
    """Epsilon-input arcs (multi-word olabel chains from lattice_from_decode's
    _emit) must NOT abort numerator construction: their graph cost folds
    into the adjacent emitting arc via epsilon closure, and num ≤ den still
    holds on random logits."""
    from old_kaldi_git_tpu.chain.e2e import (
        NumeratorGraphBatch,
        generic_numerator_logprob,
    )
    from old_kaldi_git_tpu.chain.loss import denominator_logprob
    from old_kaldi_git_tpu.chain.semisup import lattice_to_numerator
    from old_kaldi_git_tpu.lat.lattice import Lattice, LatticeArc

    (seed, lang, graph, _sf, _st, unsup_feats, _tf, _tt) = _seed_system(
        n_sup=8, n_unsup=2, n_test=2, epochs=4)
    lats = decode_chain_lattices(seed, graph, unsup_feats, beam=14.0,
                                 lattice_beam=6.0)
    assert lats
    key = sorted(lats)[0]
    lat = lats[key]
    # splice an epsilon arc into the middle of the best chain, exactly the
    # shape _emit produces for a 2-word olabel: emitting arc retargeted to a
    # fresh state, then (ilabel=0, graph_cost) to the original destination
    src = next(s for s in range(lat.num_states) if lat.arcs[s])
    arc = lat.arcs[src][0]
    mid = lat.add_state(time=lat.state_time[src])
    orig_dst = arc.nextstate
    arc.nextstate = mid
    lat.arcs[mid].append(LatticeArc(0, 0, 1.25, 0.0, orig_dst))
    g1 = lattice_to_numerator(lat, seed.tm, seed.den, lattice_lm_scale=0.7)
    g = NumeratorGraphBatch.from_csr_graphs([g1])
    nf = np.array([max(t for t in lat.state_time if t >= 0) + 1], np.int32)
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(
        size=(1, int(nf[0]), seed.ctx_dep.num_pdfs)).astype(np.float32))
    num = generic_numerator_logprob(logits, g, jnp.asarray(nf))
    den = denominator_logprob(logits, jnp.asarray(nf), seed.den, 0.0)
    assert np.all(np.isfinite(np.asarray(num)))
    assert np.all(np.asarray(num) <= np.asarray(den) + 1e-3)


@pytest.mark.slow
def test_semisup_improves_or_holds_wer():
    """End-to-end semisup: seed on half the data, lattice supervision on
    the unlabeled half; held-out WER does not regress and the final model
    keeps the num ≤ den normalization invariant."""
    (seed, lang, graph, sup_feats, sup_text, unsup_feats, test_feats,
     test_text) = _seed_system()
    seed_stats = score_hyps(
        test_text, decode_chain(seed, graph, lang, test_feats, beam=20.0))
    model = train_chain_semisup(
        seed, lang, sup_feats, sup_text, unsup_feats, graph,
        SemisupOptions(num_epochs=6, minibatch_size=8,
                       initial_lr=3e-4, final_lr=1e-4,
                       lattice_lm_scale=0.5, unsup_egs_weight=1.0),
    )
    stats = score_hyps(
        test_text, decode_chain(model, graph, lang, test_feats, beam=20.0))
    assert stats.wer <= max(seed_stats.wer, 15.0), (
        f"semisup WER {stats.wer} vs seed {seed_stats.wer}")
