"""nnet1/nnet2-equivalent stacks (SURVEY.md §2.6 legacy rows)."""

import numpy as np
import pytest

import jax.numpy as jnp

from old_kaldi_git_tpu.models.nnet1 import (
    AmNnet1,
    Nnet1Config,
    Nnet1TrainOptions,
    train_nnet1_frmshuff,
)
from old_kaldi_git_tpu.models.nnet2 import (
    AmNnet2,
    Nnet2Config,
    Nnet2TrainOptions,
    group_pnorm,
    make_fixed_affine,
    radial_normalize,
    train_nnet2_parallel,
)


def test_group_pnorm_matches_naive():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 7, 12)).astype(np.float32)
    for p in (2.0, 3.0):
        y = np.asarray(group_pnorm(jnp.asarray(x), 4, p))
        ref = np.power(
            np.abs(x.reshape(3, 7, 4, 3)) ** p, 1.0
        ).sum(-1) ** (1.0 / p)
        assert np.allclose(y, ref, atol=1e-4), p


def test_radial_normalize_unit_rms():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(5, 16)).astype(np.float32) * 3.0
    y = np.asarray(radial_normalize(jnp.asarray(x)))
    rms = np.sqrt(np.mean(y * y, axis=-1))
    assert np.allclose(rms, 1.0, atol=1e-4)


def test_fixed_affine_whitens():
    rng = np.random.default_rng(2)
    X = rng.normal(size=(4, 50, 6)).astype(np.float32) @ np.diag(
        [5, 1, 0.2, 3, 1, 1]).astype(np.float32)
    wb, bb, d = make_fixed_affine(X)
    W = np.frombuffer(wb, np.float32).reshape(d, d)
    b = np.frombuffer(bb, np.float32)
    Y = X.reshape(-1, 6) @ W.T + b  # W symmetric, but keep the convention
    cov = np.cov(Y, rowvar=False)
    assert np.allclose(cov, np.eye(6), atol=0.15)


def _yesno_system():
    from old_kaldi_git_tpu.recipes.gmm_common import GmmTrainOptions
    from old_kaldi_git_tpu.recipes.mono import train_mono
    from old_kaldi_git_tpu.recipes.yesno import (
        compute_feats,
        make_corpus,
        make_lang,
    )
    from old_kaldi_git_tpu.hmm.hmm_utils import alignment_to_pdfs

    train_waves, train_text, test_waves, test_text = make_corpus(24, 6)
    train_feats = compute_feats(train_waves)
    test_feats = compute_feats(test_waves)
    lang = make_lang()
    gmm, ali = train_mono(
        train_feats, train_text, lang,
        GmmTrainOptions(num_iters=8, totgauss=60,
                        realign_iters=(1, 2, 3, 4, 6)),
    )
    labels = {k: np.asarray(alignment_to_pdfs(gmm.tm, a), np.int32)
              for k, a in ali.items() if a is not None}
    return gmm, lang, train_feats, labels, train_text, test_feats, test_text


def _decode_wer(gmm, lang, train_text, test_feats, test_text, am):
    from old_kaldi_git_tpu.decoder.csr import fst_to_csr
    from old_kaldi_git_tpu.decoder.graph import mkgraph
    from old_kaldi_git_tpu.decoder.viterbi import (
        ViterbiOptions,
        decode_batch,
    )
    from old_kaldi_git_tpu.fst.lang import make_unigram_grammar_fst
    from old_kaldi_git_tpu.utils.batching import pad_feature_batch
    from old_kaldi_git_tpu.recipes.decode import score_hyps
    from old_kaldi_git_tpu.tree.context_dep import (
        monophone_context_dependency,
    )

    g = make_unigram_grammar_fst(list(train_text.values()), lang.words)
    topo = gmm.tm.topo
    phones = lang.real_phone_ids
    cd = monophone_context_dependency(
        phones, {p: topo.num_pdf_classes(p) for p in phones})
    hclg = mkgraph(lang, g, cd, gmm.tm)
    csr = fst_to_csr(hclg, gmm.tm.tid_to_pdf_array())
    keys, padded, nf = pad_feature_batch(test_feats)
    loglikes = am.loglikes_batch(padded)
    results = decode_batch(
        csr, loglikes, nf, ViterbiOptions(beam=20.0, acoustic_scale=0.1))
    hyps = {k: ([lang.words[w] for w in r.words] if r else [])
            for k, r in zip(keys, results)}
    return score_hyps(test_text, hyps)


@pytest.mark.slow
def test_nnet2_pnorm_parallel_averaging_e2e():
    """nnet2 capability: pnorm DNN trained by parallel SGD + model
    averaging decodes yesno at low WER."""
    gmm, lang, feats, labels, train_text, test_feats, test_text = (
        _yesno_system())
    input_dim = next(iter(feats.values())).shape[1]
    cfg = Nnet2Config(
        input_dim=input_dim, output_dim=gmm.am.num_pdfs,
        left_context=3, right_context=3,
        pnorm_input_dim=256, pnorm_output_dim=32, num_hidden_layers=2,
    )
    # estimate the fixed preconditioning affine on spliced features
    from old_kaldi_git_tpu.models.tdnn import splice

    sp = np.concatenate(
        [np.asarray(splice(jnp.asarray(feats[k][None]), tuple(range(-3, 4))))[0]
         for k in sorted(feats)], 0)
    cfg = Nnet2Config(**{**cfg.__dict__, "fixed_affine": make_fixed_affine(sp)})
    am = AmNnet2.init(cfg)
    am = train_nnet2_parallel(
        am, feats, labels,
        Nnet2TrainOptions(num_epochs=40, minibatch_size=4,
                          num_jobs_initial=2, num_jobs_final=4,
                          initial_lr=1e-2, final_lr=1e-3),
    )
    stats = _decode_wer(gmm, lang, train_text, test_feats, test_text, am)
    # measured 0.00 (fixed seeds): zero-error-tolerance gate
    assert stats.wer <= 2.0, stats.report()


@pytest.mark.slow
def test_nnet1_frmshuff_newbob_e2e():
    """nnet1 capability: sigmoid MLP trained frame-shuffled with the newbob
    schedule decodes yesno at low WER."""
    gmm, lang, feats, labels, train_text, test_feats, test_text = (
        _yesno_system())
    input_dim = next(iter(feats.values())).shape[1]
    cfg = Nnet1Config(input_dim=input_dim, output_dim=gmm.am.num_pdfs,
                      hidden_dim=128, num_hidden_layers=2,
                      left_context=4, right_context=4)
    am = train_nnet1_frmshuff(
        AmNnet1.init(cfg), feats, labels,
        Nnet1TrainOptions(max_epochs=20, minibatch_size=128,
                          learn_rate=6e-2, momentum=0.5,
                          start_halving_impr=0.004),
    )
    stats = _decode_wer(gmm, lang, train_text, test_feats, test_text, am)
    # measured 0.00 (fixed seeds): zero-error-tolerance gate
    assert stats.wer <= 2.0, stats.report()


def test_nnet1_mse_loss_trains():
    """Mse loss branch (nnet-loss.h Mse): regression error decreases."""
    from old_kaldi_git_tpu.models.nnet1 import Nnet1Model

    rng = np.random.default_rng(3)
    feats = {"u0": rng.normal(size=(60, 5)).astype(np.float32)}
    targets = {"u0": (feats["u0"] @ rng.normal(size=(5, 4))
                      ).astype(np.float32)}
    cfg = Nnet1Config(input_dim=5, output_dim=4, hidden_dim=32,
                      num_hidden_layers=1, left_context=0, right_context=0)
    init = AmNnet1.init(cfg)
    am = train_nnet1_frmshuff(
        init, feats, targets,
        Nnet1TrainOptions(max_epochs=10, minibatch_size=16,
                          learn_rate=2e-2, loss="mse", cv_fraction=0.2),
    )
    assert am.log_priors is None  # mse path sets no priors

    def mse(m):
        out = Nnet1Model(cfg).apply(
            {"params": m.params}, m._splice(feats["u0"][None]))[0]
        return float(np.mean(np.sum((np.asarray(out) - targets["u0"]) ** 2,
                                    -1)))

    # evaluate both through the TRAINED model's feature transform so the
    # only difference is the weights
    before = AmNnet1(cfg, init.params, feat_shift=am.feat_shift,
                     feat_scale=am.feat_scale)
    assert mse(am) < 0.9 * mse(before), (mse(am), mse(before))
