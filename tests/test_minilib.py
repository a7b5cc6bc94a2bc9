"""Tiny-scale end-to-end test of the realistic-system recipe (minilib).

Covers, at CI scale, the exact code path the full 20k-word benchmark system
uses: trigram LM with entropy pruning → G with backoff arcs → LG has
epsilon arcs → context composition emits the #-1 begin-of-sequence symbol
(ilabel_info entry [0]) → make_h_transducer must pass it through as a
disambig (reference GetHTransducer `size()==1 && [0] <= 0`; regression for
the round-2 fix in hmm/hmm_utils.py) → token-sparse decode with WER.
"""

import numpy as np
import pytest

from old_kaldi_git_tpu.recipes.minilib import (
    MinilibOptions,
    decode_and_score,
    load_system,
)

TINY = MinilibOptions(
    num_phones=12,
    num_words=80,
    lm_sentences=800,
    num_train=40,
    num_test=8,
    tree_leaves=100,
    tri_iters=6,
    mono_iters=10,
    mono_totgauss=100,
    tri_totgauss=300,
    hidden_dim=128,
    bottleneck_dim=32,
    num_layers=3,
    num_epochs=12,
    chain_epochs=40,
    prune_threshold=1e-6,
)


@pytest.fixture(scope="module")
def tiny_system(tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("minilib"))
    return wd, load_system(wd, TINY)


def test_minilib_tiny_end_to_end(tiny_system):
    _wd, system = tiny_system
    wer, audio_s = decode_and_score(system, max_active=512)
    assert audio_s > 10.0
    # measured 0.00% at this config; anything above a point is a regression
    assert wer <= 1.0, f"tiny minilib WER {wer}"


def test_minilib_artifacts_reload(tiny_system):
    wd, system = tiny_system
    # loading again must hit every artifact (no rebuilds) and reproduce the
    # same graph + test set
    system2 = load_system(wd, TINY)
    assert system2.csr.num_states == system.csr.num_states
    assert system2.csr.num_arcs == system.csr.num_arcs
    assert sorted(system2.test_text) == sorted(system.test_text)
    k = sorted(system.test_text)[0]
    assert system2.test_text[k] == system.test_text[k]
    np.testing.assert_array_equal(
        system2.test_waves[k], system.test_waves[k]
    )


def test_minilib_tiny_chain_and_rescore(tiny_system):
    """Chain stages (7: LF-MMI train on the real biphone tree; 8: chain
    HCLG at self-loop-scale 1.0) and full-LM lattice rescoring run at CI
    scale on the same code path as the flagship system."""
    from old_kaldi_git_tpu.recipes.minilib import (
        build_system,
        decode_and_score_chain,
        rescore_and_score,
    )

    wd, system = tiny_system
    build_system(wd, TINY)  # stages 1-6 skip; 7-8 build if missing
    wer, audio_s = decode_and_score_chain(wd, TINY, max_active=512)
    assert audio_s > 10.0
    assert wer <= 2.0, f"tiny minilib chain WER {wer}"

    before, after = rescore_and_score(system, TINY, max_active=512,
                                      num_utts=8, compute_oracle=True)
    # rescoring with the unpruned trigram must not hurt, and the lattice
    # oracle can only be at least as good as the 1-best
    assert after <= before + 1.0, (before, after)
    stats = rescore_and_score.last_stats
    assert stats["oracle_wer"] is not None
    assert stats["oracle_wer"] <= before + 1e-9
