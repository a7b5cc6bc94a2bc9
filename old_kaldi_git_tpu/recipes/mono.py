"""Monophone GMM-HMM training.

Parity with reference steps/train_mono.sh (SURVEY.md §3.2): flat-start from
global feature stats, per-utterance training graphs, iterative
Viterbi-align → accumulate → MLE update with mixture growing, transition
re-estimation.  The N-job map-reduce of the reference collapses into one
batched align/accumulate pass (SURVEY.md §2.8 P1/P2); the shared loop lives
in recipes/gmm_common.py.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np


from old_kaldi_git_tpu.decoder.graph import GraphCompiler
from old_kaldi_git_tpu.fst.lang import Lang
from old_kaldi_git_tpu.gmm.diag_gmm import AmDiagGmm, AmGmmModel
from old_kaldi_git_tpu.hmm.topology import HmmTopology
from old_kaldi_git_tpu.hmm.transition_model import TransitionModel
from old_kaldi_git_tpu.recipes.gmm_common import (
    GmmTrainOptions,
    align_all,
    gmm_training_loop,
    pad_feats,
)
from old_kaldi_git_tpu.decoder.viterbi import ViterbiOptions
from old_kaldi_git_tpu.tree.context_dep import monophone_context_dependency
from old_kaldi_git_tpu.utils.log import get_logger
from old_kaldi_git_tpu.utils.parse_options import options_dataclass

log = get_logger("mono")

# kept as the public name used by recipes/tests
MonoTrainOptions = GmmTrainOptions


def align_utts(am, graphs, feats_padded, num_frames, opts: ViterbiOptions):
    return align_all(am, graphs, feats_padded, num_frames, opts)


def train_mono(
    feats: Dict[str, np.ndarray],
    transcripts: Dict[str, List[str]],
    lang: Lang,
    opts: Optional[GmmTrainOptions] = None,
) -> Tuple[AmGmmModel, Dict[str, np.ndarray]]:
    """Returns (final model, alignments per utt)."""
    opts = opts or GmmTrainOptions(totgauss=100)
    keys, feats_padded, num_frames = pad_feats(feats)

    # flat start (reference gmm-init-mono)
    phones = lang.real_phone_ids
    topo = HmmTopology.standard(phones, silence_phones=[lang.silence_id])
    ctx_dep = monophone_context_dependency(
        phones, {p: topo.num_pdf_classes(p) for p in phones}
    )
    all_feats = np.concatenate([feats[k] for k in keys], axis=0)
    glob_mean = all_feats.mean(axis=0)
    glob_var = all_feats.var(axis=0) + 1e-3
    am = AmDiagGmm.init_mono(ctx_dep.num_pdfs, glob_mean, glob_var, perturb=0.01)
    tm = TransitionModel(ctx_dep, topo)
    log.info(
        "train_mono: %d utts, %d pdfs, %d tids",
        len(keys), ctx_dep.num_pdfs, tm.num_tids,
    )

    compiler = GraphCompiler(lang, ctx_dep, tm)
    tid2pdf = tm.tid_to_pdf_array()
    graphs = [
        compiler.compile_csr_from_text(transcripts[k])
        for k in keys
    ]
    am, alignments = gmm_training_loop(
        am, tm, graphs, feats, keys, feats_padded, num_frames, opts
    )
    model = AmGmmModel(tm, am)
    ali_dict = {
        k: alignments[i] for i, k in enumerate(keys) if alignments[i] is not None
    }
    return model, ali_dict
