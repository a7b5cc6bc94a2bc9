"""Monophone GMM-HMM training.

Parity with reference steps/train_mono.sh (SURVEY.md §3.2): flat-start from
global feature stats, per-utterance training graphs, iterative
Viterbi-align → accumulate → MLE update with mixture growing, transition
re-estimation.  The N-job map-reduce of the reference collapses into one
batched align/accumulate pass (SURVEY.md §2.8 P1/P2).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from old_kaldi_git_tpu.decoder.csr import CsrGraph, fst_to_csr
from old_kaldi_git_tpu.decoder.graph import GraphCompiler
from old_kaldi_git_tpu.decoder.viterbi import ViterbiOptions, align_batch
from old_kaldi_git_tpu.fst.lang import Lang
from old_kaldi_git_tpu.gmm.diag_gmm import AmDiagGmm, AmGmmModel
from old_kaldi_git_tpu.gmm.mle import (
    AccumAmDiagGmm,
    MleDiagGmmOptions,
    mixup,
    mle_am_diag_gmm_update,
)
from old_kaldi_git_tpu.hmm.hmm_utils import alignment_to_pdfs
from old_kaldi_git_tpu.hmm.topology import HmmTopology
from old_kaldi_git_tpu.hmm.transition_model import TransitionModel
from old_kaldi_git_tpu.tree.context_dep import monophone_context_dependency
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger
from old_kaldi_git_tpu.utils.parse_options import options_dataclass

log = get_logger("mono")


@options_dataclass
class MonoTrainOptions:
    num_iters: int = 30
    max_iter_inc: int = 20  # last iteration to increase gaussians
    totgauss: int = 100
    beam: float = 32.0
    acoustic_scale: float = 0.1
    self_loop_scale: float = 0.1
    transition_scale: float = 1.0
    realign_iters: Sequence[int] = tuple(range(1, 10)) + (12, 14, 16, 18, 20, 23, 26, 29)
    power: float = 0.25  # (kept for parity; occupancy-proportional mixup)


def _pad_feats(
    feats: Dict[str, np.ndarray]
) -> Tuple[List[str], np.ndarray, np.ndarray]:
    keys = sorted(feats)
    T = max(feats[k].shape[0] for k in keys)
    D = feats[keys[0]].shape[1]
    out = np.zeros((len(keys), T, D), np.float32)
    nf = np.zeros(len(keys), np.int32)
    for i, k in enumerate(keys):
        t = feats[k].shape[0]
        out[i, :t] = feats[k]
        nf[i] = t
    return keys, out, nf


def align_utts(
    am: AmDiagGmm,
    graphs: Sequence[CsrGraph],
    feats_padded: np.ndarray,
    num_frames: np.ndarray,
    opts: ViterbiOptions,
) -> Tuple[List[Optional[np.ndarray]], List[float]]:
    """Score + align one batch (AM loglikes evaluated on device)."""
    loglikes = np.asarray(am.loglikes_batch(feats_padded))
    return align_batch(graphs, loglikes, num_frames, opts)


def train_mono(
    feats: Dict[str, np.ndarray],
    transcripts: Dict[str, List[str]],
    lang: Lang,
    opts: Optional[MonoTrainOptions] = None,
) -> Tuple[AmGmmModel, Dict[str, np.ndarray]]:
    """Returns (final model, alignments per utt)."""
    opts = opts or MonoTrainOptions()
    keys, feats_padded, num_frames = _pad_feats(feats)

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

    # training graphs (reference compile-train-graphs)
    compiler = GraphCompiler(
        lang, ctx_dep, tm,
        transition_scale=opts.transition_scale,
        self_loop_scale=opts.self_loop_scale,
    )
    tid2pdf = tm.tid_to_pdf_array()
    graphs = [
        fst_to_csr(compiler.compile_graph_from_text(transcripts[k]), tid2pdf)
        for k in keys
    ]

    vopts = ViterbiOptions(beam=opts.beam, acoustic_scale=opts.acoustic_scale)
    alignments: List[Optional[np.ndarray]] = [None] * len(keys)

    def do_align():
        nonlocal alignments
        new_ali, scores = align_utts(am, graphs, feats_padded, num_frames, vopts)
        ok = sum(1 for a in new_ali if a is not None)
        if ok == 0:
            raise KaldiError("all alignments failed")
        for i, a in enumerate(new_ali):
            if a is not None:
                alignments[i] = a
        log.info("aligned %d/%d utts", ok, len(keys))

    cur_gauss = am.num_gauss
    inc = max(0, (opts.totgauss - cur_gauss)) // max(opts.max_iter_inc, 1)

    do_align()
    for it in range(opts.num_iters):
        if it > 0 and it in set(opts.realign_iters):
            do_align()
        accs = AccumAmDiagGmm(am)
        tstats = np.zeros(tm.num_tids + 1)
        tot_like = 0.0
        tot_frames = 0
        for i, k in enumerate(keys):
            ali = alignments[i]
            if ali is None:
                continue
            pdfs = alignment_to_pdfs(tm, ali)
            tot_like += accs.accumulate(am, feats[k], pdfs)
            tm.accumulate(ali, tstats)
            tot_frames += len(ali)
        log.info(
            "iter %d: avg like/frame %.4f over %d frames",
            it, tot_like / max(tot_frames, 1), tot_frames,
        )
        am = mle_am_diag_gmm_update(am, accs, MleDiagGmmOptions())
        tm.mle_update(tstats)
        if it < opts.max_iter_inc and am.num_gauss < opts.totgauss:
            cur_gauss = min(opts.totgauss, am.num_gauss + inc)
            am = mixup(am, cur_gauss, occs=accs.occ.sum(axis=1), seed=it)

    do_align()
    model = AmGmmModel(tm, am)
    ali_dict = {
        k: alignments[i] for i, k in enumerate(keys) if alignments[i] is not None
    }
    return model, ali_dict
