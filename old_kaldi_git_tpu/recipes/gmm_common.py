"""Shared GMM training machinery (align → accumulate → update → mixup loop).

Factored from the mono/triphone/LDA+MLLT/SAT recipes — the loop is identical
across reference steps/train_{mono,deltas,lda_mllt,sat}.sh; only
initialization and feature transforms differ (SURVEY.md §3.2).
"""

from __future__ import annotations

import time

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from old_kaldi_git_tpu.decoder.csr import CsrGraph
from old_kaldi_git_tpu.decoder.viterbi import ViterbiOptions, align_batch
from old_kaldi_git_tpu.gmm.diag_gmm import AmDiagGmm
from old_kaldi_git_tpu.gmm.mle import (
    AccumAmDiagGmm,
    MleDiagGmmOptions,
    mixup,
    mle_am_diag_gmm_update,
)
from old_kaldi_git_tpu.hmm.hmm_utils import alignment_to_pdfs
from old_kaldi_git_tpu.hmm.transition_model import TransitionModel
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger
from old_kaldi_git_tpu.utils.parse_options import options_dataclass

log = get_logger("gmm-train")


@options_dataclass
class GmmTrainOptions:
    num_iters: int = 30
    max_iter_inc: int = 20
    totgauss: int = 1000
    beam: float = 32.0
    acoustic_scale: float = 0.1
    realign_iters: Sequence[int] = tuple(range(1, 10)) + (12, 14, 16, 18, 20, 23, 26, 29)


def pad_feats(
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


def align_all(
    am: AmDiagGmm,
    graphs: Sequence[CsrGraph],
    feats_padded: np.ndarray,
    num_frames: np.ndarray,
    vopts: ViterbiOptions,
    max_batch: int = 0,
) -> Tuple[List[Optional[np.ndarray]], List[float]]:
    """Viterbi-align every utterance, chunking the corpus so the GMM
    loglike intermediate ([b, T, num_pdfs·max_gauss] floats — the
    ext@Wᵀ expansion in AmDiagGmm.loglikes_batch) stays within a fixed
    HBM budget: at mini-librispeech scale (600 utts × 2k pdfs) the
    whole-corpus batch is ~8 GB and OOMs a 16 GB chip.  Each chunk is
    also trimmed to its own longest utterance, so sorted-by-key batches
    don't pay the global max length."""
    B, T, _D = feats_padded.shape
    if max_batch <= 0:
        pm = am.num_pdfs * max(
            (len(p.weights) for p in am.pdfs), default=1)
        budget_floats = 500_000_000  # 2 GB of f32 activations
        max_batch = int(min(B, max(8, budget_floats // max(T * pm, 1))))
    alis: List[Optional[np.ndarray]] = []
    scores: List[float] = []
    num_frames = np.asarray(num_frames, np.int32)
    for lo in range(0, B, max_batch):
        hi = min(B, lo + max_batch)
        # bucket the time dim to multiples of 64 so chunks share compiles
        t_max = min(T, -(-int(num_frames[lo:hi].max()) // 64) * 64)
        # keep the loglikes DEVICE-resident: np.asarray here cost a
        # [b, T, P] D2H + H2D round trip (~120 MB/chunk over a tunneled
        # link) before the fused align kernel consumed them again
        ll = am.loglikes_batch(feats_padded[lo:hi, :t_max])
        a, s = align_batch(graphs[lo:hi], ll, num_frames[lo:hi], vopts)
        alis.extend(a)
        scores.extend(s)
    return alis, scores


def gmm_training_loop(
    am: AmDiagGmm,
    tm: TransitionModel,
    graphs: Sequence[CsrGraph],
    feats: Dict[str, np.ndarray],
    keys: List[str],
    feats_padded: np.ndarray,
    num_frames: np.ndarray,
    opts: GmmTrainOptions,
    initial_alignments: Optional[List[Optional[np.ndarray]]] = None,
) -> Tuple[AmDiagGmm, List[Optional[np.ndarray]]]:
    """Runs the iterate(align/accumulate/update/mixup) loop in place on
    (am, tm); returns (final am, final alignments)."""
    vopts = ViterbiOptions(beam=opts.beam, acoustic_scale=opts.acoustic_scale)
    alignments: List[Optional[np.ndarray]] = (
        list(initial_alignments) if initial_alignments is not None else [None] * len(keys)
    )

    audio_s = float(np.asarray(num_frames).sum()) * 0.01
    timings = {"align": 0.0, "accumulate": 0.0, "update": 0.0}

    def do_align():
        t0 = time.perf_counter()
        new_ali, _ = align_all(am, graphs, feats_padded, num_frames, vopts)
        timings["align"] += time.perf_counter() - t0
        ok = sum(1 for a in new_ali if a is not None)
        if ok == 0:
            raise KaldiError("all alignments failed")
        for i, a in enumerate(new_ali):
            if a is not None:
                alignments[i] = a
        log.info("aligned %d/%d utts in %.1fs", ok, len(keys),
                 time.perf_counter() - t0)

    if initial_alignments is None:
        do_align()
    cur_gauss = am.num_gauss
    inc = max(0, opts.totgauss - cur_gauss) // max(opts.max_iter_inc, 1)

    for it in range(opts.num_iters):
        if it > 0 and it in set(opts.realign_iters):
            do_align()
        t0 = time.perf_counter()
        accs = AccumAmDiagGmm(am)
        tstats = np.zeros(tm.num_tids + 1)
        # one vectorized pass over the concatenated corpus (reference
        # gmm-acc-stats-ali over all jobs + gmm-sum-accs, minus the
        # per-utterance Python overhead)
        tid2pdf = tm.tid_to_pdf_array()
        ali_ok = [np.asarray(alignments[i], np.int64)
                  for i in range(len(keys)) if alignments[i] is not None]
        if ali_ok:
            all_ali = np.concatenate(ali_ok)
            all_feats = np.concatenate(
                [feats[k][: len(alignments[i])]
                 for i, k in enumerate(keys) if alignments[i] is not None])
            tot_like = accs.accumulate_corpus(
                am, all_feats, tid2pdf[all_ali])
            tm.accumulate(all_ali, tstats)
            tot_frames = len(all_ali)
        else:
            tot_like, tot_frames = 0.0, 0
        timings["accumulate"] += time.perf_counter() - t0
        log.info(
            "iter %d: avg like/frame %.4f over %d frames (%d gauss)",
            it, tot_like / max(tot_frames, 1), tot_frames, am.num_gauss,
        )
        t0 = time.perf_counter()
        am = mle_am_diag_gmm_update(am, accs, MleDiagGmmOptions())
        tm.mle_update(tstats)
        if it < opts.max_iter_inc and am.num_gauss < opts.totgauss:
            cur_gauss = min(opts.totgauss, am.num_gauss + inc)
            am = mixup(am, cur_gauss, occs=accs.occ.sum(axis=1), seed=it)
        timings["update"] += time.perf_counter() - t0

    do_align_final, _ = align_all(am, graphs, feats_padded, num_frames, vopts)
    for i, a in enumerate(do_align_final):
        if a is not None:
            alignments[i] = a
    # per-training-stage throughput (r3 verdict: audio-s/s per stage must
    # be a tracked metric — the GMM stages had an invisible regression
    # surface)
    total = sum(timings.values())
    log.info(
        "gmm stage timing: align %.0fs, accumulate %.0fs, update %.0fs "
        "(%.1f audio-s/s over %.0f audio-s)",
        timings["align"], timings["accumulate"], timings["update"],
        audio_s / max(total, 1e-9), audio_s,
    )
    return am, alignments
