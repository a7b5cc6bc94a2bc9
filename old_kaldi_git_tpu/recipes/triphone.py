"""Triphone GMM training: deltas, LDA+MLLT, SAT/fMLLR.

Parity with reference steps/train_deltas.sh, steps/train_lda_mllt.sh,
steps/train_sat.sh (SURVEY.md §3.2 later stages + BASELINE config 2):

  train_deltas    — tree from alignments (acc-tree-stats/build-tree), convert
                    alignments to the new tree, GMM loop.
  train_lda_mllt  — splice statics ± context, estimate LDA (classes = pdfs),
                    train with periodic MLLT updates composed into the
                    feature transform and model means.
  train_sat       — per-speaker fMLLR estimated between iterations; training
                    runs on adapted features (speaker-adaptive training).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


from old_kaldi_git_tpu.decoder.graph import GraphCompiler
from old_kaldi_git_tpu.gmm.diag_gmm import AmDiagGmm, AmGmmModel, DiagGmm
from old_kaldi_git_tpu.hmm.hmm_utils import alignment_to_pdfs, convert_alignment
from old_kaldi_git_tpu.hmm.transition_model import TransitionModel
from old_kaldi_git_tpu.recipes.gmm_common import (
    GmmTrainOptions,
    gmm_training_loop,
    pad_feats,
)
from old_kaldi_git_tpu.fst.lang import Lang
from old_kaldi_git_tpu.transform.fmllr import (
    FmllrAccs,
    apply_affine_transform,
    compute_fmllr_transform,
)
from old_kaldi_git_tpu.transform.lda import LdaEstimate
from old_kaldi_git_tpu.transform.mllt import MlltAccs, transform_gmm_means, update_mllt
from old_kaldi_git_tpu.tree.build_tree import accumulate_tree_stats, build_tree
from old_kaldi_git_tpu.tree.context_dep import ContextDependency
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger

log = get_logger("tri")


def _build_tree_and_model(
    feats: Dict[str, np.ndarray],
    alignments: Dict[str, np.ndarray],
    prev_model: AmGmmModel,
    lang: Lang,
    num_leaves: int,
    N: int = 3,
    P: int = 1,
    thresh: float = 20.0,
) -> Tuple[ContextDependency, TransitionModel, AmDiagGmm, Dict[str, np.ndarray]]:
    """acc-tree-stats → build-tree → init leaf GMMs → convert-ali."""
    stats: Dict[tuple, object] = {}
    for k, ali in alignments.items():
        if ali is None:
            continue
        accumulate_tree_stats(ali, feats[k], prev_model.tm, N=N, P=P, stats=stats)
    phones = lang.real_phone_ids
    topo = prev_model.tm.topo
    num_pdf_classes = {p: topo.num_pdf_classes(p) for p in phones}
    ctx_dep = build_tree(
        stats, phones, num_pdf_classes, N=N, P=P,
        max_leaves=num_leaves, thresh=thresh,
    )
    tm = TransitionModel(ctx_dep, topo)
    # leaf GMMs initialized from the tree stats (reference gmm-init-model)
    dim = next(iter(feats.values())).shape[1]
    leaf_stats = [None] * ctx_dep.num_pdfs
    for event, st in stats.items():
        d = dict(event)
        window = [d[i] for i in range(N)]
        pdf = ctx_dep.compute(window, d[-1])
        if leaf_stats[pdf] is None:
            leaf_stats[pdf] = st.copy()
        else:
            leaf_stats[pdf].add(st)
    glob = None
    for st in leaf_stats:
        if st is not None:
            glob = st.copy() if glob is None else glob
            if st is not glob:
                glob.add(st)
    gmean = glob.x / glob.count
    gvar = np.maximum(glob.x2 / glob.count - gmean**2, 1e-3)
    pdfs = []
    for st in leaf_stats:
        if st is not None and st.count > 3.0:
            mean = st.x / st.count
            var = np.maximum(st.x2 / st.count - mean**2, 1e-3)
        else:
            mean, var = gmean.copy(), gvar.copy()
        pdfs.append(DiagGmm(np.ones(1), mean[None, :], var[None, :]))
    am = AmDiagGmm(pdfs)
    new_ali = {
        k: np.asarray(
            convert_alignment(ali, prev_model.tm, tm, ctx_dep), np.int32
        )
        for k, ali in alignments.items()
        if ali is not None
    }
    log.info("tree: %d leaves; converted %d alignments", ctx_dep.num_pdfs, len(new_ali))
    return ctx_dep, tm, am, new_ali


def train_deltas(
    feats: Dict[str, np.ndarray],
    transcripts: Dict[str, List[str]],
    lang: Lang,
    prev_model: AmGmmModel,
    prev_alignments: Dict[str, np.ndarray],
    num_leaves: int = 200,
    opts: Optional[GmmTrainOptions] = None,
) -> Tuple[AmGmmModel, ContextDependency, Dict[str, np.ndarray]]:
    """Triphone system on the given features (reference train_deltas.sh)."""
    opts = opts or GmmTrainOptions()
    ctx_dep, tm, am, conv_ali = _build_tree_and_model(
        feats, prev_alignments, prev_model, lang, num_leaves
    )
    keys, feats_padded, num_frames = pad_feats(feats)
    compiler = GraphCompiler(lang, ctx_dep, tm)
    tid2pdf = tm.tid_to_pdf_array()
    graphs = [
        compiler.compile_csr_from_text(transcripts[k])
        for k in keys
    ]
    init_ali = [conv_ali.get(k) for k in keys]
    am, alignments = gmm_training_loop(
        am, tm, graphs, feats, keys, feats_padded, num_frames, opts,
        initial_alignments=init_ali,
    )
    model = AmGmmModel(tm, am)
    ali_dict = {k: alignments[i] for i, k in enumerate(keys) if alignments[i] is not None}
    return model, ctx_dep, ali_dict


@dataclasses.dataclass
class LdaMlltResult:
    model: AmGmmModel
    ctx_dep: ContextDependency
    transform: np.ndarray  # [target_dim, spliced_dim]
    alignments: Dict[str, np.ndarray]


def splice_numpy(x: np.ndarray, left: int = 3, right: int = 3) -> np.ndarray:
    T = x.shape[0]
    idx = np.clip(
        np.arange(T)[:, None] + np.arange(-left, right + 1)[None, :], 0, T - 1
    )
    return x[idx].reshape(T, -1)


def train_lda_mllt(
    static_feats: Dict[str, np.ndarray],
    transcripts: Dict[str, List[str]],
    lang: Lang,
    prev_model: AmGmmModel,
    prev_alignments: Dict[str, np.ndarray],
    num_leaves: int = 250,
    target_dim: int = 40,
    splice_context: int = 3,
    mllt_iters: Sequence[int] = (2, 4, 6, 12),
    opts: Optional[GmmTrainOptions] = None,
) -> LdaMlltResult:
    """reference train_lda_mllt.sh: LDA over spliced statics, then triphone
    training with interleaved MLLT updates composed into the transform."""
    opts = opts or GmmTrainOptions()
    spliced = {k: splice_numpy(v, splice_context, splice_context)
               for k, v in static_feats.items()}
    sp_dim = next(iter(spliced.values())).shape[1]
    target_dim = min(target_dim, sp_dim)

    # LDA stats from previous alignments (classes = previous pdf ids)
    lda = LdaEstimate(prev_model.am.num_pdfs, sp_dim)
    for k, ali in prev_alignments.items():
        if ali is None:
            continue
        pdfs = np.asarray(alignment_to_pdfs(prev_model.tm, ali))
        t = min(len(pdfs), spliced[k].shape[0])
        lda.accumulate(spliced[k][:t], pdfs[:t])
    transform = lda.estimate(target_dim)  # [40, sp_dim]

    def apply_t(mat):
        return {k: (v @ mat.T).astype(np.float32) for k, v in spliced.items()}

    feats = apply_t(transform)
    ctx_dep, tm, am, conv_ali = _build_tree_and_model(
        feats, prev_alignments, prev_model, lang, num_leaves
    )
    keys, feats_padded, num_frames = pad_feats(feats)
    compiler = GraphCompiler(lang, ctx_dep, tm)
    tid2pdf = tm.tid_to_pdf_array()
    graphs = [
        compiler.compile_csr_from_text(transcripts[k])
        for k in keys
    ]
    alignments = [conv_ali.get(k) for k in keys]

    # training with interleaved MLLT: run segments of the GMM loop between
    # MLLT updates (reference realign/MLLT schedule)
    boundaries = [0] + sorted(mllt_iters) + [opts.num_iters]
    for seg in range(len(boundaries) - 1):
        seg_iters = boundaries[seg + 1] - boundaries[seg]
        if seg_iters > 0:
            seg_opts = dataclasses.replace(
                opts, num_iters=seg_iters,
                realign_iters=tuple(range(1, seg_iters)),
            )
            am, alignments = gmm_training_loop(
                am, tm, graphs, feats, keys, feats_padded, num_frames,
                seg_opts, initial_alignments=alignments,
            )
        if seg < len(boundaries) - 2:
            # MLLT update
            accs = MlltAccs(target_dim)
            for i, k in enumerate(keys):
                if alignments[i] is None:
                    continue
                pdfs = alignment_to_pdfs(tm, alignments[i])
                accs.accumulate(am, feats[k], pdfs)
            m, _ = update_mllt(accs)
            transform = m @ transform
            transform_gmm_means(am, m)
            feats = apply_t(transform)
            keys, feats_padded, num_frames = pad_feats(feats)

    model = AmGmmModel(tm, am)
    ali_dict = {k: alignments[i] for i, k in enumerate(keys) if alignments[i] is not None}
    return LdaMlltResult(model, ctx_dep, transform, ali_dict)


def estimate_fmllr_per_speaker(
    model: AmGmmModel,
    feats: Dict[str, np.ndarray],
    alignments: Dict[str, np.ndarray],
    utt2spk: Dict[str, str],
    min_count: float = 100.0,
    silence_weight: float = 1.0,
) -> Dict[str, np.ndarray]:
    """Per-speaker fMLLR transforms from aligned data (reference
    gmm-est-fmllr + spk2utt grouping)."""
    dim = next(iter(feats.values())).shape[1]
    spk_accs: Dict[str, FmllrAccs] = {}
    for k, ali in alignments.items():
        if ali is None or k not in feats:
            continue
        spk = utt2spk.get(k, k)
        if spk not in spk_accs:
            spk_accs[spk] = FmllrAccs(dim)
        pdfs = np.asarray(alignment_to_pdfs(model.tm, ali))
        t = min(len(pdfs), feats[k].shape[0])
        spk_accs[spk].accumulate(model.am, feats[k][:t], pdfs[:t])
    out: Dict[str, np.ndarray] = {}
    for spk, accs in spk_accs.items():
        w = compute_fmllr_transform(accs, min_count=min_count)
        if w is not None:
            out[spk] = w
    return out


def train_sat(
    feats: Dict[str, np.ndarray],
    transcripts: Dict[str, List[str]],
    lang: Lang,
    prev_model: AmGmmModel,
    prev_alignments: Dict[str, np.ndarray],
    utt2spk: Dict[str, str],
    num_leaves: int = 300,
    fmllr_iters: Sequence[int] = (2, 4, 6, 12),
    opts: Optional[GmmTrainOptions] = None,
) -> Tuple[AmGmmModel, ContextDependency, Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Speaker-adaptive training (reference train_sat.sh).
    Returns (model, tree, transforms per speaker, alignments)."""
    opts = opts or GmmTrainOptions()
    ctx_dep, tm, am, conv_ali = _build_tree_and_model(
        feats, prev_alignments, prev_model, lang, num_leaves
    )
    keys, _, _ = pad_feats(feats)
    compiler = GraphCompiler(lang, ctx_dep, tm)
    tid2pdf = tm.tid_to_pdf_array()
    graphs = [
        compiler.compile_csr_from_text(transcripts[k])
        for k in keys
    ]
    alignments = [conv_ali.get(k) for k in keys]
    transforms: Dict[str, np.ndarray] = {}

    def adapted():
        return {
            k: (
                apply_affine_transform(feats[k], transforms[utt2spk.get(k, k)])
                if utt2spk.get(k, k) in transforms
                else feats[k]
            )
            for k in keys
        }

    boundaries = [0] + sorted(fmllr_iters) + [opts.num_iters]
    for seg in range(len(boundaries) - 1):
        cur_feats = adapted()
        _, feats_padded, num_frames = pad_feats(cur_feats)
        seg_iters = boundaries[seg + 1] - boundaries[seg]
        if seg_iters > 0:
            seg_opts = dataclasses.replace(
                opts, num_iters=seg_iters,
                realign_iters=tuple(range(1, seg_iters)),
            )
            am, alignments = gmm_training_loop(
                am, tm, graphs, cur_feats, keys, feats_padded, num_frames,
                seg_opts, initial_alignments=alignments,
            )
        if seg < len(boundaries) - 2:
            model_now = AmGmmModel(tm, am)
            ali_dict = {
                k: alignments[i] for i, k in enumerate(keys)
                if alignments[i] is not None
            }
            transforms = estimate_fmllr_per_speaker(
                model_now, feats, ali_dict, utt2spk
            )
            log.info("SAT: estimated fMLLR for %d speakers", len(transforms))

    model = AmGmmModel(tm, am)
    ali_dict = {k: alignments[i] for i, k in enumerate(keys) if alignments[i] is not None}
    return model, ctx_dep, transforms, ali_dict
