"""MMI discriminative GMM training (lattice-based).

Reference parity (SURVEY.md §3 / steps/train_mmi.sh): numerator stats from
the fixed alignments, denominator stats from decode lattices' arc
posteriors (gmm-acc-stats2 over gmm-rescore-lattice'd lattices), EBW
update per iteration.  The reference regenerates lattice acoustics with
the updated model each iteration (gmm-rescore-lattice); here the batched
TPU decoder is cheap enough to simply re-decode.

Boosted MMI (the b·accuracy term in the den lattice) is not implemented
yet; standard MMI only.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from old_kaldi_git_tpu.decoder.csr import CsrGraph
from old_kaldi_git_tpu.fst.lang import Lang
from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
from old_kaldi_git_tpu.gmm.ebw import EbwOptions, ebw_update
from old_kaldi_git_tpu.gmm.mle import AccumAmDiagGmm
from old_kaldi_git_tpu.hmm.hmm_utils import alignment_to_pdfs
from old_kaldi_git_tpu.lat.lattice import lattice_arc_posteriors
from old_kaldi_git_tpu.recipes.decode import (
    DecodeOptions,
    decode_dataset_with_lattices,
)
from old_kaldi_git_tpu.utils.log import get_logger
from old_kaldi_git_tpu.utils.parse_options import options_dataclass

log = get_logger("mmi")


@options_dataclass
class MmiTrainOptions:
    num_iters: int = 4
    acoustic_scale: float = 0.1
    beam: float = 16.0
    lattice_beam: float = 10.0
    ebw_e: float = 2.0
    tau: float = 0.0  # i-smoothing
    update_weights: bool = True


def accumulate_den_stats_from_lattices(
    model: AmGmmModel,
    lattices: Dict[str, object],
    feats: Dict[str, np.ndarray],
    acoustic_scale: float,
) -> AccumAmDiagGmm:
    """Arc posteriors at the decode scales → per-frame soft pdf stats."""
    acc = AccumAmDiagGmm(model.am)
    tm = model.tm
    for k, lat in lattices.items():
        post = lattice_arc_posteriors(lat, lm_scale=1.0, ac_scale=acoustic_scale)
        frames, pdfs, weights = [], [], []
        for s in range(lat.num_states):
            for a, p in zip(lat.arcs[s], post[s]):
                if a.ilabel == 0 or p <= 1e-5:
                    continue
                t = lat.state_time[a.nextstate]
                if t < 0 or t >= feats[k].shape[0]:
                    continue
                frames.append(t)
                pdfs.append(tm.tid_to_pdf(a.ilabel))
                weights.append(p)
        if not frames:
            continue
        acc.accumulate(
            model.am, feats[k][np.asarray(frames)], np.asarray(pdfs),
            np.asarray(weights),
        )
    return acc


def train_mmi(
    model: AmGmmModel,
    graph: CsrGraph,
    lang: Lang,
    feats: Dict[str, np.ndarray],
    alignments: Dict[str, np.ndarray],
    opts: Optional[MmiTrainOptions] = None,
) -> AmGmmModel:
    """EBW/MMI iterations; modifies and returns the model."""
    opts = opts or MmiTrainOptions()
    keys = [k for k, a in alignments.items() if a is not None and k in feats]
    for it in range(opts.num_iters):
        num_acc = AccumAmDiagGmm(model.am)
        for k in keys:
            pdf_ids = np.asarray(alignment_to_pdfs(model.tm, alignments[k]))
            num_acc.accumulate(model.am, feats[k], pdf_ids)
        lats = decode_dataset_with_lattices(
            model, graph, lang, {k: feats[k] for k in keys},
            DecodeOptions(beam=opts.beam, acoustic_scale=opts.acoustic_scale),
            lattice_beam=opts.lattice_beam,
        )
        den_acc = accumulate_den_stats_from_lattices(
            model, lats, feats, opts.acoustic_scale
        )
        objf = (num_acc.tot_like * opts.acoustic_scale) / max(
            num_acc.tot_frames, 1.0
        )
        log.info(
            "MMI iter %d: num frames %.0f, den frames %.0f, scaled num "
            "like/frame %.4f",
            it, num_acc.tot_frames, den_acc.tot_frames, objf,
        )
        ebw_update(
            model.am, num_acc, den_acc,
            EbwOptions(e=opts.ebw_e, tau=opts.tau,
                       update_weights=opts.update_weights),
        )
    return model
