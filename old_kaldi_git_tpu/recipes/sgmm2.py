"""SGMM2 training recipe (reference steps/train_sgmm2.sh):
UBM from the features, sgmm2-init from a trained GMM system's alignments,
EM with the alternating vwc/MS flag schedule (see gmm/sgmm2.py
Sgmm2UpdateOptions for why the flags alternate), substate growth on a
schedule, periodic realignment.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np

from old_kaldi_git_tpu.decoder.csr import fst_to_csr
from old_kaldi_git_tpu.decoder.viterbi import ViterbiOptions, align_batch
from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
from old_kaldi_git_tpu.gmm.full_gmm import FullGmm
from old_kaldi_git_tpu.gmm.sgmm2 import (
    AmSgmm2,
    MleAmSgmm2Accs,
    Sgmm2Model,
    Sgmm2UpdateOptions,
    alternating_flags,
    sgmm2_update,
    split_substates,
)
from old_kaldi_git_tpu.ivector.extractor import train_ubm
from old_kaldi_git_tpu.utils.batching import pad_feature_batch
from old_kaldi_git_tpu.utils.log import get_logger
from old_kaldi_git_tpu.utils.parse_options import options_dataclass

log = get_logger("sgmm2_recipe")


@options_dataclass
class Sgmm2TrainOptions:
    num_iters: int = 8
    num_ubm_gauss: int = 64
    total_substates: int = 0       # 0 = keep one per pdf
    realign_iters: Tuple[int, ...] = (2, 4, 6)
    beam: float = 200.0
    phn_space_dim: int = 0


def train_sgmm2(
    base: AmGmmModel,
    feats: Dict[str, np.ndarray],
    alignments: Dict[str, np.ndarray],
    graphs: Optional[Dict[str, object]] = None,
    opts: Optional[Sgmm2TrainOptions] = None,
) -> Sgmm2Model:
    """graphs: per-utt training graphs (VectorFst) for realignment; when
    None, the initial alignments are kept fixed throughout."""
    opts = opts or Sgmm2TrainOptions()
    keys = sorted(k for k in feats if k in alignments)
    X = np.concatenate([np.asarray(feats[k], np.float64) for k in keys])
    ubm_diag = train_ubm(X, num_gauss=opts.num_ubm_gauss, num_iters=6)
    ubm = FullGmm.from_diag(ubm_diag)
    sgmm = AmSgmm2.init(ubm, base.am.num_pdfs,
                        opts.phn_space_dim or None)
    tid2pdf = base.tm.tid_to_pdf_array()
    ali = {k: np.asarray(alignments[k]) for k in keys}
    csr = None
    if graphs is not None:
        csr = [fst_to_csr(graphs[k], tid2pdf) for k in keys]
        keys_p, padded, nf = pad_feature_batch(
            {k: np.asarray(feats[k], np.float32) for k in keys})

    split_at = opts.num_iters // 2
    for it in range(opts.num_iters):
        accs = MleAmSgmm2Accs(sgmm)
        for k in keys:
            x = np.asarray(feats[k], np.float64)
            t = min(len(x), len(ali[k]))
            accs.accumulate(sgmm, x[:t], tid2pdf[ali[k][:t]])
        sgmm2_update(sgmm, accs, Sgmm2UpdateOptions(
            update_flags=alternating_flags(it)))
        if it == split_at and opts.total_substates > sgmm.num_substates:
            split_substates(sgmm, accs, opts.total_substates)
        if csr is not None and it in opts.realign_iters:
            loglikes = sgmm.loglikes_batch(padded).astype(np.float32)
            alis, _ = align_batch(csr, loglikes, nf,
                                  ViterbiOptions(beam=opts.beam))
            for i, k in enumerate(keys_p):
                if alis[i] is not None:
                    ali[k] = np.asarray(alis[i])
            log.info("realigned at iter %d", it)
    return Sgmm2Model(base.tm, sgmm)
