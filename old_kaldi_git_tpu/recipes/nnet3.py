"""nnet3-style TDNN training recipe (BASELINE config 3 shape).

Parity with reference steps/nnet3/train_dnn.py: take alignments from a GMM
system, train a TDNN with cross-entropy on pdf labels, set priors, decode
with the same HCLG.  The N-job model-averaging loop collapses into one
data-parallel jitted step (SURVEY.md §2.8 P3).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from old_kaldi_git_tpu.decoder.csr import CsrGraph
from old_kaldi_git_tpu.decoder.viterbi import ViterbiOptions, decode_batch
from old_kaldi_git_tpu.fst.lang import Lang
from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
from old_kaldi_git_tpu.hmm.hmm_utils import alignment_to_pdfs
from old_kaldi_git_tpu.models.am_nnet import AmNnet
from old_kaldi_git_tpu.models.tdnn import make_tdnn, make_tdnnf
from old_kaldi_git_tpu.models.train import NnetTrainOptions, train_ce
from old_kaldi_git_tpu.utils.batching import pad_feature_batch
from old_kaldi_git_tpu.utils.log import get_logger

log = get_logger("nnet3")


def append_ivector_feats(
    feats: Dict[str, np.ndarray],
    ivectors: Dict[str, np.ndarray],
) -> Dict[str, np.ndarray]:
    """{utt: [T, D]} + {utt: [T, R] online (or [R] per-utt) i-vectors} →
    {utt: [T, D+R]}: the reference's Append(input, ivector) Descriptor
    wiring collapsed into the feature matrix (TPU array-first contract)."""
    out = {}
    for k, x in feats.items():
        iv = np.asarray(ivectors[k], np.float32)
        if iv.ndim == 1:
            iv = np.broadcast_to(iv, (x.shape[0], iv.shape[0]))
        elif iv.shape[0] != x.shape[0]:
            # online i-vectors computed on a different frame count (e.g.
            # pre-CMVN feats): clamp-pad to the feature length
            idx = np.minimum(np.arange(x.shape[0]), iv.shape[0] - 1)
            iv = iv[idx]
        out[k] = np.concatenate([x, iv.astype(np.float32)], axis=1)
    return out


def train_tdnn(
    gmm_model: AmGmmModel,
    feats: Dict[str, np.ndarray],
    alignments: Dict[str, np.ndarray],
    hidden_dim: int = 256,
    num_layers: int = 4,
    factored: bool = False,
    opts: Optional[NnetTrainOptions] = None,
    config=None,
    ivectors: Optional[Dict[str, np.ndarray]] = None,
) -> AmNnet:
    """CE-train a TDNN on GMM alignments; pdf ids come from the GMM's tree.

    config: any TdnnConfig (e.g. make_tdnn_lstm / make_tdnn_attention)
    overrides the hidden_dim/num_layers/factored defaults.

    ivectors: per-utterance {utt: [T, R] online or [R]} i-vectors appended
    to every frame (reference steps/nnet3/train_dnn.py
    --online-ivector-dir); the model's input_dim grows by R and
    AmNnet.ivector_dim records it so decode paths append the same way."""
    tm = gmm_model.tm
    num_pdfs = gmm_model.am.num_pdfs
    ivector_dim = 0
    if ivectors is not None:
        feats = append_ivector_feats(feats, ivectors)
        iv0 = np.asarray(next(iter(ivectors.values())))
        ivector_dim = int(iv0.shape[-1])
    input_dim = next(iter(feats.values())).shape[1]
    labels = {
        k: np.asarray(alignment_to_pdfs(tm, ali), np.int32)
        for k, ali in alignments.items()
        if ali is not None
    }
    feats = {k: feats[k] for k in labels}
    if config is None:
        config = (
            make_tdnnf(input_dim, num_pdfs, hidden_dim,
                       max(32, hidden_dim // 8), num_layers)
            if factored
            else make_tdnn(input_dim, num_pdfs, hidden_dim, num_layers)
        )
    if config.input_dim != input_dim:
        raise ValueError(
            f"config input_dim {config.input_dim} != feature dim "
            f"{input_dim} (acoustic + i-vector)")
    am = AmNnet.init(config)
    am.ivector_dim = ivector_dim
    log.info(
        "train_tdnn: %d pdfs, context -%d/+%d, %d utts, ivector_dim %d",
        num_pdfs, config.left_context, config.right_context, len(labels),
        ivector_dim,
    )
    out = train_ce(am, feats, labels, opts)
    out.ivector_dim = ivector_dim
    return out


def decode_tdnn(
    am: AmNnet,
    graph: CsrGraph,
    lang: Lang,
    feats: Dict[str, np.ndarray],
    beam: float = 16.0,
    max_active: int = 7000,
    acoustic_scale: float = 1.0,
    ivectors: Optional[Dict[str, np.ndarray]] = None,
) -> Dict[str, List[str]]:
    """Batched TDNN decode (reference nnet3-latgen-faster, 1-best path).
    acoustic_scale 1.0 is the nnet3 convention (posteriors / priors).

    A model trained with i-vectors (am.ivector_dim > 0) must be fed
    matching `ivectors` (reference nnet3-latgen-faster --online-ivectors)."""
    if am.ivector_dim and ivectors is None:
        raise ValueError(
            f"model expects {am.ivector_dim}-dim i-vectors appended; pass "
            "ivectors= (reference --online-ivector-dir decode convention)")
    if ivectors is not None:
        feats = append_ivector_feats(feats, ivectors)
    keys, padded, nf = pad_feature_batch(feats)
    loglikes = am.loglikes_batch(padded)  # device-resident
    results = decode_batch(
        graph, loglikes, nf,
        ViterbiOptions(beam=beam, max_active=max_active, acoustic_scale=acoustic_scale),
    )
    hyps: Dict[str, List[str]] = {}
    for k, res in zip(keys, results):
        hyps[k] = [lang.words[w] for w in res.words] if res else []
    return hyps
