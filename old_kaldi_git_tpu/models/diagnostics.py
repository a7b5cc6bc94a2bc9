"""Train/valid objective diagnostics.

Reference parity (SURVEY.md §2.6): src/nnet3/nnet-diagnostics.{h,cc}
(NnetComputeProb — the nnet3-compute-prob / nnet3-chain-compute-prob
binaries): evaluate the objective and frame accuracy of a model on a
held-out set without updating it (the train.py loop logs these each
iteration to catch divergence).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from old_kaldi_git_tpu.models.am_nnet import AmNnet
from old_kaldi_git_tpu.utils.log import get_logger

log = get_logger("nnet-diag")


def compute_prob(
    am: AmNnet,
    feats: Dict[str, np.ndarray],
    pdf_labels: Dict[str, np.ndarray],
) -> Tuple[float, float]:
    """(mean CE in nats/frame, frame accuracy) in eval mode.

    ~ nnet3-compute-prob on cross-entropy egs."""
    from old_kaldi_git_tpu.utils.batching import pad_feature_batch

    keys = [k for k in sorted(feats) if k in pdf_labels]
    if not keys:
        return float("nan"), float("nan")
    keys, x, _nf = pad_feature_batch(feats, keys=keys)
    T = x.shape[1]
    y = np.zeros((len(keys), T), np.int32)
    m = np.zeros((len(keys), T), np.float32)
    for i, k in enumerate(keys):
        t = min(feats[k].shape[0], len(pdf_labels[k]))
        y[i, :t] = pdf_labels[k][:t]
        m[i, :t] = 1.0
    logits = am.logits(jnp.asarray(x))
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok = jnp.take_along_axis(logp, jnp.asarray(y)[:, :, None], 2)[:, :, 0]
    mask = jnp.asarray(m)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    ce = float(-jnp.sum(tok * mask) / denom)
    acc = float(
        jnp.sum((jnp.argmax(logits, -1) == jnp.asarray(y)) * mask) / denom
    )
    log.info("compute_prob: CE %.4f acc %.3f over %d frames",
             ce, acc, int(denom))
    return ce, acc


def compute_chain_prob(
    chain_model,
    feats: Dict[str, np.ndarray],
    alignments: Dict[str, np.ndarray],
    gmm_model,
    opts=None,
) -> float:
    """Chain objective (num − den, per frame) on held-out data without
    updating — the nnet3-chain-compute-prob role."""
    from old_kaldi_git_tpu.chain.loss import ChainLossOptions, chain_loss
    from old_kaldi_git_tpu.chain.supervision import (
        alignment_to_supervision,
        pad_supervisions,
    )

    fsf = chain_model.frame_subsampling_factor
    keys = [k for k in sorted(feats)
            if alignments.get(k) is not None]
    sups, used = [], []
    for k in keys:
        try:
            sups.append(
                alignment_to_supervision(
                    alignments[k], gmm_model.tm, chain_model.ctx_dep,
                    frame_subsampling_factor=fsf, den=chain_model.den,
                )
            )
            used.append(k)
        except Exception as e:  # noqa: BLE001 - skip bad utterances like the trainer
            log.warning("compute_chain_prob: skipping %s (%s)", k, e)
    if not used:
        return float("nan")
    pdf_seq, allowed, nf, seq_len, adv = pad_supervisions(sups)
    T = max(feats[k].shape[0] for k in used)
    D = feats[used[0]].shape[1]
    x = np.zeros((len(used), T, D), np.float32)
    for i, k in enumerate(used):
        x[i, : feats[k].shape[0]] = feats[k]
    logits = chain_model.am.logits(
        jnp.asarray(x), output_stride=fsf)[:, : allowed.shape[1]]
    loss, metrics = chain_loss(
        logits, chain_model.den, jnp.asarray(pdf_seq), jnp.asarray(allowed),
        jnp.asarray(nf), jnp.asarray(seq_len), jnp.asarray(adv),
        opts or ChainLossOptions(),
    )
    objf = -float(loss)
    log.info("compute_chain_prob: objf %.4f over %d utts", objf, len(used))
    return objf
