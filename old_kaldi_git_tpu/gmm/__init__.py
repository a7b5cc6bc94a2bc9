"""Gaussian mixture acoustic models (tensor plane).

Parity with reference src/gmm (SURVEY.md §2.3): DiagGmm/AmDiagGmm with
MLE accumulation/update/mixup.  Array-first: the whole acoustic model is a
stacked, padded tensor so per-frame likelihoods for ALL pdfs are one MXU
matmul + masked logsumexp (reference does a per-frame matvec per utterance;
see BASELINE "GMM-likelihood as batched Pallas matmul/log-sum-exp kernels").
"""

from old_kaldi_git_tpu.gmm.diag_gmm import DiagGmm, AmDiagGmm
from old_kaldi_git_tpu.gmm.mle import (
    AccumAmDiagGmm,
    mle_am_diag_gmm_update,
    MleDiagGmmOptions,
)
