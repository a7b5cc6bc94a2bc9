"""Pallas TPU kernels for the hot compute paths.

BASELINE mandate: "MFCC/fbank/fMLLR feature extraction as fused Pallas
STFT+filterbank kernels, GMM ... likelihood evaluation as batched Pallas
matmul/log-sum-exp kernels".  Each kernel has a jnp reference implementation
and an equivalence test (the reference's CuMatrix-vs-Matrix oracle pattern,
SURVEY.md §4).

Kernels run compiled on TPU and in interpreter mode elsewhere (tests).
"""

from old_kaldi_git_tpu.ops.mfcc_kernel import (
    fused_mfcc_from_frames,
    fused_mfcc_reference,
    make_mfcc_weights,
)
from old_kaldi_git_tpu.ops.gmm_kernel import (
    gmm_loglikes_pallas,
    gmm_loglikes_reference,
    pack_gmm_weights,
)
from old_kaldi_git_tpu.ops.gather_kernel import batched_table_gather
