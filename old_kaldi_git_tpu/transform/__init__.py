"""Feature-space transforms: LDA, MLLT/STC, fMLLR (speaker adaptation).

Parity with reference src/transform (SURVEY.md §2.2): LdaEstimate, MlltAccs,
FmllrDiagGmmAccs/ComputeFmllrTransform, CMVN lives in feat/.  Statistics are
accumulated batched (tensor plane); the small eigen/row-update solves run on
host numpy (SURVEY.md §7.3 item 3).
"""

from old_kaldi_git_tpu.transform.lda import LdaEstimate, estimate_lda
from old_kaldi_git_tpu.transform.mllt import MlltAccs, update_mllt
from old_kaldi_git_tpu.transform.fmllr import (
    FmllrAccs,
    compute_fmllr_transform,
    apply_affine_transform,
)
