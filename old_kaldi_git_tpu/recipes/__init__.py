"""Recipe layer: stage-gated training/decoding pipelines.

Parity with reference egs/*/s5 + steps/utils scripts (SURVEY.md §1 L10), as
Python drivers over the library.  Job-array parallelism is replaced by
batched SPMD execution (SURVEY.md §2.8 P1): a "job" is a batch dimension.
"""

from old_kaldi_git_tpu.recipes.mono import MonoTrainOptions, train_mono, align_utts
from old_kaldi_git_tpu.recipes.gmm_common import GmmTrainOptions
from old_kaldi_git_tpu.recipes.triphone import (
    train_deltas,
    train_lda_mllt,
    train_sat,
    estimate_fmllr_per_speaker,
)
from old_kaldi_git_tpu.recipes.decode import DecodeOptions, decode_dataset, score_hyps
