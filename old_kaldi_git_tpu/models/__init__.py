"""Neural acoustic models (the nnet3-equivalent layer).

Parity with reference src/nnet3 (SURVEY.md §2.6), re-designed TPU-first:
the Descriptor DSL's Offset/Append splicing becomes static gathers inside
flax modules; the nnet3 computation compiler/optimizer/executor is NOT
rebuilt — XLA is the compiler (SURVEY.md §7.2 M6).  NG-SGD, max-change and
backstitch live as optax transforms in models/train.py.
"""

from old_kaldi_git_tpu.models.tdnn import (
    TdnnConfig,
    TdnnLayerSpec,
    TdnnModel,
    constrain_orthonormal,
    make_tdnn,
    make_tdnnf,
    make_tdnn_attention,
    make_tdnn_lstm,
)
from old_kaldi_git_tpu.models.recurrent import (
    BlstmpLayer,
    LstmpLayer,
    RestrictedAttentionLayer,
)
from old_kaldi_git_tpu.models.am_nnet import AmNnet
from old_kaldi_git_tpu.models.train import (
    NnetTrainOptions,
    TrainState,
    make_ce_train_step,
    train_ce,
)
