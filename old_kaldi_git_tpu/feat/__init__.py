"""Feature extraction (tensor plane).

Parity with reference src/feat (SURVEY.md §2.2), re-designed array-first:
whole utterance batches [B, num_samples] → [B, T, D] in one XLA program, with
a fused Pallas STFT+mel+DCT kernel for the hot path (old_kaldi_git_tpu.ops).
"""

from old_kaldi_git_tpu.feat.window import FrameExtractionOptions, num_frames, extract_frames
from old_kaldi_git_tpu.feat.mel import MelBanksOptions, mel_banks_matrix
from old_kaldi_git_tpu.feat.compute import (
    MfccOptions,
    FbankOptions,
    SpectrogramOptions,
    PlpOptions,
    Mfcc,
    Fbank,
    Spectrogram,
    Plp,
)
from old_kaldi_git_tpu.feat.functions import (
    DeltaFeaturesOptions,
    compute_deltas,
    splice_frames,
    sliding_window_cmn,
    SlidingWindowCmnOptions,
)
from old_kaldi_git_tpu.feat.cmvn import acc_cmvn_stats, apply_cmvn
from old_kaldi_git_tpu.feat.resample import linear_resample
from old_kaldi_git_tpu.feat.pitch import (
    PitchOptions,
    ProcessPitchOptions,
    compute_kaldi_pitch,
    process_pitch,
)
