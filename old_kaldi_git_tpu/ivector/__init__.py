"""Speaker embeddings: UBM + i-vector extractor.

Parity with reference src/ivector (SURVEY.md §2.7): diagonal UBM trained by
EM on pooled features, T-matrix i-vector extractor (EM), per-utterance /
per-speaker extraction with the online-decay variant used by the chain
recipes' online i-vectors.
"""

from old_kaldi_git_tpu.ivector.extractor import (
    IvectorExtractor,
    extract_ivector,
    train_ivector_extractor,
    train_ubm,
)
from old_kaldi_git_tpu.ivector.plda import (
    Plda,
    PldaStats,
    estimate_plda,
)
from old_kaldi_git_tpu.ivector.vad import VadOptions, compute_vad_energy
