"""Decoding: graph construction (CPU plane) + batched TPU beam search.

Parity with reference src/decoder (SURVEY.md §2.5): mkgraph HCLG pipeline,
per-utterance training graphs, and the batched token-passing decoder
(the reference's LatticeFasterDecoder re-shaped as a lax.scan over frames
with dense top-K beams per utterance — SURVEY.md §7.1/P9).
"""

from old_kaldi_git_tpu.decoder.graph import GraphCompiler, mkgraph, compile_training_graphs
from old_kaldi_git_tpu.decoder.csr import CsrGraph, fst_to_csr
from old_kaldi_git_tpu.decoder.viterbi import (
    ViterbiOptions,
    align_batch,
    decode_batch,
)
