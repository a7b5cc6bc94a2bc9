"""Chain (LF-MMI) training.

Parity with reference src/chain (SURVEY.md §2.6): un-smoothed phone LM,
denominator graph (phone LM ∘ 1-state chain topology), batched denominator
forward over the den FST as a lax.scan with leaky-HMM and per-frame
normalization, tolerance-windowed numerator, LF-MMI objective.

TPU re-design notes (SURVEY.md §3.4): the reference's chain-kernels.cu
alpha/beta CUDA kernels become scan + scatter-logsumexp XLA programs, and
the BACKWARD pass is jax.grad of the forward — the derivative of the
log-partition function IS the occupancy, so no hand-written beta recursion.

Simplifications vs reference (documented):
  * chain topology uses one shared pdf per phone-state for self-loop and
    forward transitions (reference separates ForwardPdfClass/SelfLoopPdfClass);
  * numerator supervision comes from alignments (reference also supports
    lattice supervision with per-path weights);
  * xent regularization targets hard alignment labels rather than numerator
    posteriors.
"""

from old_kaldi_git_tpu.chain.topology import chain_topology
from old_kaldi_git_tpu.chain.phone_lm import estimate_phone_lm
from old_kaldi_git_tpu.chain.den_graph import DenominatorGraph, make_denominator_graph
from old_kaldi_git_tpu.chain.supervision import ChainSupervision, alignment_to_supervision
from old_kaldi_git_tpu.chain.loss import (
    ChainLossOptions,
    chain_loss,
    denominator_logprob,
    numerator_logprob,
)
