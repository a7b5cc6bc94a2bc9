"""HMM layer: topologies, transition model, H-transducer construction.

Parity with reference src/hmm (SURVEY.md §2.3): HmmTopology, TransitionModel
(transition-id ↔ (transition-state, transition-index) ↔ (phone, hmm-state,
pdf-id)), H transducer + self-loops, alignment↔phone conversions, posteriors.
"""

from old_kaldi_git_tpu.hmm.topology import HmmTopology
from old_kaldi_git_tpu.hmm.transition_model import TransitionModel
from old_kaldi_git_tpu.hmm.hmm_utils import (
    make_h_transducer,
    add_self_loops,
    split_to_phones,
    alignment_to_phones,
    alignment_to_pdfs,
    convert_alignment,
)
