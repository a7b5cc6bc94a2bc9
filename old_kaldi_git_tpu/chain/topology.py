"""Chain HMM topology: one emitting state per phone, minimum duration 1.

Parity with reference steps/nnet3/chain/gen_topo.py output — except the
reference gives the self-loop a separate pdf-class (ForwardPdfClass 0 /
SelfLoopPdfClass 1); we share one pdf-class (documented divergence in
old_kaldi_git_tpu.chain).
"""

from __future__ import annotations

from typing import Sequence

from old_kaldi_git_tpu.hmm.topology import NO_PDF, HmmState, HmmTopology


def chain_topology(phones: Sequence[int]) -> HmmTopology:
    topo = HmmTopology()
    entry = [
        HmmState(pdf_class=0, transitions=[(0, 0.5), (1, 0.5)]),
        HmmState(pdf_class=NO_PDF, transitions=[]),
    ]
    for p in phones:
        topo._entries[p] = entry
    return topo
