"""Language models: ARPA parsing, G.fst compilation, rescoring.

Parity with reference src/lm (SURVEY.md §2.4): arpa-file-parser,
arpa-lm-compiler (ARPA → G.fst with backoff #0 arcs), const-arpa-lm
(in-memory trie for lattice rescoring).
"""

from old_kaldi_git_tpu.lm.arpa import ArpaLm, parse_arpa, arpa_to_fst
