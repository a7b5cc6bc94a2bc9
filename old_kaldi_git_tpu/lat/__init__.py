"""Lattices: generation, pruning, N-best, posteriors, rescoring.

Parity with reference src/lat (SURVEY.md §2.5): raw lattice generation from
the batched decoder's per-frame token sets, forward-backward pruning
(lattice-prune), best/N-best paths (lattice-best-path / lattice-nbest),
arc/word posteriors (lattice-to-post), word-level determinization
(lattice-determinize: tropical determinization of the word→tid transducer),
confusion networks / MBR (lattice-mbr-decode, simplified), and N-best LM
rescoring (lattice-lmrescore with old-LM subtraction).

Graph and acoustic costs are kept separate on every arc so LM-weight sweeps
(the reference's scoring LMWT loop) work after decoding.
"""

from old_kaldi_git_tpu.lat.lattice import (
    Lattice,
    LatticeArc,
    lattice_from_decode,
    lattice_best_path,
    lattice_nbest,
    lattice_nbest_paths,
    lattice_prune,
    lattice_union,
    linear_lattice_from_path,
    lattice_arc_posteriors,
    lattice_to_word_fst,
    lattice_word_posteriors,
    confusion_network,
    rescore_nbest,
)
from old_kaldi_git_tpu.lat.determinize import (
    CompactLattice,
    CompactLatticeArc,
    compact_lattice_to_lattice,
    determinize_lattice,
    determinize_lattice_pruned,
    minimize_compact_lattice,
    push_compact_lattice,
)
from old_kaldi_git_tpu.lat.ctm import (
    CtmEntry,
    align_words_lexicon,
    ctm_from_alignment,
    lattice_to_ctm_conf,
)
from old_kaldi_git_tpu.lat.rescore import lmrescore_compact_lattice
from old_kaldi_git_tpu.lat.mbr import MbrResult, minimum_bayes_risk
from old_kaldi_git_tpu.lat import holder as _holder  # registers lat/clat holders
