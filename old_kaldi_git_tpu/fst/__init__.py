"""WFST graph plane (CPU-side, compile-time).

Parity with reference tools/openfst + src/fstext (SURVEY.md §2.4): a minimal
weighted FST library with the Kaldi graph-construction algorithms —
composition (with epsilon filter), DeterminizeStar (epsilon-removing subset
determinization with output strings), encoded minimization, local epsilon
removal, push-special, connection/topsort, and symbol tables.

This plane runs once per LM/graph on CPU; the run-time decoder consumes the
result as padded CSR arc tensors (old_kaldi_git_tpu.decoder).  Per SURVEY.md
§7.1 this is the component where native (C++) acceleration is warranted; the
Python implementation is the semantic reference, a C++ mirror accelerates the
large-LM builds.
"""

from old_kaldi_git_tpu.fst.vector_fst import VectorFst, Arc, NO_STATE
from old_kaldi_git_tpu.fst.symbols import SymbolTable
from old_kaldi_git_tpu.fst.algorithms import (
    compose,
    determinize_star,
    minimize_encoded,
    remove_eps_local,
    rm_symbols,
    push_special,
    shortest_path,
    fst_equivalent,
    add_self_loops_from,
    project,
)
