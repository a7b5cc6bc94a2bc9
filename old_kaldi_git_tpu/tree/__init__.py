"""Phonetic-context decision trees.

Parity with reference src/tree (SURVEY.md §2.3): EventMap hierarchy
(Constant/Table/Split), ContextDependency (N, P, root map), tree statistics
accumulation, question generation by phone clustering, and greedy
likelihood-gain tree building.
"""

from old_kaldi_git_tpu.tree.event_map import (
    KEY_PDF_CLASS,
    ConstantEventMap,
    EventMap,
    SplitEventMap,
    TableEventMap,
)
from old_kaldi_git_tpu.tree.context_dep import ContextDependency, monophone_context_dependency
from old_kaldi_git_tpu.tree.build_tree import (
    GaussClusterable,
    accumulate_tree_stats,
    build_tree,
    cluster_phones_into_questions,
)
