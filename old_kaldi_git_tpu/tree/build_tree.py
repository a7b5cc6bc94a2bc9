"""Decision-tree building from single-Gaussian statistics.

Parity with reference src/tree/{build-tree.h,build-tree-utils.h,
cluster-utils.h,clusterable-classes.h}: GaussClusterable sufficient stats,
tree-stats accumulation from alignments, automatic question generation by
agglomerative phone clustering, and greedy likelihood-gain splitting with
max-leaves / min-gain stopping.

Simplifications vs reference (documented):
  * roots: one root per central phone, pdf-classes shared & splittable
    (reference default behavior for the standard recipes);
  * questions for the pdf-class key are the contiguous subsets {0},{0,1},…;
  * no post-split leaf re-clustering (cluster-leaves stage) yet.
"""

from __future__ import annotations

import dataclasses
import heapq
import math
from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

from old_kaldi_git_tpu.tree.event_map import (
    KEY_PDF_CLASS,
    ConstantEventMap,
    EventMap,
    SplitEventMap,
    TableEventMap,
    make_event,
)
from old_kaldi_git_tpu.tree.context_dep import ContextDependency
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger

log = get_logger("tree")


class GaussClusterable:
    """Diagonal-Gaussian sufficient statistics (count, Σx, Σx²) with the
    single-Gaussian data log-likelihood as the clustering objective."""

    __slots__ = ("count", "x", "x2")

    def __init__(self, dim: int = 0):
        self.count = 0.0
        self.x = np.zeros(dim)
        self.x2 = np.zeros(dim)

    def add_sample(self, feat: np.ndarray, weight: float = 1.0) -> None:
        if self.x.size == 0:
            self.x = np.zeros(feat.shape[-1])
            self.x2 = np.zeros(feat.shape[-1])
        self.count += weight
        self.x += weight * feat
        self.x2 += weight * feat * feat

    def add(self, other: "GaussClusterable") -> None:
        if self.x.size == 0 and other.x.size:
            self.x = np.zeros_like(other.x)
            self.x2 = np.zeros_like(other.x2)
        self.count += other.count
        if other.x.size:
            self.x += other.x
            self.x2 += other.x2

    def copy(self) -> "GaussClusterable":
        out = GaussClusterable()
        out.count = self.count
        out.x = self.x.copy()
        out.x2 = self.x2.copy()
        return out

    def objf(self, var_floor: float = 0.01) -> float:
        """Data log-likelihood under the ML diagonal Gaussian."""
        if self.count <= 0:
            return 0.0
        mean = self.x / self.count
        var = np.maximum(self.x2 / self.count - mean**2, var_floor)
        dim = self.x.size
        return float(
            -0.5 * self.count * (dim * (math.log(2 * math.pi) + 1.0) + np.log(var).sum())
        )


def merged_objf(a: GaussClusterable, b: GaussClusterable) -> float:
    m = a.copy()
    m.add(b)
    return m.objf()


# ---------------------------------------------------------------------------
# stats accumulation (reference src/hmm/tree-accu.cc AccumulateTreeStats)
# ---------------------------------------------------------------------------

def accumulate_tree_stats(
    alignment: Sequence[int],
    feats: np.ndarray,
    transition_model,
    N: int = 3,
    P: int = 1,
    stats: Optional[Dict[tuple, GaussClusterable]] = None,
) -> Dict[tuple, GaussClusterable]:
    """alignment: per-frame transition-ids; feats [T, D].
    Returns/updates {event → GaussClusterable} where the event carries the
    context window and pdf-class."""
    from old_kaldi_git_tpu.hmm.hmm_utils import split_to_phones

    stats = stats if stats is not None else {}
    segments = split_to_phones(transition_model, alignment)
    phone_seq = [transition_model.tid_to_phone(seg[0]) for seg in segments]
    t = 0
    for i, seg in enumerate(segments):
        window = []
        for pos in range(i - P, i - P + N):
            window.append(phone_seq[pos] if 0 <= pos < len(phone_seq) else 0)
        for tid in seg:
            pdf_class = transition_model.tid_to_pdf_class(tid)
            event = make_event(
                [(KEY_PDF_CLASS, pdf_class)] + list(enumerate(window))
            )
            if event not in stats:
                stats[event] = GaussClusterable(feats.shape[1])
            stats[event].add_sample(feats[t])
            t += 1
    if t != len(feats):
        raise KaldiError(f"alignment length {t} != num frames {len(feats)}")
    return stats


# ---------------------------------------------------------------------------
# question generation (reference bin/cluster-phones + compile-questions)
# ---------------------------------------------------------------------------

def cluster_phones_into_questions(
    stats: Dict[tuple, GaussClusterable],
    phones: Sequence[int],
    P: int = 1,
    extra_questions: Sequence[Set[int]] = (),
) -> List[Set[int]]:
    """Agglomerative clustering of central-phone stats; every intermediate
    cluster becomes a question (set of phones)."""
    per_phone: Dict[int, GaussClusterable] = {p: GaussClusterable() for p in phones}
    for event, st in stats.items():
        d = dict(event)
        phone = d.get(P)
        if phone in per_phone:
            per_phone[phone].add(st)
    active: List[Tuple[Set[int], GaussClusterable]] = [
        ({p}, per_phone[p]) for p in phones if per_phone[p].count > 0
    ]
    questions: List[Set[int]] = [set(s) for s, _ in active]
    while len(active) > 1:
        best = None
        for i in range(len(active)):
            for j in range(i + 1, len(active)):
                gain = (
                    merged_objf(active[i][1], active[j][1])
                    - active[i][1].objf()
                    - active[j][1].objf()
                )
                if best is None or gain > best[0]:
                    best = (gain, i, j)
        _, i, j = best
        merged_set = active[i][0] | active[j][0]
        merged_stats = active[i][1].copy()
        merged_stats.add(active[j][1])
        active = [a for k, a in enumerate(active) if k not in (i, j)]
        active.append((merged_set, merged_stats))
        questions.append(set(merged_set))
    for q in extra_questions:
        questions.append(set(q))
    # dedupe
    seen, out = set(), []
    for q in questions:
        key = frozenset(q)
        if key not in seen and q:
            seen.add(key)
            out.append(q)
    return out


# ---------------------------------------------------------------------------
# greedy tree building (reference src/tree/build-tree.cc BuildTree)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class _Leaf:
    items: List[Tuple[tuple, GaussClusterable]]  # (event, stats)
    total: GaussClusterable


def _best_split(
    leaf: _Leaf,
    keys: Sequence[int],
    questions_per_key: Dict[int, List[Set[int]]],
):
    """Best (gain, key, value_set) split of this leaf, or None."""
    base = leaf.total.objf()
    best = None
    for key in keys:
        for q in questions_per_key.get(key, ()):
            yes = GaussClusterable()
            no = GaussClusterable()
            any_yes = any_no = False
            for event, st in leaf.items:
                v = dict(event).get(key)
                if v in q:
                    yes.add(st)
                    any_yes = True
                else:
                    no.add(st)
                    any_no = True
            if not (any_yes and any_no):
                continue
            gain = yes.objf() + no.objf() - base
            if best is None or gain > best[0]:
                best = (gain, key, q)
    return best


def build_tree(
    stats: Dict[tuple, GaussClusterable],
    phones: Sequence[int],
    num_pdf_classes: Dict[int, int],
    N: int = 3,
    P: int = 1,
    questions: Optional[List[Set[int]]] = None,
    max_leaves: int = 1000,
    thresh: float = 300.0,
) -> ContextDependency:
    """Greedy likelihood-gain splitting, one root per central phone."""
    if questions is None:
        questions = cluster_phones_into_questions(stats, phones, P)
    max_pc = max(num_pdf_classes.values())
    questions_per_key: Dict[int, List[Set[int]]] = {}
    for pos in range(N):
        if pos != P:
            questions_per_key[pos] = questions
    questions_per_key[KEY_PDF_CLASS] = [
        set(range(k + 1)) for k in range(max_pc - 1)
    ] or [{0}]
    keys = [KEY_PDF_CLASS] + [pos for pos in range(N) if pos != P]

    # roots: central phone
    roots: Dict[int, _Leaf] = {}
    for event, st in stats.items():
        phone = dict(event)[P]
        if phone not in roots:
            roots[phone] = _Leaf([], GaussClusterable())
        roots[phone].items.append((event, st))
        roots[phone].total.add(st)
    missing = [p for p in phones if p not in roots]
    if missing:
        log.warning("no tree stats for phones %s (unseen in data)", missing)

    # global greedy across all roots: a heap of candidate splits over a pool
    # of leaves; each pool entry owns a mutable dict node filled when split
    heap: List[Tuple[float, int]] = []  # (-gain, pool idx)
    pool: List[Tuple[int, _Leaf, Optional[tuple]]] = []  # (root_phone, leaf, split)
    for phone, leaf in sorted(roots.items()):
        idx = len(pool)
        split = _best_split(leaf, keys, questions_per_key)
        pool.append((phone, leaf, split))
        if split is not None and split[0] > thresh:
            heapq.heappush(heap, (-split[0], idx))
    num_leaves = len(roots)

    nodes: List[dict] = [{"items": pool[i][1]} for i in range(len(pool))]
    root_nodes: Dict[int, dict] = {}
    for i, (phone, leaf, _) in enumerate(pool):
        root_nodes[phone] = nodes[i]

    while heap and num_leaves < max_leaves:
        neg_gain, idx = heapq.heappop(heap)
        root_phone, leaf, split = pool[idx]
        if split is None:
            continue
        gain, key, q = split
        if gain <= thresh:
            continue
        yes_leaf = _Leaf([], GaussClusterable())
        no_leaf = _Leaf([], GaussClusterable())
        for event, st in leaf.items:
            v = dict(event).get(key)
            target = yes_leaf if v in q else no_leaf
            target.items.append((event, st))
            target.total.add(st)
        node = nodes[idx]
        node["split"] = (key, frozenset(q))
        yes_node = {"items": yes_leaf}
        no_node = {"items": no_leaf}
        node["yes"] = yes_node
        node["no"] = no_node
        num_leaves += 1
        for sub_leaf, sub_node in ((yes_leaf, yes_node), (no_leaf, no_node)):
            sidx = len(pool)
            ssplit = _best_split(sub_leaf, keys, questions_per_key)
            pool.append((root_phone, sub_leaf, ssplit))
            nodes.append(sub_node)
            if ssplit is not None and ssplit[0] > thresh:
                heapq.heappush(heap, (-ssplit[0], sidx))

    # assign pdf ids and build EventMaps
    counter = [0]

    def to_event_map(node: dict) -> EventMap:
        if "split" in node:
            key, q = node["split"]
            return SplitEventMap(key, q, to_event_map(node["yes"]), to_event_map(node["no"]))
        pdf = counter[0]
        counter[0] += 1
        return ConstantEventMap(pdf)

    table: Dict[int, EventMap] = {}
    for phone in sorted(roots):
        table[phone] = to_event_map(root_nodes[phone])
    # phones never seen: give them a fresh pdf per pdf-class so decoding
    # graphs can still be built (reference would abort; we degrade gracefully)
    for phone in sorted(missing):
        sub = {}
        for pc in range(num_pdf_classes[phone]):
            sub[pc] = ConstantEventMap(counter[0])
            counter[0] += 1
        table[phone] = TableEventMap(KEY_PDF_CLASS, sub)
    log.info("build_tree: %d leaves (max %d)", counter[0], max_leaves)
    return ContextDependency(N, P, TableEventMap(P, table))


# ---------------------------------------------------------------------------
# tree-stats files (reference bin/acc-tree-stats writes BuildTreeStatsType;
# bin/sum-tree-stats adds; bin/build-tree consumes).
# ---------------------------------------------------------------------------


def write_tree_stats(f, stats: Dict[tuple, GaussClusterable]) -> None:
    from old_kaldi_git_tpu.utils import io_funcs as iof

    iof.init_kaldi_output_stream(f, True)
    iof.write_token(f, "<TreeStats>")
    iof.write_int32(f, len(stats))
    for event, gc in sorted(stats.items()):
        iof.write_int32(f, len(event))
        for k, v in event:
            iof.write_int32(f, int(k))
            iof.write_int32(f, int(v))
        iof.write_double(f, gc.count)
        iof.write_vector(f, gc.x, dtype=np.float64)
        iof.write_vector(f, gc.x2, dtype=np.float64)
    iof.write_token(f, "</TreeStats>")


def read_tree_stats(f) -> Dict[tuple, GaussClusterable]:
    from old_kaldi_git_tpu.utils import io_funcs as iof

    if not iof.init_kaldi_input_stream(f):
        raise KaldiError("tree-stats file must be binary")
    iof.expect_token(f, "<TreeStats>")
    n = iof.read_int32(f)
    stats: Dict[tuple, GaussClusterable] = {}
    for _ in range(n):
        ne = iof.read_int32(f)
        event = tuple(
            (iof.read_int32(f), iof.read_int32(f)) for _ in range(ne)
        )
        gc = GaussClusterable()
        gc.count = iof.read_float(f)
        gc.x = np.asarray(iof.read_vector(f), np.float64)
        gc.x2 = np.asarray(iof.read_vector(f), np.float64)
        stats[event] = gc
    iof.expect_token(f, "</TreeStats>")
    return stats


def sum_tree_stats(
    dsts: Dict[tuple, GaussClusterable], src: Dict[tuple, GaussClusterable]
) -> Dict[tuple, GaussClusterable]:
    for event, gc in src.items():
        if event in dsts:
            dsts[event].add(gc)
        else:
            dsts[event] = gc.copy()
    return dsts


def cluster_leaves(
    stats: Dict[tuple, GaussClusterable],
    ctx_dep,
    num_clusters: int,
) -> List[int]:
    """Agglomerative bottom-up clustering of a tree's leaves into
    `num_clusters` groups by likelihood loss (reference
    bin/build-tree-two-level.cc / cluster-utils ClusterBottomUp): returns
    the leaf → cluster mapping, clusters renumbered 0..K-1 in order of
    smallest member leaf."""
    num_pdfs = ctx_dep.num_pdfs
    pooled: List[Optional[GaussClusterable]] = [None] * num_pdfs
    for event, st in stats.items():
        leaf = ctx_dep.root.map(event)
        if leaf is None:
            continue
        if pooled[leaf] is None:
            pooled[leaf] = st.copy()
        else:
            pooled[leaf].add(st)
    # leaves with no stats merge into cluster of leaf 0 at zero cost
    live = {i: pooled[i] for i in range(num_pdfs) if pooled[i] is not None}
    members: Dict[int, List[int]] = {i: [i] for i in live}
    while len(live) > max(1, num_clusters):
        keys = sorted(live)
        best = None
        for ai, a in enumerate(keys):
            for b in keys[ai + 1:]:
                loss = (live[a].objf() + live[b].objf()
                        - merged_objf(live[a], live[b]))
                if best is None or loss < best[0]:
                    best = (loss, a, b)
        _, a, b = best
        live[a].add(live.pop(b))
        members[a].extend(members.pop(b))
    mapping = [0] * num_pdfs
    for cluster, (root_leaf, leaves) in enumerate(sorted(members.items())):
        for leaf in leaves:
            mapping[leaf] = cluster
    return mapping
