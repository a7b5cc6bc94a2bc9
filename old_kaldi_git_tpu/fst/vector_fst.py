"""Mutable weighted FST over the tropical semiring.

Parity with reference OpenFst VectorFst<StdArc> as used by src/fstext: the
graph-construction workhorse.  Weights are floats (tropical: plus=min,
times=+, zero=inf, one=0).  Labels are ints with 0 = epsilon.

Kept deliberately simple: struct-of-lists storage, no arc iterators — Python
list traversal is the bottleneck-free path for graphs up to a few million
arcs; bigger LM builds move to the C++ mirror (cpp/wfst).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Iterable, List, Optional, Tuple

INF = math.inf
NO_STATE = -1
EPS = 0


@dataclasses.dataclass
class Arc:
    ilabel: int
    olabel: int
    weight: float
    nextstate: int

    def copy(self) -> "Arc":
        return Arc(self.ilabel, self.olabel, self.weight, self.nextstate)


class VectorFst:
    def __init__(self):
        self.arcs: List[List[Arc]] = []
        self.finals: List[float] = []  # INF = not final
        self.start: int = NO_STATE

    # -- construction -------------------------------------------------------
    def add_state(self) -> int:
        self.arcs.append([])
        self.finals.append(INF)
        return len(self.arcs) - 1

    def add_arc(self, state: int, arc: Arc) -> None:
        self.arcs[state].append(arc)

    def set_start(self, s: int) -> None:
        self.start = s

    def set_final(self, s: int, weight: float = 0.0) -> None:
        self.finals[s] = weight

    def final(self, s: int) -> float:
        return self.finals[s]

    def is_final(self, s: int) -> bool:
        return self.finals[s] != INF

    # -- properties ----------------------------------------------------------
    @property
    def num_states(self) -> int:
        return len(self.arcs)

    @property
    def num_arcs(self) -> int:
        return sum(len(a) for a in self.arcs)

    def states(self) -> Iterable[int]:
        return range(len(self.arcs))

    # -- simple transforms ----------------------------------------------------
    def arcsort(self, sort_type: str = "ilabel") -> None:
        key = (lambda a: (a.ilabel, a.olabel)) if sort_type == "ilabel" else (
            lambda a: (a.olabel, a.ilabel)
        )
        for lst in self.arcs:
            lst.sort(key=key)

    def copy(self) -> "VectorFst":
        out = VectorFst()
        out.start = self.start
        out.finals = list(self.finals)
        out.arcs = [[a.copy() for a in lst] for lst in self.arcs]
        return out

    def reverse_arcs(self) -> List[List[Tuple[int, Arc]]]:
        """For each state, list of (src, arc) entering it."""
        rev: List[List[Tuple[int, Arc]]] = [[] for _ in self.states()]
        for s in self.states():
            for a in self.arcs[s]:
                rev[a.nextstate].append((s, a))
        return rev

    def connect(self) -> None:
        """Trim states not both accessible and coaccessible (OpenFst Connect)."""
        if self.start == NO_STATE:
            self.arcs, self.finals = [], []
            return
        n = self.num_states
        # forward reachability
        acc = [False] * n
        stack = [self.start]
        acc[self.start] = True
        while stack:
            s = stack.pop()
            for a in self.arcs[s]:
                if not acc[a.nextstate]:
                    acc[a.nextstate] = True
                    stack.append(a.nextstate)
        # backward reachability from finals
        rev = self.reverse_arcs()
        coacc = [False] * n
        stack = [s for s in self.states() if self.is_final(s)]
        for s in stack:
            coacc[s] = True
        while stack:
            s = stack.pop()
            for src, _ in rev[s]:
                if not coacc[src]:
                    coacc[src] = True
                    stack.append(src)
        keep = [s for s in self.states() if acc[s] and coacc[s]]
        remap = {old: new for new, old in enumerate(keep)}
        new_arcs: List[List[Arc]] = []
        new_finals: List[float] = []
        for old in keep:
            lst = [
                Arc(a.ilabel, a.olabel, a.weight, remap[a.nextstate])
                for a in self.arcs[old]
                if a.nextstate in remap
            ]
            new_arcs.append(lst)
            new_finals.append(self.finals[old])
        self.arcs = new_arcs
        self.finals = new_finals
        self.start = remap.get(self.start, NO_STATE)
        # old→new state ids for callers tracking per-state metadata
        self.last_connect_map = remap

    def topsort(self) -> bool:
        """Topologically order states (False if cyclic).  Ignores arc labels."""
        n = self.num_states
        WHITE, GRAY, BLACK = 0, 1, 2
        color = [WHITE] * n
        order: List[int] = []
        for root in ([self.start] if self.start != NO_STATE else []) + list(
            self.states()
        ):
            if color[root] != WHITE:
                continue
            stack: List[Tuple[int, int]] = [(root, 0)]
            color[root] = GRAY
            while stack:
                s, i = stack[-1]
                if i < len(self.arcs[s]):
                    stack[-1] = (s, i + 1)
                    ns = self.arcs[s][i].nextstate
                    if color[ns] == GRAY:
                        return False
                    if color[ns] == WHITE:
                        color[ns] = GRAY
                        stack.append((ns, 0))
                else:
                    color[s] = BLACK
                    order.append(s)
                    stack.pop()
        order.reverse()
        remap = {old: new for new, old in enumerate(order)}
        new_arcs: List[List[Arc]] = [None] * n  # type: ignore[list-item]
        new_finals: List[float] = [INF] * n
        for old in self.states():
            new_arcs[remap[old]] = [
                Arc(a.ilabel, a.olabel, a.weight, remap[a.nextstate])
                for a in self.arcs[old]
            ]
            new_finals[remap[old]] = self.finals[old]
        self.arcs = new_arcs
        self.finals = new_finals
        if self.start != NO_STATE:
            self.start = remap[self.start]
        return True

    # -- I/O (FST text format, OpenFst-compatible) ----------------------------
    def to_text(self) -> str:
        lines = []
        if self.start == NO_STATE:
            return ""
        order = [self.start] + [s for s in self.states() if s != self.start]
        for s in order:
            for a in self.arcs[s]:
                w = f"\t{a.weight:g}" if a.weight != 0.0 else ""
                lines.append(f"{s}\t{a.nextstate}\t{a.ilabel}\t{a.olabel}{w}")
            if self.is_final(s):
                w = f"\t{self.finals[s]:g}" if self.finals[s] != 0.0 else ""
                lines.append(f"{s}{w}")
        return "\n".join(lines) + "\n"

    @staticmethod
    def from_text(text: str) -> "VectorFst":
        fst = VectorFst()
        ids: Dict[int, int] = {}

        def state(x: int) -> int:
            if x not in ids:
                ids[x] = fst.add_state()
            return ids[x]

        for ln in text.splitlines():
            parts = ln.split()
            if not parts:
                continue
            if len(parts) in (1, 2):
                s = state(int(parts[0]))
                fst.set_final(s, float(parts[1]) if len(parts) == 2 else 0.0)
            else:
                s = state(int(parts[0]))
                ns = state(int(parts[1]))
                w = float(parts[4]) if len(parts) >= 5 else 0.0
                fst.add_arc(s, Arc(int(parts[2]), int(parts[3]), w, ns))
            if fst.start == NO_STATE:
                fst.start = state(int(parts[0]))
        return fst

    # -- binary I/O (framework-native; reference ReadFstKaldi reads OpenFst
    #    binary — we standardize on our own compact format + text compat) ----
    def write(self, f) -> None:
        import struct

        import numpy as np

        f.write(b"OKTFST01")
        f.write(struct.pack("<iqi", self.start, self.num_states, self.num_arcs))
        finals = np.asarray(self.finals, dtype="<f4")
        f.write(finals.tobytes())
        counts = np.asarray([len(a) for a in self.arcs], dtype="<i4")
        f.write(counts.tobytes())
        if self.num_arcs:
            flat = np.asarray(
                [
                    (a.ilabel, a.olabel, a.weight, a.nextstate)
                    for lst in self.arcs
                    for a in lst
                ],
                dtype="<f4",
            )
            ints = np.asarray(
                [
                    (a.ilabel, a.olabel, a.nextstate)
                    for lst in self.arcs
                    for a in lst
                ],
                dtype="<i4",
            )
            f.write(ints[:, 0].tobytes())
            f.write(ints[:, 1].tobytes())
            f.write(flat[:, 2].tobytes())
            f.write(ints[:, 2].tobytes())

    @staticmethod
    def read(f) -> "VectorFst":
        import struct

        import numpy as np

        magic = f.read(8)
        if magic != b"OKTFST01":
            raise ValueError(f"bad FST magic {magic!r}")
        start, num_states, num_arcs = struct.unpack("<iqi", f.read(16))
        finals = np.frombuffer(f.read(4 * num_states), dtype="<f4")
        counts = np.frombuffer(f.read(4 * num_states), dtype="<i4")
        il = np.frombuffer(f.read(4 * num_arcs), dtype="<i4")
        ol = np.frombuffer(f.read(4 * num_arcs), dtype="<i4")
        w = np.frombuffer(f.read(4 * num_arcs), dtype="<f4")
        ns = np.frombuffer(f.read(4 * num_arcs), dtype="<i4")
        fst = VectorFst()
        fst.start = start
        fst.finals = [float(x) if np.isfinite(x) else INF for x in finals]
        # stored INF as f4 inf, fine
        idx = 0
        for s in range(num_states):
            lst = []
            for _ in range(int(counts[s])):
                lst.append(Arc(int(il[idx]), int(ol[idx]), float(w[idx]), int(ns[idx])))
                idx += 1
            fst.arcs.append(lst)
        return fst


def linear_fst(labels: List[int], olabels: Optional[List[int]] = None) -> VectorFst:
    """Linear acceptor/transducer through `labels` (MakeLinearAcceptor)."""
    olabels = olabels if olabels is not None else labels
    fst = VectorFst()
    cur = fst.add_state()
    fst.set_start(cur)
    for il, ol in zip(labels, olabels):
        nxt = fst.add_state()
        fst.add_arc(cur, Arc(il, ol, 0.0, nxt))
        cur = nxt
    fst.set_final(cur, 0.0)
    return fst
