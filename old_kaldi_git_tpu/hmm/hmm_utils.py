"""H-transducer construction, self-loops, alignment utilities.

Parity with reference src/hmm/hmm-utils.h: GetHTransducer (Ha: no self-loops,
with disambig pass-through), AddSelfLoops (reorder semantics: loop applied at
the arc destination, states split so incoming arcs share one transition-state
class), SplitToPhones, ConvertAlignment, alignment→pdf/phone maps.

Probability convention (documented; matches the reference's scaling scheme):
  * H arcs carry weight = transition_scale * -log(p / (1 - p_self)) — the
    forward probability renormalized without the self-loop;
  * AddSelfLoops adds self_loop_scale * -log(p_self) on the loop arc and
    self_loop_scale * -log(1 - p_self) on every non-self-loop transition of
    that transition-state, so at scales (1, 1) path weights equal the true
    -log transition probabilities.
"""

from __future__ import annotations

import math

import numpy as np
from typing import Dict, List, Optional, Sequence, Tuple

from old_kaldi_git_tpu.fst.vector_fst import EPS, INF, Arc, VectorFst
from old_kaldi_git_tpu.hmm.topology import NO_PDF
from old_kaldi_git_tpu.hmm.transition_model import TransitionModel
from old_kaldi_git_tpu.tree.context_dep import ContextDependency
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger

log = get_logger("hmm")


def phone_window_to_fst(
    window: Sequence[int],
    ctx_dep: ContextDependency,
    tm: TransitionModel,
    transition_scale: float = 1.0,
) -> VectorFst:
    """HMM piece for one context window: input labels = transition-ids of the
    non-self-loop transitions, output = eps, start = topo state 0, final =
    topo final state (reference GetHmmAsFst)."""
    phone = window[ctx_dep.P]
    entry = tm.topo.topology_for_phone(phone)
    fst = VectorFst()
    states = [fst.add_state() for _ in entry]
    fst.set_start(states[0])
    fst.set_final(states[-1], 0.0)
    for j, st in enumerate(entry):
        if st.pdf_class == NO_PDF:
            continue
        pdf = ctx_dep.compute(window, st.pdf_class)
        ts = tm.tuple_to_tstate(phone, j, pdf)
        p_self = tm.self_loop_prob(ts)
        for ti, (ns, _prob) in enumerate(st.transitions):
            if ns == j:
                continue  # self-loops added later
            tid = tm.pair_to_tid(ts, ti)
            p = math.exp(tm.log_probs[tid])
            q = p / max(1.0 - p_self, 1e-20)
            weight = -transition_scale * math.log(max(q, 1e-20))
            fst.add_arc(states[j], Arc(tid, EPS, weight, states[ns]))
    return fst


def make_h_transducer(
    ilabel_info: List[List[int]],
    ctx_dep: ContextDependency,
    tm: TransitionModel,
    transition_scale: float = 1.0,
    disambig_offset: Optional[Dict[int, int]] = None,
) -> Tuple[VectorFst, List[int]]:
    """Build Ha (reference GetHTransducer): one loop state; for each CLG
    ilabel i, either an HMM piece (context window) or a pass-through arc
    (disambig, encoded in ilabel_info as a single negative id).

    Returns (Ha, disambig_tids): the input labels used for disambig symbols
    (they live above num_tids and must be removed before decoding).
    """
    fst = VectorFst()
    loop = fst.add_state()
    fst.set_start(loop)
    fst.set_final(loop, 0.0)
    next_disambig = tm.num_tids + 1
    disambig_tids: List[int] = []
    for i, info in enumerate(ilabel_info):
        if i == 0 or not info:
            continue  # epsilon
        if len(info) == 1 and info[0] <= 0:
            # disambiguation symbol (negative id), or the #-1 begin-of-
            # sequence symbol stored as [0] (context composition emits it
            # for epsilon arcs in LG, e.g. LM backoff — reference
            # GetHTransducer's `size()==1 && [0] <= 0` case): pass through
            # with a fresh input id
            fst.add_arc(loop, Arc(next_disambig, i, 0.0, loop))
            disambig_tids.append(next_disambig)
            next_disambig += 1
            continue
        piece = phone_window_to_fst(info, ctx_dep, tm, transition_scale)
        # splice piece between loop → ... → loop, olabel=i on the entry arcs
        offset = fst.num_states
        for s in piece.states():
            fst.add_state()
        for s in piece.states():
            for a in piece.arcs[s]:
                fst.add_arc(offset + s, Arc(a.ilabel, a.olabel, a.weight, offset + a.nextstate))
        fst.add_arc(loop, Arc(EPS, i, 0.0, offset + piece.start))
        for s in piece.states():
            if piece.finals[s] != INF:
                fst.add_arc(offset + s, Arc(EPS, EPS, piece.finals[s], loop))
    return fst, disambig_tids


def add_self_loops(
    fst: VectorFst,
    tm: TransitionModel,
    self_loop_scale: float = 0.1,
    disambig_tids: Sequence[int] = (),
) -> VectorFst:
    """Reference AddSelfLoops with reorder=true: apply the (1-p_self)
    correction on every non-self-loop tid arc, split states so all incoming
    arcs share one transition-state class, then add loop arcs at states whose
    incoming class has a self-loop."""
    disambig = set(disambig_tids)
    out = fst.copy()

    def arc_class(a: Arc) -> int:
        if a.ilabel == EPS or a.ilabel in disambig:
            return 0
        return tm.tid_to_tstate(a.ilabel) + 1

    # 1. weight correction on non-self-loop tid arcs
    for s in out.states():
        for a in out.arcs[s]:
            if a.ilabel != EPS and a.ilabel not in disambig:
                ts = tm.tid_to_tstate(a.ilabel)
                p_self = tm.self_loop_prob(ts)
                if p_self > 0.0:
                    a.weight += -self_loop_scale * math.log(max(1.0 - p_self, 1e-20))

    # 2. split states with mixed incoming classes
    incoming_classes: List[set] = [set() for _ in out.states()]
    for s in out.states():
        for a in out.arcs[s]:
            incoming_classes[a.nextstate].add(arc_class(a))
    copies: Dict[Tuple[int, int], int] = {}
    num_orig = out.num_states
    for s in range(num_orig):
        classes = sorted(incoming_classes[s])
        if len(classes) <= 1:
            copies[(s, classes[0] if classes else 0)] = s
            continue
        # keep original for the first class, fresh copies for the rest
        copies[(s, classes[0])] = s
        for c in classes[1:]:
            ns = out.add_state()
            copies[(s, c)] = ns
            out.arcs[ns] = [a.copy() for a in out.arcs[s]]
            out.finals[ns] = out.finals[s]
    for s in range(out.num_states):
        for a in out.arcs[s]:
            key = (a.nextstate, arc_class(a))
            if key in copies:
                a.nextstate = copies[key]

    # 3. add self-loop arcs keyed by incoming class
    state_class: Dict[int, int] = {}
    for (orig, c), st in copies.items():
        state_class[st] = c
    for s in out.states():
        c = state_class.get(s, 0)
        if c == 0:
            continue
        ts = c - 1
        loop_tid = tm.self_loop_tid(ts)
        if loop_tid:
            p_self = tm.self_loop_prob(ts)
            w = -self_loop_scale * math.log(max(p_self, 1e-20))
            out.add_arc(s, Arc(loop_tid, EPS, w, s))
    return out


# ---------------------------------------------------------------------------
# alignment utilities
# ---------------------------------------------------------------------------

def split_to_phones(tm: TransitionModel, alignment: Sequence[int]) -> List[List[int]]:
    """Split a tid sequence into per-phone segments (reference SplitToPhones).

    Our graphs use reorder=true self-loops (loop arcs sit at the destination
    of the forward arc), so a phone BEGINS at a tid that leaves hmm-state 0
    and is not a self-loop; the trailing state-0 self-loop frames belong to
    the phone that just started."""
    segments: List[List[int]] = []
    cur: List[int] = []
    for tid in alignment:
        tid = int(tid)
        starts = tm.tid_to_hmm_state(tid) == 0 and not tm.is_self_loop(tid)
        if starts and cur:
            segments.append(cur)
            cur = []
        cur.append(tid)
    if cur:
        segments.append(cur)
    return segments


def alignment_to_phones(tm: TransitionModel, alignment: Sequence[int]) -> List[int]:
    return [tm.tid_to_phone(seg[0]) for seg in split_to_phones(tm, alignment)]


def alignment_to_pdfs(tm: TransitionModel, alignment: Sequence[int]) -> List[int]:
    return tm.tid_to_pdf_array()[
        np.asarray(alignment, np.int64)].tolist()


def convert_alignment(
    alignment: Sequence[int],
    tm_old: TransitionModel,
    tm_new: TransitionModel,
    ctx_dep_new: ContextDependency,
) -> List[int]:
    """Re-map an alignment to a new tree with the same topology (reference
    ConvertAlignment, same-topology fast path used by train_deltas etc.)."""
    segments = split_to_phones(tm_old, alignment)
    phone_seq = [tm_old.tid_to_phone(seg[0]) for seg in segments]
    N, P = ctx_dep_new.N, ctx_dep_new.P
    out: List[int] = []
    for i, seg in enumerate(segments):
        phone = phone_seq[i]
        window = [
            phone_seq[j] if 0 <= j < len(phone_seq) else 0
            for j in range(i - P, i - P + N)
        ]
        for tid in seg:
            hmm_state = tm_old.tid_to_hmm_state(tid)
            tindex = tm_old.tid_to_tindex(tid)
            pdf_class = tm_old.tid_to_pdf_class(tid)
            pdf_new = ctx_dep_new.compute(window, pdf_class)
            ts_new = tm_new.tuple_to_tstate(phone, hmm_state, pdf_new)
            out.append(tm_new.pair_to_tid(ts_new, tindex))
    return out
