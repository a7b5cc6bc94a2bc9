"""Context-dependency composition (C) and the subsequential loop.

Parity with reference src/fstext/context-fst.h (ComposeContext,
AddSubsequentialLoop): expands an LG phone-level FST into CLG whose input
labels are context windows of N phones (ilabel-info entries), with output
delayed by N-P-1 phones and flushed at utterance end via the subsequential
symbol '$'.  Disambiguation symbols pass through as their own entries
(encoded [-k] in ilabel_info, as in the reference).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from old_kaldi_git_tpu.fst.vector_fst import EPS, INF, Arc, VectorFst
from old_kaldi_git_tpu.utils.log import KaldiError


def add_subsequential_loop(fst: VectorFst, subseq_symbol: int) -> VectorFst:
    """Append '$' symbols after complete strings (reference
    AddSubsequentialLoop): new superfinal state with a '$' self-loop; every
    final state gets a ($:eps) arc into it carrying its final weight."""
    out = fst.copy()
    superfinal = out.add_state()
    out.add_arc(superfinal, Arc(subseq_symbol, EPS, 0.0, superfinal))
    out.set_final(superfinal, 0.0)
    for s in range(out.num_states - 1):
        if out.finals[s] != INF:
            out.add_arc(s, Arc(subseq_symbol, EPS, out.finals[s], superfinal))
            out.finals[s] = INF
    return out


def compose_context(
    lg: VectorFst,
    N: int,
    P: int,
    disambig_ids: Sequence[int],
    subseq_symbol: int,
) -> Tuple[VectorFst, List[List[int]]]:
    """Build CLG = C ∘ LG' where LG' = AddSubsequentialLoop(LG) when N > 1.

    Input labels of `lg` are phone ids (plus disambig ids); returns
    (CLG, ilabel_info) where ilabel_info[i] is the context window (list of N
    phone ids, 0 = out-of-utterance) for CLG ilabel i, [] for eps, and [-k]
    for disambiguation symbol #k.
    """
    disambig = set(disambig_ids)
    ilabel_info: List[List[int]] = [[]]
    window_index: Dict[Tuple[int, ...], int] = {}
    disambig_index: Dict[int, int] = {}

    def window_label(window: Tuple[int, ...]) -> int:
        if window not in window_index:
            ilabel_info.append(list(window))
            window_index[window] = len(ilabel_info) - 1
        return window_index[window]

    def disambig_label(phone_id: int, k: int) -> int:
        if phone_id not in disambig_index:
            ilabel_info.append([-k])
            disambig_index[phone_id] = len(ilabel_info) - 1
        return disambig_index[phone_id]

    # map disambig phone-id → its #k index: caller encodes via position in
    # disambig_ids (we just need a stable negative id; use ordinal)
    disambig_ord = {pid: k for k, pid in enumerate(sorted(disambig))}

    if N == 1:
        # trivial relabel: each phone becomes its own window
        out = lg.copy()
        for s in out.states():
            for a in out.arcs[s]:
                if a.ilabel == EPS:
                    continue
                if a.ilabel in disambig:
                    a.ilabel = disambig_label(a.ilabel, disambig_ord[a.ilabel])
                else:
                    a.ilabel = window_label((a.ilabel,))
        return out, ilabel_info

    delay = N - P - 1
    if delay < 0:
        raise KaldiError(f"bad context spec N={N} P={P}")
    src = add_subsequential_loop(lg, subseq_symbol) if delay > 0 else lg

    out = VectorFst()
    # state: (hist, lg_state); hist = last N-1 phones (0-padded), plus a
    # counter of how many real phones seen (to suppress start-padding output)
    start_hist = (0,) * (N - 1)
    start_key = (start_hist, src.start)
    ids: Dict[Tuple[Tuple[int, ...], int], int] = {start_key: out.add_state()}
    out.set_start(0)
    stack = [start_key]
    while stack:
        key = stack.pop()
        hist, q = key
        s_out = ids[key]
        if src.finals[q] != INF:
            out.set_final(s_out, src.finals[q])

        for a in src.arcs[q]:

            def emit(new_hist, ilabel, weight, nextstate, olabel):
                nkey = (new_hist, nextstate)
                if nkey not in ids:
                    ids[nkey] = out.add_state()
                    stack.append(nkey)
                out.add_arc(s_out, Arc(ilabel, olabel, weight, ids[nkey]))

            if a.ilabel == EPS:
                emit(hist, EPS, a.weight, a.nextstate, a.olabel)
            elif a.ilabel in disambig:
                emit(
                    hist,
                    disambig_label(a.ilabel, disambig_ord[a.ilabel]),
                    a.weight,
                    a.nextstate,
                    a.olabel,
                )
            else:
                phone = 0 if a.ilabel == subseq_symbol else a.ilabel
                full = hist + (phone,)
                center = full[P]
                new_hist = full[1:]
                if center == 0:
                    # start padding (or flushing an already-empty center):
                    # no window to emit
                    emit(new_hist, EPS, a.weight, a.nextstate, a.olabel)
                else:
                    emit(
                        new_hist,
                        window_label(full),
                        a.weight,
                        a.nextstate,
                        a.olabel,
                    )
    out.connect()
    return out, ilabel_info
