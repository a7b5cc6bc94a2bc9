"""Un-smoothed phone n-gram LM for the chain denominator.

Parity with reference src/chain/language-model.cc (LanguageModelEstimator):
an n-gram (default bigram here, reference default 4-gram with state pruning)
over training phone sequences, no discounting except backoff arcs for unseen
continuations; built directly as an FST over phones with explicit
begin/end-of-sentence handling.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from old_kaldi_git_tpu.fst.vector_fst import EPS, Arc, VectorFst
from old_kaldi_git_tpu.utils.log import get_logger

import math

log = get_logger("phone-lm")


def estimate_phone_lm(
    phone_seqs: Sequence[Sequence[int]], ngram_order: int = 2
) -> VectorFst:
    """Phone sequences → acceptor over phones (tropical weights = -log p).

    States are histories of length order-1 (with backoff to shorter
    histories via epsilon arcs when a continuation is unseen).
    """
    assert ngram_order >= 1
    # count n-grams for orders 1..order, with <s>(=-1)/</s>(=-2) markers
    counts: List[Dict[Tuple[int, ...], Dict[int, int]]] = [
        {} for _ in range(ngram_order)
    ]
    for seq in phone_seqs:
        seq = list(seq)
        padded = [-1] * (ngram_order - 1) + seq + [-2]
        for i in range(ngram_order - 1, len(padded)):
            target = padded[i]
            for order in range(1, ngram_order + 1):
                hist = tuple(padded[i - order + 1 : i])
                d = counts[order - 1].setdefault(hist, {})
                d[target] = d.get(target, 0) + 1

    fst = VectorFst()
    state_of: Dict[Tuple[int, ...], int] = {}

    def get_state(hist: Tuple[int, ...]) -> int:
        # back off to the longest suffix that has continuations
        while hist not in counts[len(hist)] and len(hist) > 0:
            hist = hist[1:]
        if hist not in state_of:
            state_of[hist] = fst.add_state()
        return state_of[hist]

    start_hist = (-1,) * (ngram_order - 1)
    start = get_state(start_hist)
    fst.set_start(start)

    # un-smoothed: every continuation seen in training is a direct arc from
    # its (possibly backed-off) history state
    top = counts[ngram_order - 1]
    for hist, targets in top.items():
        src = get_state(hist)
        total = sum(targets.values())
        for phone, c in sorted(targets.items()):
            w = -math.log(c / total)
            if phone == -2:
                fst.set_final(src, min(w, fst.finals[src]) if fst.is_final(src) else w)
            else:
                next_hist = (hist + (phone,))[-(ngram_order - 1):] if ngram_order > 1 else ()
                dst = get_state(next_hist)
                fst.add_arc(src, Arc(phone, phone, w, dst))
    fst.connect()
    # expose state → history for context-dependent den graphs: for order ≥ 2
    # every arc into a state carries the history's last phone, so the state
    # identifies the left context exactly (connect() remaps state ids via
    # fst.last_connect_map when present, else ids are unchanged)
    remap = getattr(fst, "last_connect_map", None)
    state_hist = {}
    for hist, s in state_of.items():
        ns = remap.get(s) if remap is not None else s
        if ns is not None:
            state_hist[ns] = hist
    fst.state_hist = state_hist
    log.info(
        "phone LM: order %d, %d states, %d arcs",
        ngram_order, fst.num_states, fst.num_arcs,
    )
    return fst
