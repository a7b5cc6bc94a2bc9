"""Semi-supervised LF-MMI: lattice supervision for unlabeled audio.

Reference parity: the fork's semi-supervised chain pipeline (Vimal Manohar
et al., "Semi-supervised training of acoustic models using lattice-free
MMI", ICASSP 2018; src/chain/chain-supervision-splitter.{h,cc}
SupervisionLatticeSplitter + steps/nnet3/chain/train_semisup.py style
recipes): the numerator of an unlabeled utterance is not a transcript
training graph but the *decode lattice* produced by a seed model — every
path the seed considered plausible, weighted by its LM score — so the MMI
objective pulls probability mass toward the lattice and away from the rest
of the denominator graph.

TPU formulation: a raw decode lattice is already frame-synchronous (every
arc consumes one subsampled frame), so it IS a generic numerator FST in the
sense of chain/e2e.py — no tolerance windows or splitting machinery needed.
We form the product of the lattice with the denominator's normalization
weights (exactly as normalize_numerator_csr does for training graphs),
fold in the lattice's own graph (LM) scores scaled by --lattice-lm-scale,
and hand the result to the same batched scatter-logsumexp numerator scan.
num ≤ den stays an identity: lattice paths are a subset of den paths and
the extra lattice LM costs only lower the numerator.

Per-sequence supervision weights (the recipe's --unsup-egs-weight) scale
each utterance's contribution to the objective and gradient.
"""

from __future__ import annotations

from collections import deque
from typing import List, Optional, Tuple

import numpy as np

from old_kaldi_git_tpu.chain.den_graph import DenominatorGraph
from old_kaldi_git_tpu.chain.e2e import NEG_INF, SimpleNumGraph
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger

log = get_logger("chain_semisup")


def lattice_to_numerator(
    lat,
    tm,
    den: DenominatorGraph,
    lattice_lm_scale: float = 1.0,
    acoustic_scale: float = 0.0,
) -> SimpleNumGraph:
    """Decode lattice (tid-level, frame-synchronous) → normalized numerator.

    States are (lattice-state, den-state) product pairs; arc weights are the
    den-graph normalization weight (self-loop stay / LM advance — identical
    pricing to chain/e2e.py normalize_numerator_csr) plus the lattice's own
    scores: ``-lattice_lm_scale * graph_cost - acoustic_scale *
    acoustic_cost``.  The reference's semisup recipe keeps lattice LM scores
    (lattice-lm-scale) and drops acoustic ones (they would double-count the
    model being trained), hence acoustic_scale defaults to 0.
    """
    loop_lp = float(den.loop_log_prob)
    states: dict = {}

    def sid(ls: int, ds: int) -> int:
        key = (ls, ds)
        if key not in states:
            states[key] = len(states)
        return states[key]

    def eps_closure(ls: int) -> List[Tuple[int, float, float]]:
        """(state, graph_cost, acoustic_cost) reachable from ls by epsilon-
        input arcs, including (ls, 0, 0).  lattice_from_decode's _emit
        creates such arcs whenever a decode-graph arc carries a multi-word
        olabel chain (eps-closure word forwarding); they consume no frame,
        so their costs fold into the closure instead of becoming numerator
        arcs.  Keeps the min-cost copy per state (the chains are linear in
        practice; the guard also terminates on general eps cycles)."""
        best = {ls: (0.0, 0.0)}
        stack = [(ls, 0.0, 0.0)]
        while stack:
            s, g, a = stack.pop()
            for arc in lat.arcs[s]:
                if int(arc.ilabel) != 0:
                    continue
                ns = int(arc.nextstate)
                g2 = g + float(arc.graph_cost)
                a2 = a + float(arc.acoustic_cost)
                old = best.get(ns)
                if old is None or g2 + a2 < old[0] + old[1]:
                    best[ns] = (g2, a2)
                    stack.append((ns, g2, a2))
        return [(s, g, a) for s, (g, a) in best.items()]

    start_key = (int(lat.start), -1)
    start = sid(*start_key)
    arcs: List[Tuple[int, int, int, float]] = []
    finals: dict = {}
    seen = {start_key}
    q = deque([start_key])
    while q:
        ls, ds = q.popleft()
        me = sid(ls, ds)
        closure = eps_closure(ls)
        for ls2, eg, ea in closure:
            fg, fa = lat.finals[ls2]
            if np.isfinite(fg) and ds >= 0:
                cand = (
                    float(den.final_log_probs[ds])
                    - lattice_lm_scale * (fg + eg)
                    - acoustic_scale * (fa + ea)
                )
                if me not in finals or cand > finals[me]:
                    finals[me] = cand
        for ls2, eg, ea in closure:
            for arc in lat.arcs[ls2]:
                tid = int(arc.ilabel)
                if tid == 0:
                    continue  # folded into the closure costs
                pdf = int(tm.tid_to_pdf(tid))
                if tm.is_self_loop(tid) and ds >= 0:
                    w, nds = loop_lp, ds
                else:
                    phone = tm.tid_to_phone(tid)
                    lm = den.lm_start if ds < 0 else int(den.lm_next[ds])
                    ds2 = den.arc_lookup.get((lm, phone))
                    if ds2 is None:
                        nds = ds if ds >= 0 else 0
                        w = (loop_lp - 20.0) if ds >= 0 else -20.0
                    elif ds < 0:
                        nds, w = ds2, float(den.initial_log_probs[ds2])
                    else:
                        nds = ds2
                        w = loop_lp + float(den.advance_lm_log_prob[ds2])
                w -= lattice_lm_scale * (arc.graph_cost + eg)
                w -= acoustic_scale * (arc.acoustic_cost + ea)
                to = sid(int(arc.nextstate), nds)
                arcs.append((me, to, pdf, w))
                if (int(arc.nextstate), nds) not in seen:
                    seen.add((int(arc.nextstate), nds))
                    q.append((int(arc.nextstate), nds))
    if not arcs:
        raise KaldiError("empty lattice numerator")
    S = len(states)
    final_lp = np.full(S, NEG_INF, np.float32)
    for s, w in finals.items():
        final_lp[s] = w
    src, dst, pdf, w = (np.asarray(x) for x in zip(*arcs))
    return SimpleNumGraph(
        start,
        src.astype(np.int32),
        dst.astype(np.int32),
        pdf.astype(np.int32),
        w.astype(np.float32),
        final_lp,
        S,
    )
