"""Denominator graph construction.

Parity with reference src/chain/chain-den-graph.cc (DenominatorGraph):
compose the phone LM with the 1-state chain topology — each phone LM arc
becomes a pdf-emitting arc plus a self-loop on a per-arc state — normalize,
and compute the initial-state distribution by a power-method pass (the
reference runs ~100 iterations of the transition matrix).

Exported as flat arc tensors for the scan-based forward (chain/loss.py):
  from_state [A], to_state [A], pdf [A], log_prob [A] (+ init/final probs).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Sequence

import numpy as np

from old_kaldi_git_tpu.fst.vector_fst import EPS, INF, VectorFst
from old_kaldi_git_tpu.tree.context_dep import ContextDependency
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger

log = get_logger("den-graph")


@dataclasses.dataclass
class DenominatorGraph:
    num_states: int
    from_state: np.ndarray  # [A] int32
    to_state: np.ndarray  # [A] int32
    pdf: np.ndarray  # [A] int32
    log_prob: np.ndarray  # [A] float32
    initial_log_probs: np.ndarray  # [S] float32 (power-method stationary-ish)
    final_log_probs: np.ndarray  # [S] float32 (0 = allowed to end; Kaldi
    #                              treats all states as final in the den)
    num_pdfs: int
    # numerator-normalization support (the reference's normalization.fst):
    # den state per (LM state, phone), LM continuation per den state
    arc_lookup: dict = dataclasses.field(default_factory=dict)
    lm_next: np.ndarray = None  # [S] int32: LM state after this instance
    lm_start: int = 0
    loop_log_prob: float = float(math.log(0.5))
    advance_lm_log_prob: np.ndarray = None  # [S]: LM part of entering state

    def numerator_weights(self, phone_seq) -> tuple:
        """(init_lp, advance_lp [L]) giving each token the SAME weights its
        path carries in the denominator graph (so num ≤ den holds exactly,
        as with the reference normalization FST).  advance_lp[0] = initial
        prob of the first token's den state; advance_lp[l>0] = LM advance
        cost into token l."""
        lm_state = self.lm_start
        advance = np.zeros(len(phone_seq), np.float32)
        for l, phone in enumerate(phone_seq):
            key = (lm_state, int(phone))
            if key not in self.arc_lookup:
                # unseen n-gram (shouldn't happen for training data): floor
                advance[l] = -20.0
                continue
            s = self.arc_lookup[key]
            advance[l] = (
                self.initial_log_probs[s]
                if l == 0
                else self.advance_lm_log_prob[s]
            )
            lm_state = int(self.lm_next[s])
        return advance


def make_denominator_graph(
    phone_lm: VectorFst,
    ctx_dep: ContextDependency,
    num_power_iters: int = 100,
) -> DenominatorGraph:
    """Phone LM ∘ chain topology → den graph arc tensors.

    With the 1-state topology, each phone-LM arc (p: lm_s → lm_d, weight w)
    expands to: an entry arc into a phone-instance state emitting pdf(p),
    a self-loop on that state emitting pdf(p), and (merged) exit = the next
    phone's entry.  We realize this by creating one state per LM arc (the
    "phone instance"), connecting instances along LM paths.
    """
    if ctx_dep.N == 1:
        def window_of(lm_state: int, phone: int):
            return [phone]
    elif ctx_dep.N == 2 and ctx_dep.P == 1:
        # left-biphone trees (the chain recipes' --context-width=2
        # --central-position=1): for an order ≥ 2 un-smoothed phone LM every
        # arc into a state carries the state's history's last phone, so the
        # LM state identifies the left context exactly (reference builds the
        # same information via C∘LM composition in chain-den-graph.cc)
        state_hist = getattr(phone_lm, "state_hist", None)
        if state_hist is None:
            raise KaldiError(
                "biphone den graph needs a phone LM with state histories "
                "(estimate_phone_lm provides them)"
            )

        def window_of(lm_state: int, phone: int):
            hist = state_hist.get(lm_state, ())
            left = hist[-1] if hist and hist[-1] > 0 else 0
            return [left, phone]
    else:
        # full triphone den graphs need right-context lookahead in the
        # composition; the reference's chain recipes use left-biphone
        raise KaldiError(
            "make_denominator_graph supports N=1 and left-biphone N=2/P=1"
        )

    # enumerate LM arcs; state per arc (phone instance)
    lm_arcs = []
    for s in phone_lm.states():
        for a in phone_lm.arcs[s]:
            lm_arcs.append((s, a))
    inst_of = {i: i for i in range(len(lm_arcs))}
    S = len(lm_arcs)
    if S == 0:
        raise KaldiError("empty phone LM")

    # index LM arcs by source state for linking
    by_src: Dict[int, list] = {}
    for i, (s, a) in enumerate(lm_arcs):
        by_src.setdefault(s, []).append(i)

    frm, to, pdfs, lp = [], [], [], []
    # self-loops: stay in the same phone instance (prob 0.5 from topology)
    loop_lp = math.log(0.5)
    for i, (s, a) in enumerate(lm_arcs):
        pdf = ctx_dep.compute(window_of(s, a.ilabel), 0)
        frm.append(i)
        to.append(i)
        pdfs.append(pdf)
        lp.append(loop_lp)
        # advance: to each arc leaving this arc's destination LM state
        for j in by_src.get(a.nextstate, ()):
            s2, a2 = lm_arcs[j]
            pdf2 = ctx_dep.compute(window_of(s2, a2.ilabel), 0)
            frm.append(i)
            to.append(j)
            pdfs.append(pdf2)
            # forward prob 0.5 * LM prob of the next phone
            lp.append(loop_lp - a2.weight)

    # initial distribution: arcs leaving the LM start state
    init = np.full(S, -INF)
    for j in by_src.get(phone_lm.start, ()):
        s2, a2 = lm_arcs[j]
        init[j] = -a2.weight  # LM prob of the first phone

    # final: instances whose LM destination is final
    final = np.full(S, -INF)
    for i, (s, a) in enumerate(lm_arcs):
        if phone_lm.finals[a.nextstate] != INF:
            final[i] = -phone_lm.finals[a.nextstate]

    # power method for the steady-state occupancy (reference: 100 iters),
    # used as the leaky-HMM target distribution and normalization start
    frm_np = np.asarray(frm, np.int64)
    to_np = np.asarray(to, np.int64)
    p_np = np.exp(np.asarray(lp))
    x = np.exp(np.where(np.isfinite(init), init, -1e30))
    x = x / max(x.sum(), 1e-30)
    for _ in range(num_power_iters):
        nx = np.zeros(S)
        np.add.at(nx, to_np, x[frm_np] * p_np)
        tot = nx.sum()
        if tot <= 0:
            break
        x = nx / tot
    x = np.maximum(x, 1e-20)
    initial_log_probs = np.log(x / x.sum()).astype(np.float32)

    log.info(
        "den graph: %d states, %d arcs, %d pdfs",
        S, len(frm), ctx_dep.num_pdfs,
    )
    arc_lookup = {}
    lm_next = np.zeros(S, np.int32)
    advance_lm = np.zeros(S, np.float32)
    for i, (s, a) in enumerate(lm_arcs):
        arc_lookup.setdefault((s, a.ilabel), i)
        lm_next[i] = a.nextstate
        advance_lm[i] = -a.weight
    return DenominatorGraph(
        num_states=S,
        from_state=np.asarray(frm, np.int32),
        to_state=np.asarray(to, np.int32),
        pdf=np.asarray(pdfs, np.int32),
        log_prob=np.asarray(lp, np.float32),
        initial_log_probs=initial_log_probs,
        # chunks may end anywhere: every state is final with prob 1
        # (reference DenominatorGraph does the same for the chunked case)
        final_log_probs=np.zeros(S, np.float32),
        num_pdfs=ctx_dep.num_pdfs,
        arc_lookup=arc_lookup,
        lm_next=lm_next,
        lm_start=phone_lm.start,
        advance_lm_log_prob=advance_lm,
    )
