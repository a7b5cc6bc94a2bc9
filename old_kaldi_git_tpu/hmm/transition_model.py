"""TransitionModel: transition-id bookkeeping and transition probabilities.

Parity with reference src/hmm/transition-model.h: maps
transition-id (tid) ↔ (transition-state, transition-index) ↔
(phone, hmm-state, pdf-id); holds log transition probs; MLE update from
per-tid occupancy stats.  tids are 1-based (0 is reserved/epsilon), as in the
reference — decoder graphs use tid as input labels.

Array-first addition for the TPU plane: `tid_to_pdf_array()` exports the
tid→pdf map as an int32 vector so the batched decoder can gather acoustic
scores on device (SURVEY.md §7.1 array-first decodable contract).
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import numpy as np

from old_kaldi_git_tpu.hmm.topology import NO_PDF, HmmTopology
from old_kaldi_git_tpu.tree.context_dep import ContextDependency
from old_kaldi_git_tpu.utils import io_funcs as iof
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger

log = get_logger("hmm")


class TransitionModel:
    def __init__(self, ctx_dep: ContextDependency, topo: HmmTopology):
        self.topo = topo
        self.ctx_dep_info = (ctx_dep.N, ctx_dep.P)
        # tuples: (phone, hmm_state, pdf)  — one per transition-state
        self.tuples: List[Tuple[int, int, int]] = []
        phones = topo.phones
        num_pdf_classes = {p: topo.num_pdf_classes(p) for p in phones}
        pdf_info = ctx_dep.get_pdf_info(phones, num_pdf_classes)
        # enumerate (phone, hmm_state, pdf): for each pdf, which (phone,
        # pdf_class) reach it; hmm_states with that pdf_class
        for pdf, pairs in enumerate(pdf_info):
            for phone, pdf_class in sorted(pairs):
                for hmm_state, st in enumerate(topo.topology_for_phone(phone)):
                    if st.pdf_class == pdf_class:
                        self.tuples.append((phone, hmm_state, pdf))
        self.tuples.sort()
        self.num_pdfs = ctx_dep.num_pdfs
        self._index: Dict[Tuple[int, int, int], int] = {
            t: i for i, t in enumerate(self.tuples)
        }
        # tid layout: state2id[ts] = first tid of transition-state ts (1-based)
        self.state2id: List[int] = [0] * (len(self.tuples) + 1)
        cur = 1
        for ts, (phone, hmm_state, _pdf) in enumerate(self.tuples):
            self.state2id[ts] = cur
            cur += len(topo.topology_for_phone(phone)[hmm_state].transitions)
        self.state2id[len(self.tuples)] = cur
        self.num_tids = cur - 1
        self._id2state = np.zeros(cur, dtype=np.int32)
        for ts in range(len(self.tuples)):
            self._id2state[self.state2id[ts] : self.state2id[ts + 1]] = ts
        self.init_probs()

    # -- probabilities --------------------------------------------------------
    def init_probs(self) -> None:
        """Initialize log-probs from the topology priors."""
        self.log_probs = np.zeros(self.num_tids + 1, dtype=np.float64)
        for ts, (phone, hmm_state, _pdf) in enumerate(self.tuples):
            trans = self.topo.topology_for_phone(phone)[hmm_state].transitions
            for ti, (_ns, prob) in enumerate(trans):
                self.log_probs[self.state2id[ts] + ti] = math.log(max(prob, 1e-20))

    # -- mappings -------------------------------------------------------------
    def tuple_to_tstate(self, phone: int, hmm_state: int, pdf: int) -> int:
        key = (phone, hmm_state, pdf)
        if key not in self._index:
            raise KaldiError(f"no transition-state for {key}")
        return self._index[key]

    def pair_to_tid(self, tstate: int, tindex: int) -> int:
        return self.state2id[tstate] + tindex

    def tid_to_tstate(self, tid: int) -> int:
        return int(self._id2state[tid])

    def tid_to_tindex(self, tid: int) -> int:
        return tid - self.state2id[self.tid_to_tstate(tid)]

    def tid_to_pdf(self, tid: int) -> int:
        return self.tuples[self.tid_to_tstate(tid)][2]

    def tid_to_phone(self, tid: int) -> int:
        return self.tuples[self.tid_to_tstate(tid)][0]

    def tid_to_hmm_state(self, tid: int) -> int:
        return self.tuples[self.tid_to_tstate(tid)][1]

    def tid_to_pdf_class(self, tid: int) -> int:
        phone, hmm_state, _ = self.tuples[self.tid_to_tstate(tid)]
        return self.topo.topology_for_phone(phone)[hmm_state].pdf_class

    def is_self_loop(self, tid: int) -> bool:
        ts = self.tid_to_tstate(tid)
        phone, hmm_state, _ = self.tuples[ts]
        trans = self.topo.topology_for_phone(phone)[hmm_state].transitions
        ns, _ = trans[tid - self.state2id[ts]]
        return ns == hmm_state

    def is_final(self, tid: int) -> bool:
        """Transition goes to the (non-emitting) final state of the phone."""
        ts = self.tid_to_tstate(tid)
        phone, hmm_state, _ = self.tuples[ts]
        entry = self.topo.topology_for_phone(phone)
        ns, _ = entry[hmm_state].transitions[tid - self.state2id[ts]]
        return ns == len(entry) - 1

    def self_loop_tid(self, tstate: int) -> int:
        """tid of the self-loop of this transition-state, or 0 if none."""
        phone, hmm_state, _ = self.tuples[tstate]
        trans = self.topo.topology_for_phone(phone)[hmm_state].transitions
        for ti, (ns, _p) in enumerate(trans):
            if ns == hmm_state:
                return self.state2id[tstate] + ti
        return 0

    def self_loop_prob(self, tstate: int) -> float:
        tid = self.self_loop_tid(tstate)
        return math.exp(self.log_probs[tid]) if tid else 0.0

    # -- array exports for the TPU decoder ------------------------------------
    def tid_to_pdf_array(self) -> np.ndarray:
        """[num_tids+1] int32; entry 0 is -1 (epsilon).  Cached — callers
        index it per alignment frame."""
        cached = getattr(self, "_tid_to_pdf_arr", None)
        if cached is not None and len(cached) == self.num_tids + 1:
            return cached
        out = np.full(self.num_tids + 1, -1, dtype=np.int32)
        for tid in range(1, self.num_tids + 1):
            out[tid] = self.tid_to_pdf(tid)
        self._tid_to_pdf_arr = out
        return out

    def tid_to_phone_array(self) -> np.ndarray:
        """[num_tids+1] int32; entry 0 is -1 (epsilon)."""
        out = np.full(self.num_tids + 1, -1, dtype=np.int32)
        for tid in range(1, self.num_tids + 1):
            out[tid] = self.tid_to_phone(tid)
        return out

    # -- MLE update (reference MleUpdate) --------------------------------------
    def accumulate(self, alignment: Sequence[int], stats: np.ndarray) -> np.ndarray:
        """Occupancy per tid.  stats: float64 [num_tids+1]."""
        ali = np.asarray(alignment, np.int64)
        if len(ali):
            stats += np.bincount(ali, minlength=len(stats)).astype(
                stats.dtype)
        return stats

    def mle_update(self, stats: np.ndarray, floor: float = 0.01) -> float:
        """Per-transition-state renormalization; returns objf improvement
        proxy (total count)."""
        stats = np.asarray(stats, dtype=np.float64)
        for ts in range(len(self.tuples)):
            lo, hi = self.state2id[ts], self.state2id[ts + 1]
            counts = np.maximum(stats[lo:hi], floor)
            probs = counts / counts.sum()
            self.log_probs[lo:hi] = np.log(probs)
        return float(stats.sum())

    # -- serialization ---------------------------------------------------------
    def write(self, f) -> None:
        """Byte layout of reference TransitionModel::Write (binary):
        <TransitionModel> <Topology>…</Topology> <Triples> n
        (phone hmm-state pdf)×n </Triples> <LogProbs> FV[num_tids+1]
        </LogProbs> </TransitionModel>.  num_pdfs is NOT serialized
        (derived on read, as upstream ComputeDerived does).  The modern
        upstream <Tuples> form (separate forward/self-loop pdf) is accepted
        by read(); this fork's topologies always have one pdf per state, so
        writing uses <Triples> — byte-identical to what modern upstream
        emits for such models (its IsHmm() back-compat branch)."""
        iof.write_token(f, "<TransitionModel>")
        self.topo.write(f)
        iof.write_token(f, "<Triples>")
        iof.write_int32(f, len(self.tuples))
        for phone, hmm_state, pdf in self.tuples:
            iof.write_int32(f, phone)
            iof.write_int32(f, hmm_state)
            iof.write_int32(f, pdf)
        iof.write_token(f, "</Triples>")
        iof.write_token(f, "<LogProbs>")
        iof.write_vector(f, self.log_probs.astype(np.float32))
        iof.write_token(f, "</LogProbs>")
        iof.write_token(f, "</TransitionModel>")

    @staticmethod
    def read(f) -> "TransitionModel":
        iof.expect_token(f, "<TransitionModel>")
        topo = HmmTopology.read(f)
        open_tok = iof.read_token(f)
        if open_tok not in ("<Triples>", "<Tuples>"):
            raise KaldiError(f"TransitionModel.read: got {open_tok!r}")
        four_ints = open_tok == "<Tuples>"
        count = iof.read_int32(f)
        tuples = []
        for _ in range(count):
            phone = iof.read_int32(f)
            hmm_state = iof.read_int32(f)
            pdf = iof.read_int32(f)
            if four_ints:
                self_loop_pdf = iof.read_int32(f)
                if self_loop_pdf != pdf:
                    raise KaldiError(
                        "TransitionModel.read: separate self-loop pdfs "
                        "(post-2017 chain topologies) are not supported"
                    )
            tuples.append((phone, hmm_state, pdf))
        iof.expect_token(f, "</Triples>" if not four_ints else "</Tuples>")
        num_pdfs = 1 + max((t[2] for t in tuples), default=-1)
        iof.expect_token(f, "<LogProbs>")
        log_probs = iof.read_vector(f).astype(np.float64)
        iof.expect_token(f, "</LogProbs>")
        iof.expect_token(f, "</TransitionModel>")
        tm = TransitionModel.__new__(TransitionModel)
        tm.topo = topo
        tm.tuples = tuples
        tm.num_pdfs = num_pdfs
        tm._index = {t: i for i, t in enumerate(tuples)}
        tm.state2id = [0] * (len(tuples) + 1)
        cur = 1
        for ts, (phone, hmm_state, _pdf) in enumerate(tuples):
            tm.state2id[ts] = cur
            cur += len(topo.topology_for_phone(phone)[hmm_state].transitions)
        tm.state2id[len(tuples)] = cur
        tm.num_tids = cur - 1
        tm._id2state = np.zeros(cur, dtype=np.int32)
        for ts in range(len(tuples)):
            tm._id2state[tm.state2id[ts] : tm.state2id[ts + 1]] = ts
        tm.log_probs = log_probs
        tm.ctx_dep_info = None
        return tm
