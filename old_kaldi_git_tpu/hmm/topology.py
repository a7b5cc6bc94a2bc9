"""HMM topologies.

Parity with reference src/hmm/hmm-topology.h: per-phone state graphs read
from the `topo` text format; default 3-state Bakis for speech phones and a
5-state left-to-right topology for silence.  State entries carry a pdf-class
and a list of (next-state, prob) transitions; the last state is non-emitting
(no pdf-class, no transitions).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

from old_kaldi_git_tpu.utils.log import KaldiError

NO_PDF = -1


@dataclasses.dataclass
class HmmState:
    pdf_class: int  # NO_PDF for non-emitting
    transitions: List[Tuple[int, float]]  # (next hmm-state, prob)


class HmmTopology:
    def __init__(self):
        self._entries: Dict[int, List[HmmState]] = {}  # phone → states

    # -- construction --------------------------------------------------------
    @staticmethod
    def standard(
        phones: Sequence[int],
        silence_phones: Sequence[int] = (),
        num_states: int = 3,
        sil_num_states: int = 5,
    ) -> "HmmTopology":
        """Default Kaldi topology: `num_states`-state Bakis chain
        (self-loop 0.75 / forward 0.25) for speech phones; a `sil_num_states`
        left-to-right topology with skips for silence phones."""
        topo = HmmTopology()
        sil = set(silence_phones)
        bakis = HmmTopology._bakis_entry(num_states)
        sil_entry = HmmTopology._silence_entry(sil_num_states)
        for p in phones:
            topo._entries[p] = sil_entry if p in sil else bakis
        return topo

    @staticmethod
    def _bakis_entry(num_states: int) -> List[HmmState]:
        states = [
            HmmState(pdf_class=i, transitions=[(i, 0.75), (i + 1, 0.25)])
            for i in range(num_states)
        ]
        states.append(HmmState(pdf_class=NO_PDF, transitions=[]))
        return states

    @staticmethod
    def _silence_entry(num_states: int) -> List[HmmState]:
        """Reference default 5-state silence: state 0 can jump to 1..3;
        middle states fully connected among 1..3 + to 4; modeled after the
        stock `topo` produced by utils/gen_topo-free prepare_lang."""
        if num_states < 3:
            return HmmTopology._bakis_entry(num_states)
        n = num_states
        states: List[HmmState] = []
        # state 0 can self-loop or skip ahead to any of 1..n-2 (lets short
        # silences pass through quickly, like the stock 5-state topo)
        targets0 = [0] + list(range(1, n - 1))
        p0 = 1.0 / len(targets0)
        states.append(HmmState(0, [(t, p0) for t in targets0]))
        for i in range(1, n):
            states.append(HmmState(i, [(i, 0.75), (i + 1, 0.25)]))
        states.append(HmmState(NO_PDF, []))
        return states

    # -- access ---------------------------------------------------------------
    @property
    def phones(self) -> List[int]:
        return sorted(self._entries)

    def topology_for_phone(self, phone: int) -> List[HmmState]:
        if phone not in self._entries:
            raise KaldiError(f"no topology entry for phone {phone}")
        return self._entries[phone]

    def num_pdf_classes(self, phone: int) -> int:
        return 1 + max(
            s.pdf_class for s in self.topology_for_phone(phone) if s.pdf_class != NO_PDF
        )

    # -- binary I/O (reference hmm-topology.cc Write/Read, binary branch) -----
    def _grouped_entries(self):
        """(entries, phone2idx): dedup identical per-phone entries, as the
        reference stores them (phones_, phone2idx_, entries_)."""
        entry_list: List[List[HmmState]] = []
        phone2idx: Dict[int, int] = {}
        for phone in self.phones:
            entry = self._entries[phone]
            for i, e in enumerate(entry_list):
                if e is entry or _entries_equal(e, entry):
                    phone2idx[phone] = i
                    break
            else:
                entry_list.append(entry)
                phone2idx[phone] = len(entry_list) - 1
        return entry_list, phone2idx

    def write(self, f) -> None:
        """Byte layout of reference HmmTopology::Write (binary):
        <Topology> phones_(WriteIntegerVector) phone2idx_(WriteIntegerVector)
        num-entries, then per entry: num-states, per state: pdf-class,
        num-transitions, (next-state, prob-float)...; </Topology>.
        (Old-Kaldi vintage: one pdf-class per state, matching this fork;
        the post-2017 format adds a separate self-loop pdf-class.)"""
        from old_kaldi_git_tpu.utils import io_funcs as iof

        iof.write_token(f, "<Topology>")
        phones = self.phones
        entries, phone2idx = self._grouped_entries()
        idx_vec = [-1] * (max(phones) + 1)
        for p in phones:
            idx_vec[p] = phone2idx[p]
        iof.write_integer_vector(f, phones)
        iof.write_integer_vector(f, idx_vec)
        iof.write_int32(f, len(entries))
        for entry in entries:
            iof.write_int32(f, len(entry))
            for st in entry:
                iof.write_int32(f, st.pdf_class)
                iof.write_int32(f, len(st.transitions))
                for ns, prob in st.transitions:
                    iof.write_int32(f, ns)
                    iof.write_float(f, prob)
        iof.write_token(f, "</Topology>")

    @staticmethod
    def read(f) -> "HmmTopology":
        from old_kaldi_git_tpu.utils import io_funcs as iof

        iof.expect_token(f, "<Topology>")
        phones = iof.read_integer_vector(f)
        idx_vec = iof.read_integer_vector(f)
        num_entries = iof.read_int32(f)
        entries: List[List[HmmState]] = []
        for _ in range(num_entries):
            num_states = iof.read_int32(f)
            states: List[HmmState] = []
            for _ in range(num_states):
                pdf_class = iof.read_int32(f)
                ntrans = iof.read_int32(f)
                trans = []
                for _ in range(ntrans):
                    ns = iof.read_int32(f)
                    prob = iof.read_float(f)
                    trans.append((ns, float(prob)))
                states.append(HmmState(pdf_class, trans))
            entries.append(states)
        iof.expect_token(f, "</Topology>")
        topo = HmmTopology()
        for p in phones:
            idx = idx_vec[p]
            if idx < 0 or idx >= num_entries:
                raise KaldiError(f"topology: bad entry index for phone {p}")
            topo._entries[int(p)] = entries[idx]
        return topo

    # -- text I/O (Kaldi `topo` format) ---------------------------------------
    def write_text(self) -> str:
        # group phones with identical entries
        groups: Dict[int, List[int]] = {}
        entry_list: List[List[HmmState]] = []
        for phone in self.phones:
            entry = self._entries[phone]
            for i, e in enumerate(entry_list):
                if e is entry or _entries_equal(e, entry):
                    groups[i].append(phone)
                    break
            else:
                entry_list.append(entry)
                groups[len(entry_list) - 1] = [phone]
        lines = ["<Topology>"]
        for i, entry in enumerate(entry_list):
            lines.append("<TopologyEntry>")
            lines.append("<ForPhones>")
            lines.append(" ".join(str(p) for p in groups[i]))
            lines.append("</ForPhones>")
            for si, st in enumerate(entry):
                parts = [f"<State> {si}"]
                if st.pdf_class != NO_PDF:
                    parts.append(f"<PdfClass> {st.pdf_class}")
                for ns, prob in st.transitions:
                    parts.append(f"<Transition> {ns} {prob:g}")
                parts.append("</State>")
                lines.append(" ".join(parts))
            lines.append("</TopologyEntry>")
        lines.append("</Topology>")
        return "\n".join(lines) + "\n"

    @staticmethod
    def read_text(text: str) -> "HmmTopology":
        topo = HmmTopology()
        toks = text.split()
        i = 0

        def expect(t):
            nonlocal i
            if toks[i] != t:
                raise KaldiError(f"topo parse: expected {t}, got {toks[i]}")
            i += 1

        expect("<Topology>")
        while toks[i] == "<TopologyEntry>":
            i += 1
            expect("<ForPhones>")
            phones = []
            while toks[i] != "</ForPhones>":
                phones.append(int(toks[i]))
                i += 1
            i += 1
            states: List[HmmState] = []
            while toks[i] == "<State>":
                i += 1
                sid = int(toks[i]); i += 1
                pdf_class = NO_PDF
                transitions = []
                while toks[i] != "</State>":
                    if toks[i] == "<PdfClass>":
                        pdf_class = int(toks[i + 1]); i += 2
                    elif toks[i] == "<Transition>":
                        transitions.append((int(toks[i + 1]), float(toks[i + 2])))
                        i += 3
                    else:
                        raise KaldiError(f"topo parse: unexpected {toks[i]}")
                i += 1
                if sid != len(states):
                    raise KaldiError("topo parse: states out of order")
                states.append(HmmState(pdf_class, transitions))
            expect("</TopologyEntry>")
            for p in phones:
                topo._entries[p] = states
        expect("</Topology>")
        return topo


def _entries_equal(a: List[HmmState], b: List[HmmState]) -> bool:
    return len(a) == len(b) and all(
        x.pdf_class == y.pdf_class and x.transitions == y.transitions
        for x, y in zip(a, b)
    )
