"""ARPA n-gram LMs: parsing, trie scoring (const-arpa role), G.fst building.

Parity with reference src/lm/{arpa-file-parser,arpa-lm-compiler,
const-arpa-lm}.{h,cc}: read \\data\\ / \\N-grams: sections (log10 probs +
backoffs), score word sequences with Katz backoff, and compile a G
acceptor whose states are n-gram histories with #0-labeled backoff arcs
(the disambig convention L∘G composition relies on).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

from old_kaldi_git_tpu.fst.symbols import SymbolTable
from old_kaldi_git_tpu.fst.vector_fst import EPS, Arc, VectorFst
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger

log = get_logger("arpa")

LOG10 = math.log(10.0)

BOS, EOS, UNK = "<s>", "</s>", "<unk>"


@dataclasses.dataclass
class ArpaLm:
    """In-memory trie LM (the const-arpa equivalent)."""

    order: int
    # ngram (tuple of words) → (logprob_e, backoff_e) in natural log
    ngrams: Dict[Tuple[str, ...], Tuple[float, float]]

    def logprob(self, word: str, history: Tuple[str, ...]) -> float:
        """Katz backoff P(word | history), natural log."""
        history = tuple(history[-(self.order - 1):]) if self.order > 1 else ()
        backoff = 0.0
        while True:
            entry = self.ngrams.get(history + (word,))
            if entry is not None:
                return backoff + entry[0]
            if not history:
                unk = self.ngrams.get((UNK,))
                return backoff + (unk[0] if unk else -20.0)
            hist_entry = self.ngrams.get(history)
            backoff += hist_entry[1] if hist_entry else 0.0
            history = history[1:]

    def score_sequence(self, words: Sequence[str], bos: bool = True,
                       eos: bool = True) -> float:
        """Total natural-log probability of a sentence."""
        hist: Tuple[str, ...] = (BOS,) if bos else ()
        total = 0.0
        for w in list(words) + ([EOS] if eos else []):
            total += self.logprob(w, hist)
            hist = (hist + (w,))[-(self.order - 1):] if self.order > 1 else ()
        return total


def parse_arpa(text: str) -> ArpaLm:
    lines = iter(text.splitlines())
    counts: List[int] = []
    for ln in lines:
        if ln.strip() == "\\data\\":
            break
    else:
        raise KaldiError("ARPA: no \\data\\ section")
    for ln in lines:
        ln = ln.strip()
        if ln.startswith("ngram"):
            counts.append(int(ln.split("=")[1]))
        elif ln.endswith("-grams:"):
            current_order = int(ln.strip("\\").split("-")[0])
            break
        elif not ln:
            continue
    else:
        raise KaldiError("ARPA: no n-gram sections")
    order = len(counts)
    ngrams: Dict[Tuple[str, ...], Tuple[float, float]] = {}
    while True:
        done = False
        for ln in lines:
            ln = ln.strip()
            if not ln:
                continue
            if ln == "\\end\\":
                done = True
                break
            if ln.endswith("-grams:"):
                current_order = int(ln.strip("\\").split("-")[0])
                break
            parts = ln.split()
            logp = float(parts[0]) * LOG10
            words = tuple(parts[1 : 1 + current_order])
            backoff = (
                float(parts[1 + current_order]) * LOG10
                if len(parts) > 1 + current_order
                else 0.0
            )
            ngrams[words] = (logp, backoff)
        if done:
            break
    log.info("ARPA: order %d, %d ngrams", order, len(ngrams))
    return ArpaLm(order=order, ngrams=ngrams)


def arpa_to_fst(
    lm: ArpaLm,
    words: SymbolTable,
    backoff_symbol: Optional[int] = None,
) -> VectorFst:
    """ARPA → G acceptor (reference arpa-lm-compiler): states = histories,
    word arcs with -logprob, backoff arcs labeled #0 (input side) with
    -backoff weight; <s>/</s> handled via start state and final weights.
    OOV words (not in the table) are skipped with a warning."""
    if backoff_symbol is None:
        backoff_symbol = words.get("#0")
        if backoff_symbol is None:
            raise KaldiError("word table lacks #0 for LM backoff arcs")
    fst = VectorFst()
    state_of: Dict[Tuple[str, ...], int] = {}

    def get_state(hist: Tuple[str, ...]) -> int:
        if hist not in state_of:
            state_of[hist] = fst.add_state()
        return state_of[hist]

    # histories that exist: all ngrams of order < max that have backoff
    # relevance, plus () ; build states lazily from arcs
    start = get_state((BOS,) if lm.order > 1 else ())
    fst.set_start(start)
    null_state = get_state(())

    skipped = 0
    for ngram, (logp, backoff) in lm.ngrams.items():
        hist, word = ngram[:-1], ngram[-1]
        if word == BOS:
            # <s> is not an event; its entry only carries backoff weight
            continue
        # histories containing unk words not in table are still fine (they
        # key states by strings); only emitted arcs need word ids
        src = get_state(hist if lm.order > 1 else ())
        if word == EOS:
            w = -logp
            if not fst.is_final(src) or w < fst.finals[src]:
                fst.set_final(src, w)
            continue
        if word not in words:
            skipped += 1
            continue
        next_hist = (hist + (word,))[-(lm.order - 1):] if lm.order > 1 else ()
        # back off the next history to one that exists as a context
        while next_hist and next_hist not in lm.ngrams and len(next_hist) > 0:
            next_hist = next_hist[1:]
        dst = get_state(next_hist)
        fst.add_arc(src, Arc(words[word], words[word], -logp, dst))

    # backoff arcs: hist → hist[1:] with #0 label
    for hist in list(state_of):
        if not hist:
            continue
        entry = lm.ngrams.get(hist)
        bo = entry[1] if entry else 0.0
        shorter = hist[1:]
        while shorter and shorter not in state_of and shorter not in lm.ngrams:
            shorter = shorter[1:]
        dst = get_state(shorter if shorter in state_of or shorter == () else ())
        src = state_of[hist]
        fst.add_arc(src, Arc(backoff_symbol, EPS, -bo, dst))

    fst.connect()
    fst.arcsort("ilabel")
    if skipped:
        log.warning("arpa_to_fst: skipped %d ngrams with OOV words", skipped)
    log.info("G: %d states, %d arcs", fst.num_states, fst.num_arcs)
    return fst


# ---------------------------------------------------------------------------
# const-arpa binary format (reference src/lm/const-arpa-lm.cc role: a
# pre-parsed LM that loads much faster than re-reading the ARPA text).
# Layout: magic line b"CARPA1\n", then order, then the trie as three
# parallel numpy arrays (flattened key strings, logprobs, backoffs).
# ---------------------------------------------------------------------------

_CARPA_MAGIC = b"CARPA1\n"


def write_const_arpa(lm: ArpaLm, path: str) -> None:
    import numpy as _np

    keys = []
    probs = _np.empty(len(lm.ngrams), _np.float64)
    bos = _np.empty(len(lm.ngrams), _np.float64)
    for i, (ng, (p, b)) in enumerate(lm.ngrams.items()):
        keys.append("\x01".join(ng))
        probs[i] = p
        bos[i] = b
    with open(path, "wb") as f:
        f.write(_CARPA_MAGIC)
        f.write(f"{lm.order}\n".encode())
        blob = "\x00".join(keys).encode("utf-8")
        f.write(f"{len(blob)} {len(keys)}\n".encode())
        f.write(blob)
        f.write(probs.tobytes())
        f.write(bos.tobytes())


def read_const_arpa(path: str) -> ArpaLm:
    import numpy as _np

    with open(path, "rb") as f:
        if f.read(len(_CARPA_MAGIC)) != _CARPA_MAGIC:
            raise ValueError(f"{path}: not a const-arpa file")
        order = int(f.readline())
        nblob, n = (int(x) for x in f.readline().split())
        keys = f.read(nblob).decode("utf-8").split("\x00") if nblob else []
        probs = _np.frombuffer(f.read(8 * n), _np.float64)
        bos = _np.frombuffer(f.read(8 * n), _np.float64)
    ngrams = {
        tuple(k.split("\x01")): (float(p), float(b))
        for k, p, b in zip(keys, probs, bos)
    }
    return ArpaLm(order=order, ngrams=ngrams)


def load_lm(path: str) -> ArpaLm:
    """Load an LM from either const-arpa binary or ARPA text."""
    with open(path, "rb") as f:
        magic = f.read(len(_CARPA_MAGIC))
    if magic == _CARPA_MAGIC:
        return read_const_arpa(path)
    with open(path) as f:
        return parse_arpa(f.read())
