"""Keyword search (KWS) over decoded lattices.

Reference parity: src/kws/ (kws-functions.{h,cc}, kwsbin/lattice-to-kws-index,
kws-index-union, kwsbin/kws-search) — the reference builds a corpus-wide
factor transducer index so huge-corpus search is sublinear, then composes
keyword FSTs against it.

Redesigned here (documented, deliberate): the two query classes are served
directly:

* single-word keywords — an **inverted occurrence index**
  word → [(utt, tbeg, tend, log-posterior)] built from lattice
  forward-backward arc posteriors (same posteriors the factor transducer
  would yield), mergeable across shards (the kws-index-union role is a
  dict merge);
* multi-word phrases — an exact **(state × keyword-position) DP** over the
  lattice, summing the posterior mass of every path that realizes the
  phrase (epsilon arcs allowed between the words), clustered by start
  frame.  This is the factor posterior the reference computes, without
  materializing the factor transducer.

Posterior convention matches the reference kws pipeline: combined weight
`lm_scale * graph + ac_scale * acoustic`, occurrence posterior =
mass(paths through the occurrence) / mass(all paths).
"""

from __future__ import annotations

import dataclasses
import pickle
from typing import Dict, List, Sequence, Tuple

import numpy as np

from old_kaldi_git_tpu.lat.lattice import (
    Lattice,
    _topo_order,
    lattice_state_times,
)
from old_kaldi_git_tpu.utils.log import get_logger

log = get_logger("kws")

NEG_INF = float("-inf")


@dataclasses.dataclass
class KwsHit:
    utt: str
    tbeg: int  # frames
    tend: int  # frames
    log_post: float  # log occurrence posterior (<= 0 up to rounding)


def _forward_backward(
    lat: Lattice, lm_scale: float, ac_scale: float
) -> Tuple[np.ndarray, np.ndarray, float, List[int]]:
    """Log-domain total-path forward/backward over the lattice."""
    if any(t < 0 for t in lat.state_time):
        lattice_state_times(lat)  # ark-read lattices carry no stored times
    order = _topo_order(lat)
    n = lat.num_states
    fwd = np.full(n, NEG_INF)
    fwd[lat.start] = 0.0
    for s in order:
        if fwd[s] == NEG_INF:
            continue
        for a in lat.arcs[s]:
            c = fwd[s] - lat.combined(a, lm_scale, ac_scale)
            fwd[a.nextstate] = np.logaddexp(fwd[a.nextstate], c)
    bwd = np.full(n, NEG_INF)
    for s in range(n):
        if lat.is_final(s):
            g, ac = lat.finals[s]
            bwd[s] = -(lm_scale * g + ac_scale * ac)
    for s in reversed(order):
        for a in lat.arcs[s]:
            c = -lat.combined(a, lm_scale, ac_scale) + bwd[a.nextstate]
            bwd[s] = np.logaddexp(bwd[s], c)
    return fwd, bwd, float(bwd[lat.start]), order


def search_phrase(
    lat: Lattice,
    keyword: Sequence[int],
    lm_scale: float = 1.0,
    ac_scale: float = 0.1,
    min_log_post: float = np.log(1e-4),
) -> List[Tuple[int, int, float]]:
    """Exact phrase search: returns [(tbeg, tend, log_posterior)] for every
    occurrence (clustered by start frame) of the word-id sequence.

    DP state: (lattice state, #words matched, tbeg) → log path mass from
    the lattice start through the partial occurrence.  Word arcs advance
    the match position; epsilon (olabel 0) arcs carry partial matches
    forward; a completed match at state s contributes mass * beta(s)."""
    k = len(keyword)
    if k == 0:
        return []
    fwd, bwd, total, order = _forward_backward(lat, lm_scale, ac_scale)
    if total == NEG_INF:
        return []
    # partial[s] : {(j, tbeg): log mass}, 1 <= j <= k
    partial: List[Dict[Tuple[int, int], float]] = [
        {} for _ in range(lat.num_states)
    ]
    hits: Dict[int, Tuple[float, int]] = {}  # tbeg -> (log mass, best tend)

    def _add(d: Dict, key, val: float) -> None:
        old = d.get(key)
        d[key] = val if old is None else float(np.logaddexp(old, val))

    for s in order:
        # completed matches end exactly where the k-th word arc ends
        for (j, tbeg), mass in list(partial[s].items()):
            if j == k:
                contrib = mass + bwd[s]
                if contrib - total >= min_log_post:
                    tend = lat.state_time[s]
                    old = hits.get(tbeg)
                    if old is None:
                        hits[tbeg] = (contrib, tend)
                    else:
                        hits[tbeg] = (
                            float(np.logaddexp(old[0], contrib)),
                            max(old[1], tend),
                        )
                del partial[s][(j, tbeg)]
        if fwd[s] == NEG_INF and not partial[s]:
            continue
        for a in lat.arcs[s]:
            w = -lat.combined(a, lm_scale, ac_scale)
            if a.olabel == 0:
                # epsilon: carry partial matches through
                for key, mass in partial[s].items():
                    _add(partial[a.nextstate], key, mass + w)
            else:
                # word arc: may start a new occurrence ...
                if a.olabel == keyword[0] and fwd[s] != NEG_INF:
                    _add(
                        partial[a.nextstate],
                        (1, lat.state_time[s]),
                        fwd[s] + w,
                    )
                # ... and/or extend partials expecting this word
                for (j, tbeg), mass in partial[s].items():
                    if j < k and keyword[j] == a.olabel:
                        _add(partial[a.nextstate], (j + 1, tbeg), mass + w)
    return [
        (tbeg, tend, min(mass - total, 0.0))
        for tbeg, (mass, tend) in sorted(hits.items())
    ]


# ---------------------------------------------------------------------------
# inverted single-word occurrence index (lattice-to-kws-index +
# kws-index-union roles)
# ---------------------------------------------------------------------------


def build_kws_index(
    lats: Dict[str, Lattice],
    lm_scale: float = 1.0,
    ac_scale: float = 0.1,
    min_log_post: float = np.log(1e-4),
) -> Dict[int, List[KwsHit]]:
    """word id → occurrences over a lattice set, posteriors from
    forward-backward; same-word occurrences sharing a start frame are
    merged (posterior mass summed) like overlapping factors in the
    reference index."""
    index: Dict[int, List[KwsHit]] = {}
    for utt, lat in lats.items():
        fwd, bwd, total, order = _forward_backward(lat, lm_scale, ac_scale)
        if total == NEG_INF:
            continue
        per: Dict[Tuple[int, int], Tuple[float, int]] = {}
        for s in order:
            if fwd[s] == NEG_INF:
                continue
            for a in lat.arcs[s]:
                if a.olabel == 0:
                    continue
                lp = (
                    fwd[s]
                    - lat.combined(a, lm_scale, ac_scale)
                    + bwd[a.nextstate]
                    - total
                )
                if lp < min_log_post:
                    continue
                key = (a.olabel, lat.state_time[s])
                tend = lat.state_time[a.nextstate]
                old = per.get(key)
                if old is None:
                    per[key] = (lp, tend)
                else:
                    per[key] = (float(np.logaddexp(old[0], lp)),
                                max(old[1], tend))
        for (word, tbeg), (lp, tend) in per.items():
            index.setdefault(word, []).append(
                KwsHit(utt, tbeg, tend, min(lp, 0.0)))
    return index


def merge_indexes(
    indexes: Sequence[Dict[int, List[KwsHit]]],
) -> Dict[int, List[KwsHit]]:
    """kws-index-union role: concatenate per-shard inverted indexes."""
    out: Dict[int, List[KwsHit]] = {}
    for idx in indexes:
        for word, hits in idx.items():
            out.setdefault(word, []).extend(hits)
    return out


def search_index(
    index: Dict[int, List[KwsHit]], word: int
) -> List[KwsHit]:
    return sorted(
        index.get(word, []), key=lambda h: (h.utt, h.tbeg))


def save_index(index: Dict[int, List[KwsHit]], path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump(
            {w: [(h.utt, h.tbeg, h.tend, h.log_post) for h in hits]
             for w, hits in index.items()},
            f,
        )


def load_index(path: str) -> Dict[int, List[KwsHit]]:
    with open(path, "rb") as f:
        raw = pickle.load(f)
    return {
        w: [KwsHit(*t) for t in hits] for w, hits in raw.items()
    }
