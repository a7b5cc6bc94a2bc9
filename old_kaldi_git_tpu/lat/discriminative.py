"""MPE / sMBR lattice posteriors (signed) for discriminative training.

Reference parity: src/lat/lattice-functions.cc
LatticeForwardBackwardMpeVariants (criterion 'mpfe' = phone-frame accuracy,
'smbr' = state/pdf accuracy) as consumed by src/latbin/lattice-to-mpe-post.cc
and src/gmmbin/gmm-fmpe-acc-stats.cc.

The double forward-backward: alpha/beta are the usual log-domain occupation
scores; alpha_acc/beta_acc carry the *expected accumulated path accuracy*
through each state.  An arc's signed posterior is
gamma(arc) * (alpha_acc[src] + acc(arc) + beta_acc[dst] - avg_acc): arcs on
better-than-average-accuracy paths get positive weight, worse-than-average
negative — the per-frame pull that EBW/fMPE training uses.

Host-side per-lattice code (pointer-chasing over ragged arcs), like the
other lattice-functions; batched model-side statistics stay on TPU.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from old_kaldi_git_tpu.lat.lattice import (
    INF,
    Lattice,
    _topo_order,
    lattice_state_times,
)
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger

log = get_logger("discriminative")

Posterior = List[List[Tuple[int, float]]]


def forward_backward_mpe_variants(
    lat: Lattice,
    tm,
    ref_alignment: Sequence[int],
    criterion: str = "mpfe",
    silence_phones: Sequence[int] = (),
    lm_scale: float = 1.0,
    ac_scale: float = 0.1,
) -> Tuple[Posterior, float]:
    """Signed tid-level posteriors + expected accuracy (frames correct).

    criterion 'mpfe': an emitting arc scores 1 at frame t when its phone
    matches the reference alignment's phone; 'smbr': when its pdf matches.
    Arcs whose phone is in silence_phones always score 0 (the reference's
    default non-one-silence-class behaviour), as do frames whose reference
    is silence.
    """
    if criterion not in ("mpfe", "smbr"):
        raise KaldiError(f"bad criterion {criterion!r}")
    order = _topo_order(lat)
    times = lattice_state_times(lat)
    n = lat.num_states
    sil = frozenset(int(p) for p in silence_phones)
    ref_phone = np.asarray([tm.tid_to_phone(t) for t in ref_alignment])
    ref_pdf = np.asarray([tm.tid_to_pdf(t) for t in ref_alignment])

    def arc_acc(tid: int, t: int) -> float:
        if tid == 0:
            return 0.0
        if t >= len(ref_alignment):
            return 0.0
        phone = tm.tid_to_phone(tid)
        if phone in sil or int(ref_phone[t]) in sil:
            return 0.0
        if criterion == "mpfe":
            return 1.0 if phone == int(ref_phone[t]) else 0.0
        return 1.0 if tm.tid_to_pdf(tid) == int(ref_pdf[t]) else 0.0

    # standard log-domain forward/backward
    alpha = np.full(n, -INF)
    alpha[lat.start] = 0.0
    for s in order:
        if alpha[s] == -INF:
            continue
        for a in lat.arcs[s]:
            w = -lat.combined(a, lm_scale, ac_scale)
            alpha[a.nextstate] = np.logaddexp(alpha[a.nextstate], alpha[s] + w)
    beta = np.full(n, -INF)
    for s in range(n):
        if lat.is_final(s):
            g, ac = lat.finals[s]
            beta[s] = -(lm_scale * g + ac_scale * ac)
    for s in reversed(order):
        for a in lat.arcs[s]:
            w = -lat.combined(a, lm_scale, ac_scale)
            beta[s] = np.logaddexp(beta[s], w + beta[a.nextstate])
    total = beta[lat.start]
    if not np.isfinite(total):
        raise KaldiError("lattice has no successful path")

    # accuracy-expectation pass (probability domain, locally normalized)
    alpha_acc = np.zeros(n)
    for s in order:
        if alpha[s] == -INF:
            continue
        for a in lat.arcs[s]:
            w = -lat.combined(a, lm_scale, ac_scale)
            j = a.nextstate
            # P(arrive at j via this arc | arrive at j)
            occ = np.exp(alpha[s] + w - alpha[j])
            alpha_acc[j] += occ * (alpha_acc[s] + arc_acc(a.ilabel, times[s]))
    beta_acc = np.zeros(n)
    for s in reversed(order):
        if beta[s] == -INF:
            continue
        acc = 0.0
        for a in lat.arcs[s]:
            w = -lat.combined(a, lm_scale, ac_scale)
            occ = np.exp(w + beta[a.nextstate] - beta[s])
            acc += occ * (beta_acc[a.nextstate] + arc_acc(a.ilabel, times[s]))
        # final-state mass contributes zero future accuracy
        beta_acc[s] = acc

    # expected accuracy of the whole lattice (weight final states by their
    # arrival probability)
    avg_acc = 0.0
    for s in range(n):
        if lat.is_final(s):
            g, ac = lat.finals[s]
            fw = -(lm_scale * g + ac_scale * ac)
            avg_acc += np.exp(alpha[s] + fw - total) * alpha_acc[s]

    num_frames = max(times[s] for s in range(n) if lat.is_final(s))
    post: Posterior = [[] for _ in range(num_frames)]
    for s in range(n):
        if alpha[s] == -INF or beta[s] == -INF:
            continue
        for a in lat.arcs[s]:
            if a.ilabel == 0:
                continue
            t = times[s]
            if t >= num_frames:
                continue
            w = -lat.combined(a, lm_scale, ac_scale)
            gamma = np.exp(alpha[s] + w + beta[a.nextstate] - total)
            signed = gamma * (alpha_acc[s] + arc_acc(a.ilabel, t)
                              + beta_acc[a.nextstate] - avg_acc)
            if signed != 0.0:
                post[t].append((a.ilabel, float(signed)))
    # merge duplicate tids per frame (several lattice arcs can share a tid)
    merged: Posterior = []
    for frame in post:
        d = {}
        for tid, w in frame:
            d[tid] = d.get(tid, 0.0) + w
        merged.append(sorted(d.items()))
    return merged, float(avg_acc)
