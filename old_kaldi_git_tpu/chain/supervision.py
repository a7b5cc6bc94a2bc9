"""Chain supervision: tolerance-windowed numerator constraints from alignments.

Parity with reference src/chain/chain-supervision.cc (chain::Supervision via
alignments): frame-subsample the phone alignment, allow each phone boundary
to move by ±tolerance frames, and encode the numerator as a linear phone
sequence plus a [T', L] allowed-mask (phone token l may be occupied at
subsampled frame t).  The numerator forward-backward runs over this
(sequence-position × time) lattice — equivalent to the reference's
supervision FST for alignment-derived supervision.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from old_kaldi_git_tpu.hmm.hmm_utils import split_to_phones
from old_kaldi_git_tpu.tree.context_dep import ContextDependency
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger

log = get_logger("supervision")


@dataclasses.dataclass
class ChainSupervision:
    """One utterance/chunk: pdfs of the phone tokens + occupancy window."""

    pdf_seq: np.ndarray  # [L] int32: pdf of each phone token
    allowed: np.ndarray  # [T', L] bool: token l may emit at frame t
    num_frames: int  # T' (subsampled)
    advance_lp: np.ndarray = None  # [L]: den-graph weight of entering token l
    #   (advance_lp[0] = initial prob of the first token's den state) — the
    #   reference's normalization-FST weights, so numerator ≤ denominator


def alignment_to_supervision(
    alignment: Sequence[int],
    tm,
    ctx_dep: ContextDependency,
    frame_subsampling_factor: int = 3,
    left_tolerance: int = 5,
    right_tolerance: int = 5,
    den=None,
) -> ChainSupervision:
    """tid alignment (frame rate) → supervision at the subsampled rate."""
    segments = split_to_phones(tm, alignment)
    phones = [tm.tid_to_phone(seg[0]) for seg in segments]
    durations = [len(seg) for seg in segments]
    if not phones:
        raise KaldiError("empty alignment")
    fsf = frame_subsampling_factor
    T = sum(durations)
    Tsub = (T + fsf - 1) // fsf
    L = len(phones)
    # phone boundaries at the full frame rate
    starts = np.cumsum([0] + durations[:-1])
    ends = np.cumsum(durations)
    # tolerance windows, clipped, then converted to the subsampled rate
    win_start = np.maximum(starts - left_tolerance, 0)
    win_end = np.minimum(ends + right_tolerance, T)
    sub_start = win_start // fsf
    sub_end = (win_end + fsf - 1) // fsf
    allowed = np.zeros((Tsub, L), bool)
    for l in range(L):
        allowed[sub_start[l] : max(sub_end[l], sub_start[l] + 1), l] = True
    # every frame must have at least one allowed token; monotonic windows
    if not allowed.any(axis=1).all():
        raise KaldiError("supervision window left frames uncovered")
    if ctx_dep.N == 1:
        windows = [[p] for p in phones]
    elif ctx_dep.N == 2 and ctx_dep.P == 1:
        # left-biphone: 0 (out-of-utterance) before the first phone,
        # matching the den graph's BOS convention
        windows = [
            [phones[l - 1] if l > 0 else 0, p] for l, p in enumerate(phones)
        ]
    else:
        raise KaldiError("supervision supports N=1 and left-biphone N=2/P=1")
    pdf_seq = np.asarray(
        [ctx_dep.compute(w, 0) for w in windows], np.int32
    )
    advance_lp = (
        den.numerator_weights(phones).astype(np.float32)
        if den is not None
        else np.zeros(L, np.float32)
    )
    return ChainSupervision(
        pdf_seq=pdf_seq, allowed=allowed, num_frames=Tsub, advance_lp=advance_lp
    )


def pad_supervisions(
    sups: Sequence[ChainSupervision],
):
    """Batch: (pdf_seq [B, L], allowed [B, T', L], num_frames [B], seq_len [B],
    advance_lp [B, L])."""
    B = len(sups)
    L = max(len(s.pdf_seq) for s in sups)
    T = max(s.num_frames for s in sups)
    pdf_seq = np.zeros((B, L), np.int32)
    allowed = np.zeros((B, T, L), bool)
    num_frames = np.zeros(B, np.int32)
    seq_len = np.zeros(B, np.int32)
    advance_lp = np.zeros((B, L), np.float32)
    for b, s in enumerate(sups):
        ls = len(s.pdf_seq)
        pdf_seq[b, :ls] = s.pdf_seq
        allowed[b, : s.num_frames, :ls] = s.allowed
        num_frames[b] = s.num_frames
        seq_len[b] = ls
        if s.advance_lp is not None:
            advance_lp[b, :ls] = s.advance_lp
    return pdf_seq, allowed, num_frames, seq_len, advance_lp


def chain_xent_labels(
    alignment: Sequence[int],
    tm,
    ctx_dep: ContextDependency,
    frame_subsampling_factor: int,
    num_frames: int,
) -> np.ndarray:
    """Hard chain-pdf labels at the subsampled rate for the cross-entropy
    regularizer head (left context from the previous phone for left-biphone
    trees; 0 = out-of-utterance before the first phone, matching the den
    graph's BOS convention).  Shared by train_chain and nnet3-chain-get-egs."""
    from old_kaldi_git_tpu.hmm.hmm_utils import (
        alignment_to_phones,
        split_to_phones,
    )

    seg_phones = alignment_to_phones(tm, alignment)
    frames_phones = []
    prev = 0
    for seg, ph in zip(split_to_phones(tm, alignment), seg_phones):
        frames_phones.extend([(prev, ph)] * len(seg))
        prev = ph
    out = np.zeros(num_frames, np.int32)
    sub = frames_phones[::frame_subsampling_factor][:num_frames]
    for t, (left, ph) in enumerate(sub):
        window = [ph] if ctx_dep.N == 1 else [left, ph]
        out[t] = ctx_dep.compute(window, 0)
    return out
