"""Long-recording segmentation and decode.

Reference parity (SURVEY.md §5 long-context / §8.4): the fork's
steps/segmentation + steps/cleanup/segment_long_utterances.sh specialty —
split unbounded recordings into decodable utterances.  Two tiers:

  segment_by_vad       — energy-VAD islands with padding/merge rules
                         (steps/segmentation's SAD post-processing:
                         min-silence gap, min/max segment duration,
                         boundary padding);
  decode_long_recording — segment, batch-decode all segments together
                         (one [B, T, D] batch — the TPU-friendly shape),
                         and return per-segment transcripts with absolute
                         timestamps.

Splitting at max_segment_duration re-cuts at the lowest-energy frame in
the overlong island, as the reference splits at the weakest point rather
than mid-phone.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from old_kaldi_git_tpu.decoder.csr import CsrGraph
from old_kaldi_git_tpu.fst.lang import Lang
from old_kaldi_git_tpu.ivector.vad import VadOptions, compute_vad_energy
from old_kaldi_git_tpu.utils.log import get_logger
from old_kaldi_git_tpu.utils.parse_options import options_dataclass

log = get_logger("segment")


@options_dataclass
class SegmentationOptions:
    min_silence_sec: float = 0.3  # gaps shorter than this merge segments
    min_segment_sec: float = 0.3  # drop islands shorter than this
    max_segment_sec: float = 30.0  # re-cut longer islands at weakest frame
    pad_sec: float = 0.1  # widen each segment boundary
    frame_shift: float = 0.01


def segment_by_vad(
    log_energy: np.ndarray,  # [T] (e.g. MFCC C0 with use_energy)
    vad_opts: Optional[VadOptions] = None,
    opts: Optional[SegmentationOptions] = None,
) -> List[Tuple[float, float]]:
    """[(start_sec, end_sec)] speech segments from frame energies."""
    opts = opts or SegmentationOptions()
    vad_opts = vad_opts or VadOptions(vad_frames_context=2)
    fs = opts.frame_shift
    voiced = np.asarray(
        compute_vad_energy(jnp.asarray(log_energy[None]), vad_opts)
    )[0] > 0.5
    T = len(voiced)
    # islands of voiced frames
    segs: List[Tuple[int, int]] = []
    t = 0
    while t < T:
        if not voiced[t]:
            t += 1
            continue
        s = t
        while t < T and voiced[t]:
            t += 1
        segs.append((s, t))
    # merge across short silences
    min_gap = int(opts.min_silence_sec / fs)
    merged: List[Tuple[int, int]] = []
    for s, e in segs:
        if merged and s - merged[-1][1] < min_gap:
            merged[-1] = (merged[-1][0], e)
        else:
            merged.append((s, e))
    # drop too-short, split too-long at the lowest-energy frame
    min_len = int(opts.min_segment_sec / fs)
    max_len = int(opts.max_segment_sec / fs)
    out: List[Tuple[int, int]] = []
    stack = [se for se in merged if se[1] - se[0] >= min_len]
    while stack:
        s, e = stack.pop(0)
        if e - s <= max_len:
            out.append((s, e))
            continue
        # weakest interior frame in the middle half
        lo = s + (e - s) // 4
        hi = e - (e - s) // 4
        cut = lo + int(np.argmin(log_energy[lo:hi]))
        stack[:0] = [(s, cut), (cut, e)]
    out.sort()
    pad = int(opts.pad_sec / fs)
    return [
        (max(0, s - pad) * fs, min(T, e + pad) * fs) for s, e in out
    ]


def decode_long_recording(
    model,
    graph: CsrGraph,
    lang: Lang,
    wave: np.ndarray,
    samp_freq: float,
    feats_fn,
    energy_fn=None,
    seg_opts: Optional[SegmentationOptions] = None,
    decode_opts=None,
) -> List[Tuple[float, float, List[str]]]:
    """Segment a long recording and decode the pieces as ONE batch.

    feats_fn: {utt: wave} → {utt: feats [T, D]} (the recipe's feature
    pipeline); energy_fn: wave → per-frame log-energy (defaults to log of
    framewise power).  Returns [(start_sec, end_sec, words)]."""
    from old_kaldi_git_tpu.recipes.decode import DecodeOptions, decode_dataset

    seg_opts = seg_opts or SegmentationOptions()
    if energy_fn is None:
        def energy_fn(w):
            shift = int(samp_freq * seg_opts.frame_shift)
            win = int(samp_freq * 0.025)
            n = max(0, (len(w) - win) // shift + 1)
            e = np.asarray([
                np.sum(w[t * shift: t * shift + win] ** 2.0) for t in range(n)
            ])
            return np.log(np.maximum(e, 1e-10))
    segments = segment_by_vad(energy_fn(wave), opts=seg_opts)
    if not segments:
        return []
    waves = {
        f"seg{i:04d}": wave[int(s * samp_freq): int(e * samp_freq)]
        for i, (s, e) in enumerate(segments)
    }
    feats = feats_fn(waves)
    hyps = decode_dataset(
        model, graph, lang, feats, decode_opts or DecodeOptions()
    )
    out = []
    for i, (s, e) in enumerate(segments):
        out.append((s, e, hyps.get(f"seg{i:04d}", [])))
    log.info("decode_long_recording: %d segments over %.1fs",
             len(segments), len(wave) / samp_freq)
    return out
