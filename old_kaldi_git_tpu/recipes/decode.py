"""Batched decoding + scoring.

Parity with reference steps/decode.sh + local/score.sh (SURVEY.md §3.3):
build/accept HCLG, evaluate AM loglikes for the whole batch on device, run
the batched beam decoder, map word ids back to text, compute WER (with an
optional acoustic-scale sweep like the reference's LMWT sweep).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from old_kaldi_git_tpu.decoder.csr import CsrGraph, fst_to_csr
from old_kaldi_git_tpu.decoder.graph import mkgraph
from old_kaldi_git_tpu.decoder.viterbi import ViterbiOptions, decode_batch
from old_kaldi_git_tpu.fst.lang import Lang
from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
from old_kaldi_git_tpu.utils.batching import pad_feature_batch
from old_kaldi_git_tpu.utils.edit_distance import EditStats, compute_wer
from old_kaldi_git_tpu.utils.log import get_logger
from old_kaldi_git_tpu.utils.parse_options import options_dataclass

log = get_logger("decode")


@options_dataclass
class DecodeOptions:
    beam: float = 16.0
    max_active: int = 7000
    acoustic_scale: float = 0.1


def decode_dataset(
    model: AmGmmModel,
    graph: CsrGraph,
    lang: Lang,
    feats: Dict[str, np.ndarray],
    opts: Optional[DecodeOptions] = None,
) -> Dict[str, List[str]]:
    """Returns {utt: hypothesis words}."""
    opts = opts or DecodeOptions()
    keys, padded, nf = pad_feature_batch(feats)
    loglikes = model.am.loglikes_batch(padded)  # device-resident
    vopts = ViterbiOptions(
        beam=opts.beam, max_active=opts.max_active, acoustic_scale=opts.acoustic_scale
    )
    results = decode_batch(graph, loglikes, nf, vopts)
    hyps: Dict[str, List[str]] = {}
    for k, res in zip(keys, results):
        if res is None:
            log.warning("decode failed for %s", k)
            hyps[k] = []
        else:
            hyps[k] = [lang.words[w] for w in res.words]
    return hyps


def score_hyps(
    ref_text: Dict[str, Sequence[str]], hyps: Dict[str, Sequence[str]]
) -> EditStats:
    stats = compute_wer(
        {k: list(v) for k, v in ref_text.items()},
        {k: list(v) for k, v in hyps.items()},
    )
    log.info("scoring: %s", stats.report())
    return stats


def decode_dataset_with_lattices(
    model: AmGmmModel,
    graph: CsrGraph,
    lang: Lang,
    feats: Dict[str, np.ndarray],
    opts: Optional[DecodeOptions] = None,
    lattice_beam: float = 10.0,
    determinize: bool = False,
):
    """Batched decode keeping lattices (reference gmm-latgen-faster):
    returns {utt: Lattice}, or {utt: CompactLattice} when determinize=True
    (the reference's --determinize-lattice=true default).

    The AM loglikes stay ON DEVICE: the token-sparse decoder emits
    lattice arcs into a bounded device buffer (decoder.viterbi
    TokenLattice) and the host only materializes the pruned raw lattice
    (reference GetRawLattice re-shaped per SURVEY.md §7.1)."""
    from old_kaldi_git_tpu.decoder.viterbi import decode_batch_tokens
    from old_kaldi_git_tpu.lat.determinize import determinize_lattice_pruned
    from old_kaldi_git_tpu.lat.lattice import lattice_from_token_records

    opts = opts or DecodeOptions()
    keys, padded, nf = pad_feature_batch(feats)
    loglikes = model.am.loglikes_batch(padded)  # device-resident
    results = decode_batch_tokens(
        graph, loglikes, nf,
        ViterbiOptions(beam=opts.beam, max_active=opts.max_active,
                       acoustic_scale=opts.acoustic_scale),
        want_lattice=True, lattice_beam=lattice_beam,
    )
    lats = {}
    for k, res in zip(keys, results):
        if res is None or res.token_lattice is None:
            log.warning("no lattice for %s", k)
            continue
        lat = lattice_from_token_records(graph, res.token_lattice)
        if lat is not None:
            if determinize:
                lats[k] = determinize_lattice_pruned(
                    lat, lattice_beam, acoustic_scale=opts.acoustic_scale
                )
            else:
                lats[k] = lat
    return lats


def decode_biglm(
    model: AmGmmModel,
    graph: CsrGraph,
    lang: Lang,
    feats: Dict[str, np.ndarray],
    old_lm,
    new_lm,
    opts: Optional[DecodeOptions] = None,
    lattice_beam: float = 10.0,
) -> Dict[str, List[str]]:
    """Big-LM decoding (reference lattice-biglm-faster-decoder capability):
    decode against the SMALL-LM HCLG, then exactly replace the LM on the
    determinized lattices (old scores out, big LM in).

    The reference composes G_small⁻¹ ∘ G_big on the fly during search; with
    exact CompactLattice rescoring the same hypothesis space is re-weighted
    after batched decode — no big HCLG is ever built.  old_lm/new_lm:
    ArpaLm objects over lang's word symbols."""
    from old_kaldi_git_tpu.lat.rescore import lmrescore_compact_lattice

    opts = opts or DecodeOptions()
    clats = decode_dataset_with_lattices(
        model, graph, lang, feats, opts, lattice_beam, determinize=True
    )
    hyps: Dict[str, List[str]] = {}
    for k, clat in clats.items():
        resc = lmrescore_compact_lattice(clat, lang.words, new_lm, old_lm)
        words, _tids, _cost = resc.best_path(1.0, opts.acoustic_scale)
        hyps[k] = [lang.words[w] for w in words]
    return hyps


def score_lattices_sweep(
    lattices,
    lang: Lang,
    ref_text: Dict[str, Sequence[str]],
    acoustic_scale: float = 0.1,
    lm_scales: Sequence[float] = (0.5, 0.75, 1.0, 1.25, 1.5, 2.0),
) -> Tuple[float, EditStats]:
    """LM-weight sweep over lattice best paths (reference local/score.sh
    LMWT 7..17 loop, expressed as lm_scale relative to the decode scales).
    Returns (best lm_scale, stats at best)."""
    from old_kaldi_git_tpu.lat.lattice import lattice_best_path

    best = None
    for lms in lm_scales:
        hyps = {}
        for k, lat in lattices.items():
            words, _, _ = lattice_best_path(lat, lm_scale=lms, ac_scale=acoustic_scale)
            hyps[k] = [lang.words[w] for w in words]
        stats = compute_wer(
            {k: list(v) for k, v in ref_text.items()},
            {k: list(v) for k, v in hyps.items()},
        )
        if best is None or stats.wer < best[1].wer:
            best = (lms, stats)
    log.info("sweep best: lm_scale=%.2f %s", best[0], best[1].report())
    return best
