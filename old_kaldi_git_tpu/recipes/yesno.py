"""Synthetic yesno corpus + end-to-end mono pipeline.

The reference's egs/yesno/s5 (60 Hebrew yes/no wavs) is not downloadable in
this environment (zero egress), so this module synthesizes an equivalent
corpus: two words with distinct formant structure plus silence, 8 kHz wavs,
and runs the full BASELINE config-1 pipeline: MFCC → flat-start mono GMM →
unigram G → mkgraph → batched decode → WER.  This is the M4 go/no-go gate
(SURVEY.md §7.2).
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from old_kaldi_git_tpu.decoder.csr import fst_to_csr
from old_kaldi_git_tpu.decoder.graph import mkgraph
from old_kaldi_git_tpu.feat import Mfcc, MfccOptions, compute_deltas
from old_kaldi_git_tpu.feat.cmvn import acc_cmvn_stats, apply_cmvn
from old_kaldi_git_tpu.fst.lang import Lang, Lexicon, make_unigram_grammar_fst
from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
from old_kaldi_git_tpu.recipes.decode import DecodeOptions, decode_dataset, score_hyps
from old_kaldi_git_tpu.recipes.mono import MonoTrainOptions, train_mono
from old_kaldi_git_tpu.utils.edit_distance import EditStats
from old_kaldi_git_tpu.utils.log import get_logger
from old_kaldi_git_tpu.utils.wav import WaveData, write_wav

log = get_logger("yesno")

SAMP_FREQ = 8000.0

# formant recipes per phone (frequencies in Hz, amplitudes)
PHONE_SPECS: Dict[str, List[Tuple[float, float]]] = {
    "Y": [(250, 0.9), (2100, 0.5), (2900, 0.3)],
    "EH": [(550, 1.0), (1750, 0.6)],
    "S": [(3400, 0.7), (2800, 0.5)],  # fricative-ish, high freq
    "N": [(300, 1.0), (1200, 0.3)],
    "OW": [(450, 1.0), (900, 0.7)],
}
PHONE_DUR = {"Y": 0.10, "EH": 0.14, "S": 0.12, "N": 0.11, "OW": 0.16}
WORD_PRONS = {"yes": ["Y", "EH", "S"], "no": ["N", "OW"]}


def synth_utterance(
    words: List[str], rng: np.random.Generator, noise: float = 40.0
) -> np.ndarray:
    """Concatenate formant-tone phones with silence gaps → waveform."""
    pieces = [_silence(0.12, rng, noise)]
    for w in words:
        for ph in WORD_PRONS[w]:
            pieces.append(_phone(ph, rng, noise))
        pieces.append(_silence(0.10 + 0.05 * rng.random(), rng, noise))
    return np.concatenate(pieces)


def _phone(ph: str, rng: np.random.Generator, noise: float) -> np.ndarray:
    dur = PHONE_DUR[ph] * (0.85 + 0.3 * rng.random())
    n = int(dur * SAMP_FREQ)
    t = np.arange(n) / SAMP_FREQ
    sig = np.zeros(n)
    for freq, amp in PHONE_SPECS[ph]:
        f = freq * (1.0 + 0.02 * rng.standard_normal())
        sig += amp * np.sin(2 * math.pi * f * t + rng.random() * 2 * math.pi)
    # onset/offset ramps to avoid clicks
    ramp = min(80, n // 4)
    env = np.ones(n)
    env[:ramp] = np.linspace(0, 1, ramp)
    env[-ramp:] = np.linspace(1, 0, ramp)
    sig = 2500.0 * sig * env + noise * rng.standard_normal(n)
    return sig.astype(np.float32)


def _silence(dur: float, rng: np.random.Generator, noise: float) -> np.ndarray:
    n = int(dur * SAMP_FREQ)
    return (noise * rng.standard_normal(n)).astype(np.float32)


def make_corpus(
    num_train: int = 31, num_test: int = 10, seed: int = 17
) -> Tuple[Dict[str, np.ndarray], Dict[str, List[str]], Dict[str, np.ndarray], Dict[str, List[str]]]:
    """Returns (train_waves, train_text, test_waves, test_text)."""
    rng = np.random.default_rng(seed)
    def gen(n, prefix):
        waves, text = {}, {}
        for i in range(n):
            num_words = 1 + int(rng.integers(0, 4))
            words = [("yes" if rng.random() < 0.5 else "no") for _ in range(num_words)]
            utt = f"{prefix}_{i:03d}"
            waves[utt] = synth_utterance(words, rng)
            text[utt] = words
        return waves, text
    train_waves, train_text = gen(num_train, "train")
    test_waves, test_text = gen(num_test, "test")
    return train_waves, train_text, test_waves, test_text


def compute_static_feats(waves: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Static 13-dim MFCC + per-utterance CMVN (no deltas) — input for the
    LDA+MLLT pipeline (reference applies splice+LDA on statics)."""
    opts = MfccOptions()
    opts.frame_opts.samp_freq = SAMP_FREQ
    opts.frame_opts.dither = 0.0
    mfcc = Mfcc(opts)
    keys = sorted(waves)
    max_len = max(waves[k].shape[0] for k in keys)
    batch = np.zeros((len(keys), max_len), np.float32)
    for i, k in enumerate(keys):
        batch[i, : waves[k].shape[0]] = waves[k]
    feats = np.asarray(mfcc(jnp.asarray(batch)))
    out = {}
    for i, k in enumerate(keys):
        t = mfcc.num_frames(waves[k].shape[0])
        f = feats[i, :t]
        out[k] = (f - f.mean(axis=0)).astype(np.float32)
    return out


def compute_feats(waves: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """MFCC (no dither for determinism) + per-utterance CMVN + deltas.

    Waves are zero-padded into one batch so the whole feature pipeline is a
    single compiled XLA program (one compile for all utterances) — the
    TPU-first shape discipline (SURVEY.md §7.1)."""
    opts = MfccOptions()
    opts.frame_opts.samp_freq = SAMP_FREQ
    opts.frame_opts.dither = 0.0
    mfcc = Mfcc(opts)
    keys = sorted(waves)
    max_len = max(waves[k].shape[0] for k in keys)
    batch = np.zeros((len(keys), max_len), np.float32)
    for i, k in enumerate(keys):
        batch[i, : waves[k].shape[0]] = waves[k]
    feats = np.asarray(mfcc(jnp.asarray(batch)))  # [B, T, 13]
    num_frames = np.asarray([mfcc.num_frames(waves[k].shape[0]) for k in keys])
    # replicate each utterance's last valid frame into its padding so batched
    # deltas reproduce per-utterance clipped-edge semantics exactly
    T = feats.shape[1]
    idx = np.minimum(np.arange(T)[None, :], (num_frames - 1)[:, None])
    feats = np.take_along_axis(feats, idx[:, :, None], axis=1)
    # per-utterance CMVN (mean only) over valid frames
    mask = (np.arange(T)[None, :] < num_frames[:, None]).astype(np.float32)
    mean = (feats * mask[:, :, None]).sum(1) / num_frames[:, None]
    feats = feats - mean[:, None, :]
    deltas = np.asarray(compute_deltas(jnp.asarray(feats.astype(np.float32))))
    return {k: deltas[i, : num_frames[i]].astype(np.float32) for i, k in enumerate(keys)}


def make_lang() -> Lang:
    lexicon = Lexicon.from_dict({w: " ".join(p) for w, p in WORD_PRONS.items()})
    return Lang(lexicon, silence_phone="SIL", sil_prob=0.5)


def run_yesno(
    workdir: str | None = None,
    num_train: int = 31,
    num_test: int = 10,
    train_opts: MonoTrainOptions | None = None,
) -> EditStats:
    """Full config-1 pipeline; returns test-set WER stats."""
    train_waves, train_text, test_waves, test_text = make_corpus(num_train, num_test)
    if workdir:
        os.makedirs(workdir, exist_ok=True)
        for utt, w in {**train_waves, **test_waves}.items():
            write_wav(os.path.join(workdir, f"{utt}.wav"), w, SAMP_FREQ)

    log.info("yesno: computing features")
    train_feats = compute_feats(train_waves)
    test_feats = compute_feats(test_waves)

    lang = make_lang()
    opts = train_opts or MonoTrainOptions(num_iters=20, totgauss=120)
    model, _ali = train_mono(train_feats, train_text, lang, opts)
    if workdir:
        model.save(os.path.join(workdir, "final.mdl"))

    log.info("yesno: building decode graph")
    g = make_unigram_grammar_fst(list(train_text.values()), lang.words)
    # rebuild ctx_dep/topo the same way train_mono did (mono tree)
    from old_kaldi_git_tpu.hmm.topology import HmmTopology
    from old_kaldi_git_tpu.tree.context_dep import monophone_context_dependency

    phones = lang.real_phone_ids
    topo = model.tm.topo
    ctx_dep = monophone_context_dependency(
        phones, {p: topo.num_pdf_classes(p) for p in phones}
    )
    hclg = mkgraph(lang, g, ctx_dep, model.tm)
    csr = fst_to_csr(hclg, model.tm.tid_to_pdf_array())

    hyps = decode_dataset(model, csr, lang, test_feats, DecodeOptions(beam=20.0))
    stats = score_hyps(test_text, hyps)
    log.info("yesno E2E: %s", stats.report())
    return stats
