"""Benchmark: batched decode throughput (audio-seconds/s/chip).

Measures the BASELINE primary metric on the full decode pipeline —
on-device MFCC+deltas → TDNN-F acoustic scores → batched token-passing beam
search (lax.scan) → host backtrace — over a synthetic medium-vocabulary
task.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio_sec_per_sec_per_chip",
   "vs_baseline": N}

vs_baseline: the reference decodes at roughly RTF 1.0 per CPU core
(BASELINE.md, recalled upstream range 0.5-1.5), so vs_baseline is the value
itself (x realtime per chip).
"""

from __future__ import annotations

import json
import math
import os
import time

import numpy as np


def build_system(num_words: int = 200, seed: int = 0):
    """Medium-vocab synthetic system: random lexicon over 30 phones,
    unigram G, mono GMM-free TDNN-F acoustic model with matching pdf count."""
    rng = np.random.default_rng(seed)
    from old_kaldi_git_tpu.decoder.csr import fst_to_csr
    from old_kaldi_git_tpu.decoder.graph import mkgraph
    from old_kaldi_git_tpu.fst.lang import Lang, Lexicon, make_unigram_grammar_fst
    from old_kaldi_git_tpu.hmm.topology import HmmTopology
    from old_kaldi_git_tpu.hmm.transition_model import TransitionModel
    from old_kaldi_git_tpu.models.am_nnet import AmNnet
    from old_kaldi_git_tpu.models.tdnn import make_tdnnf
    from old_kaldi_git_tpu.tree.context_dep import monophone_context_dependency

    phone_names = [f"p{i}" for i in range(30)]
    lex = {}
    for w in range(num_words):
        pron = " ".join(rng.choice(phone_names, size=rng.integers(2, 6)))
        lex[f"w{w:03d}"] = pron
    lang = Lang(Lexicon.from_dict(lex), silence_phone="SIL", sil_prob=0.5)
    phones = lang.real_phone_ids
    topo = HmmTopology.standard(phones, silence_phones=[lang.silence_id])
    cd = monophone_context_dependency(
        phones, {p: topo.num_pdf_classes(p) for p in phones}
    )
    tm = TransitionModel(cd, topo)
    sentences = [
        [f"w{rng.integers(0, num_words):03d}" for _ in range(rng.integers(1, 8))]
        for _ in range(500)
    ]
    g = make_unigram_grammar_fst(sentences, lang.words)
    hclg = mkgraph(lang, g, cd, tm)
    csr = fst_to_csr(hclg, tm.tid_to_pdf_array())
    config = make_tdnnf(39, cd.num_pdfs, hidden_dim=512, bottleneck_dim=64,
                        num_layers=6)
    am = AmNnet.init(config, seed=0)
    am.set_priors_from_alignment_counts(np.ones(cd.num_pdfs))
    return lang, tm, csr, am


def main():
    import jax

    # persistent compilation cache, stored IN THE REPO: XLA compile times on
    # the tunneled TPU backend are erratic and routinely exceed 5 minutes
    # for the decode scan (large per-step scan outputs), so a cold bench can
    # outlive its timeout.  The committed cache makes any same-environment
    # run start warm; on a different jaxlib/backend the keys miss and it
    # degrades to a cold compile.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import jax.numpy as jnp

    from old_kaldi_git_tpu.decoder.viterbi import ViterbiOptions, decode_batch
    from old_kaldi_git_tpu.feat import Mfcc, MfccOptions, compute_deltas

    backend = jax.default_backend()
    B = 128
    DUR = 10.0  # seconds per utterance
    SR = 16000.0

    lang, tm, csr, am = build_system()
    rng = np.random.default_rng(1)
    waves = rng.normal(size=(B, int(DUR * SR))).astype(np.float32) * 2000.0

    mfcc_opts = MfccOptions()
    mfcc_opts.frame_opts.dither = 0.0
    mfcc = Mfcc(mfcc_opts)

    @jax.jit
    def frontend(w):
        f = mfcc(w)
        return compute_deltas(f)  # 13 MFCC x (static+delta+accel) = 39

    def pipeline(waves_dev):
        feats = frontend(waves_dev)
        ll = am.loglikes_batch(feats)  # stays on device: decode_batch
        return ll, feats.shape[1]      # consumes device arrays directly

    vopts = ViterbiOptions(beam=14.0, max_active=2000, acoustic_scale=1.0)

    # warmup (compile)
    waves_dev = jnp.asarray(waves)
    ll, T = pipeline(waves_dev)
    nf = np.full(B, T, np.int32)
    decode_batch(csr, ll, nf, vopts)

    # timed runs
    runs = 2
    t0 = time.perf_counter()
    for _ in range(runs):
        ll, T = pipeline(waves_dev)
        results = decode_batch(csr, ll, nf, vopts)
    wall = (time.perf_counter() - t0) / runs
    ok = sum(1 for r in results if r is not None)

    audio_sec_per_sec = B * DUR / wall
    print(
        json.dumps(
            {
                "metric": "decode audio-seconds/s/chip (MFCC+TDNN-F+beam search, "
                f"{csr.num_states} states, {csr.num_arcs} arcs, backend={backend}, "
                f"decoded {ok}/{B})",
                "value": round(audio_sec_per_sec, 2),
                "unit": "audio_sec_per_sec_per_chip",
                "vs_baseline": round(audio_sec_per_sec / 1.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
