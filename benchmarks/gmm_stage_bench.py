"""Flagship-scale GMM training-stage timing (BASELINE.md GMM stage table).

Rebuilds the minilib mono + tri GMM stages from scratch in a scratch
workdir and reports the per-stage align/accumulate/update walls that
`gmm_common.gmm_training_loop` logs.  Run on the chip to refresh the
BASELINE "GMM training-stage throughput" table (e.g. after the r5 fused
on-device align backtrace + device-resident loglikes change).

Usage: python benchmarks/gmm_stage_bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from old_kaldi_git_tpu.recipes import minilib as ml
    from old_kaldi_git_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    from old_kaldi_git_tpu.recipes.gmm_common import GmmTrainOptions
    from old_kaldi_git_tpu.recipes.mono import MonoTrainOptions, train_mono
    from old_kaldi_git_tpu.recipes.triphone import train_deltas

    opts = ml.MinilibOptions()
    t0 = time.perf_counter()
    # stage-1 equivalent: lexicon + Lang
    lex = ml.make_lexicon(opts)
    from old_kaldi_git_tpu.fst.lang import Lang, Lexicon
    lang = Lang(Lexicon.from_dict(lex), silence_phone="SIL", sil_prob=0.5)
    print(f"lang: {time.perf_counter() - t0:.1f}s", flush=True)

    sents = ml.make_text(opts, opts.num_train, opts.seed + 4,
                         min_len=4, max_len=11)
    waves, text = ml.synth_set(opts, sents, "train", opts.seed + 5)
    t0 = time.perf_counter()
    feats = ml.compute_feats(waves)
    audio_s = sum(len(w) for w in waves.values()) / 16000.0
    print(f"feats: {time.perf_counter() - t0:.1f}s over {audio_s:.0f} "
          "audio-s", flush=True)

    t0 = time.perf_counter()
    mono, mono_ali = train_mono(
        feats, text, lang,
        MonoTrainOptions(num_iters=opts.mono_iters,
                         totgauss=opts.mono_totgauss))
    mono_wall = time.perf_counter() - t0
    print(f"MONO stage wall {mono_wall:.0f}s  "
          f"({audio_s / mono_wall:.2f} audio-s/s)", flush=True)

    t0 = time.perf_counter()
    tri, _cd, _ali = train_deltas(
        feats, text, lang, mono, mono_ali,
        num_leaves=opts.tree_leaves,
        opts=GmmTrainOptions(
            num_iters=opts.tri_iters, totgauss=opts.tri_totgauss,
            realign_iters=tuple(range(1, opts.tri_iters, 2))))
    tri_wall = time.perf_counter() - t0
    print(f"TRI stage wall {tri_wall:.0f}s  "
          f"({audio_s / tri_wall:.2f} audio-s/s)", flush=True)


if __name__ == "__main__":
    main()
