"""Long-recording segmentation (the fork's cleanup/segmentation specialty)."""

import numpy as np
import pytest

from old_kaldi_git_tpu.ivector.vad import VadOptions
from old_kaldi_git_tpu.recipes.segment import (
    SegmentationOptions,
    decode_long_recording,
    segment_by_vad,
)


def test_segment_by_vad_islands():
    """Three speech bursts with silence gaps → three segments with
    approximately right boundaries; tiny gaps merge; short blips drop."""
    fs = 0.01
    T = 1000
    e = np.full(T, 0.0)
    for s, en in ((100, 250), (400, 560), (800, 950)):
        e[s:en] = 10.0
    e[300:305] = 10.0  # 50ms blip: dropped (min_segment 0.3s)
    e[560:575] = 0.0
    e[575:590] = 10.0  # gap 0.15s < min_silence 0.3 → merges with 400-560
    segs = segment_by_vad(
        e, VadOptions(vad_energy_threshold=5.0, vad_energy_mean_scale=0.0),
        SegmentationOptions(pad_sec=0.0),
    )
    assert len(segs) == 3, segs
    (s1, e1), (s2, e2), (s3, e3) = segs
    assert abs(s1 - 1.0) < 0.05 and abs(e1 - 2.5) < 0.05
    assert abs(s2 - 4.0) < 0.05 and abs(e2 - 5.9) < 0.1
    assert abs(s3 - 8.0) < 0.05 and abs(e3 - 9.5) < 0.05


def test_segment_max_duration_split():
    e = np.full(3000, 10.0)  # 30s of continuous speech
    e[1500] = 1.0  # weakest point
    segs = segment_by_vad(
        e, VadOptions(vad_energy_threshold=5.0, vad_energy_mean_scale=0.0),
        SegmentationOptions(max_segment_sec=20.0, pad_sec=0.0),
    )
    assert len(segs) == 2
    # cut lands at the weak frame
    assert abs(segs[0][1] - 15.0) < 0.5


def test_decode_long_recording_e2e():
    """Concatenated yesno utterances with silence gaps: segmentation +
    batched decode recovers each utterance's words with sane timestamps."""
    from old_kaldi_git_tpu.decoder.csr import fst_to_csr
    from old_kaldi_git_tpu.decoder.graph import mkgraph
    from old_kaldi_git_tpu.fst.lang import make_unigram_grammar_fst
    from old_kaldi_git_tpu.recipes.decode import DecodeOptions
    from old_kaldi_git_tpu.recipes.mono import MonoTrainOptions, train_mono
    from old_kaldi_git_tpu.recipes.yesno import (
        SAMP_FREQ, compute_feats, make_corpus, make_lang,
    )
    from old_kaldi_git_tpu.tree.context_dep import monophone_context_dependency

    tw, tt, sw, st = make_corpus(20, 3)
    tf = compute_feats(tw)
    lang = make_lang()
    model, _ = train_mono(tf, tt, lang,
                          MonoTrainOptions(num_iters=8, totgauss=60))
    g = make_unigram_grammar_fst(list(tt.values()), lang.words)
    phones = lang.real_phone_ids
    topo = model.tm.topo
    cd = monophone_context_dependency(
        phones, {p: topo.num_pdf_classes(p) for p in phones}
    )
    csr = fst_to_csr(mkgraph(lang, g, cd, model.tm), model.tm.tid_to_pdf_array())

    keys = sorted(sw)
    rng = np.random.default_rng(0)

    def gap():
        # low-level noise, not digital zero: exact zeros give degenerate
        # log-energies that wreck CMVN at segment edges
        return (rng.normal(size=int(0.8 * SAMP_FREQ)) * 10).astype(np.float32)

    pieces = [gap()]
    for k in keys:
        pieces.extend([sw[k], gap()])
    long_wave = np.concatenate(pieces)

    results = decode_long_recording(
        model, csr, lang, long_wave, SAMP_FREQ, compute_feats,
        seg_opts=SegmentationOptions(min_silence_sec=0.4,
                                     min_segment_sec=0.3, pad_sec=0.1),
        decode_opts=DecodeOptions(beam=20.0, acoustic_scale=1.0),
    )
    assert len(results) == len(keys), results
    prev_end = 0.0
    for (s, e, words), k in zip(results, keys):
        assert s >= prev_end - 0.2 and e > s
        prev_end = e
        assert words == list(st[k]), (k, words, st[k])
