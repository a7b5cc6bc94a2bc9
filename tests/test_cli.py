"""CLI tool layer: a full Kaldi-style shell pipeline over ark files.

Covers the reference's binary-composition workflow (SURVEY §2 CLI rows):
features → model decode → lattices → determinize → rescore → best path →
WER, everything passed between processes as ark archives.
"""

import math
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(args, cwd, check=True):
    return subprocess.run(
        [sys.executable, "-m", "old_kaldi_git_tpu.bin"] + args,
        check=check, capture_output=True, text=True, cwd=str(cwd),
        env={**os.environ, "PYTHONPATH": REPO},
    )


def test_feature_tools_pipeline(tmp_path):
    from old_kaldi_git_tpu.utils.wav import write_wav

    t = np.arange(16000) / 16000.0
    for i, f0 in enumerate((220.0, 330.0)):
        sig = (4000 * np.sin(2 * math.pi * f0 * t)).astype(np.float32)
        write_wav(str(tmp_path / f"u{i}.wav"), sig, 16000.0)
    (tmp_path / "wav.scp").write_text(
        "".join(f"u{i} {tmp_path}/u{i}.wav\n" for i in range(2))
    )
    run(["compute-fbank-feats", "--dither=0.0", "scp:wav.scp", "ark:fb.ark"],
        tmp_path)
    run(["compute-spectrogram-feats", "--dither=0.0", "scp:wav.scp",
         "ark:spec.ark"], tmp_path)
    run(["compute-kaldi-pitch-feats", "scp:wav.scp", "ark:pitch.ark"], tmp_path)
    run(["process-kaldi-pitch-feats", "ark:pitch.ark", "ark:pitchf.ark"],
        tmp_path)
    run(["compute-mfcc-feats", "--dither=0.0", "scp:wav.scp", "ark:mfcc.ark"],
        tmp_path)
    run(["compute-vad", "ark:mfcc.ark", "ark:vad.ark"], tmp_path)
    run(["paste-feats", "ark:mfcc.ark", "ark:pitchf.ark", "ark:mp.ark"],
        tmp_path)
    run(["select-feats", "0-3", "ark:mp.ark", "ark:sel.ark"], tmp_path)
    run(["subsample-feats", "--n=3", "ark:sel.ark", "ark:sub.ark"], tmp_path)

    from old_kaldi_git_tpu.utils.table import read_table

    mp = read_table(f"ark:{tmp_path}/mp.ark", "mat")
    assert mp["u0"].shape[1] == 16  # 13 mfcc + 3 pitch
    sel = read_table(f"ark:{tmp_path}/sel.ark", "mat")
    assert sel["u0"].shape[1] == 4
    sub = read_table(f"ark:{tmp_path}/sub.ark", "mat")
    assert sub["u0"].shape[0] == (sel["u0"].shape[0] + 2) // 3
    # segments: cut 0.2-0.6 s
    (tmp_path / "segments").write_text("u0-a u0 0.2 0.6\n")
    run(["extract-segments", "scp:wav.scp", "segments", "ark:segs.ark"],
        tmp_path)
    segs = read_table(f"ark:{tmp_path}/segs.ark", "wav")
    assert abs(segs["u0-a"].duration - 0.4) < 0.01


def test_decode_lattice_cli_pipeline(tmp_path):
    """Train a tiny model in-process, then run the whole decode side via CLI."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from old_kaldi_git_tpu.decoder.graph import mkgraph
    from old_kaldi_git_tpu.fst.lang import make_unigram_grammar_fst
    from old_kaldi_git_tpu.recipes.mono import MonoTrainOptions, train_mono
    from old_kaldi_git_tpu.recipes.yesno import (
        compute_feats,
        make_corpus,
        make_lang,
    )
    from old_kaldi_git_tpu.tree.context_dep import monophone_context_dependency
    from old_kaldi_git_tpu.utils.table import TableWriter, read_table

    tw, tt, sw, st = make_corpus(20, 4)
    tf, sf = compute_feats(tw), compute_feats(sw)
    lang = make_lang()
    model, _ = train_mono(tf, tt, lang,
                          MonoTrainOptions(num_iters=8, totgauss=60))
    model.save(str(tmp_path / "final.mdl"))
    g = make_unigram_grammar_fst(list(tt.values()), lang.words)
    phones = lang.real_phone_ids
    topo = model.tm.topo
    cd = monophone_context_dependency(
        phones, {p: topo.num_pdf_classes(p) for p in phones}
    )
    hclg = mkgraph(lang, g, cd, model.tm)
    with open(tmp_path / "HCLG.fst", "wb") as f:
        hclg.write(f)
    lang.words.write(str(tmp_path / "words.txt"))
    with TableWriter(f"ark:{tmp_path}/feats.ark", "mat") as w:
        for k, f in sf.items():
            w[k] = f
    with TableWriter(f"ark:{tmp_path}/ref.ark", "text") as w:
        for k, words in st.items():
            w[k] = " ".join(words)

    run(["gmm-latgen-faster", "--beam=20", "--acoustic-scale=1.0",
         "--word-symbol-table=words.txt", "final.mdl", "HCLG.fst",
         "ark:feats.ark", "ark:lat.ark", "ark:hyp.ark"], tmp_path)
    out = run(["compute-wer", "ark:ref.ark", "ark:hyp.ark"], tmp_path)
    assert "%WER 0.00" in out.stdout, out.stdout

    # lattice ops compose over ark files
    run(["lattice-scale", "--acoustic-scale=1.0", "ark:lat.ark",
         "ark:lat2.ark"], tmp_path)
    run(["lattice-prune", "--beam=8", "--acoustic-scale=1.0", "ark:lat2.ark",
         "ark:latp.ark"], tmp_path)
    run(["lattice-best-path", "--acoustic-scale=1.0",
         "--word-symbol-table=words.txt", "ark:latp.ark", "ark:hyp2.ark",
         "ark:ali.ark"], tmp_path)
    out = run(["compute-wer", "ark:ref.ark", "ark:hyp2.ark"], tmp_path)
    assert "%WER 0.00" in out.stdout, out.stdout
    run(["lattice-determinize-pruned", "--beam=8", "--acoustic-scale=1.0",
         "ark:lat.ark", "ark:clat.ark"], tmp_path)
    run(["lattice-to-nbest", "--n=3", "--acoustic-scale=1.0", "ark:lat.ark",
         "ark:nbest.ark"], tmp_path)
    nb = read_table(f"ark:{tmp_path}/nbest.ark", "lat")
    assert any(k.endswith("-1") for k in nb)
    # nbest → linear tables → nbest round trip; -1 entries match best path
    run(["nbest-to-linear", "ark:nbest.ark", "ark:nb_ali.ark",
         "ark:nb_words.ark", "ark:nb_lm.ark", "ark:nb_ac.ark"], tmp_path)
    nb_words = read_table(f"ark:{tmp_path}/nb_words.ark", "text")
    run(["lattice-best-path", "--acoustic-scale=1.0", "ark:latp.ark",
         "ark:hyp2i.ark"], tmp_path)
    hyp2i = read_table(f"ark:{tmp_path}/hyp2i.ark", "text")
    for k, words in hyp2i.items():
        assert nb_words[k + "-1"] == words
    run(["linear-to-nbest", "ark:nb_ali.ark", "ark:nb_words.ark",
         "ark:nb_lm.ark", "ark:nb_ac.ark", "ark:nbest2.ark"], tmp_path)
    nb2 = read_table(f"ark:{tmp_path}/nbest2.ark", "lat")
    assert set(nb2) == set(nb)
    # combining a lattice with itself keeps the best path intact
    run(["lattice-combine", "--lat-weights=0.5:0.5", "ark:lat.ark",
         "ark:lat.ark", "ark:comb.ark"], tmp_path)
    run(["lattice-best-path", "--acoustic-scale=1.0", "ark:comb.ark",
         "ark:hyp3i.ark"], tmp_path)
    assert read_table(f"ark:{tmp_path}/hyp3i.ark", "text") == hyp2i

    # alignments have one tid per frame
    ali = read_table(f"ark:{tmp_path}/ali.ark", "ivec")
    k0 = sorted(sf)[0]
    assert len(ali[k0]) == sf[k0].shape[0]

    # --- second tool batch (lat_tools) over the same lattices ---
    # 1best == first nbest entry; copy round-trips
    run(["lattice-1best", "--acoustic-scale=1.0", "ark:lat.ark",
         "ark:best.ark"], tmp_path)
    run(["nbest-to-linear", "ark:best.ark", "ark:b_ali.ark", "ark:b_w.ark"],
        tmp_path)
    assert read_table(f"ark:{tmp_path}/b_w.ark", "text") == hyp2i
    run(["lattice-copy", "ark:lat.ark", "ark:latc.ark"], tmp_path)
    run(["lattice-best-path", "--acoustic-scale=1.0", "ark:latc.ark",
         "ark:hyp4i.ark"], tmp_path)
    assert read_table(f"ark:{tmp_path}/hyp4i.ark", "text") == hyp2i
    # rmali drops tids, best words unchanged
    run(["lattice-rmali", "ark:lat.ark", "ark:latr.ark"], tmp_path)
    run(["lattice-best-path", "--acoustic-scale=1.0", "ark:latr.ark",
         "ark:hyp5i.ark"], tmp_path)
    assert read_table(f"ark:{tmp_path}/hyp5i.ark", "text") == hyp2i
    # gmm-decode-faster gives the same words as the lattice best path
    run(["gmm-decode-faster", "--beam=20", "--acoustic-scale=1.0",
         "final.mdl", "HCLG.fst", "ark:feats.ark", "ark:hyp6i.ark",
         "ark:ali6.ark"], tmp_path)
    assert read_table(f"ark:{tmp_path}/hyp6i.ark", "text") == hyp2i
    # rescoring acoustics with the same model keeps the best path
    run(["gmm-rescore-lattice", "final.mdl", "ark:lat.ark", "ark:feats.ark",
         "ark:latg.ark"], tmp_path)
    run(["lattice-best-path", "--acoustic-scale=1.0", "ark:latg.ark",
         "ark:hyp7i.ark"], tmp_path)
    assert read_table(f"ark:{tmp_path}/hyp7i.ark", "text") == hyp2i
    run(["gmm-compute-likes", "final.mdl", "ark:feats.ark", "ark:ll.ark"],
        tmp_path)
    run(["lattice-rescore-mapped", "final.mdl", "ark:lat.ark", "ark:ll.ark",
         "ark:latm.ark"], tmp_path)
    run(["lattice-best-path", "--acoustic-scale=1.0", "ark:latm.ark",
         "ark:hyp8i.ark"], tmp_path)
    assert read_table(f"ark:{tmp_path}/hyp8i.ark", "text") == hyp2i
    # posteriors from lattices; frame posts sum to ≤ 1 + tol
    run(["lattice-to-post", "--acoustic-scale=1.0", "final.mdl",
         "ark:lat.ark", "ark:post.ark"], tmp_path)
    post = read_table(f"ark:{tmp_path}/post.ark", "post")
    assert post and all(
        sum(wt for _, wt in frame) < 1.01 for p in post.values() for frame in p
    )
    # determinize → push → minimize chain preserves key set
    run(["lattice-determinize", "ark:lat.ark", "ark:clat2.ark"], tmp_path)
    run(["lattice-push", "ark:clat2.ark", "ark:clat3.ark"], tmp_path)
    run(["lattice-minimize", "ark:clat3.ark", "ark:clat4.ark"], tmp_path)
    assert set(read_table(f"ark:{tmp_path}/clat4.ark", "clat")) == set(hyp2i)
    # boost-ali against own alignment leaves graph costs unchanged (0 errors)
    run(["lattice-boost-ali", "--b=1.0", "final.mdl", "ark:best.ark",
         "ark:b_ali.ark", "ark:latb.ark"], tmp_path)
    run(["nbest-to-linear", "ark:latb.ark", "ark:bb_ali.ark", "ark:bb_w.ark",
         "ark:bb_lm.ark", "ark:bb_ac.ark"], tmp_path)
    run(["nbest-to-linear", "ark:best.ark", "ark:b2_ali.ark", "ark:b2_w.ark",
         "ark:b2_lm.ark", "ark:b2_ac.ark"], tmp_path)
    assert (read_table(f"ark:{tmp_path}/bb_lm.ark", "text")
            == read_table(f"ark:{tmp_path}/b2_lm.ark", "text"))
    # word FSTs + add-penalty
    run(["lattice-to-fst", "--acoustic-scale=1.0", "ark:lat.ark",
         "ark:wfst.ark"], tmp_path)
    assert set(read_table(f"ark:{tmp_path}/wfst.ark", "fst")) == set(hyp2i)
    run(["lattice-add-penalty", "--word-ins-penalty=0.5", "ark:lat.ark",
         "ark:latpen.ark"], tmp_path)
    # word alignment + CTM need a lang dir with the lexicon
    lexdir = tmp_path / "langdir"
    lexdir.mkdir()
    from old_kaldi_git_tpu.recipes.yesno import WORD_PRONS

    (lexdir / "lexicon.txt").write_text(
        "".join(f"{w} {' '.join(p)}\n" for w, p in WORD_PRONS.items())
    )
    run(["lattice-align-words-lexicon", "--acoustic-scale=1.0",
         "langdir", "final.mdl", "ark:lat.ark", "ark:walign.ark"], tmp_path)
    wal = read_table(f"ark:{tmp_path}/walign.ark", "text")
    assert set(wal) == set(hyp2i)
    out = run(["lattice-to-ctm-conf", "--acoustic-scale=1.0", "final.mdl",
               "langdir", "ark:lat.ark", "-"], tmp_path)
    assert out.stdout.strip()


def test_misc_tool_batch(tmp_path):
    """vector/posterior/feat-info/fst/const-arpa tools."""
    from old_kaldi_git_tpu.utils.table import TableWriter, read_table

    with TableWriter(f"ark:{tmp_path}/v.ark", "vec") as w:
        w["a"] = np.array([1.0, 2.0], np.float32)
        w["b"] = np.array([3.0, 4.0], np.float32)
    run(["vector-scale", "--scale=2.0", "ark:v.ark", "ark:v2.ark"], tmp_path)
    v2 = read_table(f"ark:{tmp_path}/v2.ark", "vec")
    assert np.allclose(v2["a"], [2.0, 4.0])
    run(["vector-sum", "ark:v.ark", "ark:v2.ark", "ark:vs.ark"], tmp_path)
    assert np.allclose(read_table(f"ark:{tmp_path}/vs.ark", "vec")["b"],
                       [9.0, 12.0])
    run(["vector-sum", "--sum-all", "ark:v.ark", "tot.vec"], tmp_path)
    from old_kaldi_git_tpu.utils.io_funcs import init_kaldi_input_stream, read_vector

    with open(tmp_path / "tot.vec", "rb") as f:
        assert init_kaldi_input_stream(f)
        assert np.allclose(read_vector(f), [4.0, 6.0])

    import old_kaldi_git_tpu.hmm.posterior  # register "post" holder

    with TableWriter(f"ark:{tmp_path}/p.ark", "post") as w:
        w["a"] = [[(1, 0.5), (2, 0.5)], [(3, 1.0)]]
    run(["copy-post", "--scale=0.5", "ark:p.ark", "ark:p2.ark"], tmp_path)
    p2 = read_table(f"ark:{tmp_path}/p2.ark", "post")
    assert p2["a"][1][0][1] == pytest.approx(0.5)
    run(["sum-post", "ark:p.ark", "ark:p2.ark", "ark:ps.ark"], tmp_path)
    ps = read_table(f"ark:{tmp_path}/ps.ark", "post")
    assert dict(ps["a"][0])[1] == pytest.approx(0.75)
    run(["scale-post", "ark:p.ark", "2.0", "ark:p3.ark"], tmp_path)
    assert dict(read_table(f"ark:{tmp_path}/p3.ark", "post")["a"][0])[2] \
        == pytest.approx(1.0)

    with TableWriter(f"ark:{tmp_path}/m.ark", "mat") as w:
        w["a"] = np.zeros((7, 3), np.float32)
    run(["feat-to-len", "ark:m.ark", "ark:len.ark"], tmp_path)
    assert read_table(f"ark:{tmp_path}/len.ark", "text")["a"] == "7"
    out = run(["feat-to-dim", "ark:m.ark", "-"], tmp_path)
    assert out.stdout.strip() == "3"

    from old_kaldi_git_tpu.utils.wav import write_wav

    write_wav(str(tmp_path / "w.wav"), np.zeros(8000, np.float32), 16000.0)
    (tmp_path / "wav.scp").write_text(f"w {tmp_path}/w.wav\n")
    run(["wav-to-duration", "scp:wav.scp", "ark:dur.ark"], tmp_path)
    assert float(read_table(f"ark:{tmp_path}/dur.ark", "text")["w"]) \
        == pytest.approx(0.5)

    # fst extras: a stochastic one-state FST; equivalence with itself
    from old_kaldi_git_tpu.fst.vector_fst import Arc, VectorFst

    f = VectorFst()
    s = f.add_state()
    f.start = s
    f.finals[s] = -math.log(0.5)
    f.add_arc(s, Arc(1, 1, -math.log(0.5), s))
    with open(tmp_path / "a.fst", "wb") as fh:
        f.write(fh)
    assert run(["fstisstochastic", "a.fst"], tmp_path,
               check=False).returncode == 0
    assert run(["fstequivalent", "a.fst", "a.fst"], tmp_path,
               check=False).returncode == 0
    run(["fsttablecompose", "a.fst", "a.fst", "c.fst"], tmp_path)

    # const-arpa round trip through the CLI
    import tests.test_lattice as tl

    (tmp_path / "lm.arpa").write_text(tl.ARPA_TEXT)
    run(["arpa-to-const-arpa", "lm.arpa", "lm.carpa"], tmp_path)
    from old_kaldi_git_tpu.lm.arpa import load_lm, parse_arpa

    assert load_lm(str(tmp_path / "lm.carpa")).ngrams \
        == parse_arpa(tl.ARPA_TEXT).ngrams


def test_lattice_holder_roundtrip(tmp_path):
    import old_kaldi_git_tpu.lat  # registers holders
    from old_kaldi_git_tpu.lat.determinize import determinize_lattice
    from old_kaldi_git_tpu.utils.table import TableWriter, read_table
    from tests.test_determinize import all_paths, clat_paths, random_lattice

    rng = np.random.default_rng(0)
    lats = {f"u{i}": random_lattice(rng) for i in range(4)}
    # binary and text round-trips preserve all paths/costs
    for spec in (f"ark:{tmp_path}/l.ark", f"ark,t:{tmp_path}/l_t.ark"):
        with TableWriter(spec, "lat") as w:
            for k, lat in lats.items():
                w[k] = lat
        back = read_table(spec.split(":", 1)[0].replace(",t", "") + ":" +
                          spec.split(":", 1)[1], "lat")
        assert set(back) == set(lats)
        for k in lats:
            got, want = all_paths(back[k]), all_paths(lats[k])
            assert set(got) == set(want)
            for key in want:
                assert got[key][0] == pytest.approx(want[key][0], abs=1e-4)
    clats = {k: determinize_lattice(lat) for k, lat in lats.items()}
    with TableWriter(f"ark:{tmp_path}/c.ark", "clat") as w:
        for k, c in clats.items():
            w[k] = c
    back = read_table(f"ark:{tmp_path}/c.ark", "clat")
    for k in clats:
        got, want = clat_paths(back[k]), clat_paths(clats[k])
        assert set(got) == set(want)
        for key in want:
            assert got[key][0] == pytest.approx(want[key][0], abs=1e-4)
            assert got[key][1] == want[key][1]  # tid strings exact


def test_prepare_lang_and_mkgraph_cli(tmp_path):
    """prepare-lang → mkgraph → gmm-latgen-faster, all via CLI."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from old_kaldi_git_tpu.recipes.mono import MonoTrainOptions, train_mono
    from old_kaldi_git_tpu.recipes.yesno import (
        WORD_PRONS, compute_feats, make_corpus, make_lang,
    )
    from old_kaldi_git_tpu.utils.table import TableWriter

    # lexicon file
    with open(tmp_path / "lexicon.txt", "w") as f:
        for w, p in WORD_PRONS.items():
            f.write(f"{w} {' '.join(p)}\n")
    run(["prepare-lang", "lexicon.txt", "lang"], tmp_path)
    assert (tmp_path / "lang" / "words.txt").exists()
    assert (tmp_path / "lang" / "L.fst").exists()

    # unigram arpa over yes/no
    (tmp_path / "g.arpa").write_text(
        "\\data\\\nngram 1=4\n\\1-grams:\n-0.3 yes\n-0.4 no\n-0.5 </s>\n"
        "-99 <s>\n\\end\\\n"
    )
    tw, tt, sw, st = make_corpus(20, 4)
    tf, sf = compute_feats(tw), compute_feats(sw)
    lang = make_lang()
    model, _ = train_mono(tf, tt, lang,
                          MonoTrainOptions(num_iters=8, totgauss=60))
    model.save(str(tmp_path / "final.mdl"))
    run(["mkgraph", "lang", "g.arpa", "final.mdl", "graph"], tmp_path)
    assert (tmp_path / "graph" / "HCLG.fst").exists()

    with TableWriter(f"ark:{tmp_path}/feats.ark", "mat") as w:
        for k, f in sf.items():
            w[k] = f
    with TableWriter(f"ark:{tmp_path}/ref.ark", "text") as w:
        for k, words in st.items():
            w[k] = " ".join(words)
    run(["gmm-latgen-faster", "--beam=20", "--acoustic-scale=1.0",
         "--word-symbol-table=graph/words.txt", "final.mdl",
         "graph/HCLG.fst", "ark:feats.ark", "ark:lat.ark", "ark:hyp.ark"],
        tmp_path)
    out = run(["compute-wer", "ark:ref.ark", "ark:hyp.ark"], tmp_path)
    assert "%WER 0.00" in out.stdout, out.stdout


def test_online_wav_latgen_cli(tmp_path):
    """Streaming CLI decode: wav in, words out, endpointing active."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from old_kaldi_git_tpu.decoder.graph import mkgraph
    from old_kaldi_git_tpu.fst.lang import make_unigram_grammar_fst
    from old_kaldi_git_tpu.recipes.mono import MonoTrainOptions, train_mono
    from old_kaldi_git_tpu.recipes.yesno import (
        SAMP_FREQ, compute_feats, make_corpus, make_lang,
    )
    from old_kaldi_git_tpu.tree.context_dep import monophone_context_dependency
    from old_kaldi_git_tpu.utils.table import read_table
    from old_kaldi_git_tpu.utils.wav import write_wav

    from old_kaldi_git_tpu.feat.compute import MfccOptions
    from old_kaldi_git_tpu.online.streaming import OnlineFeaturePipeline

    tw, tt, sw, st = make_corpus(20, 3)
    # train on ONLINE-pipeline features (causal CMN): models meant for
    # streaming use are trained with the streaming feature convention,
    # exactly as the reference's online recipes do
    mo = MfccOptions()
    mo.frame_opts.samp_freq = SAMP_FREQ
    mo.frame_opts.dither = 0.0
    tf = {}
    for k, wav in tw.items():
        pipe = OnlineFeaturePipeline(mo)
        parts = [pipe.accept_waveform(wav), pipe.input_finished()]
        tf[k] = np.concatenate([p for p in parts if p.size])
    lang = make_lang()
    model, _ = train_mono(tf, tt, lang,
                          MonoTrainOptions(num_iters=8, totgauss=60))
    model.save(str(tmp_path / "final.mdl"))
    g = make_unigram_grammar_fst(list(tt.values()), lang.words)
    phones = lang.real_phone_ids
    topo = model.tm.topo
    cd = monophone_context_dependency(
        phones, {p: topo.num_pdf_classes(p) for p in phones}
    )
    with open(tmp_path / "HCLG.fst", "wb") as f:
        mkgraph(lang, g, cd, model.tm).write(f)
    lang.words.write(str(tmp_path / "words.txt"))
    for k, wav in sw.items():
        write_wav(str(tmp_path / f"{k}.wav"), wav, SAMP_FREQ)
    (tmp_path / "wav.scp").write_text(
        "".join(f"{k} {tmp_path}/{k}.wav\n" for k in sw)
    )
    out = run(["online-wav-gmm-latgen-faster", "--beam=20",
               "--acoustic-scale=1.0", f"--samp-freq={SAMP_FREQ}",
               f"--silence-phone-id={lang.silence_id}",
               "--word-symbol-table=words.txt", "final.mdl", "HCLG.fst",
               "scp:wav.scp", "ark:hyp.ark"], tmp_path)
    assert "overall RTF" in out.stdout
    hyps = read_table(f"ark:{tmp_path}/hyp.ark", "text")
    errs = sum(hyps[k].split() != list(st[k]) for k in st)
    assert errs == 0, (hyps, st)


def test_fst_cli_tools(tmp_path):
    """fstbin-style wrappers compose over fst files."""
    from old_kaldi_git_tpu.fst.vector_fst import Arc, VectorFst

    # a∘b: simple transducers
    a = VectorFst()
    s0, s1 = a.add_state(), a.add_state()
    a.set_start(s0)
    a.add_arc(s0, Arc(1, 2, 0.5, s1))
    a.add_arc(s0, Arc(1, 3, 1.5, s1))
    a.set_final(s1, 0.0)
    b = VectorFst()
    t0, t1 = b.add_state(), b.add_state()
    b.set_start(t0)
    b.add_arc(t0, Arc(2, 7, 0.25, t1))
    b.set_final(t1, 0.0)
    with open(tmp_path / "a.fst", "wb") as f:
        a.write(f)
    with open(tmp_path / "b.fst", "wb") as f:
        b.write(f)
    run(["fstcompose", "a.fst", "b.fst", "ab.fst"], tmp_path)
    out = run(["fstshortestpath", "ab.fst"], tmp_path)
    assert "cost 0.75" in out.stdout
    assert "olabels 7" in out.stdout
    run(["fstdeterminizestar", "ab.fst", "det.fst"], tmp_path)
    run(["fstminimizeencoded", "det.fst", "min.fst"], tmp_path)
    run(["fstpushspecial", "min.fst", "push.fst"], tmp_path)
    run(["fstproject", "--project-output=true", "push.fst", "proj.fst"],
        tmp_path)
    out = run(["fstinfo", "proj.fst"], tmp_path)
    assert "# of states" in out.stdout


def test_util_tool_batch(tmp_path):
    """data-dir utilities + info tools + est-pca."""
    # utt2spk <-> spk2utt round trip
    (tmp_path / "utt2spk").write_text("u1 spkA\nu2 spkA\nu3 spkB\n")
    run(["utt2spk-to-spk2utt", "utt2spk", "spk2utt"], tmp_path)
    assert (tmp_path / "spk2utt").read_text() == "spkA u1 u2\nspkB u3\n"
    run(["spk2utt-to-utt2spk", "spk2utt", "utt2spk2"], tmp_path)
    assert (tmp_path / "utt2spk2").read_text() == (tmp_path / "utt2spk").read_text()

    # data dir: create, validate, split
    from old_kaldi_git_tpu.utils.wav import write_wav

    ddir = tmp_path / "data"
    ddir.mkdir()
    for i in range(6):
        write_wav(str(tmp_path / f"u{i}.wav"), np.zeros(1600, np.float32),
                  16000.0)
    (ddir / "wav.scp").write_text(
        "".join(f"u{i} {tmp_path}/u{i}.wav\n" for i in range(6)))
    (ddir / "text").write_text("".join(f"u{i} yes no\n" for i in range(6)))
    (ddir / "utt2spk").write_text(
        "".join(f"u{i} spk{i % 3}\n" for i in range(6)))
    out = run(["validate-data-dir", "data"], tmp_path)
    assert "OK (6 utterances)" in out.stdout
    run(["split-data", "data", "2"], tmp_path)
    seen = []
    for i in (1, 2):
        sub = ddir / "split2" / str(i)
        assert (sub / "wav.scp").exists() and (sub / "spk2utt").exists()
        seen += [ln.split()[0] for ln in (sub / "text").read_text().splitlines()]
    assert sorted(seen) == [f"u{i}" for i in range(6)]

    # est-pca decorrelates correlated features
    from old_kaldi_git_tpu.utils.table import TableWriter

    rng = np.random.default_rng(0)
    base = rng.standard_normal((500, 2)).astype(np.float32)
    corr = np.concatenate([base, base @ np.array([[1, .5], [.5, 1]],
                                                 np.float32)], axis=1)
    with TableWriter(f"ark:{tmp_path}/pca_feats.ark", "mat") as w:
        w["a"] = corr
    run(["est-pca", "--dim=2", "--normalize-variance=true",
         "ark:pca_feats.ark", "pca.mat"], tmp_path)
    from old_kaldi_git_tpu.utils.io_funcs import (
        init_kaldi_input_stream,
        read_matrix,
    )

    with open(tmp_path / "pca.mat", "rb") as f:
        assert init_kaldi_input_stream(f)
        T = read_matrix(f)
    assert T.shape == (2, 5)  # affine column appended
    proj = corr @ T[:, :4].T + T[:, 4]
    cov = np.cov(proj.T)
    assert np.allclose(cov, np.eye(2), atol=0.15), cov

    # wav-copy round trip
    (tmp_path / "wav.scp").write_text(f"u0 {tmp_path}/u0.wav\n")
    run(["wav-copy", "scp:wav.scp", "ark:w2.ark"], tmp_path)


def test_fstcomposecontext_cli(tmp_path):
    from old_kaldi_git_tpu.fst.vector_fst import linear_fst

    lg = linear_fst([3, 4, 5])
    with open(tmp_path / "LG.fst", "wb") as f:
        lg.write(f)
    run(["fstcomposecontext", "--context-size=1", "--central-position=0",
         "ilabels.txt", "LG.fst", "CLG.fst"], tmp_path)
    lines = (tmp_path / "ilabels.txt").read_text().splitlines()
    assert lines[0] == ""  # eps entry
    assert {tuple(map(int, ln.split())) for ln in lines[1:]} == {
        (3,), (4,), (5,)}
    from old_kaldi_git_tpu.fst.vector_fst import VectorFst

    with open(tmp_path / "CLG.fst", "rb") as f:
        clg = VectorFst.read(f)
    assert clg.num_states == lg.num_states


def test_misc_tool_batch2(tmp_path):
    """modify-cmvn-stats, extract-feature-segments, show-alignments path."""
    from old_kaldi_git_tpu.utils.table import TableWriter, read_table

    # cmvn stats for 2 dims: dim 1 gets faked to mean0/var1
    rng = np.random.default_rng(0)
    f = (rng.standard_normal((50, 2)) * [2.0, 5.0] + [1.0, -3.0]).astype(
        np.float32)
    from old_kaldi_git_tpu.feat.cmvn import acc_cmvn_stats, cmvn_shift_scale

    with TableWriter(f"ark:{tmp_path}/cst.ark", "mat") as w:
        w["u"] = acc_cmvn_stats(f)
    run(["modify-cmvn-stats", "1", "ark:cst.ark", "ark:cst2.ark"], tmp_path)
    st2 = read_table(f"ark:{tmp_path}/cst2.ark", "mat")["u"]
    shift, scale = cmvn_shift_scale(st2, norm_vars=True)
    assert shift[1] == pytest.approx(0.0) and scale[1] == pytest.approx(1.0)
    assert shift[0] != pytest.approx(0.0)

    # feature segments by time
    with TableWriter(f"ark:{tmp_path}/ff.ark", "mat") as w:
        w["rec"] = np.arange(200, dtype=np.float32).reshape(100, 2)
    (tmp_path / "fsegs").write_text("s1 rec 0.10 0.30\ns2 rec 0.50 2.00\n")
    run(["extract-feature-segments", "ark:ff.ark", "fsegs", "ark:fs.ark"],
        tmp_path)
    fs = read_table(f"ark:{tmp_path}/fs.ark", "mat")
    assert fs["s1"].shape == (20, 2) and fs["s1"][0, 0] == 20.0
    assert fs["s2"].shape == (50, 2)  # clipped to matrix end


def test_make_grammar_fst_cli(tmp_path):
    """make-grammar-fst splices a sub-FST at a nonterminal arc."""
    from old_kaldi_git_tpu.fst.algorithms import shortest_path
    from old_kaldi_git_tpu.fst.vector_fst import VectorFst, linear_fst

    top = linear_fst([1, 100, 3])
    sub = linear_fst([2])
    with open(tmp_path / "top.fst", "wb") as f:
        top.write(f)
    with open(tmp_path / "sub.fst", "wb") as f:
        sub.write(f)
    run(["make-grammar-fst", "top.fst", "100", "sub.fst", "out.fst"],
        tmp_path)
    with open(tmp_path / "out.fst", "rb") as f:
        out = VectorFst.read(f)
    _, _, olabs = shortest_path(out)
    assert [o for o in olabs if o] == [1, 2, 3]


def test_small_tool_batch(tmp_path):
    """fstrand / subset-feats / feat-to-post / lattice-confidence."""
    from old_kaldi_git_tpu.fst.vector_fst import VectorFst
    from old_kaldi_git_tpu.lat.lattice import Lattice, LatticeArc
    from old_kaldi_git_tpu.utils.table import TableWriter, read_table

    run(["fstrand", "--num-states=8", "--num-arcs=14", "--srand=3",
         "r.fst"], tmp_path)
    with open(tmp_path / "r.fst", "rb") as f:
        fst = VectorFst.read(f)
    assert fst.num_states > 0

    rng = np.random.default_rng(0)
    with TableWriter(f"ark:{tmp_path}/f.ark", "mat") as w:
        for i in range(5):
            w[f"u{i}"] = rng.normal(size=(4, 6)).astype(np.float32)
    run(["subset-feats", "--n=2", "ark:f.ark", "ark:sub.ark"], tmp_path)
    assert sorted(read_table(f"ark:{tmp_path}/sub.ark", "mat")) == ["u0", "u1"]
    with open(tmp_path / "keep.txt", "w") as f:
        f.write("u3\nu4\n")
    run(["subset-feats", "--include=keep.txt", "ark:f.ark", "ark:inc.ark"],
        tmp_path)
    assert sorted(read_table(f"ark:{tmp_path}/inc.ark", "mat")) == ["u3", "u4"]

    run(["feat-to-post", "--top-n=2", "ark:f.ark", "ark:p.ark"], tmp_path)
    posts = read_table(f"ark:{tmp_path}/p.ark", "post")
    feats = read_table(f"ark:{tmp_path}/f.ark", "mat")
    for k, post in posts.items():
        m = np.asarray(feats[k])
        for t, frame in enumerate(post):
            assert len(frame) == 2
            got = {c for c, _ in frame}
            want = set(np.argsort(-m[t])[:2].tolist())
            assert got == want

    # two-alternative lattice: best path cost 0, second 1.5 → confidence 1.5
    lat = Lattice()
    s0, s1 = lat.add_state(), lat.add_state()
    lat.start = s0
    lat.arcs[s0].append(LatticeArc(1, 7, 0.0, 0.0, s1))
    lat.arcs[s0].append(LatticeArc(2, 8, 1.5, 0.0, s1))
    lat.finals[s1] = (0.0, 0.0)
    with TableWriter(f"ark:{tmp_path}/l.ark", "lat") as w:
        w["u0"] = lat
    run(["lattice-confidence", "ark:l.ark", "ark:c.ark"], tmp_path)
    conf = read_table(f"ark:{tmp_path}/c.ark", "flt")
    assert abs(conf["u0"] - 1.5) < 1e-4


def test_rnnlm_cli_train_and_rescore(tmp_path):
    """rnnlm-train on a toy corpus; lattice-lmrescore-rnnlm flips the best
    path toward the LM-favored word sequence."""
    from old_kaldi_git_tpu.lat.lattice import (
        Lattice,
        LatticeArc,
        lattice_best_path,
    )
    from old_kaldi_git_tpu.utils.table import TableWriter, read_table

    with open(tmp_path / "words.txt", "w") as f:
        f.write("<eps> 0\nalpha 1\nbeta 2\n")
    with TableWriter(f"ark:{tmp_path}/text.ark", "text") as w:
        for i in range(30):
            w[f"s{i}"] = "alpha alpha"  # the LM learns: alpha likely
    run(["rnnlm-train", "--num-epochs=20", "--embed-dim=8", "--cell-dim=16",
         "--recurrent-dim=8", "ark:text.ark", "words.txt", "toy.rnnlm"],
        tmp_path)

    # acoustics tie; old graph slightly prefers beta-beta
    lat = Lattice()
    s0, s1, s2 = (lat.add_state() for _ in range(3))
    lat.start = s0
    lat.arcs[s0].append(LatticeArc(1, 1, 0.3, 0.0, s1))
    lat.arcs[s0].append(LatticeArc(2, 2, 0.0, 0.0, s1))
    lat.arcs[s1].append(LatticeArc(1, 1, 0.3, 0.0, s2))
    lat.arcs[s1].append(LatticeArc(2, 2, 0.0, 0.0, s2))
    lat.finals[s2] = (0.0, 0.0)
    with TableWriter(f"ark:{tmp_path}/l.ark", "lat") as w:
        w["u0"] = lat
    words0, _, _ = lattice_best_path(lat)
    assert words0 == [2, 2]

    run(["lattice-lmrescore-rnnlm", "--rnnlm-scale=1.0", "--n=4",
         "toy.rnnlm", "ark:l.ark", "ark:resc.ark"], tmp_path)
    resc = read_table(f"ark:{tmp_path}/resc.ark", "lat")
    words1, _, _ = lattice_best_path(resc["u0"])
    assert words1 == [1, 1], words1


def test_utils_script_family(tmp_path):
    """sym2int / int2sym / apply-map / filter-scp / subset-data-dir /
    compute-wer-bootci."""
    from old_kaldi_git_tpu.utils.table import TableWriter

    with open(tmp_path / "words.txt", "w") as f:
        f.write("<eps> 0\nyes 1\nno 2\n<unk> 3\n")
    with open(tmp_path / "text", "w") as f:
        f.write("u1 yes no\nu2 no maybe\n")
    run(["sym2int", "--map-oov=<unk>", "words.txt", "text", "text.int"],
        tmp_path)
    lines = open(tmp_path / "text.int").read().splitlines()
    assert lines == ["u1 1 2", "u2 2 3"]
    run(["int2sym", "words.txt", "text.int", "text.sym"], tmp_path)
    assert open(tmp_path / "text.sym").read().splitlines() == [
        "u1 yes no", "u2 no <unk>"]
    # OOV without --map-oov fails
    r = run(["sym2int", "words.txt", "text", "x"], tmp_path, check=False)
    assert r.returncode != 0

    with open(tmp_path / "map.txt", "w") as f:
        f.write("yes YES\nno NO\n")
    run(["apply-map", "--permissive", "map.txt", "text", "text.map"],
        tmp_path)
    assert open(tmp_path / "text.map").read().splitlines() == [
        "u1 YES NO", "u2 NO maybe"]

    with open(tmp_path / "ids", "w") as f:
        f.write("u2\n")
    run(["filter-scp", "ids", "text", "text.f"], tmp_path)
    assert open(tmp_path / "text.f").read().splitlines() == ["u2 no maybe"]
    run(["filter-scp", "--exclude", "ids", "text", "text.e"], tmp_path)
    assert open(tmp_path / "text.e").read().splitlines() == ["u1 yes no"]

    # subset-data-dir
    d = tmp_path / "data"
    d.mkdir()
    for name, rows in (
        ("wav.scp", [f"u{i} /x/u{i}.wav" for i in range(6)]),
        ("text", [f"u{i} yes" for i in range(6)]),
        ("utt2spk", [f"u{i} s{i // 3}" for i in range(6)]),
    ):
        (d / name).write_text("\n".join(rows) + "\n")
    run(["subset-data-dir", "data", "2", "sub"], tmp_path)
    assert open(tmp_path / "sub/utt2spk").read().splitlines() == [
        "u0 s0", "u1 s0"]
    run(["subset-data-dir", "--per-spk", "data", "1", "persub"], tmp_path)
    assert open(tmp_path / "persub/utt2spk").read().splitlines() == [
        "u0 s0", "u3 s1"]

    with TableWriter(f"ark:{tmp_path}/ref.ark", "text") as w:
        for i in range(10):
            w[f"u{i}"] = "yes no yes no"
    with TableWriter(f"ark:{tmp_path}/hyp.ark", "text") as w:
        for i in range(10):
            w[f"u{i}"] = "yes no yes yes" if i < 5 else "yes no yes no"
    out = run(["compute-wer-bootci", "--replications=2000",
               "ark:ref.ark", "ark:hyp.ark"], tmp_path)
    assert "WER 12.50" in out.stdout
    import re

    m = re.search(r"\[ ([0-9.]+), ([0-9.]+) \]", out.stdout)
    lo, hi = float(m.group(1)), float(m.group(2))
    assert lo <= 12.5 <= hi and hi - lo > 0.1
