"""CLI GMM training pipeline: the train_mono.sh / train_deltas.sh binary
composition (SURVEY.md §3.2) driven end-to-end through ark files.

gmm-init-mono → compile-train-graphs → align-equal-compiled →
(gmm-acc-stats-ali → gmm-sum-accs → gmm-est → gmm-align-compiled)* →
mkgraph → gmm-latgen-faster → compute-wer 0.00, plus the tree-building and
transform-estimation tool chains.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(args, cwd, check=True):
    r = subprocess.run(
        [sys.executable, "-m", "old_kaldi_git_tpu.bin"] + args,
        check=False, capture_output=True, text=True, cwd=str(cwd),
        env={**os.environ, "PYTHONPATH": REPO},
    )
    if check and r.returncode != 0:
        raise AssertionError(
            f"{args[0]} failed rc={r.returncode}\n{r.stdout}\n{r.stderr}")
    return r


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from old_kaldi_git_tpu.recipes.yesno import (
        WORD_PRONS,
        compute_feats,
        make_corpus,
    )
    from old_kaldi_git_tpu.utils.table import TableWriter

    d = tmp_path_factory.mktemp("gmmcli")
    tw, tt, sw, st = make_corpus(31, 8)
    tf, sf = compute_feats(tw), compute_feats(sw)
    with TableWriter(f"ark:{d}/train.ark", "mat") as w:
        for k, f in tf.items():
            w[k] = f
    with TableWriter(f"ark:{d}/test.ark", "mat") as w:
        for k, f in sf.items():
            w[k] = f
    with TableWriter(f"ark:{d}/text.ark", "text") as w:
        for k, words in tt.items():
            w[k] = " ".join(words)
    with TableWriter(f"ark:{d}/ref.ark", "text") as w:
        for k, words in st.items():
            w[k] = " ".join(words)
    with open(d / "lexicon.txt", "w") as f:
        for word, prons in WORD_PRONS.items():
            f.write(f"{word} {' '.join(prons)}\n")
    # unigram ARPA estimated from the training transcripts (the same
    # distribution make_unigram_grammar_fst uses in the recipe)
    import math

    counts = {"yes": 0, "no": 0, "</s>": 0}
    for words in tt.values():
        for w in words:
            counts[w] += 1
        counts["</s>"] += 1
    total = sum(counts.values())
    with open(d / "arpa.lm", "w") as f:
        f.write(f"\n\\data\\\nngram 1={len(counts) + 1}\n\n\\1-grams:\n")
        for w, c in counts.items():
            f.write(f"{math.log10(c / total):.6f} {w}\n")
        f.write("-99 <s>\n\n\\end\\\n")
    run(["prepare-lang", "lexicon.txt", "lang"], d)
    return d, tf, sf, st


def test_gmm_cli_training_pipeline(corpus):
    d, tf, sf, st = corpus
    run(["gmm-init-mono", "lang", "ark:train.ark", "0.mdl", "mono.tree"], d)
    run(["compile-train-graphs", "mono.tree", "0.mdl", "lang",
         "ark:text.ark", "ark:gra.fsts"], d)
    run(["align-equal-compiled", "0.mdl", "ark:gra.fsts", "ark:train.ark",
         "ark:ali.0.ark"], d)

    # map-reduce stats: split utterances into two "jobs", sum the accs, and
    # check the reduced file matches a single-pass acc (P2 semantics)
    from old_kaldi_git_tpu.utils.table import read_table

    keys = sorted(tf)
    half = len(keys) // 2
    ali = read_table(f"ark:{d}/ali.0.ark", "ivec")
    from old_kaldi_git_tpu.utils.table import TableWriter

    for name, sel in (("a", keys[:half]), ("b", keys[half:])):
        with TableWriter(f"ark:{d}/ali.0.{name}.ark", "ivec") as w:
            for k in sel:
                w[k] = np.asarray(ali[k], np.int32)
    run(["gmm-acc-stats-ali", "0.mdl", "ark:train.ark",
         "ark:ali.0.a.ark", "0.a.acc"], d)
    run(["gmm-acc-stats-ali", "0.mdl", "ark:train.ark",
         "ark:ali.0.b.ark", "0.b.acc"], d)
    run(["gmm-sum-accs", "0.acc", "0.a.acc", "0.b.acc"], d)
    run(["gmm-acc-stats-ali", "0.mdl", "ark:train.ark", "ark:ali.0.ark",
         "0.ref.acc"], d)
    from old_kaldi_git_tpu.gmm.mle import read_accs

    with open(d / "0.acc", "rb") as f:
        summed, trans_sum = read_accs(f)
    with open(d / "0.ref.acc", "rb") as f:
        single, trans_single = read_accs(f)
    np.testing.assert_allclose(summed.occ, single.occ, rtol=1e-10)
    np.testing.assert_allclose(trans_sum, trans_single)

    run(["gmm-est", "--mix-up=30", "0.mdl", "0.acc", "1.mdl"], d)
    # iterate align / accumulate / re-estimate with a mixup schedule
    # (train_mono.sh's realign_iters + power-of-2-ish gaussian growth)
    mixup = [45, 60, 80, 100, 110, 120, 0, 0]
    cur = 1
    for it, mix in enumerate(mixup, start=1):
        run(["gmm-align-compiled", "--beam=200", f"{cur}.mdl", "ark:gra.fsts",
             "ark:train.ark", f"ark:ali.{cur}.ark"], d)
        run(["gmm-acc-stats-ali", f"{cur}.mdl", "ark:train.ark",
             f"ark:ali.{cur}.ark", f"{cur}.acc"], d)
        run(["gmm-est", f"--mix-up={mix}", f"{cur}.mdl", f"{cur}.acc",
             f"{cur + 1}.mdl"], d)
        cur += 1
    os.replace(d / f"{cur}.mdl", d / "final.mdl")
    os.replace(d / f"ali.{cur - 1}.ark", d / "ali.1.ark")

    # training likelihood is logged at each estimation
    r1 = run(["gmm-est", "--mix-up=0", f"{cur - 1}.mdl", f"{cur - 1}.acc",
              "tmp.mdl"], d)
    assert "avg like/frame" in r1.stderr

    # decode the held-out set through mkgraph + latgen
    run(["mkgraph", "lang", "arpa.lm", "final.mdl", "graph"], d)
    run(["gmm-latgen-faster", "--beam=24", "--acoustic-scale=0.1",
         "--word-symbol-table=graph/words.txt", "final.mdl",
         "graph/HCLG.fst", "ark:test.ark", "ark:lat.ark", "ark:hyp.ark"], d)
    out = run(["compute-wer", "ark:ref.ark", "ark:hyp.ark"], d)
    assert "%WER 0.00" in out.stdout, out.stdout + out.stderr


def test_tree_and_posterior_and_transform_tools(corpus):
    d, tf, sf, st = corpus
    assert (d / "final.mdl").exists(), "training pipeline test must run first"

    # tree building chain on the final alignments
    run(["acc-tree-stats", "final.mdl", "ark:train.ark", "ark:ali.1.ark",
         "tree.stats"], d)
    run(["sum-tree-stats", "tree.sum.stats", "tree.stats"], d)
    from old_kaldi_git_tpu.fst.lang import load_lang_dir

    lang = load_lang_dir(str(d / "lang"))
    phones = ":".join(str(p) for p in lang.real_phone_ids)
    run(["cluster-phones", "tree.sum.stats", phones, "questions.txt"], d)
    run(["build-tree", "--max-leaves=50", "--thresh=5",
         "--questions=questions.txt", "tree.sum.stats", "final.mdl",
         "tri.tree"], d)
    run(["gmm-init-model", "tri.tree", "tree.sum.stats", "final.mdl",
         "tri0.mdl"], d)
    run(["convert-ali", "final.mdl", "tri0.mdl", "tri.tree",
         "ark:ali.1.ark", "ark:ali.tri.ark"], d)
    from old_kaldi_git_tpu.utils.table import read_table

    ali_m = read_table(f"ark:{d}/ali.1.ark", "ivec")
    ali_t = read_table(f"ark:{d}/ali.tri.ark", "ivec")
    assert set(ali_m) == set(ali_t)
    for k in ali_m:
        assert len(ali_m[k]) == len(ali_t[k])
    # the converted alignment decodes to the same phone sequence
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
    from old_kaldi_git_tpu.hmm.hmm_utils import alignment_to_phones

    mono = AmGmmModel.load(str(d / "final.mdl"))
    tri = AmGmmModel.load(str(d / "tri0.mdl"))
    k0 = sorted(ali_m)[0]
    assert (alignment_to_phones(mono.tm, ali_m[k0])
            == alignment_to_phones(tri.tm, ali_t[k0]))

    # posterior chain: ali → post → weight silence → pdf post
    run(["ali-to-post", "ark:ali.1.ark", "ark:post.ark"], d)
    sil_id = lang.silence_id
    run(["weight-silence-post", "0.0", str(sil_id), "final.mdl",
         "ark:post.ark", "ark:wpost.ark"], d)
    run(["post-to-pdf-post", "final.mdl", "ark:wpost.ark",
         "ark:pdfpost.ark"], d)
    run(["post-to-weights", "ark:wpost.ark", "ark:pw.ark"], d)
    pw = read_table(f"ark:{d}/pw.ark", "vec")
    # silence frames got weight 0
    assert any(np.any(np.asarray(v) == 0.0) for v in pw.values())

    # LDA chain (on static feats, target dim 8)
    run(["acc-lda", "final.mdl", "ark:train.ark", "ark:pdfpost.ark",
         "lda.acc"], d)
    run(["est-lda", "--dim=8", "lda.acc", "lda.mat"], d)
    run(["transform-feats", "lda.mat", "ark:train.ark", "ark:ldafeats.ark"], d)
    ldaf = read_table(f"ark:{d}/ldafeats.ark", "mat")
    assert next(iter(ldaf.values())).shape[1] == 8

    # MLLT chain in the LDA space, mirroring train_lda_mllt.sh: build an
    # LDA-space single-Gaussian model from the mono alignments, then
    # estimate the square rotation there and compose it onto the LDA matrix
    run(["acc-tree-stats", "--context-width=1", "--central-position=0",
         "final.mdl", "ark:ldafeats.ark", "ark:ali.1.ark",
         "lda.tree.stats"], d)
    run(["gmm-init-model", "mono.tree", "lda.tree.stats", "final.mdl",
         "lda0.mdl"], d)
    run(["gmm-acc-mllt", "lda0.mdl", "ark:ldafeats.ark", "ark:pdfpost.ark",
         "mllt.acc"], d)
    run(["est-mllt", "mllt.acc", "mllt.mat"], d)
    run(["gmm-transform-means", "mllt.mat", "lda0.mdl", "mllt.mdl"], d)
    run(["compose-transforms", "mllt.mat", "lda.mat", "ldamllt.mat"], d)
    lm = read_table  # noqa: F841  (keep namespace tidy)
    from old_kaldi_git_tpu.utils import io_funcs as iof

    with open(d / "ldamllt.mat", "rb") as f:
        iof.init_kaldi_input_stream(f)
        composed = iof.read_matrix(f)
    assert composed.shape == (8, next(iter(tf.values())).shape[1])

    # fMLLR per utterance (min-count low for the tiny corpus)
    run(["gmm-est-fmllr", "--fmllr-min-count=10", "final.mdl",
         "ark:train.ark", "ark:wpost.ark", "ark:fmllr.ark"], d)
    trans = read_table(f"ark:{d}/fmllr.ark", "mat")
    assert trans
    D = next(iter(tf.values())).shape[1]
    for m in trans.values():
        assert m.shape == (D, D + 1)
    run(["transform-feats", f"ark:{d}/fmllr.ark", "ark:train.ark",
         "ark:fmllrfeats.ark"], d)

    # misc utilities
    run(["copy-int-vector", "ark:ali.1.ark", "ark:ali.copy.ark"], d)
    run(["copy-matrix", "--scale=2.0", "ark:train.ark", "ark:t2.ark"], d)
    t2 = read_table(f"ark:{d}/t2.ark", "mat")
    np.testing.assert_allclose(t2[k0], np.asarray(tf[k0]) * 2.0, rtol=1e-5)
    out = run(["show-transitions", "lang/phones.txt", "final.mdl"], d)
    assert "Transition-state" in out.stdout
    run(["align-text", "ark:ref.ark", "ark:ref.ark", "ark:at.ark"], d)
    at = read_table(f"ark:{d}/at.ark", "text")
    assert all("<eps>" not in v for v in at.values())


def test_gmm_boost_silence(corpus):
    d, tf, sf, st = corpus
    assert (d / "final.mdl").exists()
    from old_kaldi_git_tpu.fst.lang import load_lang_dir
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel

    lang = load_lang_dir(str(d / "lang"))
    run(["gmm-boost-silence", "--boost=1.5", str(lang.silence_id),
         "final.mdl", "boosted.mdl"], d)
    base = AmGmmModel.load(str(d / "final.mdl"))
    boosted = AmGmmModel.load(str(d / "boosted.mdl"))
    tm = base.tm
    sil_pdfs = {tm.tid_to_pdf(t) for t in range(1, tm.num_tids + 1)
                if tm.tid_to_phone(t) == lang.silence_id}
    x = np.ones((1, base.am.dim))
    for pdf in range(base.am.num_pdfs):
        delta = (boosted.am.pdfs[pdf].loglikes(x)[0]
                 - base.am.pdfs[pdf].loglikes(x)[0])
        if pdf in sil_pdfs:
            assert abs(delta - np.log(1.5)) < 1e-6
        else:
            assert abs(delta) < 1e-9


def test_gmm_acc_stats_posterior_equals_ali(corpus):
    """gmm-acc-stats over ali-to-post posteriors == gmm-acc-stats-ali
    (soft counts with weight 1.0 are the hard counts)."""
    d, tf, sf, st = corpus
    run(["gmm-init-mono", "lang", "ark:train.ark", "p0.mdl", "p.tree"], d)
    run(["compile-train-graphs", "p.tree", "p0.mdl", "lang",
         "ark:text.ark", "ark:pgra.fsts"], d)
    run(["align-equal-compiled", "p0.mdl", "ark:pgra.fsts", "ark:train.ark",
         "ark:pali.ark"], d)
    run(["gmm-acc-stats-ali", "p0.mdl", "ark:train.ark", "ark:pali.ark",
         "p.hard.acc"], d)
    run(["ali-to-post", "ark:pali.ark", "ark:ppost.ark"], d)
    run(["gmm-acc-stats", "p0.mdl", "ark:train.ark", "ark:ppost.ark",
         "p.soft.acc"], d)
    from old_kaldi_git_tpu.gmm.mle import read_accs

    with open(d / "p.hard.acc", "rb") as f:
        hard, t_hard = read_accs(f)
    with open(d / "p.soft.acc", "rb") as f:
        soft, t_soft = read_accs(f)
    np.testing.assert_allclose(soft.occ, hard.occ, rtol=1e-8)
    np.testing.assert_allclose(soft.mean_acc, hard.mean_acc, rtol=1e-8)
    np.testing.assert_allclose(t_soft, t_hard)
    # weight-silence-post composes: zero silence weight shrinks occupancy
    run(["weight-silence-post", "0.0", "1", "p0.mdl",
         "ark:ppost.ark", "ark:ppost0.ark"], d)
    run(["gmm-acc-stats", "p0.mdl", "ark:train.ark", "ark:ppost0.ark",
         "p.nosil.acc"], d)
    with open(d / "p.nosil.acc", "rb") as f:
        nosil, _ = read_accs(f)
    assert nosil.occ.sum() < hard.occ.sum()


def test_gpost_and_basis_fmllr_cli(corpus):
    """gmm-post-to-gpost → gmm-est-fmllr-gpost matches gmm-est-fmllr, and
    the basis chain (gmm-basis-fmllr-training → gmm-est-basis-fmllr)
    produces valid transforms from the same stats."""
    d, tf, sf, st = corpus
    assert (d / "final.mdl").exists()
    if not (d / "wpost.ark").exists():
        pytest.skip("transform-tools test must run first")
    from old_kaldi_git_tpu.utils.table import read_table

    run(["gmm-post-to-gpost", "final.mdl", "ark:train.ark",
         "ark:wpost.ark", "ark:gpost.ark"], d)
    run(["gmm-est-fmllr-gpost", "--fmllr-min-count=10", "final.mdl",
         "ark:train.ark", "ark:gpost.ark", "ark:fmllr.gpost.ark"], d)
    via_post = read_table(f"ark:{d}/fmllr.ark", "mat")
    via_gpost = read_table(f"ark:{d}/fmllr.gpost.ark", "mat")
    assert set(via_post) == set(via_gpost)
    # the gpost ark quantizes responsibilities to f32, and the iterative
    # row solve amplifies that on near-zero elements — compare transforms
    # loosely element-wise and tightly on what matters: the transformed
    # features themselves
    feats = read_table(f"ark:{d}/train.ark", "mat")
    from old_kaldi_git_tpu.transform.fmllr import apply_affine_transform

    for k in via_post:
        np.testing.assert_allclose(
            via_gpost[k], via_post[k], rtol=0.02, atol=0.5)
        x = np.asarray(feats[k], np.float64)
        ya = apply_affine_transform(x, np.asarray(via_post[k], np.float64))
        yb = apply_affine_transform(x, np.asarray(via_gpost[k], np.float64))
        rms = np.sqrt(np.mean((ya - yb) ** 2)) / (np.std(ya) + 1e-8)
        assert rms < 0.02

    run(["gmm-basis-fmllr-training", "final.mdl", "ark:train.ark",
         "ark:wpost.ark", "fmllr.basis"], d)
    run(["gmm-est-basis-fmllr", "--fmllr-min-count=5", "final.mdl",
         "fmllr.basis", "ark:train.ark", "ark:wpost.ark",
         "ark:basisfmllr.ark"], d)
    basis_trans = read_table(f"ark:{d}/basisfmllr.ark", "mat")
    assert basis_trans
    D = next(iter(tf.values())).shape[1]
    for m in basis_trans.values():
        assert m.shape == (D, D + 1)
        assert np.isfinite(m).all()


def test_latbin_fstbin_extra_tools(corpus):
    """lattice-interp / lattice-align-words (word-boundary) /
    phone-align-lattice / fstaddselfloops / draw-tree / analyze-counts."""
    d, tf, sf, st = corpus
    if not (d / "lat.ark").exists():
        pytest.skip("training pipeline test must run first")
    from old_kaldi_git_tpu.fst.lang import load_lang_dir
    from old_kaldi_git_tpu.lat.lattice import lattice_best_path
    from old_kaldi_git_tpu.utils.table import read_table

    # interp of a lattice with itself keeps the best path and (with
    # alpha=1 vs 0.5) scales the graph side consistently
    run(["lattice-interp", "--alpha=0.5", "ark:lat.ark", "ark:lat.ark",
         "ark:lat_i.ark"], d)
    lats = read_table(f"ark:{d}/lat.ark", "lat")
    lats_i = read_table(f"ark:{d}/lat_i.ark", "lat")
    assert set(lats_i) == set(lats)
    for k in lats:
        w0, _t0, _c0 = lattice_best_path(lats[k], 1.0, 0.1)
        w1, _t1, _c1 = lattice_best_path(lats_i[k], 1.0, 0.1)
        assert w0 == w1

    # word-boundary map for the yesno lexicon: multi-phone prons get
    # begin/internal/end marks, silence is nonword
    lang = load_lang_dir(str(d / "lang"))
    lines = [f"{lang.silence_id} nonword"]
    for w_str, _prob, pron in lang.lexicon.entries:
        pids = [lang.phones[p] for p in pron]
        if len(pids) == 1:
            lines.append(f"{pids[0]} singleton")
        else:
            lines.append(f"{pids[0]} begin")
            for p in pids[1:-1]:
                lines.append(f"{p} internal")
            lines.append(f"{pids[-1]} end")
    (d / "word_boundary.int").write_text("\n".join(dict.fromkeys(lines)) + "\n")
    run(["lattice-align-words", "word_boundary.int", "final.mdl",
         "ark:lat.ark", "ark:wb_align.ark"], d)
    wb = read_table(f"ark:{d}/wb_align.ark", "text")
    hyps = read_table(f"ark:{d}/hyp.ark", "text")
    assert set(wb) == set(lats)
    for k, v in wb.items():
        n_words = len([seg for seg in v.split(";") if seg.strip()])
        assert n_words == len(hyps[k].split())

    # agreement with the lexicon-based aligner on words and times
    run(["lattice-align-words-lexicon", "lang", "final.mdl", "ark:lat.ark",
         "ark:lex_align.ark"], d)
    lex = read_table(f"ark:{d}/lex_align.ark", "text")
    for k in wb:
        assert wb[k] == lex[k], (k, wb[k], lex[k])

    # phone alignment covers every frame
    run(["phone-align-lattice", "final.mdl", "ark:lat.ark",
         "ark:ph_align.ark"], d)
    ph = read_table(f"ark:{d}/ph_align.ark", "text")
    feats = read_table(f"ark:{d}/test.ark", "mat")
    for k, v in ph.items():
        tot = sum(int(seg.split()[2]) for seg in v.split(";") if seg.strip())
        assert tot == feats[k].shape[0]

    # fstaddselfloops on a tiny FST
    from old_kaldi_git_tpu.fst.vector_fst import Arc, VectorFst

    fst = VectorFst()
    s0, s1, s2 = fst.add_state(), fst.add_state(), fst.add_state()
    fst.set_start(s0)
    fst.add_arc(s0, Arc(5, 7, 0.5, s1))   # word-emitting state s0
    fst.add_arc(s1, Arc(6, 0, 0.2, s2))   # eps-output state s1
    fst.set_final(s2, 0.0)
    with open(d / "loops_in.fst", "wb") as f:
        fst.write(f)
    (d / "dis_in.txt").write_text("100\n")
    (d / "dis_out.txt").write_text("200\n")
    run(["fstaddselfloops", "dis_in.txt", "dis_out.txt", "loops_in.fst",
         "loops_out.fst"], d)
    with open(d / "loops_out.fst", "rb") as f:
        out = VectorFst.read(f)
    loops = {s: [(a.ilabel, a.olabel) for a in out.arcs[s]
                 if a.nextstate == s] for s in out.states()}
    assert (100, 200) in loops[s0]      # emits a word
    assert (100, 200) in loops[s2]      # final
    assert (100, 200) not in loops[s1]  # neither

    # draw-tree emits graphviz
    out = run(["draw-tree", "lang/phones.txt", "mono.tree"], d)
    assert out.stdout.startswith("digraph tree {")
    assert "pdf " in out.stdout

    # analyze-counts totals equal total frames
    out = run(["analyze-counts", "ark:ali.1.ark", "-"], d)
    counts = [int(x) for x in out.stdout.strip().strip("[]").split()]
    total_frames = sum(f.shape[0] for f in tf.values())
    assert sum(counts) == total_frames


def test_lvtln_cli_chain(corpus):
    """gmm-init-lvtln → gmm-train-lvtln-special → gmm-est-lvtln-trans picks
    the class matching a known feature distortion."""
    d, tf, sf, st = corpus
    if not (d / "wpost.ark").exists():
        pytest.skip("transform-tools test must run first")
    from old_kaldi_git_tpu.utils.table import TableWriter, read_table

    D = next(iter(tf.values())).shape[1]
    run(["gmm-init-lvtln", f"--dim={D}", "--num-classes=3",
         "--min-warp=0.9", "--max-warp=1.1", "0.lvtln"], d)
    rng = np.random.default_rng(9)
    dist = np.eye(D) + 0.25 * rng.normal(size=(D, D)) / np.sqrt(D)
    feats = read_table(f"ark:{d}/train.ark", "mat")
    with TableWriter(f"ark:{d}/train_warped.ark", "mat") as w:
        for k, f in feats.items():
            w[k] = (np.asarray(f) @ dist.T).astype(np.float32)
    # a second, different distortion for class 0 so every class is trained
    # (untrained classes stay identity and would tie with class 1)
    dist0 = np.eye(D) + 0.25 * rng.normal(size=(D, D)) / np.sqrt(D)
    with TableWriter(f"ark:{d}/train_warped0.ark", "mat") as w:
        for k, f in feats.items():
            w[k] = (np.asarray(f) @ dist0.T).astype(np.float32)
    # class 2 learns to undo dist; class 0 undoes dist0; class 1 = identity
    run(["gmm-train-lvtln-special", "2", "0.lvtln", "1a.lvtln",
         "ark:train.ark", "ark:train_warped.ark"], d)
    run(["gmm-train-lvtln-special", "0", "1a.lvtln", "1.lvtln",
         "ark:train.ark", "ark:train_warped0.ark"], d)
    run(["gmm-est-lvtln-trans", "final.mdl", "1.lvtln",
         "ark:train_warped.ark", "ark:wpost.ark", "ark:lvtln_trans.ark",
         "ark:lvtln_warp.ark"], d)
    warps = read_table(f"ark:{d}/lvtln_warp.ark", "text")
    assert warps
    frac = np.mean([float(v) == 1.1 for v in warps.values()])
    assert frac > 0.8, warps  # distorted speakers pick the trained class
    trans = read_table(f"ark:{d}/lvtln_trans.ark", "mat")
    for m in trans.values():
        assert m.shape == (D, D + 1) and np.isfinite(m).all()
    # undistorted features pick the identity class (warp 1.0)
    run(["gmm-est-lvtln-trans", "final.mdl", "1.lvtln", "ark:train.ark",
         "ark:wpost.ark", "ark:id_trans.ark", "ark:id_warp.ark"], d)
    id_warps = read_table(f"ark:{d}/id_warp.ark", "text")
    frac_id = np.mean([float(v) == 1.0 for v in id_warps.values()])
    assert frac_id > 0.8, id_warps


def test_regtree_cli_chain(corpus):
    """gmm-make-regtree → gmm-est-regtree-{fmllr,mllr} → regtree decode:
    transforms estimated on clean data keep the decode at the baseline
    transcript (near-identity adaptation must not hurt)."""
    d, tf, sf, st = corpus
    if not (d / "wpost.ark").exists() or not (d / "graph").exists():
        pytest.skip("training pipeline + transform tests must run first")
    from old_kaldi_git_tpu.utils.table import read_table

    run(["gmm-make-regtree", "--max-leaves=4", "final.mdl", "regtree"], d)
    from old_kaldi_git_tpu.transform.regtree import RegressionTree

    tree = RegressionTree.load(str(d / "regtree"))
    assert 1 <= tree.num_baseclasses <= 4

    for kind in ("fmllr", "mllr"):
        run([f"gmm-est-regtree-{kind}", "--min-count=100", "final.mdl",
             "regtree", "ark:train.ark", "ark:wpost.ark",
             f"ark:regtree_{kind}.ark"], d)
        xfs = read_table(f"ark:{d}/regtree_{kind}.ark", "regx")
        assert xfs and all(x.kind == kind for x in xfs.values())
        run([f"gmm-decode-faster-regtree-{kind}",
             "--word-symbol-table=graph/words.txt", "final.mdl", "regtree",
             "graph/HCLG.fst", "ark:test.ark", f"ark:regtree_{kind}.ark",
             f"ark:hyp_regtree_{kind}.ark"], d)
        hyp = read_table(f"ark:{d}/hyp_regtree_{kind}.ark", "text")
        assert len(hyp) == len(st)
        errs = sum(h.split() != list(st[k]) for k, h in hyp.items())
        assert errs <= max(1, len(st) // 4), (kind, hyp, st)


def test_mpe_post_and_fmpe_cli_chain(corpus):
    """lattice-to-mpe-post (per-frame signed mass sums to ~0) →
    fmpe-init → gmm-fmpe-acc-stats → fmpe-est → fmpe-apply-transform."""
    d, tf, sf, st = corpus
    if not (d / "final.mdl").exists() or not (d / "ali.1.ark").exists():
        pytest.skip("training pipeline test must run first")
    from old_kaldi_git_tpu.utils.table import read_table

    # lattices on the TRAIN set so ali.1.ark is the numerator
    run(["gmm-latgen-faster", "--beam=24", "--acoustic-scale=0.1",
         "final.mdl", "graph/HCLG.fst", "ark:train.ark",
         "ark:trainlat.ark", "ark:trainhyp.ark"], d)
    run(["lattice-to-mpe-post", "--acoustic-scale=0.1", "final.mdl",
         "ark:ali.1.ark", "ark:trainlat.ark", "ark:mpe_post.ark"], d)
    posts = read_table(f"ark:{d}/mpe_post.ark", "post")
    assert posts
    for key, post in posts.items():
        for frame in post:
            s = sum(w for _, w in frame)
            assert abs(s) < 1e-3, (key, s)

    run(["gmm-global-init-from-feats", "--num-gauss=16", "--num-iters=5",
         "ark:train.ark", "fmpe.ubm"], d)
    run(["fmpe-init", "--num-gselect=5", "fmpe.ubm", "0.fmpe"], d)
    run(["gmm-fmpe-acc-stats", "final.mdl", "0.fmpe", "ark:train.ark",
         "ark:mpe_post.ark", "fmpe.accs"], d)
    r = run(["fmpe-est", "--learning-rate=0.05", "0.fmpe", "fmpe.accs",
             "1.fmpe"], d)
    assert "mean |step|" in r.stderr
    run(["fmpe-apply-transform", "1.fmpe", "ark:train.ark",
         "ark:fmpe_feats.ark"], d)
    out = read_table(f"ark:{d}/fmpe_feats.ark", "mat")
    assert set(out) == set(tf)
    moved = 0
    for k in out:
        a, b = np.asarray(out[k]), np.asarray(tf[k])
        assert a.shape == b.shape and np.isfinite(a).all()
        moved += float(np.abs(a - b).mean())
    assert moved > 0  # the update actually produced nonzero offsets

    # indirect differential leg: gmm-get-stats-deriv + --model-derivs
    run(["gmm-get-stats-deriv", "final.mdl", "1.fmpe", "ark:train.ark",
         "ark:mpe_post.ark", "ark:ali.1.ark", "fmpe.dstats"], d)
    run(["gmm-fmpe-acc-stats", "--model-derivs=fmpe.dstats",
         "--ali=ark:ali.1.ark", "final.mdl", "1.fmpe", "ark:train.ark",
         "ark:mpe_post.ark", "fmpe.accs2"], d)
    r = run(["fmpe-est", "--learning-rate=0.05", "1.fmpe", "fmpe.accs2",
             "2.fmpe"], d)
    assert "mean |step|" in r.stderr
    from old_kaldi_git_tpu.transform.fmpe import FmpeAccs

    direct_only = FmpeAccs.load(str(d / "fmpe.accs"))
    both = FmpeAccs.load(str(d / "fmpe.accs2"))
    # the indirect term changes the accumulated gradient
    assert float(np.abs((both.pos - both.neg)
                        - (direct_only.pos - direct_only.neg)).sum()) > 0


def test_sgmm2_cli_chain(corpus):
    """sgmm2-init → (acc-stats-ali → est, alternating flags, with a split
    and a realign) → sgmm2-latgen-faster: WER 0.00 on yesno."""
    d, tf, sf, st = corpus
    if not (d / "final.mdl").exists() or not (d / "graph").exists():
        pytest.skip("training pipeline test must run first")

    run(["gmm-global-init-from-feats", "--num-gauss=12", "--num-iters=6",
         "ark:train.ark", "sgmm.ubm"], d)
    run(["gmm-global-to-fgmm", "sgmm.ubm", "sgmm.fubm"], d)
    run(["sgmm2-init", "final.mdl", "sgmm.fubm", "sgmm.0.mdl"], d)
    r = run(["sgmm2-info", "sgmm.0.mdl"], d)
    assert "number of pdfs" in r.stdout

    cur, ali = "sgmm.0.mdl", "ark:ali.1.ark"
    for it in range(4):
        flags = "vwc" if it % 2 == 0 else "MS"
        split = ["--split-substates=60"] if it == 2 else []
        run(["sgmm2-acc-stats-ali", cur, "ark:train.ark", ali,
             f"sgmm.{it}.accs"], d)
        run(["sgmm2-est", f"--update-flags={flags}", *split, cur,
             f"sgmm.{it}.accs", f"sgmm.{it + 1}.mdl"], d)
        cur = f"sgmm.{it + 1}.mdl"
        if it == 1:
            run(["sgmm2-align-compiled", "--beam=200", cur, "ark:gra.fsts",
                 "ark:train.ark", "ark:sgmm.ali.ark"], d)
            ali = "ark:sgmm.ali.ark"

    # map-reduce equivalence: two half-corpus accs summed == whole-corpus
    # acc (the ali.0.{a,b} splits come from the pipeline test)
    run(["sgmm2-acc-stats-ali", cur, "ark:train.ark", "ark:ali.0.a.ark",
         "sgmm.a.accs"], d)
    run(["sgmm2-acc-stats-ali", cur, "ark:train.ark", "ark:ali.0.b.ark",
         "sgmm.b.accs"], d)
    run(["sgmm2-sum-accs", cur, "sgmm.sum.accs", "sgmm.a.accs",
         "sgmm.b.accs"], d)
    run(["sgmm2-acc-stats-ali", cur, "ark:train.ark", "ark:ali.0.ark",
         "sgmm.whole.accs"], d)
    from old_kaldi_git_tpu.gmm.sgmm2 import MleAmSgmm2Accs, Sgmm2Model

    sm = Sgmm2Model.load(str(d / cur))
    summed = MleAmSgmm2Accs.load(str(d / "sgmm.sum.accs"), sm.sgmm)
    whole = MleAmSgmm2Accs.load(str(d / "sgmm.whole.accs"), sm.sgmm)
    np.testing.assert_allclose(summed.Y, whole.Y, rtol=1e-6, atol=1e-8)
    assert summed.total_frames == pytest.approx(whole.total_frames)

    run(["sgmm2-latgen-faster", "--beam=24", "--acoustic-scale=0.1",
         "--word-symbol-table=graph/words.txt", cur, "graph/HCLG.fst",
         "ark:test.ark", "ark:sgmm_lat.ark", "ark:sgmm_hyp.ark"], d)
    out = run(["compute-wer", "ark:ref.ark", "ark:sgmm_hyp.ark"], d)
    assert "%WER 0.00" in out.stdout, out.stdout + out.stderr


def test_sgmm2_spkvecs_cli(corpus):
    """Speaker-subspace leg: sgmm2-init --spk-space-dim → EM →
    sgmm2-est-spkvecs → acc --spk-vecs → est --update-flags=N →
    speaker-adapted sgmm2-latgen-faster --spk-vecs keeps WER 0.00."""
    d, tf, sf, st = corpus
    if not (d / "sgmm.fubm").exists() or not (d / "graph").exists():
        pytest.skip("sgmm2 chain test must run first")

    run(["sgmm2-init", "--spk-space-dim=3", "final.mdl", "sgmm.fubm",
         "spk.0.mdl"], d)
    r = run(["sgmm2-info", "spk.0.mdl"], d)
    assert "speaker-space dimension 3" in r.stdout
    cur = "spk.0.mdl"
    for it in range(2):
        flags = "vwc" if it % 2 == 0 else "MS"
        run(["sgmm2-acc-stats-ali", cur, "ark:train.ark", "ark:ali.1.ark",
             f"spk.{it}.accs"], d)
        run(["sgmm2-est", f"--update-flags={flags}", cur,
             f"spk.{it}.accs", f"spk.{it + 1}.mdl"], d)
        cur = f"spk.{it + 1}.mdl"
    # per-utterance "speakers" (no utt2spk): estimate vectors on train
    run(["sgmm2-est-spkvecs", cur, "ark:train.ark", "ark:ali.1.ark",
         "ark:spkvecs.ark"], d)
    from old_kaldi_git_tpu.utils.table import read_table

    vecs = read_table(f"ark:{d}/spkvecs.ark", "vec")
    assert vecs and all(np.asarray(v).shape == (3,) for v in vecs.values())
    # re-accumulate WITH the vectors and update the speaker projections
    run(["sgmm2-acc-stats-ali", "--spk-vecs=ark:spkvecs.ark", cur,
         "ark:train.ark", "ark:ali.1.ark", "spk.N.accs"], d)
    run(["sgmm2-est", "--update-flags=N", cur, "spk.N.accs",
         "spk.final.mdl"], d)
    # adapted decode of the training utterances (per-utt vectors) stays
    # at WER 0.00 against the training transcripts
    run(["sgmm2-latgen-faster", "--beam=24", "--acoustic-scale=0.1",
         "--word-symbol-table=graph/words.txt", "--spk-vecs=ark:spkvecs.ark",
         "spk.final.mdl", "graph/HCLG.fst", "ark:train.ark",
         "ark:spk_lat.ark", "ark:spk_hyp.ark"], d)
    out = run(["compute-wer", "ark:text.ark", "ark:spk_hyp.ark"], d)
    assert "%WER 0.00" in out.stdout, out.stdout + out.stderr


def test_sgmm2_symmetric_cli(corpus):
    """Symmetric-SGMM leg: sgmm2-init --symmetric → EM → est-spkvecs →
    acc --spk-vecs → est --update-flags=Nu (speaker projections AND
    speaker weight projections) → adapted decode keeps WER 0.00."""
    d, tf, sf, st = corpus
    if not (d / "sgmm.fubm").exists() or not (d / "graph").exists():
        pytest.skip("sgmm2 chain test must run first")

    run(["sgmm2-init", "--spk-space-dim=3", "--symmetric", "final.mdl",
         "sgmm.fubm", "sym.0.mdl"], d)
    r = run(["sgmm2-info", "sym.0.mdl"], d)
    assert "symmetric true" in r.stdout
    cur = "sym.0.mdl"
    for it in range(2):
        flags = "vwc" if it % 2 == 0 else "MS"
        run(["sgmm2-acc-stats-ali", cur, "ark:train.ark", "ark:ali.1.ark",
             f"sym.{it}.accs"], d)
        run(["sgmm2-est", f"--update-flags={flags}", cur,
             f"sym.{it}.accs", f"sym.{it + 1}.mdl"], d)
        cur = f"sym.{it + 1}.mdl"
    run(["sgmm2-est-spkvecs", cur, "ark:train.ark", "ark:ali.1.ark",
         "ark:symvecs.ark"], d)
    # accumulate WITH the vectors: updates both N (mean subspace) and u
    # (weight projections) from the same stats pass
    run(["sgmm2-acc-stats-ali", "--spk-vecs=ark:symvecs.ark", cur,
         "ark:train.ark", "ark:ali.1.ark", "sym.Nu.accs"], d)
    run(["sgmm2-est", "--update-flags=Nu", cur, "sym.Nu.accs",
         "sym.final.mdl"], d)
    from old_kaldi_git_tpu.gmm.sgmm2 import Sgmm2Model

    sm = Sgmm2Model.load(str(d / "sym.final.mdl"))
    assert sm.sgmm.u is not None and float(np.abs(sm.sgmm.u).sum()) > 0
    run(["sgmm2-latgen-faster", "--beam=24", "--acoustic-scale=0.1",
         "--word-symbol-table=graph/words.txt",
         "--spk-vecs=ark:symvecs.ark", "sym.final.mdl", "graph/HCLG.fst",
         "ark:train.ark", "ark:sym_lat.ark", "ark:sym_hyp.ark"], d)
    out = run(["compute-wer", "ark:text.ark", "ark:sym_hyp.ark"], d)
    assert "%WER 0.00" in out.stdout, out.stdout + out.stderr


def test_sgmm2_fmllr_cli(corpus):
    """SGMM2 fMLLR leg (fmllr-sgmm2.cc role): sgmm2-est-fmllr estimates
    per-utterance [D, D+1] transforms from alignments, transform-feats
    applies them, and the adapted decode keeps WER 0.00."""
    d, tf, sf, st = corpus
    if not (d / "sgmm.4.mdl").exists() or not (d / "graph").exists():
        pytest.skip("sgmm2 chain test must run first")

    run(["sgmm2-est-fmllr", "--min-count=20", "sgmm.4.mdl", "ark:train.ark",
         "ark:ali.1.ark", "ark:sgmm_fmllr.ark"], d)
    from old_kaldi_git_tpu.utils.table import read_table

    mats = read_table(f"ark:{d}/sgmm_fmllr.ark", "mat")
    assert mats and all(np.asarray(m).shape[1] ==
                        np.asarray(m).shape[0] + 1 for m in mats.values())
    run(["transform-feats", "ark:sgmm_fmllr.ark", "ark:train.ark",
         "ark:sgmm_fmllr_feats.ark"], d)
    run(["sgmm2-latgen-faster", "--beam=24", "--acoustic-scale=0.1",
         "--word-symbol-table=graph/words.txt", "sgmm.4.mdl",
         "graph/HCLG.fst", "ark:sgmm_fmllr_feats.ark",
         "ark:sgmm_fm_lat.ark", "ark:sgmm_fm_hyp.ark"], d)
    out = run(["compute-wer", "ark:text.ark", "ark:sgmm_fm_hyp.ark"], d)
    assert "%WER 0.00" in out.stdout, out.stdout + out.stderr


def test_compile_questions(corpus):
    d, tf, sf, st = corpus
    if not (d / "questions.txt").exists():
        pytest.skip("tree tools test must run first")
    run(["compile-questions", "final.mdl", "questions.txt",
         "questions.qst.txt"], d)
    with open(d / "questions.txt") as f:
        n_in = sum(1 for line in f if line.strip())
    lines = [sorted(int(p) for p in line.split())
             for line in open(d / "questions.qst.txt") if line.strip()]
    assert len(lines) >= 1
    # normalized: sorted, unique, and includes the all-phones question
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel

    phones = sorted(AmGmmModel.load(str(d / "final.mdl")).tm.topo.phones)
    assert phones in lines
    assert len({tuple(q) for q in lines}) == len(lines)


def test_build_tree_two_level(corpus):
    d, tf, sf, st = corpus
    if not (d / "tree.sum.stats").exists():
        pytest.skip("tree tools test must run first")
    run(["build-tree-two-level", "--max-leaves-first=4",
         "--max-leaves-second=20", "--thresh=5",
         "--questions=questions.txt", "tree.sum.stats", "final.mdl",
         "two.tree", "two.map"], d)
    from old_kaldi_git_tpu.tree.context_dep import ContextDependency
    from old_kaldi_git_tpu.utils.io_funcs import (
        init_kaldi_input_stream,
        read_int_vector,
    )

    with open(d / "two.tree", "rb") as f:
        cd = ContextDependency.read(f)
    with open(d / "two.map", "rb") as f:
        init_kaldi_input_stream(f)
        mapping = read_int_vector(f)
    assert len(mapping) == cd.num_pdfs
    n_coarse = int(max(mapping)) + 1
    assert 1 <= n_coarse <= 4 < cd.num_pdfs
    # every coarse cluster non-empty
    assert set(range(n_coarse)) == set(int(m) for m in mapping)
