"""run_all: the five BASELINE configs as ONE stage-gated pipeline.

Reference parity (SURVEY.md §3 / §5): an `egs/<corpus>/s5/run.sh` —
data prep → mono → tri(deltas) → LDA+MLLT → SAT/fMLLR → nnet3 CE TDNN →
chain LF-MMI → LM rescoring → streaming decode, every stage `--stage`
resumable and idempotent-by-artifact, per-stage logs under <work>/log/,
WER lines accumulated into <work>/RESULTS (the egs RESULTS convention).

The corpus is the deterministic synthetic yesno (the environment has no
audio data); every stage reloads its inputs from the previous stage's
on-disk artifacts, so a killed run resumes exactly where it stopped.

Run:  python -m old_kaldi_git_tpu.recipes.run_all --workdir exp/all [--stage N]
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from old_kaldi_git_tpu.utils.log import get_logger
from old_kaldi_git_tpu.utils.pipeline import Pipeline

log = get_logger("run_all")

NUM_TRAIN, NUM_TEST = 24, 8


def _corpus():
    from old_kaldi_git_tpu.recipes.yesno import make_corpus, make_lang

    tw, tt, sw, st = make_corpus(NUM_TRAIN, NUM_TEST)
    return tw, tt, sw, st, make_lang()


def _result(ctx, name: str, wer: float) -> None:
    with open(ctx.path("RESULTS"), "a") as f:
        f.write(f"%WER {wer:.2f} [{name}]\n")
    log.info("RESULT %s: %%WER %.2f", name, wer)


def _read_ali(path: str) -> Dict[str, np.ndarray]:
    from old_kaldi_git_tpu.utils.table import read_table

    return read_table(f"ark:{path}", "ivec")


def _write_ali(path: str, ali: Dict[str, np.ndarray]) -> None:
    from old_kaldi_git_tpu.utils.table import TableWriter

    with TableWriter(f"ark:{path}", "ivec") as w:
        for k, a in sorted(ali.items()):
            if a is not None:
                w[k] = np.asarray(a, np.int32)


def build_pipeline(workdir: str, stage: int = 0) -> Pipeline:
    pipe = Pipeline(workdir, stage=stage)

    @pipe.stage(0, "prepare data", produces=("data/feats_train.ark",))
    def _prepare(ctx):
        from old_kaldi_git_tpu.recipes.yesno import (
            compute_feats,
            compute_static_feats,
        )
        from old_kaldi_git_tpu.utils.table import TableWriter

        tw, tt, sw, st, lang = _corpus()
        for name, feats in (
            ("feats_train", compute_feats(tw)),
            ("feats_test", compute_feats(sw)),
            ("static_train", compute_static_feats(tw)),
            ("static_test", compute_static_feats(sw)),
        ):
            with TableWriter(f"ark:{ctx.path(f'data/{name}.ark')}", "mat") as w:
                for k, f in sorted(feats.items()):
                    w[k] = f
        with TableWriter(f"ark:{ctx.path('data/text.ark')}", "text") as w:
            for k, words in sorted(tt.items()):
                w[k] = " ".join(words)
        with TableWriter(f"ark:{ctx.path('data/ref.ark')}", "text") as w:
            for k, words in sorted(st.items()):
                w[k] = " ".join(words)

    @pipe.stage(10, "train mono", produces=("mono/final.mdl", "mono/ali.ark"))
    def _mono(ctx):
        from old_kaldi_git_tpu.recipes.gmm_common import GmmTrainOptions
        from old_kaldi_git_tpu.recipes.mono import train_mono
        from old_kaldi_git_tpu.recipes.yesno import compute_feats

        tw, tt, _sw, _st, lang = _corpus()
        feats = compute_feats(tw)
        fast = GmmTrainOptions(num_iters=8, totgauss=60,
                               realign_iters=(1, 2, 3, 4, 6))
        model, ali = train_mono(feats, tt, lang, fast)
        model.save(ctx.path("mono/final.mdl"))
        _write_ali(ctx.path("mono/ali.ark"), ali)

    @pipe.stage(20, "train tri deltas",
                produces=("tri1/final.mdl", "tri1/tree", "tri1/ali.ark"))
    def _tri(ctx):
        from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
        from old_kaldi_git_tpu.recipes.gmm_common import GmmTrainOptions
        from old_kaldi_git_tpu.recipes.triphone import train_deltas
        from old_kaldi_git_tpu.recipes.yesno import compute_feats

        tw, tt, _sw, _st, lang = _corpus()
        feats = compute_feats(tw)
        mono = AmGmmModel.load(ctx.path("mono/final.mdl"))
        mono_ali = _read_ali(ctx.path("mono/ali.ark"))
        fast = GmmTrainOptions(num_iters=8, totgauss=60,
                               realign_iters=(1, 2, 3, 4, 6))
        model, tree, ali = train_deltas(
            feats, tt, lang, mono, mono_ali, num_leaves=60, opts=fast
        )
        model.save(ctx.path("tri1/final.mdl"))
        with open(ctx.path("tri1/tree"), "wb") as f:
            tree.write(f)
        _write_ali(ctx.path("tri1/ali.ark"), ali)

    @pipe.stage(30, "train lda+mllt",
                produces=("tri2b/final.mdl", "tri2b/tree",
                          "tri2b/transform.npy", "tri2b/ali.ark"))
    def _lda(ctx):
        from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
        from old_kaldi_git_tpu.recipes.gmm_common import GmmTrainOptions
        from old_kaldi_git_tpu.recipes.triphone import train_lda_mllt
        from old_kaldi_git_tpu.recipes.yesno import compute_static_feats

        tw, tt, _sw, _st, lang = _corpus()
        statics = compute_static_feats(tw)
        tri = AmGmmModel.load(ctx.path("tri1/final.mdl"))
        tri_ali = _read_ali(ctx.path("tri1/ali.ark"))
        fast = GmmTrainOptions(num_iters=8, totgauss=60,
                               realign_iters=(1, 2, 3, 4, 6))
        res = train_lda_mllt(
            statics, tt, lang, tri, tri_ali, num_leaves=60, target_dim=20,
            mllt_iters=(2, 4), opts=fast,
        )
        res.model.save(ctx.path("tri2b/final.mdl"))
        with open(ctx.path("tri2b/tree"), "wb") as f:
            res.ctx_dep.write(f)
        np.save(ctx.path("tri2b/transform.npy"), res.transform)
        _write_ali(ctx.path("tri2b/ali.ark"), res.alignments)

    @pipe.stage(40, "sat fmllr decode", produces=("tri2b/DONE_fmllr",))
    def _sat(ctx):
        from old_kaldi_git_tpu.decoder.csr import fst_to_csr
        from old_kaldi_git_tpu.decoder.graph import GraphCompiler, mkgraph
        from old_kaldi_git_tpu.decoder.viterbi import ViterbiOptions
        from old_kaldi_git_tpu.fst.lang import make_unigram_grammar_fst
        from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
        from old_kaldi_git_tpu.recipes.decode import (
            DecodeOptions,
            decode_dataset,
            score_hyps,
        )
        from old_kaldi_git_tpu.recipes.gmm_common import align_all, pad_feats
        from old_kaldi_git_tpu.recipes.triphone import (
            estimate_fmllr_per_speaker,
            splice_numpy,
        )
        from old_kaldi_git_tpu.recipes.yesno import compute_static_feats
        from old_kaldi_git_tpu.transform.fmllr import apply_affine_transform
        from old_kaldi_git_tpu.tree.context_dep import ContextDependency

        tw, tt, sw, st, lang = _corpus()
        model = AmGmmModel.load(ctx.path("tri2b/final.mdl"))
        with open(ctx.path("tri2b/tree"), "rb") as f:
            tree = ContextDependency.read(f)
        transform = np.load(ctx.path("tri2b/transform.npy"))
        test_lda = {
            k: (splice_numpy(v) @ transform.T).astype(np.float32)
            for k, v in compute_static_feats(sw).items()
        }
        g = make_unigram_grammar_fst(list(tt.values()), lang.words)
        csr = fst_to_csr(mkgraph(lang, g, tree, model.tm),
                         model.tm.tid_to_pdf_array())
        hyps = decode_dataset(model, csr, lang, test_lda,
                              DecodeOptions(beam=20.0))
        _result(ctx, "tri2b", score_hyps(st, hyps).wer)
        # two-pass unsupervised fMLLR adaptation
        utt2spk = {k: k.split("_")[0] for k in test_lda}
        hyp_texts = {k: v for k, v in hyps.items() if v}
        gc = GraphCompiler(lang, tree, model.tm)
        keys, fp, nf = pad_feats({k: test_lda[k] for k in hyp_texts})
        graphs = [gc.compile_csr_from_text(hyp_texts[k]) for k in keys]
        alis, _ = align_all(model.am, graphs, fp, nf,
                            ViterbiOptions(beam=32.0))
        ali_map = {k: a for k, a in zip(keys, alis) if a is not None}
        transforms = estimate_fmllr_per_speaker(
            model, test_lda, ali_map, utt2spk, min_count=50.0
        )
        adapted = {
            k: apply_affine_transform(v, transforms[utt2spk[k]])
            if utt2spk[k] in transforms else v
            for k, v in test_lda.items()
        }
        hyps2 = decode_dataset(model, csr, lang, adapted,
                               DecodeOptions(beam=20.0))
        _result(ctx, "tri2b+fmllr", score_hyps(st, hyps2).wer)
        open(ctx.path("tri2b/DONE_fmllr"), "w").write("done\n")

    @pipe.stage(50, "train nnet3 tdnn", produces=("nnet3/am.mdl",))
    def _tdnn(ctx):
        from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
        from old_kaldi_git_tpu.models.am_nnet import AmNnetModel
        from old_kaldi_git_tpu.models.train import NnetTrainOptions
        from old_kaldi_git_tpu.recipes.nnet3 import train_tdnn
        from old_kaldi_git_tpu.recipes.yesno import compute_feats

        tw, _tt, _sw, _st, _lang = _corpus()
        feats = compute_feats(tw)
        tri = AmGmmModel.load(ctx.path("tri1/final.mdl"))
        ali = _read_ali(ctx.path("tri1/ali.ark"))
        am = train_tdnn(
            tri, feats, ali, hidden_dim=64, num_layers=3,
            opts=NnetTrainOptions(num_epochs=30, minibatch_size=8,
                                  chunk_width=64),
        )
        AmNnetModel(am, tri.tm).save(ctx.path("nnet3/am.mdl"))

    @pipe.stage(51, "decode nnet3", produces=("nnet3/DONE_decode",))
    def _tdnn_decode(ctx):
        from old_kaldi_git_tpu.decoder.csr import fst_to_csr
        from old_kaldi_git_tpu.decoder.graph import mkgraph
        from old_kaldi_git_tpu.fst.lang import make_unigram_grammar_fst
        from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
        from old_kaldi_git_tpu.models.am_nnet import AmNnetModel
        from old_kaldi_git_tpu.recipes.decode import score_hyps
        from old_kaldi_git_tpu.recipes.nnet3 import decode_tdnn
        from old_kaldi_git_tpu.recipes.yesno import compute_feats
        from old_kaldi_git_tpu.tree.context_dep import ContextDependency

        _tw, tt, sw, st, lang = _corpus()
        bundle = AmNnetModel.load(ctx.path("nnet3/am.mdl"))
        with open(ctx.path("tri1/tree"), "rb") as f:
            tree = ContextDependency.read(f)
        g = make_unigram_grammar_fst(list(tt.values()), lang.words)
        csr = fst_to_csr(mkgraph(lang, g, tree, bundle.tm),
                         bundle.tm.tid_to_pdf_array())
        hyps = decode_tdnn(bundle.am, csr, lang, compute_feats(sw),
                           beam=20.0)
        _result(ctx, "nnet3-tdnn", score_hyps(st, hyps).wer)
        open(ctx.path("nnet3/DONE_decode"), "w").write("done\n")

    @pipe.stage(52, "train nnet3 tdnn + online ivectors",
                produces=("nnet3_iv/am.mdl", "nnet3_iv/final.ie"))
    def _tdnn_ivector(ctx):
        from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
        from old_kaldi_git_tpu.ivector.extractor import (
            IvectorExtractor,
            extract_online_ivectors,
            train_ivector_extractor,
            train_ubm,
        )
        from old_kaldi_git_tpu.models.am_nnet import AmNnetModel
        from old_kaldi_git_tpu.models.train import NnetTrainOptions
        from old_kaldi_git_tpu.recipes.nnet3 import train_tdnn
        from old_kaldi_git_tpu.recipes.yesno import compute_feats

        tw, _tt, _sw, _st, _lang = _corpus()
        feats = compute_feats(tw)
        # UBM + T-matrix on the training features (reference
        # steps/online/nnet2/{train_diag_ubm,train_ivector_extractor}.sh)
        pooled = np.concatenate(list(feats.values()))[::2]
        ubm = train_ubm(pooled, num_gauss=16, num_iters=6)
        ext = train_ivector_extractor(
            ubm, list(feats.values()), ivector_dim=8, num_iters=4)
        ext.save(ctx.path("nnet3_iv/final.ie"))
        ivecs = {k: extract_online_ivectors(ext, v, period=10)
                 for k, v in feats.items()}
        tri = AmGmmModel.load(ctx.path("tri1/final.mdl"))
        ali = _read_ali(ctx.path("tri1/ali.ark"))
        am = train_tdnn(
            tri, feats, ali, hidden_dim=64, num_layers=3,
            opts=NnetTrainOptions(num_epochs=30, minibatch_size=8,
                                  chunk_width=64),
            ivectors=ivecs,
        )
        assert am.ivector_dim == 8
        AmNnetModel(am, tri.tm).save(ctx.path("nnet3_iv/am.mdl"))

    @pipe.stage(53, "decode nnet3 + online ivectors",
                produces=("nnet3_iv/DONE_decode",))
    def _tdnn_ivector_decode(ctx):
        from old_kaldi_git_tpu.decoder.csr import fst_to_csr
        from old_kaldi_git_tpu.decoder.graph import mkgraph
        from old_kaldi_git_tpu.fst.lang import make_unigram_grammar_fst
        from old_kaldi_git_tpu.ivector.extractor import (
            IvectorExtractor,
            extract_online_ivectors,
        )
        from old_kaldi_git_tpu.models.am_nnet import AmNnetModel
        from old_kaldi_git_tpu.recipes.decode import score_hyps
        from old_kaldi_git_tpu.recipes.nnet3 import decode_tdnn
        from old_kaldi_git_tpu.recipes.yesno import compute_feats
        from old_kaldi_git_tpu.tree.context_dep import ContextDependency

        _tw, tt, sw, st, lang = _corpus()
        bundle = AmNnetModel.load(ctx.path("nnet3_iv/am.mdl"))
        ext = IvectorExtractor.load(ctx.path("nnet3_iv/final.ie"))
        with open(ctx.path("tri1/tree"), "rb") as f:
            tree = ContextDependency.read(f)
        g = make_unigram_grammar_fst(list(tt.values()), lang.words)
        csr = fst_to_csr(mkgraph(lang, g, tree, bundle.tm),
                         bundle.tm.tid_to_pdf_array())
        test_feats = compute_feats(sw)
        ivecs = {k: extract_online_ivectors(ext, v, period=10)
                 for k, v in test_feats.items()}
        hyps = decode_tdnn(bundle.am, csr, lang, test_feats, beam=20.0,
                           ivectors=ivecs)
        _result(ctx, "nnet3-tdnn-ivector", score_hyps(st, hyps).wer)
        open(ctx.path("nnet3_iv/DONE_decode"), "w").write("done\n")

    @pipe.stage(60, "train+decode chain", produces=("chain/DONE",))
    def _chain(ctx):
        from old_kaldi_git_tpu.fst.lang import make_unigram_grammar_fst
        from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
        from old_kaldi_git_tpu.recipes.chain import (
            ChainTrainOptions,
            decode_chain,
            make_chain_decode_graph,
            train_chain,
        )
        from old_kaldi_git_tpu.recipes.decode import score_hyps
        from old_kaldi_git_tpu.recipes.yesno import compute_feats

        tw, tt, sw, st, lang = _corpus()
        feats = compute_feats(tw)
        tri = AmGmmModel.load(ctx.path("tri1/final.mdl"))
        ali = _read_ali(ctx.path("tri1/ali.ark"))
        cm = train_chain(
            tri, feats, ali, lang,
            ChainTrainOptions(num_epochs=30, minibatch_size=8,
                              hidden_dim=64, bottleneck_dim=16,
                              num_layers=3),
        )
        cm.save(ctx.path("chain/final.mdl"))
        g = make_unigram_grammar_fst(list(tt.values()), lang.words)
        graph = make_chain_decode_graph(cm, lang, g)
        hyps = decode_chain(cm, graph, lang, compute_feats(sw))
        _result(ctx, "chain", score_hyps(st, hyps).wer)
        # DONE marker written LAST so a crash mid-decode re-runs the stage
        open(ctx.path("chain/DONE"), "w").write("done\n")

    @pipe.stage(70, "lattice lm rescoring", produces=("rescore/DONE",))
    def _rescore(ctx):
        import math

        from old_kaldi_git_tpu.decoder.csr import fst_to_csr
        from old_kaldi_git_tpu.decoder.graph import mkgraph
        from old_kaldi_git_tpu.fst.lang import make_unigram_grammar_fst
        from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
        from old_kaldi_git_tpu.lat.determinize import determinize_lattice_pruned
        from old_kaldi_git_tpu.lat.rescore import lmrescore_compact_lattice
        from old_kaldi_git_tpu.lm.arpa import parse_arpa
        from old_kaldi_git_tpu.recipes.decode import (
            DecodeOptions,
            decode_dataset_with_lattices,
            score_hyps,
        )
        from old_kaldi_git_tpu.recipes.yesno import compute_static_feats
        from old_kaldi_git_tpu.recipes.triphone import splice_numpy
        from old_kaldi_git_tpu.tree.context_dep import ContextDependency

        tw, tt, sw, st, lang = _corpus()
        model = AmGmmModel.load(ctx.path("tri2b/final.mdl"))
        with open(ctx.path("tri2b/tree"), "rb") as f:
            tree = ContextDependency.read(f)
        transform = np.load(ctx.path("tri2b/transform.npy"))
        test_lda = {
            k: (splice_numpy(v) @ transform.T).astype(np.float32)
            for k, v in compute_static_feats(sw).items()
        }
        g = make_unigram_grammar_fst(list(tt.values()), lang.words)
        csr = fst_to_csr(mkgraph(lang, g, tree, model.tm),
                         model.tm.tid_to_pdf_array())
        lats = decode_dataset_with_lattices(
            model, csr, lang, test_lda, DecodeOptions(beam=20.0),
            lattice_beam=12.0,
        )
        # bigram LM estimated from the training text → exact lattice rescore
        counts: Dict[tuple, int] = {}
        uni: Dict[str, int] = {}
        for words in tt.values():
            seq = ["<s>"] + list(words) + ["</s>"]
            for a, b in zip(seq[:-1], seq[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
                uni[a] = uni.get(a, 0) + 1
        uni["</s>"] = sum(1 for _ in tt)
        tot = sum(uni.values())
        lines = ["\\data\\", f"ngram 1={len(uni)}", f"ngram 2={len(counts)}",
                 "", "\\1-grams:"]
        for w, c in sorted(uni.items()):
            lines.append(f"{math.log10(max(c, 1) / tot):.6f}\t{w}\t-0.30103")
        lines += ["", "\\2-grams:"]
        for (a, b), c in sorted(counts.items()):
            lines.append(f"{math.log10(c / uni[a]):.6f}\t{a} {b}")
        lines += ["", "\\end\\", ""]
        lm = parse_arpa("\n".join(lines))
        from old_kaldi_git_tpu.lat.lattice import lattice_best_path

        base_hyps, resc_hyps = {}, {}
        for k, lat in lats.items():
            words, _, _ = lattice_best_path(lat, 1.0, 0.1)
            base_hyps[k] = [lang.words[w] for w in words]
            clat = determinize_lattice_pruned(lat, 12.0, acoustic_scale=0.1)
            resc = lmrescore_compact_lattice(clat, lang.words, lm,
                                             new_scale=1.0)
            w2, _tids, _cost = resc.best_path(lm_scale=1.0, ac_scale=0.1)
            resc_hyps[k] = [lang.words[w] for w in w2]
        _result(ctx, "tri2b-lattice-1best", score_hyps(st, base_hyps).wer)
        _result(ctx, "tri2b+bigram-rescore", score_hyps(st, resc_hyps).wer)
        open(ctx.path("rescore/DONE"), "w").write("done\n")

    @pipe.stage(80, "streaming decode", produces=("stream/DONE",))
    def _stream(ctx):
        import time

        from old_kaldi_git_tpu.decoder.csr import fst_to_csr
        from old_kaldi_git_tpu.decoder.graph import mkgraph
        from old_kaldi_git_tpu.decoder.viterbi import ViterbiOptions
        from old_kaldi_git_tpu.feat.compute import MfccOptions
        from old_kaldi_git_tpu.fst.lang import make_unigram_grammar_fst
        from old_kaldi_git_tpu.models.am_nnet import AmNnetModel
        from old_kaldi_git_tpu.models.streaming_am import StreamingAmNnet
        from old_kaldi_git_tpu.online.streaming import (
            OnlineFeaturePipeline,
            StreamingDecoder,
        )
        from old_kaldi_git_tpu.recipes.yesno import SAMP_FREQ
        from old_kaldi_git_tpu.tree.context_dep import ContextDependency

        _tw, tt, sw, _st, lang = _corpus()
        bundle = AmNnetModel.load(ctx.path("nnet3/am.mdl"))
        with open(ctx.path("tri1/tree"), "rb") as f:
            tree = ContextDependency.read(f)
        g = make_unigram_grammar_fst(list(tt.values()), lang.words)
        csr = fst_to_csr(mkgraph(lang, g, tree, bundle.tm),
                         bundle.tm.tid_to_pdf_array())
        mo = MfccOptions()
        mo.frame_opts.samp_freq = SAMP_FREQ
        mo.frame_opts.dither = 0.0
        # NOTE: the CE model here was trained on batch features (deltas +
        # per-utt CMVN); this stage only demonstrates the streaming PATH +
        # RTF accounting, so it feeds the streaming MFCC chain regardless
        tot_audio = tot_wall = 0.0
        for k, wav in sw.items():
            pipe_f = OnlineFeaturePipeline(mo)
            sam = StreamingAmNnet(bundle.am)
            dec = StreamingDecoder(
                csr, lambda x: x, [lang.silence_id],
                bundle.tm.tid_to_phone_array(),
                opts=ViterbiOptions(beam=20.0, acoustic_scale=1.0),
            )
            t0 = time.perf_counter()
            chunk = int(0.5 * SAMP_FREQ)
            for lo in range(0, len(wav), chunk):
                feats = pipe_f.accept_waveform(wav[lo: lo + chunk])
                if feats.size:
                    dec.advance(sam.accept(feats))
            fin = pipe_f.input_finished()
            if fin.size:
                dec.advance(sam.accept(fin, final=True), final=True)
            tot_wall += time.perf_counter() - t0
            tot_audio += len(wav) / SAMP_FREQ
        rtf = tot_wall / max(tot_audio, 1e-9)
        with open(ctx.path("RESULTS"), "a") as f:
            f.write(f"RTF {rtf:.3f} [streaming]\n")
        open(ctx.path("stream/DONE"), "w").write("done\n")

    return pipe


def run_all(workdir: str, stage: int = 0):
    return build_pipeline(workdir, stage).run()


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="exp/run_all")
    ap.add_argument("--stage", type=int, default=0)
    a = ap.parse_args()
    run_all(a.workdir, a.stage)
    print(open(os.path.join(a.workdir, "RESULTS")).read())
