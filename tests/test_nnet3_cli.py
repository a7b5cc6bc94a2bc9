"""nnet3 / chain CLI pipeline: init → egs → train → diagnostics → decode.

Mirrors the reference binary composition (SURVEY.md §3.4):
ali-to-pdf → nnet3-get-egs → nnet3-shuffle-egs → nnet3-train →
nnet3-am-init → nnet3-latgen-faster → compute-wer; and the chain side:
ali-to-phones → chain-est-phone-lm → chain-build-tree →
chain-make-den-fst → nnet3-chain-get-egs → nnet3-chain-train →
nnet3-chain-compute-prob.
"""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

XCONFIG = """
input name=input dim={D}
relu-batchnorm-layer name=tdnn1 dim=48 input=Append(-2,-1,0,1,2)
relu-batchnorm-layer name=tdnn2 dim=48 input=Append(-1,0,1)
output-layer name=output dim={P}
"""


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
def system(tmp_path_factory):
    """Mono GMM trained in-process + its artifacts on disk for the CLI."""
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
    from old_kaldi_git_tpu.utils.table import TableWriter

    d = tmp_path_factory.mktemp("nnet3cli")
    tw, tt, sw, st = make_corpus(31, 6)
    tf, sf = compute_feats(tw), compute_feats(sw)
    lang = make_lang()
    model, alis = train_mono(tf, tt, lang,
                             MonoTrainOptions(num_iters=10, totgauss=80))
    model.save(str(d / "final.mdl"))
    phones = lang.real_phone_ids
    topo = model.tm.topo
    cd = monophone_context_dependency(
        phones, {p: topo.num_pdf_classes(p) for p in phones}
    )
    g = make_unigram_grammar_fst(list(tt.values()), lang.words)
    hclg = mkgraph(lang, g, cd, model.tm)
    with open(d / "HCLG.fst", "wb") as f:
        hclg.write(f)
    lang.words.write(str(d / "words.txt"))
    with TableWriter(f"ark:{d}/train.ark", "mat") as w:
        for k, f in tf.items():
            w[k] = f
    with TableWriter(f"ark:{d}/test.ark", "mat") as w:
        for k, f in sf.items():
            w[k] = f
    with TableWriter(f"ark:{d}/ali.ark", "ivec") as w:
        for k, a in alis.items():
            if a is not None:
                w[k] = np.asarray(a, np.int32)
    with TableWriter(f"ark:{d}/ref.ark", "text") as w:
        for k, words in st.items():
            w[k] = " ".join(words)
    # per-utterance training graphs for nnet3-align-compiled
    from old_kaldi_git_tpu.decoder.graph import GraphCompiler

    import old_kaldi_git_tpu.fst.holder  # noqa: F401 — "fst" table holder

    gc = GraphCompiler(lang, cd, model.tm)
    with TableWriter(f"ark:{d}/gra.fsts", "fst") as w:
        for k in sorted(tf):
            w[k] = gc.compile_graph_from_text(tt[k])
    D = next(iter(tf.values())).shape[1]
    P = model.am.num_pdfs
    all_phones = ":".join(str(p) for p in model.tm.topo.phones)
    return d, D, P, all_phones


def test_nnet3_ce_cli_pipeline(system):
    d, D, P, _phones = system
    (d / "nnet.xconfig").write_text(XCONFIG.format(D=D, P=P))
    run(["nnet3-init", "nnet.xconfig", "0.raw"], d)
    out = run(["nnet3-info", "0.raw"], d)
    assert f"output-dim: {P}" in out.stdout
    run(["ali-to-pdf", "final.mdl", "ark:ali.ark", "ark:pdfali.ark"], d)
    run(["nnet3-get-egs", "--frames-per-eg=32", "ark:train.ark",
         "ark:pdfali.ark", "ark:egs.ark"], d)
    run(["nnet3-shuffle-egs", "--srand=1", "ark:egs.ark",
         "ark:egs_shuf.ark"], d)
    # round-robin split + recombine covers copy-egs
    run(["nnet3-copy-egs", "ark:egs_shuf.ark", "ark:egs1.ark",
         "ark:egs2.ark"], d)
    r0 = run(["nnet3-compute-prob", "0.raw", "ark:egs_shuf.ark"], d)
    ce0 = float(re.search(r"log-probability per frame: (\S+)", r0.stdout)[1])
    run(["nnet3-train", "--num-epochs=30", "--minibatch-size=16", "0.raw",
         "ark:egs_shuf.ark", "1.raw"], d)
    r1 = run(["nnet3-compute-prob", "1.raw", "ark:egs_shuf.ark"], d)
    ce1 = float(re.search(r"log-probability per frame: (\S+)", r1.stdout)[1])
    assert ce1 > ce0 + 0.1, (ce0, ce1)  # log-prob improved by training
    # priors = averaged model posteriors (nnet3-adjust-priors role)
    run(["nnet3-adjust-priors", "1.raw", "ark:egs_shuf.ark", "2.raw"], d)
    run(["nnet3-am-init", "final.mdl", "2.raw", "am.mdl"], d)
    # decode the held-out set and score
    run(["nnet3-latgen-faster", "--beam=24", "--acoustic-scale=1.0",
         "--word-symbol-table=words.txt", "am.mdl", "HCLG.fst",
         "ark:test.ark", "ark:lat.ark", "ark:hyp.ark"], d)
    out = run(["compute-wer", "ark:ref.ark", "ark:hyp.ark"], d)
    assert "%WER 0.00" in out.stdout, out.stdout + out.stderr
    # nnet3 alignment over the training graphs: one tid per frame
    run(["nnet3-align-compiled", "--beam=200", "am.mdl", "ark:gra.fsts",
         "ark:train.ark", "ark:nnet_ali.ark"], d)
    from old_kaldi_git_tpu.utils.table import read_table as rt

    ali = rt(f"ark:{d}/nnet_ali.ark", "ivec")
    feats = rt(f"ark:{d}/train.ark", "mat")
    k0 = sorted(ali)[0]
    assert len(ali[k0]) == feats[k0].shape[0]


def test_nnet3_chain_cli_pipeline(system):
    d, D, _P, phones = system
    run(["ali-to-phones", "final.mdl", "ark:ali.ark", "ark:phoneseq.ark"], d)
    run(["chain-est-phone-lm", "--ngram-order=2", "ark:phoneseq.ark",
         "phone_lm.fst"], d)
    run(["chain-build-tree", "--context-width=1", "final.mdl",
         "ark:train.ark", "ark:ali.ark", "chain.tree"], d)
    run(["chain-make-den-fst", "chain.tree", "phone_lm.fst", "den.pkl"], d)
    run(["nnet3-chain-get-egs", "--frame-subsampling-factor=3", "final.mdl",
         "chain.tree", "den.pkl", "ark:train.ark", "ark:ali.ark",
         "ark:cegs.ark"], d)
    run(["nnet3-shuffle-egs", "--chain", "--srand=1", "ark:cegs.ark",
         "ark:cegs_shuf.ark"], d)
    # chain model: output dim = chain tree pdfs
    from old_kaldi_git_tpu.tree.context_dep import ContextDependency

    with open(d / "chain.tree", "rb") as f:
        n_pdfs = ContextDependency.read(f).num_pdfs
    (d / "chain.xconfig").write_text(XCONFIG.format(D=D, P=n_pdfs))
    run(["nnet3-chain-init", "--frame-subsampling-factor=3", "chain.tree",
         "den.pkl", "chain.xconfig", phones, "chain0.mdl"], d)
    r0 = run(["nnet3-chain-compute-prob", "chain0.mdl",
              "ark:cegs_shuf.ark"], d)
    obj0 = float(re.search(r"objective per frame: (\S+)", r0.stdout)[1])
    run(["nnet3-chain-train", "--num-epochs=8", "--minibatch-size=8",
         "chain0.mdl", "ark:cegs_shuf.ark", "chain1.mdl"], d)
    r1 = run(["nnet3-chain-compute-prob", "chain1.mdl",
              "ark:cegs_shuf.ark"], d)
    obj1 = float(re.search(r"objective per frame: (\S+)", r1.stdout)[1])
    assert np.isfinite(obj0) and np.isfinite(obj1)
    assert obj1 > obj0 + 0.1, (obj0, obj1)  # LF-MMI objective improved



def test_nnet3_merge_combine_edits(system):
    """nnet3-merge-egs shape grouping, nnet3-combine weight optimization,
    and nnet3-copy --edits model surgery (lr factors + dropout)."""
    d, D, P, _phones = system
    if not (d / "1.raw").exists():
        pytest.skip("CE pipeline test must run first")
    run(["nnet3-merge-egs", "--minibatch-size=16", "ark:egs_shuf.ark",
         "ark:egs_merged.ark"], d)
    from old_kaldi_git_tpu.utils.table import read_table as rt

    merged = rt(f"ark:{d}/egs_merged.ark", "egs")
    lens = [e.feats.shape[0] for e in merged.values()]
    assert lens == sorted(lens) and len(merged) > 0

    # combine the initial and trained model: optimized weights must put
    # almost all mass on the trained one, and the combined objf must not
    # be (much) worse than the best input
    run(["nnet3-combine", "0.raw", "1.raw", "ark:egs_merged.ark",
         "combined.raw"], d)
    r_best = run(["nnet3-compute-prob", "1.raw", "ark:egs_shuf.ark"], d)
    r_comb = run(["nnet3-compute-prob", "combined.raw", "ark:egs_shuf.ark"], d)
    ce_best = float(re.search(r"log-probability per frame: (\S+)",
                              r_best.stdout)[1])
    ce_comb = float(re.search(r"log-probability per frame: (\S+)",
                              r_comb.stdout)[1])
    assert ce_comb > ce_best - 0.05, (ce_best, ce_comb)

    # --edits: freeze everything but the output layer, then train — only
    # the output layer's params may change
    run(["nnet3-copy",
         "--edits=set-learning-rate-factor name=tdnn* learning-rate-factor=0.0",
         "1.raw", "frozen.raw"], d)
    run(["nnet3-train", "--num-epochs=2", "--minibatch-size=16",
         "frozen.raw", "ark:egs_shuf.ark", "frozen_trained.raw"], d)
    from old_kaldi_git_tpu.models.am_nnet import AmNnet

    before = AmNnet.load(str(d / "frozen.raw"))
    after = AmNnet.load(str(d / "frozen_trained.raw"))
    assert before.lr_factors == {"tdnn*": 0.0}
    pb, pa = before.variables["params"], after.variables["params"]
    for name in pb:
        delta = max(
            float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
            for x, y in zip(
                __import__("jax").tree.leaves(pb[name]),
                __import__("jax").tree.leaves(pa[name])))
        if name.startswith("tdnn"):
            assert delta == 0.0, (name, delta)
        elif name == "output":
            assert delta > 0.0, name

    # set-dropout-proportion rewrites the config
    run(["nnet3-copy", "--edits=set-dropout-proportion proportion=0.2",
         "1.raw", "dropout.raw"], d)
    dam = AmNnet.load(str(d / "dropout.raw"))
    assert all(l.dropout == 0.2 for l in dam.config.layers)


def test_nnet3_chain_combine_and_egs_tools(system):
    d, D, _P, phones = system
    if not (d / "chain1.mdl").exists():
        pytest.skip("chain pipeline test must run first")
    run(["nnet3-chain-copy-egs", "ark:cegs_shuf.ark", "ark:cegs1.ark",
         "ark:cegs2.ark"], d)
    run(["nnet3-chain-merge-egs", "--minibatch-size=8", "ark:cegs1.ark",
         "ark:cegs1m.ark"], d)
    run(["nnet3-chain-shuffle-egs", "--srand=3", "ark:cegs1m.ark",
         "ark:cegs1s.ark"], d)
    from old_kaldi_git_tpu.utils.table import read_table as rt

    n_in = len(rt(f"ark:{d}/cegs_shuf.ark", "cegs"))
    n1 = len(rt(f"ark:{d}/cegs1s.ark", "cegs"))
    n2 = len(rt(f"ark:{d}/cegs2.ark", "cegs"))
    assert n1 + n2 == n_in and n1 > 0 and n2 > 0

    run(["nnet3-chain-combine", "chain0.mdl", "chain1.mdl",
         "ark:cegs_shuf.ark", "chain_comb.mdl"], d)
    r_best = run(["nnet3-chain-compute-prob", "chain1.mdl",
                  "ark:cegs_shuf.ark"], d)
    r_comb = run(["nnet3-chain-compute-prob", "chain_comb.mdl",
                  "ark:cegs_shuf.ark"], d)
    o_best = float(re.search(r"objective per frame: (\S+)", r_best.stdout)[1])
    o_comb = float(re.search(r"objective per frame: (\S+)", r_comb.stdout)[1])
    assert o_comb > o_best - 0.05, (o_best, o_comb)


@pytest.fixture(scope="module")
def online_system(tmp_path_factory):
    """Tiny trained nnet3 system + test waves for the streaming decoders."""
    tmp_path = tmp_path_factory.mktemp("online")
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from old_kaldi_git_tpu.decoder.graph import mkgraph
    from old_kaldi_git_tpu.feat.compute import MfccOptions
    from old_kaldi_git_tpu.fst.lang import make_unigram_grammar_fst
    from old_kaldi_git_tpu.models.am_nnet import AmNnetModel
    from old_kaldi_git_tpu.online.streaming import OnlineFeaturePipeline
    from old_kaldi_git_tpu.recipes.mono import MonoTrainOptions, train_mono
    from old_kaldi_git_tpu.recipes.nnet3 import train_tdnn
    from old_kaldi_git_tpu.recipes.yesno import SAMP_FREQ, make_corpus, make_lang
    from old_kaldi_git_tpu.tree.context_dep import monophone_context_dependency
    from old_kaldi_git_tpu.utils.table import read_table
    from old_kaldi_git_tpu.utils.wav import write_wav

    tw, tt, sw, st = make_corpus(24, 3)
    mo = MfccOptions()
    mo.frame_opts.samp_freq = SAMP_FREQ
    mo.frame_opts.dither = 0.0
    tf = {}
    for k, wav in tw.items():
        pipe = OnlineFeaturePipeline(mo)
        parts = [pipe.accept_waveform(wav), pipe.input_finished()]
        tf[k] = np.concatenate([p for p in parts if p.size])
    lang = make_lang()
    model, alis = train_mono(tf, tt, lang,
                             MonoTrainOptions(num_iters=8, totgauss=60))
    from old_kaldi_git_tpu.models.train import NnetTrainOptions

    am = train_tdnn(model, tf, alis, hidden_dim=48, num_layers=2,
                    opts=NnetTrainOptions(num_epochs=60, minibatch_size=8,
                                          chunk_width=64))
    AmNnetModel(am, model.tm).save(str(tmp_path / "am.mdl"))
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
    return tmp_path, sw, st, lang, SAMP_FREQ


def test_online2_wav_nnet3_latgen(online_system):
    """Streaming nnet3 decode CLI: online features → chunked TDNN eval with
    context re-computation → carried beam + endpointing."""
    tmp_path, sw, st, lang, SAMP_FREQ = online_system
    from old_kaldi_git_tpu.utils.table import read_table

    out = run(["online2-wav-nnet3-latgen-faster", "--beam=20",
               "--acoustic-scale=1.0", f"--samp-freq={SAMP_FREQ}",
               f"--silence-phone-id={lang.silence_id}",
               "--word-symbol-table=words.txt", "am.mdl", "HCLG.fst",
               "scp:wav.scp", "ark:hyp.ark"], tmp_path)
    assert "overall RTF" in out.stdout
    hyps = read_table(f"ark:{tmp_path}/hyp.ark", "text")
    errs = sum(hyps[k].split() != list(st[k]) for k in st)
    assert errs == 0, (hyps, st)


def test_online2_tcp_server(online_system):
    """TCP serving: stream raw PCM over a socket, read partial ('\r') and
    final ('\n') hypotheses (reference online2bin/
    online2-tcp-nnet3-decode-faster)."""
    import socket
    import subprocess as sp
    import time

    tmp_path, sw, st, lang, SAMP_FREQ = online_system
    port_file = tmp_path / "port"
    if port_file.exists():
        port_file.unlink()
    proc = sp.Popen(
        [sys.executable, "-m", "old_kaldi_git_tpu.bin",
         "online2-tcp-nnet3-decode-faster", "--port-num=0",
         f"--port-file={port_file}", "--num-connections=1", "--beam=20",
         "--acoustic-scale=1.0", f"--samp-freq={SAMP_FREQ}",
         f"--silence-phone-id={lang.silence_id}",
         "--word-symbol-table=words.txt", "am.mdl", "HCLG.fst"],
        cwd=str(tmp_path), stdout=sp.PIPE, stderr=sp.PIPE, text=True,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    try:
        for _ in range(600):  # model load + compile can take a while
            if port_file.exists() and port_file.read_text().strip():
                break
            if proc.poll() is not None:
                raise AssertionError(
                    f"server died: {proc.communicate()[1]}")
            time.sleep(0.5)
        else:
            raise AssertionError("server never bound a port")
        port = int(port_file.read_text())
        key = sorted(sw)[0]
        pcm = np.clip(sw[key], -32768, 32767).astype("<i2").tobytes()
        with socket.create_connection(("127.0.0.1", port), timeout=120) as c:
            c.settimeout(120)
            # stream in ~0.25 s chunks like a live client
            step = int(0.25 * SAMP_FREQ) * 2
            for i in range(0, len(pcm), step):
                c.sendall(pcm[i: i + step])
            c.shutdown(socket.SHUT_WR)
            received = b""
            while True:
                try:
                    data = c.recv(4096)
                except socket.timeout:
                    break
                if not data:
                    break
                received += data
        text = received.decode()
        assert "\n" in text, f"no final hypothesis in {text!r}"
        finals = [seg.split("\r")[-1]
                  for seg in text.split("\n") if seg.strip("\r")]
        hyp_words = " ".join(f.strip() for f in finals if f.strip()).split()
        assert hyp_words == list(st[key]), (hyp_words, st[key])
    finally:
        try:
            proc.wait(timeout=60)
        except sp.TimeoutExpired:
            proc.kill()
            proc.wait()


def test_nnet3_discriminative_cli(system):
    """Sequence training over real decode lattices: generate den lattices
    on the training data with the CE-trained am-nnet, then
    nnet3-discriminative-train improves the sMBR objective reported by
    nnet3-discriminative-compute-objf."""
    d, D, P, _phones = system
    if not (d / "am.mdl").exists():
        pytest.skip("CE pipeline test must run first")
    run(["nnet3-latgen-faster", "--beam=24", "--acoustic-scale=1.0",
         "am.mdl", "HCLG.fst", "ark:train.ark", "ark:denlat.ark",
         "ark:trainhyp.ark"], d)
    r0 = run(["nnet3-discriminative-compute-objf", "--criterion=smbr",
              "--acoustic-scale=1.0", "am.mdl", "ark:train.ark",
              "ark:nnet_ali.ark", "ark:denlat.ark"], d)
    o0 = float(re.search(r"objf per frame: (\S+)", r0.stdout)[1])
    run(["nnet3-discriminative-train", "--criterion=smbr",
         "--acoustic-scale=1.0", "--num-epochs=2", "--learning-rate=1e-3",
         "am.mdl", "ark:train.ark", "ark:nnet_ali.ark", "ark:denlat.ark",
         "am_smbr.mdl"], d)
    r1 = run(["nnet3-discriminative-compute-objf", "--criterion=smbr",
              "--acoustic-scale=1.0", "am_smbr.mdl", "ark:train.ark",
              "ark:nnet_ali.ark", "ark:denlat.ark"], d)
    o1 = float(re.search(r"objf per frame: (\S+)", r1.stdout)[1])
    assert 0.0 <= o0 <= 1.0 and 0.0 <= o1 <= 1.0
    assert o1 >= o0 - 1e-6, (o0, o1)  # accuracy did not degrade
    # held-out decode still at 0% WER after sequence training
    run(["nnet3-latgen-faster", "--beam=24", "--acoustic-scale=1.0",
         "--word-symbol-table=words.txt", "am_smbr.mdl", "HCLG.fst",
         "ark:test.ark", "ark:lat_smbr.ark", "ark:hyp_smbr.ark"], d)
    out = run(["compute-wer", "ark:ref.ark", "ark:hyp_smbr.ark"], d)
    assert "%WER 0.00" in out.stdout, out.stdout + out.stderr
