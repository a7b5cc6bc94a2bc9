"""Benchmark: batched decode throughput (audio-seconds/s/chip) + WER.

Two systems, ONE JSON line:

  * minilib (flagship, BASELINE configs 2-3 scale): 20k-word lexicon,
    pruned trigram LM, triphone tree, TDNN-F AM — an HCLG in the
    million-state range, decoded token-sparse (max_active=2048) over the
    held-out test set with MEASURED WER.  This is the realistic number:
    the graph no longer fits the dense kernels and per-frame cost is
    gather/sort-bound (recipes/minilib.py; artifacts under exp/minilib,
    committed so the bench starts warm).
  * toy (1050-state unigram HCLG, dense kernel): the kernel-envelope
    number — MFCC+deltas -> TDNN-F -> fused dense beam search + on-device
    backtrace as ONE jitted program.

The printed line's value/vs_baseline is the FLAGSHIP (minilib) decode
throughput with its WER; the toy number rides as "toy_audio_s_per_s".
If the minilib artifacts are missing (fresh clone without exp/), the toy
line is printed alone so the bench never fails outright.

vs_baseline: the reference decodes at roughly RTF 1.0 per CPU core
(BASELINE.md, recalled upstream range 0.5-1.5, unverified — the
reference mount has been empty every round), so vs_baseline = value /
1.0 audio-s/s-per-core: how many upstream single-core decoders one chip
replaces at the headline operating point.  The basis rides in the JSON
as vs_baseline_basis.
"""

from __future__ import annotations

import json
import math
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))


def verify_kernels() -> bool:
    """Run the COMPILED Pallas lowerings against their jnp references on
    whatever backend the bench runs on (r4 verdict #7: the local test
    suite's compiled-TPU test is skipped off-chip, so the driver-run
    bench is where the production kernel paths must be asserted each
    round).  Raises AssertionError on any mismatch."""
    import jax
    import jax.numpy as jnp

    from old_kaldi_git_tpu.feat.compute import MfccOptions
    from old_kaldi_git_tpu.feat.window import extract_frames
    from old_kaldi_git_tpu.gmm.diag_gmm import AmDiagGmm, DiagGmm
    from old_kaldi_git_tpu.ops import (
        fused_mfcc_from_frames,
        fused_mfcc_reference,
        gmm_loglikes_pallas,
        gmm_loglikes_reference,
        make_mfcc_weights,
        pack_gmm_weights,
    )
    from old_kaldi_git_tpu.ops.gather_kernel import batched_table_gather

    rng = np.random.default_rng(0)
    # 1. one-hot loglike gather (the token-sparse decoder's hot lookup)
    tab = jnp.asarray(rng.normal(size=(8, 2000)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 2000, size=(8, 1536)).astype(np.int32))
    ref = jnp.take_along_axis(tab, idx, axis=1)
    out = batched_table_gather(tab, idx)
    if not bool((np.asarray(out) == np.asarray(ref)).all()):
        raise AssertionError(
            "compiled Pallas gather != take_along_axis on this backend")
    # 2. fused MFCC (STFT-as-matmul + mel + DCT)
    mopts = MfccOptions(use_energy=False)
    mopts.frame_opts.dither = 0.0
    wave = jnp.asarray((rng.normal(size=8000) * 1000).astype(np.float32))
    frames, _ = extract_frames(wave, mopts.frame_opts)
    weights = make_mfcc_weights(mopts)
    got = np.asarray(fused_mfcc_from_frames(frames, weights))
    want = np.asarray(fused_mfcc_reference(frames, weights))
    if not np.allclose(got, want, rtol=1e-3, atol=1e-3):
        raise AssertionError("compiled Pallas MFCC kernel != jnp reference")
    # 3. GMM loglikes (matmul + group logsumexp)
    pdfs = []
    for _ in range(37):
        m = 1 + int(rng.integers(1, 6))
        g = DiagGmm(np.abs(rng.random(m)) + 0.1,
                    rng.normal(size=(m, 13)) * 2,
                    0.3 + rng.random((m, 13)))
        g.weights = g.weights / g.weights.sum()
        pdfs.append(g)
    am = AmDiagGmm(pdfs)
    feats = jnp.asarray(rng.normal(size=(200, 13)).astype(np.float32))
    got = np.asarray(gmm_loglikes_pallas(feats, pack_gmm_weights(am)))
    want = np.asarray(gmm_loglikes_reference(feats, am))
    # contract: <= 0.02 nats absolute (measured 0.004 worst-case from
    # the bf16-input group-sum matmul; the r5 fixes took this from 14
    # nats — a real stabilizer-floor bug — and 0.23 — a stabilizer
    # rounding asymmetry — down to rounding noise)
    if not np.allclose(got, want, rtol=2e-3, atol=2e-2):
        raise AssertionError("compiled Pallas GMM kernel != jnp reference")
    return True


def build_toy_system(num_words: int = 200, seed: int = 0):
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


def run_toy() -> dict:
    """Fused-pipeline dense decode on the 1050-state toy (the r01/r02
    headline): audio-seconds/s/chip at B=1024 x 10 s."""
    import jax
    import jax.numpy as jnp

    from old_kaldi_git_tpu.decoder.viterbi import (
        BIG,
        _decode_and_backtrace,
        results_from_arcs,
    )
    from old_kaldi_git_tpu.feat import Mfcc, MfccOptions, compute_deltas
    from old_kaldi_git_tpu.feat.window import num_frames as count_frames

    # B=512 measured ~1.8x per doubling up to B=1024 (scan alone 30.8k
    # audio-s/s); [T, B, S] winning-arc store ~4.3 GB, within 16 GB HBM
    B = 1024
    DUR = 10.0
    SR = 16000.0

    lang, tm, csr, am = build_toy_system()
    rng = np.random.default_rng(1)
    waves = rng.normal(size=(B, int(DUR * SR))).astype(np.float32) * 2000.0

    mfcc_opts = MfccOptions()
    mfcc_opts.frame_opts.dither = 0.0
    mfcc = Mfcc(mfcc_opts)

    model = am.model()
    variables = am.variables
    log_priors = jnp.asarray(am.log_priors)
    S = csr.num_states
    K = S  # dense mode (beam-only pruning)
    T = count_frames(int(DUR * SR), mfcc_opts.frame_opts)
    nf_dev = jnp.full((B,), T, jnp.int32)
    frm_dev = jnp.asarray(
        np.repeat(np.arange(S, dtype=np.int32), csr.out_degree())
    )
    fw_dev = jnp.asarray(
        np.where(np.isfinite(csr.final_weight), csr.final_weight, BIG)
        .astype(np.float32)
    )
    pdf_dev = jnp.asarray(csr.pdf)
    w_dev = jnp.asarray(csr.weight)
    ns_dev = jnp.asarray(csr.nextstate)

    # ONE fused program (frontend + AM + search + backtrace): the tunneled
    # compile service queues per compilation; a single program bounds a
    # cold run to one queue wait
    @jax.jit
    def full_pipeline(w):
        f = compute_deltas(mfcc(w))  # 13 MFCC x (static+delta+accel) = 39
        logits = model.apply(variables, f, train=False)
        logp = jax.nn.log_softmax(logits, axis=-1) - log_priors
        return _decode_and_backtrace(
            frm_dev, pdf_dev, w_dev, ns_dev, csr.start, logp, nf_dev,
            1.0, 14.0, fw_dev, K, S,
        )

    nf_host = np.full(B, T, np.int32)

    def pipeline(waves_dev):
        end, has_final, costs, arcs = full_pipeline(waves_dev)
        return results_from_arcs(
            csr, np.asarray(arcs), np.asarray(end), np.asarray(has_final),
            np.asarray(costs, np.float64), nf_host,
        )

    waves_dev = jnp.asarray(waves)
    pipeline(waves_dev)  # warmup: the one big compile

    runs = 4
    wall = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        results = pipeline(waves_dev)
        wall = min(wall, time.perf_counter() - t0)
    ok = sum(1 for r in results if r is not None)
    return {
        "toy_audio_s_per_s": round(B * DUR / wall, 2),
        "toy_states": csr.num_states,
        "toy_arcs": csr.num_arcs,
        "toy_decoded": f"{ok}/{B}",
    }


def run_minilib() -> dict | None:
    """Flagship: token-sparse decode of the 20k-word trigram system with
    measured WER in BOTH evaluation regimes (clean + noisy; r4 verdict
    #2 — at clean-corpus 0.03-0.07% WER nothing quality-related can be
    resolved, so every system also reports WER at minilib.NOISE_EVAL
    where the CE first pass sits at a few percent)."""
    from old_kaldi_git_tpu.recipes import minilib as ml

    workdir = os.path.join(REPO, "exp", "minilib")
    # lang.pkl is a derived cache (rebuilt in ~4 s when absent)
    needed = ["arpa.txt.gz", "tree.pkl", "final.am", "hclg.npz"]
    if not all(os.path.exists(os.path.join(workdir, n)) for n in needed):
        return None
    system = ml.load_system(workdir, build_missing=False)
    S, A = system.csr.num_states, system.csr.num_arcs
    NOISE = ml.NOISE_EVAL

    # headline operating point: K=1024, B=128 — the r5 K-vs-WER sweep
    # measured WER flat from K=2048 down to K=512 in BOTH regimes
    # (clean 0.07%, noisy 3.56% at every K), so the headline moves to
    # the fastest WER-neutral point with a 2x safety margin over K=512
    # (upstream decode.sh defaults to max-active 7000 for arbitrary
    # corpora; K=2048 rides along as the conservative row)
    out = {}
    for tag, K, B in (("", 1024, 128), ("k2048_", 2048, 64),
                      ("k512_", 512, 128)):
        wer, audio_s = ml.decode_and_score(
            system, max_active=K, batch=B)  # warmup
        wall = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            wer, audio_s = ml.decode_and_score(system, max_active=K,
                                               batch=B)
            wall = min(wall, time.perf_counter() - t0)
        out[f"{tag}value"] = round(audio_s / wall, 2)
        out[f"{tag}wer"] = round(wer, 2)
    out["k2048_audio_s_per_s"] = out.pop("k2048_value")
    out["k512_audio_s_per_s"] = out.pop("k512_value")
    nwer, _ = ml.decode_and_score(system, max_active=1024, batch=128,
                                  noise=NOISE)
    out["noisy_wer"] = round(nwer, 2)
    # chain LF-MMI decode (config-4 shape at scale: frame-subsampling 3,
    # self-loop-scale-1.0 split-eps graph) when its artifacts are present
    if all(os.path.exists(os.path.join(workdir, n))
           for n in ("chain.mdl", "chain_hclg.npz")):
        wer_c, audio_c = ml.decode_and_score_chain(workdir)  # warmup
        wall = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            wer_c, audio_c = ml.decode_and_score_chain(workdir)
            wall = min(wall, time.perf_counter() - t0)
        out["chain_audio_s_per_s"] = round(audio_c / wall, 2)
        out["chain_wer"] = round(wer_c, 2)
        nwer_c, _ = ml.decode_and_score_chain(workdir, noise=NOISE)
        out["noisy_chain_wer"] = round(nwer_c, 2)
    # online-iVector systems (reference mini_librispeech recipe standard;
    # config-2/3/4 adaptation parity) when their artifacts are present
    if all(os.path.exists(os.path.join(workdir, n))
           for n in ("final.ie", "final_ivec.am")):
        wer_i, audio_i = ml.decode_and_score(
            system, max_active=2048, use_ivectors=True)  # warmup
        t0 = time.perf_counter()
        wer_i, audio_i = ml.decode_and_score(
            system, max_active=2048, use_ivectors=True)
        out["ce_ivec_audio_s_per_s"] = round(
            audio_i / (time.perf_counter() - t0), 2)
        out["ce_ivec_wer"] = round(wer_i, 2)
        nwer_i, _ = ml.decode_and_score(
            system, max_active=2048, use_ivectors=True, noise=NOISE)
        out["noisy_ce_ivec_wer"] = round(nwer_i, 2)
    if all(os.path.exists(os.path.join(workdir, n))
           for n in ("final.ie", "chain_ivec.mdl", "chain_hclg.npz")):
        wer_ci, audio_ci = ml.decode_and_score_chain(
            workdir, use_ivectors=True)  # warmup
        t0 = time.perf_counter()
        wer_ci, audio_ci = ml.decode_and_score_chain(
            workdir, use_ivectors=True)
        out["chain_ivec_audio_s_per_s"] = round(
            audio_ci / (time.perf_counter() - t0), 2)
        out["chain_ivec_wer"] = round(wer_ci, 2)
        nwer_ci, _ = ml.decode_and_score_chain(
            workdir, use_ivectors=True, noise=NOISE)
        out["noisy_chain_ivec_wer"] = round(nwer_ci, 2)
    # config-5: full 4-gram lattice rescoring at the noisy operating
    # point (64 utterances bounds the bench wall; the full-set numbers
    # are in BASELINE.md), with lattice oracle WER
    before, after = ml.rescore_and_score(
        system, noise=NOISE, full_lm_order=4, compute_oracle=True,
        num_utts=64)
    stats = ml.rescore_and_score.last_stats
    out["rescore_before_wer"] = round(before, 2)
    out["rescore_after_wer"] = round(after, 2)
    out["rescore_oracle_wer"] = round(stats["oracle_wer"], 2)
    return {
        **out,
        "states": S,
        "arcs": A,
        "audio_s": round(audio_s, 1),
        "num_test_utts": len(system.test_waves),
    }


def main():
    import jax

    cache_dir = os.path.join(REPO, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    backend = jax.default_backend()

    kernels_verified = verify_kernels()  # raises loudly on mismatch
    toy = run_toy()
    mini = run_minilib()
    if mini is None:
        out = {
            "metric": "decode audio-seconds/s/chip (toy 1050-state dense "
                      f"pipeline, backend={backend}; minilib artifacts "
                      "missing)",
            "value": toy["toy_audio_s_per_s"],
            "unit": "audio_sec_per_sec_per_chip",
            "vs_baseline": toy["toy_audio_s_per_s"],
            "kernels_verified": kernels_verified,
            **toy,
        }
    else:
        out = {
            "metric": (
                "minilib decode audio-seconds/s/chip + WER (20k words, "
                f"pruned trigram, {mini['states']} states, {mini['arcs']} "
                f"arcs, token-sparse max_active=1024 batch=128, "
                f"backend={backend})"
            ),
            "value": mini["value"],
            "unit": "audio_sec_per_sec_per_chip",
            # reference posture: upstream Kaldi decodes at ~RTF 1.0 per
            # CPU core (recalled 0.5-1.5, BASELINE.md "Reference
            # comparison"); vs_baseline = value / 1.0 audio-s/s-per-core,
            # i.e. how many upstream single-core decoders one chip
            # replaces at this operating point
            "vs_baseline": round(mini["value"] / 1.0, 2),
            "vs_baseline_basis": "upstream ~1x realtime per CPU core "
                                 "(recalled range 0.5-1.5, unverified)",
            "kernels_verified": kernels_verified,
            **{k: v for k, v in mini.items() if k != "value"},
            **toy,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
