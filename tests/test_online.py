"""Online/streaming tests: streaming==batch equivalence, chunked decode,
endpointing (the reference's online-feature-test / online2 oracles)."""

import numpy as np
import pytest

import jax.numpy as jnp

from old_kaldi_git_tpu.decoder.csr import fst_to_csr
from old_kaldi_git_tpu.decoder.graph import mkgraph
from old_kaldi_git_tpu.decoder.viterbi import ViterbiOptions, decode_batch
from old_kaldi_git_tpu.feat.compute import MfccOptions
from old_kaldi_git_tpu.fst.lang import Lang, Lexicon, make_unigram_grammar_fst
from old_kaldi_git_tpu.hmm.topology import HmmTopology
from old_kaldi_git_tpu.hmm.transition_model import TransitionModel
from old_kaldi_git_tpu.online.streaming import (
    EndpointRule,
    OnlineFeaturePipeline,
    StreamingDecoder,
)
from old_kaldi_git_tpu.tree.context_dep import monophone_context_dependency


def _pipeline_opts():
    opts = MfccOptions()
    opts.frame_opts.dither = 0.0
    opts.frame_opts.samp_freq = 8000.0
    return opts


def test_streaming_features_chunked_equals_whole():
    """Feeding audio in odd-sized chunks gives identical features to feeding
    it all at once (the online-feature-test oracle)."""
    rng = np.random.default_rng(0)
    wave = (rng.normal(size=9000) * 800).astype(np.float32)

    whole = OnlineFeaturePipeline(_pipeline_opts())
    out_whole = [whole.accept_waveform(wave), whole.input_finished()]
    f_whole = np.concatenate([o for o in out_whole if o.size])

    chunked = OnlineFeaturePipeline(_pipeline_opts())
    outs = []
    pos = 0
    for sz in (100, 757, 1200, 3000, 1943, 2000):
        outs.append(chunked.accept_waveform(wave[pos : pos + sz]))
        pos += sz
    outs.append(chunked.input_finished())
    f_chunked = np.concatenate([o for o in outs if o.size])

    assert f_whole.shape == f_chunked.shape
    np.testing.assert_allclose(f_chunked, f_whole, rtol=1e-4, atol=1e-4)
    assert f_whole.shape[1] == 39  # with deltas


def _toy_decode_system():
    lex = Lexicon.from_dict({"yes": "Y EH S", "no": "N OW"})
    lang = Lang(lex, silence_phone="SIL", sil_prob=0.5)
    phones = lang.real_phone_ids
    topo = HmmTopology.standard(phones, silence_phones=[lang.silence_id])
    cd = monophone_context_dependency(
        phones, {p: topo.num_pdf_classes(p) for p in phones}
    )
    tm = TransitionModel(cd, topo)
    g = make_unigram_grammar_fst([["yes"], ["no"]], lang.words)
    csr = fst_to_csr(mkgraph(lang, g, cd, tm), tm.tid_to_pdf_array())
    return lang, topo, cd, tm, csr


def _loglikes_for(tm, cd, lang, phone_names, frames_per_phone=6, sep=6.0):
    topo = tm.topo
    rows = []
    for name in phone_names:
        phone = lang.phones[name]
        entry = topo.topology_for_phone(phone)
        emitting = [st.pdf_class for st in entry if st.pdf_class >= 0]
        per = max(1, frames_per_phone // len(emitting))
        for pc in emitting:
            pdf = cd.compute([phone], pc)
            for _ in range(per):
                row = np.full(cd.num_pdfs, -sep, np.float32)
                row[pdf] = 0.0
                rows.append(row)
    return np.stack(rows)


def test_streaming_decoder_matches_batch():
    lang, topo, cd, tm, csr = _toy_decode_system()
    ll = _loglikes_for(tm, cd, lang, ["Y", "EH", "S"])
    T = ll.shape[0]
    batch = decode_batch(
        csr, ll[None], [T], ViterbiOptions(beam=30.0, max_active=200, acoustic_scale=1.0)
    )[0]

    dec = StreamingDecoder(
        csr, lambda f: jnp.asarray(f),  # identity "AM": feats ARE loglikes
        silence_phones=[lang.silence_id],
        tid_to_phone=tm.tid_to_phone_array(),
        opts=ViterbiOptions(beam=30.0, max_active=200, acoustic_scale=1.0),
    )
    for lo in range(0, T, 5):
        dec.advance(ll[lo : lo + 5])
    words = dec.best_words()
    assert [lang.words[w] for w in words] == [lang.words[w] for w in batch.words]
    assert [lang.words[w] for w in words] == ["yes"]


def test_streaming_endpoint_on_trailing_silence():
    lang, topo, cd, tm, csr = _toy_decode_system()
    speech = _loglikes_for(tm, cd, lang, ["N", "OW"])
    # one long silence visit: 24 frames per SIL state (the self-loops absorb
    # the dwell; SIL cannot re-enter without an intervening word in L)
    silence = _loglikes_for(tm, cd, lang, ["SIL"], frames_per_phone=120)
    dec = StreamingDecoder(
        csr, lambda f: jnp.asarray(f),
        silence_phones=[lang.silence_id],
        tid_to_phone=tm.tid_to_phone_array(),
        opts=ViterbiOptions(beam=30.0, max_active=200, acoustic_scale=1.0),
        endpoint_rules=[EndpointRule(True, 0.5, 0.0)],
    )
    dec.advance(speech)
    assert not dec.endpoint_detected()
    dec.advance(silence)
    assert dec.trailing_silence_frames() * 0.01 >= 0.5
    assert dec.endpoint_detected()
    assert [lang.words[w] for w in dec.best_words()] == ["no"]


def test_streaming_am_equals_batch():
    """Looped-computation oracle (reference nnet-compile-looped): chunked
    streaming evaluation with carried LSTM state + per-layer context
    buffers equals whole-utterance evaluation exactly."""
    import jax
    import jax.numpy as jnp

    from old_kaldi_git_tpu.models.am_nnet import AmNnet
    from old_kaldi_git_tpu.models.streaming_am import StreamingAmNnet
    from old_kaldi_git_tpu.models.tdnn import TdnnConfig, TdnnLayerSpec

    rng = np.random.default_rng(0)
    D, P, T = 8, 12, 57
    cfg = TdnnConfig(
        D, P,
        (
            TdnnLayerSpec("tdnn", 16, offsets=(-2, -1, 0, 1, 2)),
            TdnnLayerSpec("tdnnf", 16, bottleneck_dim=8, time_stride=3),
            TdnnLayerSpec("lstmp", 16, recurrent_dim=8),
            TdnnLayerSpec("attention", 0, num_heads=2, key_dim=4,
                          value_dim=4, num_left_inputs=2, num_right_inputs=1),
        ),
        final_hidden_dim=16,
    )
    am = AmNnet.init(cfg, seed=0)
    am.log_priors = np.log(
        np.full(P, 1.0 / P, np.float32)
    )
    feats = rng.standard_normal((T, D)).astype(np.float32)
    ref = np.asarray(am.loglikes_batch(jnp.asarray(feats[None])))[0]

    for chunks in ([T], [10, 20, 27], [1] * T, [5, 52]):
        sam = StreamingAmNnet(am)
        outs = []
        pos = 0
        for i, c in enumerate(chunks):
            final = i == len(chunks) - 1
            outs.append(sam.accept(feats[pos: pos + c], final=final))
            pos += c
        got = np.concatenate([o for o in outs if o.size], axis=0)
        assert got.shape == ref.shape, (got.shape, ref.shape)
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)

    # blstmp rejected
    bad = TdnnConfig(D, P, (TdnnLayerSpec("blstmp", 8, recurrent_dim=4),))
    am2 = AmNnet.init(bad, seed=0)
    with pytest.raises(ValueError):
        StreamingAmNnet(am2)


def test_streaming_token_decoder_matches_batch():
    """StreamingTokenDecoder (token-sparse carried beam state — the
    million-state streaming path) == batch decode_batch_tokens for any
    chunking, including alignment and endpointing behavior."""
    from old_kaldi_git_tpu.decoder.viterbi import decode_batch_tokens
    from old_kaldi_git_tpu.online.streaming import StreamingTokenDecoder

    lang, topo, cd, tm, csr = _toy_decode_system()
    ll = _loglikes_for(tm, cd, lang, ["Y", "EH", "S"])
    T = ll.shape[0]
    vopts = ViterbiOptions(beam=30.0, max_active=64, acoustic_scale=1.0)
    batch = decode_batch_tokens(csr, ll[None], [T], vopts)[0]

    for chunks in ([5] * ((T + 4) // 5), [1] * T, [T], [7, 3, T]):
        dec = StreamingTokenDecoder(
            csr, lambda f: jnp.asarray(f),
            silence_phones=[lang.silence_id],
            tid_to_phone=tm.tid_to_phone_array(),
            opts=vopts,
        )
        lo = 0
        for n in chunks:
            dec.advance(ll[lo: lo + n])
            lo += n
            if lo >= T:
                break
        words, tids = dec._backtrace()
        assert words == batch.words, chunks
        assert tids == list(batch.alignment), chunks

    # endpointing: trailing silence triggers the rule (same semantics as
    # the dense StreamingDecoder)
    speech = _loglikes_for(tm, cd, lang, ["N", "OW"])
    silence = _loglikes_for(tm, cd, lang, ["SIL"], frames_per_phone=120)
    dec = StreamingTokenDecoder(
        csr, lambda f: jnp.asarray(f),
        silence_phones=[lang.silence_id],
        tid_to_phone=tm.tid_to_phone_array(),
        opts=vopts,
        endpoint_rules=[EndpointRule(True, 0.5, 0.0)],
    )
    dec.advance(speech)
    assert not dec.endpoint_detected()
    dec.advance(silence)
    assert dec.endpoint_detected()
    assert [lang.words[w] for w in dec.best_words()] == ["no"]


def _backoff_split_system(seed=7, S=40, P=12):
    """The synthetic backoff-shaped graph from
    tests/test_decoder.py::test_split_eps_decode_matches_folded, as
    (folded CSR, split CSR, tid_to_pdf)."""
    from old_kaldi_git_tpu.decoder.csr import (
        fst_to_csr,
        fst_to_split_csr_arrays,
    )
    from old_kaldi_git_tpu.fst.vector_fst import Arc, INF, VectorFst

    rng = np.random.default_rng(seed)
    fst = VectorFst()
    for _ in range(S):
        fst.add_state()
    fst.start = 0
    for s in range(S):
        for _ in range(3):
            tid = int(rng.integers(1, P + 1))
            fst.add_arc(s, Arc(tid, int(rng.integers(0, 5)),
                               float(rng.exponential(0.5)),
                               int(rng.integers(0, S))))
        if s % 3 != 2 and s + 1 < S:
            fst.add_arc(s, Arc(0, int(rng.integers(0, 3)),
                               float(rng.exponential(0.3)), s + 1))
    for s in range(0, S, 5):
        fst.set_final(s, float(rng.exponential(0.2)))
    tid_to_pdf = np.arange(P + 1, dtype=np.int32)
    tid_to_pdf[1:] = np.arange(P)
    folded = fst_to_csr(fst, tid_to_pdf)
    n = fst.num_states
    counts = np.asarray([len(a) for a in fst.arcs], np.int64)
    row_ptr = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=row_ptr[1:])
    il = np.zeros(int(row_ptr[-1]), np.int32)
    ol = np.zeros_like(il)
    w = np.zeros(len(il), np.float32)
    ns = np.zeros_like(il)
    i = 0
    for lst in fst.arcs:
        for a in lst:
            il[i], ol[i], w[i], ns[i] = (a.ilabel, a.olabel, a.weight,
                                         a.nextstate)
            i += 1
    finals = np.asarray([f if f != INF else np.inf for f in fst.finals],
                        np.float32)
    split = fst_to_split_csr_arrays(
        fst.start, row_ptr.astype(np.int32), il, ol, w, ns, finals,
        tid_to_pdf)
    return folded, split, tid_to_pdf


def test_streaming_split_eps_matches_batch():
    """StreamingTokenDecoder over a SPLIT-EPS (backoff-shaped, chain-style)
    graph == batch decode for any chunking: the per-frame hop merge, the
    start-state eps-closure seeding, and the host backoff-word walk all
    match the batch kernel (r5 — split-eps streaming was a guarded gap)."""
    from old_kaldi_git_tpu.decoder.viterbi import decode_batch_tokens
    from old_kaldi_git_tpu.online.streaming import StreamingTokenDecoder

    _folded, split, tid_to_pdf = _backoff_split_system()
    P = 12
    rng = np.random.default_rng(3)
    T = 25
    ll = rng.normal(size=(T, P)).astype(np.float32)
    vopts = ViterbiOptions(beam=1e9, max_active=64, acoustic_scale=0.7)
    batch = decode_batch_tokens(split, ll[None], [T], vopts)[0]
    assert batch is not None

    for chunks in ([5] * 5, [1] * T, [T], [7, 3, T]):
        dec = StreamingTokenDecoder(
            split, lambda f: jnp.asarray(f),
            silence_phones=[],
            tid_to_phone=np.zeros(split.tid.max() + 1, np.int32),
            opts=vopts,
        )
        lo = 0
        for n in chunks:
            dec.advance(ll[lo: lo + n], final=lo + n >= T)
            lo += n
            if lo >= T:
                break
        words, tids = dec._backtrace()
        assert words == batch.words, chunks
        assert tids == list(batch.alignment), chunks


def test_streaming_frame_subsampling_matches_batch():
    """frame_subsampling_factor=3 (chain streaming): features fed at the
    input rate with a subsampling AM == batch decode over the subsampled
    loglikes, for any input-rate chunking."""
    from old_kaldi_git_tpu.decoder.viterbi import decode_batch_tokens
    from old_kaldi_git_tpu.online.streaming import StreamingTokenDecoder

    _folded, split, _t2p = _backoff_split_system()
    P = 12
    rng = np.random.default_rng(4)
    T_in = 75  # input frames; 25 subsampled
    ll_full = rng.normal(size=(T_in, P)).astype(np.float32)
    ll_sub = ll_full[::3]
    vopts = ViterbiOptions(beam=1e9, max_active=64, acoustic_scale=0.7)
    batch = decode_batch_tokens(split, ll_sub[None], [len(ll_sub)],
                                vopts)[0]
    assert batch is not None

    for chunks in ([30, 30, 15], [T_in], [10] * 8):
        dec = StreamingTokenDecoder(
            split, lambda f: jnp.asarray(f)[:, ::3],
            silence_phones=[],
            tid_to_phone=np.zeros(split.tid.max() + 1, np.int32),
            opts=vopts,
            frame_subsampling_factor=3,
            chunk_quantum=30,
        )
        lo = 0
        for n in chunks:
            dec.advance(ll_full[lo: lo + n], final=lo + n >= T_in)
            lo += n
            if lo >= T_in:
                break
        words, tids = dec._backtrace()
        assert words == batch.words, chunks
        assert tids == list(batch.alignment), chunks
