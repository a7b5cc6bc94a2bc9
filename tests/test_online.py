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
