"""Graph-sharded token-sparse decoder (decoder/sharded.py): equivalence
with the single-device token kernel on the virtual 8-device CPU mesh.
The shard plan splits arc storage by contiguous state ranges; per frame
each device expands its own arcs and the candidate sets merge via
all_gather — results must be identical in the exact regime and agree on
words under normal beam/K settings."""

import jax
import numpy as np
import pytest

from old_kaldi_git_tpu.decoder.csr import CsrGraph, fst_to_csr
from old_kaldi_git_tpu.decoder.graph import mkgraph
from old_kaldi_git_tpu.decoder.sharded import (
    decode_batch_tokens_sharded,
    shard_graph,
)
from old_kaldi_git_tpu.decoder.viterbi import (
    ViterbiOptions,
    decode_batch,
    decode_batch_tokens,
)
from old_kaldi_git_tpu.fst.lang import make_unigram_grammar_fst

from tests.test_decoder import _simulate_loglikes, _toy_system


def _random_csr(rng, S=500, deg=4, P=20):
    row_ptr = (np.arange(S + 1) * deg).astype(np.int32)
    nxt = ((np.repeat(np.arange(S), deg)
            + rng.integers(1, 50, S * deg)) % S).astype(np.int32)
    return CsrGraph(
        start=0, row_ptr=row_ptr,
        tid=rng.integers(1, 100, S * deg).astype(np.int32),
        pdf=rng.integers(0, P, S * deg).astype(np.int32),
        weight=rng.exponential(1.0, S * deg).astype(np.float32),
        nextstate=nxt, final_weight=np.zeros(S, np.float32),
        arc_olabels=[() for _ in range(S * deg)],
        final_olabels=[() for _ in range(S)])


def test_shard_graph_partition_covers_all_arcs():
    rng = np.random.default_rng(1)
    g = _random_csr(rng)
    sg = shard_graph(g, 8)
    assert sg.num_shards == 8
    md = sg.md
    # every graph arc appears in exactly one shard's tiles with its data
    # intact (padded tile-slot id -> graph arc via pad2orig)
    seen = np.zeros(g.num_arcs, bool)
    for d in range(8):
        lo = int(sg.lo[d])
        hi = int(sg.lo[d + 1]) if d + 1 < 8 else g.num_states
        n_states = hi - lo
        # local tile_ptr reproduces the per-state tile counts
        local_tiles = np.diff(sg.tile_ptr[d])[:n_states]
        glob_deg = np.diff(g.row_ptr)[lo:hi]
        np.testing.assert_array_equal(local_tiles, -(-glob_deg // md))
        assert (np.diff(sg.tile_ptr[d])[n_states:] == 0).all()
        n_tiles = int(sg.tile_ptr[d, n_states])
        flat = sg.tiles[d, :n_tiles].reshape(-1, 3)
        pad_ids = (int(sg.tile_off[d]) * md
                   + np.arange(n_tiles * md))
        orig = sg.pad2orig[pad_ids]
        real = orig >= 0
        assert not seen[orig[real]].any()
        seen[orig[real]] = True
        np.testing.assert_array_equal(flat[real, 1], g.pdf[orig[real]])
        np.testing.assert_array_equal(flat[real, 2],
                                      g.nextstate[orig[real]])
        np.testing.assert_array_equal(
            flat[real, 0].view(np.float32), g.weight[orig[real]])
        # padding slots carry BIG weights (can never win)
        assert (flat[~real, 0].view(np.float32) >= 1e9).all()
    assert seen.all()
    # tile balance: no shard holds more than ~2x the fair share
    total_tiles = int(sg.tile_off[-1]) + int(
        sg.tile_ptr[-1, :].max())
    per_shard = [int(sg.tile_ptr[d].max()) for d in range(8)]
    assert max(per_shard) <= 2 * total_tiles // 8 + int(
        max(-(-np.diff(g.row_ptr) // md)))


def test_sharded_exact_regime_matches_dense():
    """K >= S and unbounded beam: the sharded decoder must be exact
    Viterbi, identical to both the dense and single-device token paths."""
    rng = np.random.default_rng(2)
    g = _random_csr(rng)
    ll = rng.normal(size=(3, 40, 20)).astype(np.float32)
    nf = np.full(3, 40, np.int32)
    opts = ViterbiOptions(beam=1e9, max_active=512, acoustic_scale=0.1)
    dense = decode_batch(g, ll, nf, opts)
    shd = decode_batch_tokens_sharded(g, ll, nf, opts=opts)
    for d, s in zip(dense, shd):
        assert d is not None and s is not None
        assert s.cost == pytest.approx(d.cost, abs=1e-3)
        assert np.array_equal(s.alignment, d.alignment)


def test_sharded_matches_single_device_tokens_on_hclg():
    """Real HCLG + realistic beam/K: words, alignments and costs agree
    with decode_batch_tokens; lattice token sets come back too."""
    lang, topo, cd, tm = _toy_system()
    gfst = make_unigram_grammar_fst(
        [["yes"], ["no"], ["yes", "no"]], lang.words)
    hclg = mkgraph(lang, gfst, cd, tm)
    csr = fst_to_csr(hclg, tm.tid_to_pdf_array())

    def phone_ids(words):
        m = {"yes": ["Y", "EH", "S"], "no": ["N", "OW"]}
        return [lang.phones[p] for w in words for p in m[w]]

    cases = [["yes"], ["no", "yes"], ["no", "no", "no"]]
    lls = [_simulate_loglikes(tm, cd, lang, phone_ids(c),
                              frames_per_phone=6, sep=2.0) for c in cases]
    T = max(l.shape[0] for l in lls)
    loglikes = np.full((len(cases), T, cd.num_pdfs), -20.0, np.float32)
    nf = np.zeros(len(cases), np.int32)
    for i, l in enumerate(lls):
        loglikes[i, : l.shape[0]] = l
        nf[i] = l.shape[0]
    opts = ViterbiOptions(beam=30.0, max_active=200, acoustic_scale=1.0)
    single = decode_batch_tokens(csr, loglikes, nf, opts)
    # prebuilt shard plan path + want_lattice
    sg = shard_graph(csr, len(jax.devices()))
    shd = decode_batch_tokens_sharded(
        sg, loglikes, nf, opts=opts, want_lattice=True)
    for a, b in zip(single, shd):
        assert a is not None and b is not None
        assert b.words == a.words
        assert np.array_equal(b.alignment, a.alignment)
        assert b.cost == pytest.approx(a.cost, abs=1e-3)
        assert b.frame_states is not None


def test_sharded_mesh_axis_mismatch_raises():
    rng = np.random.default_rng(3)
    g = _random_csr(rng, S=64)
    sg = shard_graph(g, 4)  # plan for 4, mesh has len(jax.devices())
    if len(jax.devices()) == 4:
        pytest.skip("mesh happens to match")
    ll = rng.normal(size=(1, 5, 20)).astype(np.float32)
    with pytest.raises(ValueError):
        decode_batch_tokens_sharded(sg, ll, [5])


def test_sharded_rejects_split_eps_graph():
    """Split-eps graphs (eps_ns set) must be refused loudly: the sharded
    kernel has no backoff-hop merge, so decoding one silently over
    emitting arcs only would drop backoff transitions (r4 advisor)."""
    rng = np.random.default_rng(4)
    g = _random_csr(rng, S=64)
    split = CsrGraph(
        start=g.start, row_ptr=g.row_ptr, tid=g.tid, pdf=g.pdf,
        weight=g.weight, nextstate=g.nextstate,
        final_weight=g.final_weight, arc_olabels=g.arc_olabels,
        final_olabels=g.final_olabels,
        eps_ns=np.zeros(64, np.int32), eps_w=np.zeros(64, np.float32),
        eps_olab=np.zeros(64, np.int32), eps_depth=1)
    from old_kaldi_git_tpu.utils.log import KaldiError

    with pytest.raises(KaldiError):
        shard_graph(split, 2)
    ll = rng.normal(size=(1, 5, 20)).astype(np.float32)
    with pytest.raises(KaldiError):
        decode_batch_tokens_sharded(split, ll, [5])
