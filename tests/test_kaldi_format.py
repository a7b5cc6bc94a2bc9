"""Byte-level fixtures for upstream-Kaldi model-file compatibility.

These tests assemble the EXPECTED byte stream by hand (independent struct
code, not io_funcs) following the reference serializers:

  * src/base/io-funcs.h      — \\0B header, token+space, size-marked ints
  * src/hmm/hmm-topology.cc  — binary <Topology> block
  * src/hmm/transition-model.cc — <Triples>/<Tuples> + <LogProbs>
  * src/gmm/diag-gmm.cc      — <DiagGMM><GCONSTS><WEIGHTS><MEANS_INVVARS>
                               <INV_VARS></DiagGMM>
  * src/gmm/am-diag-gmm.cc   — <DIMENSION><NUMPDFS> + per-pdf DiagGmm

so the writer is pinned to the reference layout byte-for-byte and the
reader is proven against reference-layout bytes it did not produce.  The
day the reference mount carries a real final.mdl, these fixtures are the
oracle seam (SURVEY.md §1 third seam / §8 verification debt).
"""

import io
import math
import struct

import numpy as np

from old_kaldi_git_tpu.gmm.diag_gmm import AmDiagGmm, AmGmmModel, DiagGmm
from old_kaldi_git_tpu.hmm.topology import HmmTopology
from old_kaldi_git_tpu.hmm.transition_model import TransitionModel
from old_kaldi_git_tpu.tree.context_dep import monophone_context_dependency


# -- independent byte assemblers (the spec, written twice on purpose) --------

def tok(s):
    return s.encode() + b" "


def i32(v):
    return b"\x04" + struct.pack("<i", v)


def f32(v):
    return b"\x04" + struct.pack("<f", v)


def fv(arr):
    arr = np.asarray(arr, "<f4")
    return tok("FV") + i32(arr.size) + arr.tobytes()


def fm(mat):
    mat = np.asarray(mat, "<f4")
    return tok("FM") + i32(mat.shape[0]) + i32(mat.shape[1]) + mat.tobytes()


def ivec(arr):
    arr = np.asarray(arr, "<i4")
    return b"\x04" + struct.pack("<i", arr.size) + arr.tobytes()


def bakis_topology_bytes(phones, num_states=3):
    """<Topology> block for the standard Bakis entry shared by `phones`."""
    out = tok("<Topology>")
    out += ivec(list(phones))
    idx = [-1] * (max(phones) + 1)
    for p in phones:
        idx[p] = 0
    out += ivec(idx)
    out += i32(1)  # one shared entry
    out += i32(num_states + 1)
    for j in range(num_states):
        out += i32(j)  # pdf-class
        out += i32(2)  # two transitions
        out += i32(j) + f32(0.75)
        out += i32(j + 1) + f32(0.25)
    out += i32(-1) + i32(0)  # final non-emitting state
    out += tok("</Topology>")
    return out


def diag_gmm_bytes(weights, means, variances):
    weights = np.asarray(weights, np.float64)
    means = np.asarray(means, np.float64)
    variances = np.asarray(variances, np.float64)
    dim = means.shape[1]
    gconsts = (
        np.log(np.maximum(weights, 1e-30))
        - 0.5
        * (
            dim * math.log(2 * math.pi)
            + np.log(variances).sum(axis=1)
            + (means**2 / variances).sum(axis=1)
        )
    )
    out = tok("<DiagGMM>")
    out += tok("<GCONSTS>") + fv(gconsts)
    out += tok("<WEIGHTS>") + fv(weights)
    out += tok("<MEANS_INVVARS>") + fm(means / variances)
    out += tok("<INV_VARS>") + fm(1.0 / variances)
    out += tok("</DiagGMM>")
    return out


def make_model():
    phones = [1, 2]
    topo = HmmTopology.standard(phones)
    ctx_dep = monophone_context_dependency(phones, {1: 3, 2: 3})
    tm = TransitionModel(ctx_dep, topo)
    rng = np.random.default_rng(7)
    pdfs = [
        DiagGmm(
            np.asarray([0.6, 0.4]),
            rng.normal(size=(2, 2)),
            1.0 + rng.random((2, 2)),
        )
        for _ in range(ctx_dep.num_pdfs)
    ]
    return tm, AmDiagGmm(pdfs)


def expected_mdl_bytes(tm, am):
    out = b"\x00B"
    out += tok("<TransitionModel>")
    out += bakis_topology_bytes([1, 2])
    out += tok("<Triples>") + i32(len(tm.tuples))
    for phone, hmm_state, pdf in tm.tuples:
        out += i32(phone) + i32(hmm_state) + i32(pdf)
    out += tok("</Triples>")
    out += tok("<LogProbs>") + fv(tm.log_probs) + tok("</LogProbs>")
    out += tok("</TransitionModel>")
    out += tok("<DIMENSION>") + i32(2) + tok("<NUMPDFS>") + i32(am.num_pdfs)
    for pdf in am.pdfs:
        out += diag_gmm_bytes(pdf.weights, pdf.means, pdf.vars)
    return out


def test_final_mdl_writer_matches_reference_layout(tmp_path):
    tm, am = make_model()
    model = AmGmmModel(tm, am)
    path = str(tmp_path / "final.mdl")
    model.save(path)
    with open(path, "rb") as f:
        got = f.read()
    assert got == expected_mdl_bytes(tm, am)


def test_final_mdl_reader_parses_reference_layout_bytes(tmp_path):
    tm, am = make_model()
    path = str(tmp_path / "ref.mdl")
    with open(path, "wb") as f:
        f.write(expected_mdl_bytes(tm, am))
    model = AmGmmModel.load(path)
    assert model.tm.tuples == tm.tuples
    assert model.am.num_pdfs == am.num_pdfs
    np.testing.assert_allclose(
        model.tm.log_probs, tm.log_probs, rtol=1e-6, atol=1e-7
    )
    x = np.random.default_rng(0).normal(size=(5, 2))
    np.testing.assert_allclose(
        model.am.loglikes_numpy(x), am.loglikes_numpy(x), rtol=2e-4, atol=2e-4
    )
    # topology survives the binary round trip
    assert model.tm.topo.phones == [1, 2]
    assert model.tm.topo.num_pdf_classes(1) == 3


def test_reader_accepts_modern_tuples_form(tmp_path):
    """Post-2017 upstream writes <Tuples> with (phone, state, fwd-pdf,
    self-loop-pdf); for fwd==self-loop models the reader must accept it."""
    tm, am = make_model()
    out = b"\x00B" + tok("<TransitionModel>") + bakis_topology_bytes([1, 2])
    out += tok("<Tuples>") + i32(len(tm.tuples))
    for phone, hmm_state, pdf in tm.tuples:
        out += i32(phone) + i32(hmm_state) + i32(pdf) + i32(pdf)
    out += tok("</Tuples>")
    out += tok("<LogProbs>") + fv(tm.log_probs) + tok("</LogProbs>")
    out += tok("</TransitionModel>")
    out += tok("<DIMENSION>") + i32(2) + tok("<NUMPDFS>") + i32(am.num_pdfs)
    for pdf in am.pdfs:
        out += diag_gmm_bytes(pdf.weights, pdf.means, pdf.vars)
    path = str(tmp_path / "modern.mdl")
    with open(path, "wb") as f:
        f.write(out)
    model = AmGmmModel.load(path)
    assert model.tm.tuples == tm.tuples
    assert model.tm.num_tids == tm.num_tids


def test_transition_model_semantics_after_roundtrip(tmp_path):
    tm, am = make_model()
    model = AmGmmModel(tm, am)
    path = str(tmp_path / "rt.mdl")
    model.save(path)
    got = AmGmmModel.load(path).tm
    assert got.num_tids == tm.num_tids
    assert got.num_pdfs == tm.num_pdfs
    for tid in range(1, tm.num_tids + 1):
        assert got.tid_to_pdf(tid) == tm.tid_to_pdf(tid)
        assert got.tid_to_phone(tid) == tm.tid_to_phone(tid)


# ---------------------------------------------------------------------------
# OpenFst binary FST + CompactLattice layouts (src/fstext/kaldi-fst-io.cc,
# src/lat/kaldi-lattice.cc) — round-2 verdict ask #9
# ---------------------------------------------------------------------------

def fst_header_bytes(arctype, start, numstates, numarcs):
    out = struct.pack("<i", 2125659606)
    for s in ("vector", arctype):
        out += struct.pack("<i", len(s)) + s.encode()
    out += struct.pack("<ii", 2, 0)       # version 2, flags 0
    out += struct.pack("<Q", 3)           # properties expanded|mutable
    out += struct.pack("<qqq", start, numstates, numarcs)
    return out


def _make_std_fst():
    from old_kaldi_git_tpu.fst.vector_fst import Arc, VectorFst

    fst = VectorFst()
    s0, s1, s2 = fst.add_state(), fst.add_state(), fst.add_state()
    fst.set_start(s0)
    fst.add_arc(s0, Arc(3, 7, 0.5, s1))
    fst.add_arc(s0, Arc(0, 0, 1.25, s2))
    fst.add_arc(s1, Arc(4, 0, -0.5, s2))
    fst.set_final(s2, 2.0)
    return fst


def expected_std_fst_bytes():
    out = fst_header_bytes("standard", 0, 3, 3)
    # state 0: nonfinal (+inf), 2 arcs
    out += struct.pack("<f", float("inf")) + struct.pack("<q", 2)
    out += struct.pack("<iifi", 3, 7, 0.5, 1)
    out += struct.pack("<iifi", 0, 0, 1.25, 2)
    # state 1
    out += struct.pack("<f", float("inf")) + struct.pack("<q", 1)
    out += struct.pack("<iifi", 4, 0, -0.5, 2)
    # state 2: final 2.0, no arcs
    out += struct.pack("<f", 2.0) + struct.pack("<q", 0)
    return out


def test_openfst_stdarc_writer_matches_reference_layout():
    import io as _io

    from old_kaldi_git_tpu.fst.kaldi_fst_io import write_fst_kaldi

    buf = _io.BytesIO()
    write_fst_kaldi(buf, _make_std_fst())
    assert buf.getvalue() == expected_std_fst_bytes()


def test_openfst_stdarc_reader_parses_reference_bytes():
    import io as _io

    from old_kaldi_git_tpu.fst.kaldi_fst_io import read_fst_kaldi

    fst = read_fst_kaldi(_io.BytesIO(expected_std_fst_bytes()))
    assert fst.num_states == 3 and fst.start == 0
    assert [(
        a.ilabel, a.olabel, a.weight, a.nextstate) for a in fst.arcs[0]] == [
        (3, 7, 0.5, 1), (0, 0, 1.25, 2)]
    assert fst.finals[2] == 2.0 and not fst.is_final(0)


def clat_weight_bytes(graph, acoustic, tids):
    out = struct.pack("<ff", graph, acoustic)
    out += struct.pack("<q", len(tids))
    out += np.asarray(tids, "<i4").tobytes()
    return out


def _make_clat():
    from old_kaldi_git_tpu.lat.determinize import (
        CompactLattice,
        CompactLatticeArc,
    )

    clat = CompactLattice()
    s0, s1 = clat.add_state(), clat.add_state()
    clat.start = s0
    clat.arcs[s0].append(CompactLatticeArc(12, 1.5, -3.25, (5, 6, 7), s1))
    clat.finals[s1] = (0.25, 0.0, (8,))
    return clat


def expected_clat_bytes():
    out = fst_header_bytes("compactlattice44", 0, 2, 1)
    # state 0: nonfinal = (inf, inf, empty string), 1 arc 12:12
    out += clat_weight_bytes(float("inf"), float("inf"), [])
    out += struct.pack("<q", 1)
    out += struct.pack("<ii", 12, 12)
    out += clat_weight_bytes(1.5, -3.25, [5, 6, 7])
    out += struct.pack("<i", 1)
    # state 1: final (0.25, 0.0, [8]), 0 arcs
    out += clat_weight_bytes(0.25, 0.0, [8])
    out += struct.pack("<q", 0)
    return out


def test_compact_lattice_writer_matches_reference_layout():
    import io as _io

    from old_kaldi_git_tpu.fst.kaldi_fst_io import (
        write_compact_lattice_kaldi,
    )

    buf = _io.BytesIO()
    write_compact_lattice_kaldi(buf, _make_clat())
    assert buf.getvalue() == expected_clat_bytes()


def test_compact_lattice_reader_parses_reference_bytes():
    import io as _io

    from old_kaldi_git_tpu.fst.kaldi_fst_io import (
        read_compact_lattice_kaldi,
    )

    clat = read_compact_lattice_kaldi(_io.BytesIO(expected_clat_bytes()))
    assert clat.num_states == 2 and clat.start == 0
    a = clat.arcs[0][0]
    assert (a.word, a.graph_cost, a.acoustic_cost, tuple(a.tids),
            a.nextstate) == (12, 1.5, -3.25, (5, 6, 7), 1)
    assert clat.finals[1][:2] == (0.25, 0.0)
    assert tuple(clat.finals[1][2]) == (8,)


def test_kaldi_framed_ark_holders_roundtrip(tmp_path):
    """`key \\0B <openfst binary>` ark cells via the kfst/kclat holders
    (upstream lattice-ark framing), including the exact per-cell bytes."""
    import old_kaldi_git_tpu.fst.kaldi_fst_io  # noqa: F401 registers holders
    from old_kaldi_git_tpu.utils.table import TableWriter, read_table

    fst = _make_std_fst()
    clat = _make_clat()
    fpath = str(tmp_path / "g.ark")
    with TableWriter(f"ark:{fpath}", "kfst") as w:
        w["utt1"] = fst
    raw = open(fpath, "rb").read()
    assert raw == b"utt1 \x00B" + expected_std_fst_bytes()
    back = read_table(f"ark:{fpath}", "kfst")["utt1"]
    assert back.num_states == 3 and back.finals[2] == 2.0

    lpath = str(tmp_path / "lat.ark")
    with TableWriter(f"ark:{lpath}", "kclat") as w:
        w["utt1"] = clat
    raw = open(lpath, "rb").read()
    assert raw == b"utt1 \x00B" + expected_clat_bytes()
    back = read_table(f"ark:{lpath}", "kclat")["utt1"]
    assert back.arcs[0][0].word == 12


def test_hclg_fst_file_roundtrip_real_graph(tmp_path):
    """A real mkgraph HCLG survives the upstream binary file format with
    identical arcs (write_fst_kaldi_file / read_fst_kaldi_file)."""
    from old_kaldi_git_tpu.decoder.graph import mkgraph
    from old_kaldi_git_tpu.fst.kaldi_fst_io import (
        read_fst_kaldi_file,
        write_fst_kaldi_file,
    )
    from old_kaldi_git_tpu.fst.lang import (
        Lang,
        Lexicon,
        make_unigram_grammar_fst,
    )
    from old_kaldi_git_tpu.tree.context_dep import (
        monophone_context_dependency,
    )

    lex = Lexicon.from_dict({"yes": "Y EH S", "no": "N OW"})
    lang = Lang(lex, silence_phone="SIL", sil_prob=0.5)
    phones = lang.real_phone_ids
    topo = HmmTopology.standard(phones, silence_phones=[lang.silence_id])
    cd = monophone_context_dependency(
        phones, {p: topo.num_pdf_classes(p) for p in phones})
    tm = TransitionModel(cd, topo)
    g = make_unigram_grammar_fst([["yes"], ["no"]], lang.words)
    hclg = mkgraph(lang, g, cd, tm)
    path = str(tmp_path / "HCLG.fst")
    write_fst_kaldi_file(path, hclg)
    back = read_fst_kaldi_file(path)
    assert back.num_states == hclg.num_states
    assert back.start == hclg.start
    for s in range(hclg.num_states):
        assert len(back.arcs[s]) == len(hclg.arcs[s])
        for a, b in zip(hclg.arcs[s], back.arcs[s]):
            assert (a.ilabel, a.olabel, a.nextstate) == (
                b.ilabel, b.olabel, b.nextstate)
            assert abs(a.weight - b.weight) < 1e-6


# ---------------------------------------------------------------------------
# CompressedMatrix formats 2/3 + G.711/8-bit wav (src/matrix/
# compressed-matrix.cc, src/feat/wave-reader.cc) — round-2 verdict ask #9
# ---------------------------------------------------------------------------

def test_compressed_matrix_format2_bytes_and_roundtrip():
    import io as _io

    from old_kaldi_git_tpu.utils.io_funcs import (
        read_matrix,
        write_compressed_matrix,
    )

    mat = np.asarray([[-1.0, 0.0, 1.0], [0.5, -0.5, 0.25]], np.float64)
    # hand-assembled expected bytes: "CM2 " + GlobalHeader + uint16 codes
    exp = tok("CM2") + struct.pack("<ff", -1.0, 2.0)
    exp += struct.pack("<ii", 2, 3)
    codes = np.round((mat + 1.0) / 2.0 * 65535.0).astype("<u2")
    exp += codes.tobytes()
    buf = _io.BytesIO()
    write_compressed_matrix(buf, mat, format=2)
    assert buf.getvalue() == exp
    back = read_matrix(_io.BytesIO(exp))
    np.testing.assert_allclose(back, mat, atol=2.0 / 65535)


def test_compressed_matrix_format3_bytes_and_roundtrip():
    import io as _io

    from old_kaldi_git_tpu.utils.io_funcs import (
        read_matrix,
        write_compressed_matrix,
    )

    mat = np.asarray([[0.0, 2.0], [4.0, 1.0]], np.float64)
    exp = tok("CM3") + struct.pack("<ff", 0.0, 4.0)
    exp += struct.pack("<ii", 2, 2)
    exp += np.round(mat / 4.0 * 255.0).astype("u1").tobytes()
    buf = _io.BytesIO()
    write_compressed_matrix(buf, mat, format=3)
    assert buf.getvalue() == exp
    back = read_matrix(_io.BytesIO(exp))
    np.testing.assert_allclose(back, mat, atol=4.0 / 255)


def _riff(fmt_tag, bits, payload, rate=8000, channels=1):
    block = channels * (bits // 8)
    out = b"fmt " + struct.pack("<IHHIIHH", 16, fmt_tag, channels, rate,
                                rate * block, block, bits)
    out += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WAVE" + out


def test_wav_mulaw_decode_known_values():
    import io as _io

    from old_kaldi_git_tpu.utils.wav import read_wav_stream

    # G.711 µ-law reference points: 0x00 → -32124, 0xFF → 0, 0x80 → +32124
    w = read_wav_stream(_io.BytesIO(_riff(7, 8, bytes([0x00, 0xFF, 0x80]))))
    np.testing.assert_array_equal(w.data[0], [-32124.0, 0.0, 32124.0])
    assert w.samp_freq == 8000.0


def test_wav_alaw_decode_known_values():
    import io as _io

    from old_kaldi_git_tpu.utils.wav import read_wav_stream

    # G.711 A-law reference points: 0x55 → -8, 0xD5 → +8,
    # 0x2A (= ^0x55 → 0x7F, the negative full-scale code) → -32256
    w = read_wav_stream(_io.BytesIO(_riff(6, 8, bytes([0x55, 0xD5, 0x2A]))))
    np.testing.assert_array_equal(w.data[0], [-8.0, 8.0, -32256.0])


def test_wav_8bit_pcm_decode():
    import io as _io

    from old_kaldi_git_tpu.utils.wav import read_wav_stream

    w = read_wav_stream(_io.BytesIO(_riff(1, 8, bytes([0, 128, 255]))))
    np.testing.assert_array_equal(w.data[0], [-32768.0, 0.0, 32512.0])


def test_fst_array_writer_matches_object_writer():
    """write_fst_kaldi_arrays must produce byte-identical output to the
    per-arc object writer, and read_fst_kaldi_arrays must invert it."""
    import io

    import numpy as np

    from old_kaldi_git_tpu.fst.kaldi_fst_io import (
        read_fst_kaldi_arrays,
        write_fst_kaldi,
        write_fst_kaldi_arrays,
    )
    from old_kaldi_git_tpu.fst.vector_fst import Arc, VectorFst

    rng = np.random.default_rng(5)
    S = 200
    fst = VectorFst()
    for _ in range(S):
        fst.add_state()
    fst.set_start(3)
    for s in range(S):
        for _ in range(int(rng.integers(0, 5))):
            fst.add_arc(s, Arc(int(rng.integers(0, 50)),
                               int(rng.integers(0, 50)),
                               float(rng.normal()),
                               int(rng.integers(0, S))))
        if rng.random() < 0.3:
            fst.set_final(s, float(rng.exponential()))
    b1 = io.BytesIO()
    write_fst_kaldi(b1, fst)

    counts = np.asarray([len(a) for a in fst.arcs], np.int64)
    row_ptr = np.zeros(S + 1, np.int64)
    np.cumsum(counts, out=row_ptr[1:])
    il = np.asarray([a.ilabel for lst in fst.arcs for a in lst], np.int32)
    ol = np.asarray([a.olabel for lst in fst.arcs for a in lst], np.int32)
    w = np.asarray([a.weight for lst in fst.arcs for a in lst], np.float32)
    ns = np.asarray([a.nextstate for lst in fst.arcs for a in lst], np.int32)
    from old_kaldi_git_tpu.fst.vector_fst import INF

    finals = np.asarray([f if f != INF else np.inf for f in fst.finals],
                        np.float32)
    b2 = io.BytesIO()
    write_fst_kaldi_arrays(b2, fst.start, row_ptr, il, ol, w, ns, finals)
    assert b1.getvalue() == b2.getvalue()

    b2.seek(0)
    start_r, rp_r, il_r, ol_r, w_r, ns_r, fin_r = read_fst_kaldi_arrays(b2)
    assert start_r == fst.start
    np.testing.assert_array_equal(rp_r, row_ptr)
    np.testing.assert_array_equal(il_r, il)
    np.testing.assert_array_equal(ol_r, ol)
    np.testing.assert_array_equal(w_r, w)
    np.testing.assert_array_equal(ns_r, ns)
    np.testing.assert_array_equal(fin_r, finals)
