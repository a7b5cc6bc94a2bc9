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
