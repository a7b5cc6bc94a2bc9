"""SGMM2 CLI tool family (reference src/sgmm2bin/: sgmm2-init,
sgmm2-acc-stats-ali, sgmm2-sum-accs, sgmm2-est, sgmm2-align-compiled,
sgmm2-latgen-faster, sgmm2-info).

Thin wrappers over gmm/sgmm2.py, composed through ark files like every
other tool batch.  The decodable seam is loglikes[B, T, num_pdfs], so the
batched aligner and lattice decoder are shared with the GMM/nnet3 paths.
"""

from __future__ import annotations

import sys
from typing import List

import numpy as np

from old_kaldi_git_tpu.bin.tools import TOOLS, _jnp, tool
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger
from old_kaldi_git_tpu.utils.parse_options import ParseOptions

log = get_logger("sgmm2_tools")


def _usage(po) -> int:
    print(po.print_usage(), file=sys.stderr)
    return 1


@tool("sgmm2-init")
def sgmm2_init_tool(argv: List[str]) -> int:
    """Initialize an SGMM2 from a trained model's transition structure and
    a full-covariance UBM (reference sgmm2bin/sgmm2-init.cc — that one
    takes topo+tree; here the TransitionModel is taken from an existing
    .mdl, matching how our tree/topo are bundled)."""
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
    from old_kaldi_git_tpu.gmm.full_gmm import FullGmm
    from old_kaldi_git_tpu.gmm.sgmm2 import AmSgmm2, Sgmm2Model

    po = ParseOptions(
        "sgmm2-init [options] <gmm-mdl-in> <fgmm-ubm-in> <sgmm2-out>")

    class Opts:
        phn_space_dim = 0
        spk_space_dim = 0
        symmetric = False

    o = Opts()
    po.register("phn-space-dim", o, "phn_space_dim")
    po.register("spk-space-dim", o, "spk_space_dim")
    po.register("symmetric", o, "symmetric")
    args = po.parse(argv)
    if len(args) != 3:
        return _usage(po)
    base = AmGmmModel.load(args[0])
    ubm = FullGmm.load(args[1])
    sgmm = AmSgmm2.init(ubm, base.am.num_pdfs, o.phn_space_dim or None)
    if o.spk_space_dim:
        sgmm.init_speaker_subspace(o.spk_space_dim, symmetric=o.symmetric)
    elif o.symmetric:
        return _usage(po)  # --symmetric requires --spk-space-dim
    Sgmm2Model(base.tm, sgmm).save(args[2])
    log.info("sgmm2-init: %d pdfs, %d Gaussians, phn-dim %d, spk-dim %d%s",
             sgmm.num_pdfs, sgmm.num_gauss, sgmm.phn_dim, sgmm.spk_dim,
             " (symmetric)" if sgmm.u is not None else "")
    return 0


def _read_utt2spk(path: str) -> dict:
    out = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                out[parts[0]] = parts[1]
    return out


@tool("sgmm2-info")
def sgmm2_info_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.gmm.sgmm2 import Sgmm2Model

    po = ParseOptions("sgmm2-info <sgmm2-in>")
    args = po.parse(argv)
    if len(args) != 1:
        return _usage(po)
    m = Sgmm2Model.load(args[0])
    print(f"number of pdfs {m.sgmm.num_pdfs}")
    print(f"number of gaussians {m.sgmm.num_gauss}")
    print(f"feature dimension {m.sgmm.dim}")
    print(f"phone-space dimension {m.sgmm.phn_dim}")
    print(f"number of substates {m.sgmm.num_substates}")
    print(f"speaker-space dimension {m.sgmm.spk_dim}")
    print(f"symmetric {'true' if m.sgmm.u is not None else 'false'}")
    print(f"number of transition-ids {m.tm.num_tids}")
    return 0


@tool("sgmm2-est-fmllr")
def sgmm2_est_fmllr_tool(argv: List[str]) -> int:
    """Estimate per-speaker fMLLR transforms for an SGMM2
    (sgmm2bin/sgmm2-est-fmllr.cc role): pools every utterance of a
    speaker, accumulates full-covariance fMLLR stats from the alignment
    posteriors, maximizes the auxiliary by preconditioned gradient ascent
    (gmm/sgmm2_fmllr.py), and writes [D, D+1] 'mat' transforms to apply
    with transform-feats before decoding.  Speakers under --min-count get
    the identity."""
    from old_kaldi_git_tpu.gmm.sgmm2 import Sgmm2Model
    from old_kaldi_git_tpu.gmm.sgmm2_fmllr import (
        FmllrSgmm2Accs,
        FmllrSgmm2Options,
        estimate_sgmm2_fmllr,
        sgmm2_fmllr_objf_improvement,
    )
    from old_kaldi_git_tpu.utils.table import (
        SequentialTableReader,
        TableWriter,
    )

    po = ParseOptions(
        "sgmm2-est-fmllr [options] <sgmm2-mdl> <feats-rspecifier> "
        "<ali-rspecifier> <mats-wspecifier>")

    class Opts:
        utt2spk = ""
        spk_vecs = ""
        num_iters = 10
        min_count = 100.0

    o = Opts()
    po.register("utt2spk", o, "utt2spk")
    po.register("spk-vecs", o, "spk_vecs")
    po.register("num-iters", o, "num_iters")
    po.register("min-count", o, "min_count")
    args = po.parse(argv)
    if len(args) != 4:
        return _usage(po)
    model = Sgmm2Model.load(args[0])
    u2s = _read_utt2spk(o.utt2spk) if o.utt2spk else {}
    vecs = (dict(SequentialTableReader(o.spk_vecs, "vec"))
            if o.spk_vecs else {})
    alis = dict(SequentialTableReader(args[2], "ivec"))
    tid2pdf = model.tm.tid_to_pdf_array()
    by_spk: dict = {}
    for key, x in SequentialTableReader(args[1], "mat"):
        if key not in alis:
            continue
        ali = np.asarray(alis[key])
        x = np.asarray(x, np.float64)
        t = min(len(x), len(ali))
        spk = u2s.get(key, key)
        fx, fp = by_spk.setdefault(spk, ([], []))
        fx.append(x[:t])
        fp.append(tid2pdf[ali[:t]])
    D = model.sgmm.dim
    ident = np.concatenate([np.eye(D), np.zeros((D, 1))], axis=1)
    opts = FmllrSgmm2Options(num_iters=o.num_iters, min_count=o.min_count)
    n, tot_impr, tot_beta = 0, 0.0, 0.0
    with TableWriter(args[3], "mat") as w:
        for spk in sorted(by_spk):
            fx, fp = by_spk[spk]
            accs = FmllrSgmm2Accs(model.sgmm)
            vs = vecs.get(spk)
            accs.accumulate(
                model.sgmm, np.concatenate(fx), np.concatenate(fp),
                spk_vec=None if vs is None else np.asarray(vs, np.float64))
            W = estimate_sgmm2_fmllr(model.sgmm, accs, opts)
            if W is None:
                w[spk] = ident.astype(np.float32)
            else:
                impr = sgmm2_fmllr_objf_improvement(model.sgmm, accs, W)
                tot_impr += impr * accs.beta
                tot_beta += accs.beta
                w[spk] = W.astype(np.float32)
            n += 1
    log.info("sgmm2-est-fmllr: %d speakers, avg auxiliary improvement "
             "%.4f/frame", n, tot_impr / max(tot_beta, 1.0))
    return 0


@tool("sgmm2-est-spkvecs")
def sgmm2_est_spkvecs_tool(argv: List[str]) -> int:
    """Estimate per-speaker vectors from aligned frames
    (sgmm2bin/sgmm2-est-spkvecs.cc): pools every utterance of a speaker
    (--utt2spk, else per-utterance) and solves the speaker-subspace
    system; writes a 'vec' table keyed by speaker."""
    from old_kaldi_git_tpu.gmm.sgmm2 import Sgmm2Model, estimate_spk_vector
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "sgmm2-est-spkvecs [options] <sgmm2-mdl> <feats-rspecifier> "
        "<ali-rspecifier> <vecs-wspecifier>")

    class Opts:
        utt2spk = ""
        num_iters = 2
        min_count = 10.0

    o = Opts()
    po.register("utt2spk", o, "utt2spk")
    po.register("num-iters", o, "num_iters")
    po.register("min-count", o, "min_count")
    args = po.parse(argv)
    if len(args) != 4:
        return _usage(po)
    model = Sgmm2Model.load(args[0])
    if model.sgmm.N is None:
        raise KaldiError("model has no speaker subspace "
                         "(sgmm2-init --spk-space-dim)")
    u2s = _read_utt2spk(o.utt2spk) if o.utt2spk else {}
    alis = dict(SequentialTableReader(args[2], "ivec"))
    tid2pdf = model.tm.tid_to_pdf_array()
    by_spk: dict = {}
    for key, x in SequentialTableReader(args[1], "mat"):
        if key not in alis:
            continue
        ali = np.asarray(alis[key])
        x = np.asarray(x, np.float64)
        t = min(len(x), len(ali))
        spk = u2s.get(key, key)
        fx, fp = by_spk.setdefault(spk, ([], []))
        fx.append(x[:t])
        fp.append(tid2pdf[ali[:t]])
    n = 0
    with TableWriter(args[3], "vec") as w:
        for spk in sorted(by_spk):
            fx, fp = by_spk[spk]
            vs = estimate_spk_vector(
                model.sgmm, np.concatenate(fx), np.concatenate(fp),
                num_iters=o.num_iters, min_count=o.min_count)
            w[spk] = vs.astype(np.float32)
            n += 1
    log.info("sgmm2-est-spkvecs: %d speakers", n)
    return 0


@tool("sgmm2-acc-stats-ali")
def sgmm2_acc_stats_ali_tool(argv: List[str]) -> int:
    """Accumulate SGMM2 EM stats from alignments
    (sgmm2bin/sgmm2-acc-stats-ali.cc)."""
    from old_kaldi_git_tpu.gmm.sgmm2 import MleAmSgmm2Accs, Sgmm2Model
    from old_kaldi_git_tpu.utils.table import SequentialTableReader

    po = ParseOptions(
        "sgmm2-acc-stats-ali [options] <sgmm2-mdl> <feats-rspecifier> "
        "<ali-rspecifier> <accs-out>")

    class Opts:
        spk_vecs = ""
        utt2spk = ""

    o = Opts()
    po.register("spk-vecs", o, "spk_vecs")
    po.register("utt2spk", o, "utt2spk")
    args = po.parse(argv)
    if len(args) != 4:
        return _usage(po)
    model = Sgmm2Model.load(args[0])
    alis = dict(SequentialTableReader(args[2], "ivec"))
    vecs = (dict(SequentialTableReader(o.spk_vecs, "vec"))
            if o.spk_vecs else {})
    u2s = _read_utt2spk(o.utt2spk) if o.utt2spk else {}
    tid2pdf = model.tm.tid_to_pdf_array()
    accs = MleAmSgmm2Accs(model.sgmm)
    n = 0
    for key, x in SequentialTableReader(args[1], "mat"):
        if key not in alis:
            continue
        ali = np.asarray(alis[key])
        x = np.asarray(x, np.float64)
        t = min(len(x), len(ali))
        vs = vecs.get(u2s.get(key, key)) if vecs else None
        accs.accumulate(model.sgmm, x[:t], tid2pdf[ali[:t]], spk_vec=vs)
        n += 1
    accs.save(args[3])
    log.info("sgmm2-acc-stats-ali: %d utterances, %.0f frames, "
             "avg like %.4f", n, accs.total_frames,
             accs.total_like / max(accs.total_frames, 1.0))
    return 0


@tool("sgmm2-sum-accs")
def sgmm2_sum_accs_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.gmm.sgmm2 import MleAmSgmm2Accs, Sgmm2Model

    po = ParseOptions(
        "sgmm2-sum-accs <sgmm2-mdl> <accs-out> <accs-in1> [<accs-in2> ...]")
    args = po.parse(argv)
    if len(args) < 3:
        return _usage(po)
    model = Sgmm2Model.load(args[0])
    tot = MleAmSgmm2Accs.load(args[2], model.sgmm)
    for p in args[3:]:
        tot.add(MleAmSgmm2Accs.load(p, model.sgmm))
    tot.save(args[1])
    return 0


@tool("sgmm2-est")
def sgmm2_est_tool(argv: List[str]) -> int:
    """M-step + optional substate splitting (sgmm2bin/sgmm2-est.cc).
    NOTE --update-flags: 'v' and 'M' must come from different iterations
    (overshoot otherwise — gmm/sgmm2.py Sgmm2UpdateOptions); pass
    --update-flags=vwc and --update-flags=MS alternately, as
    recipes/sgmm2.py does."""
    from old_kaldi_git_tpu.gmm.sgmm2 import (
        MleAmSgmm2Accs,
        Sgmm2Model,
        Sgmm2UpdateOptions,
        sgmm2_update,
        split_substates,
    )

    po = ParseOptions("sgmm2-est [options] <sgmm2-in> <accs> <sgmm2-out>")

    class Opts:
        update_flags = "vwc"
        split_substates_n = 0
        min_gaussian_occupancy = 10.0
        cov_floor = 1e-3

    o = Opts()
    po.register("update-flags", o, "update_flags")
    po.register("split-substates", o, "split_substates_n")
    po.register("min-gaussian-occupancy", o, "min_gaussian_occupancy")
    po.register("cov-floor", o, "cov_floor")
    args = po.parse(argv)
    if len(args) != 3:
        return _usage(po)
    model = Sgmm2Model.load(args[0])
    accs = MleAmSgmm2Accs.load(args[1], model.sgmm)
    sgmm2_update(model.sgmm, accs, Sgmm2UpdateOptions(
        update_flags=o.update_flags,
        min_gaussian_occupancy=o.min_gaussian_occupancy,
        cov_floor=o.cov_floor))
    if o.split_substates_n > model.sgmm.num_substates:
        split_substates(model.sgmm, accs, o.split_substates_n)
    model.save(args[2])
    return 0


@tool("sgmm2-align-compiled")
def sgmm2_align_compiled_tool(argv: List[str]) -> int:
    """Batched Viterbi alignment with SGMM2 acoustics
    (sgmm2bin/sgmm2-align-compiled.cc); shares the aligner with the GMM
    path through the loglikes[B,T,P] decodable seam."""
    from old_kaldi_git_tpu.bin.train_tools import _batch_align
    from old_kaldi_git_tpu.gmm.sgmm2 import Sgmm2Model

    po = ParseOptions(
        "sgmm2-align-compiled [options] <sgmm2-mdl> <graphs-rspecifier> "
        "<feats-rspecifier> <ali-wspecifier>")

    class Opts:
        beam = 200.0
        acoustic_scale = 1.0

    o = Opts()
    po.register("beam", o, "beam")
    po.register("acoustic-scale", o, "acoustic_scale")
    args = po.parse(argv)
    if len(args) != 4:
        return _usage(po)
    _jnp()
    model = Sgmm2Model.load(args[0])

    class _Bundle:  # the (tm, am) decodable duck-type _batch_align expects
        tm = model.tm
        am = model.sgmm

    return _batch_align(_Bundle(), args[1], args[2], args[3],
                        beam=o.beam, acoustic_scale=o.acoustic_scale)


@tool("sgmm2-latgen-faster")
def sgmm2_latgen_faster_tool(argv: List[str]) -> int:
    """Lattice decoding with SGMM2 acoustics
    (sgmm2bin/sgmm2-latgen-faster.cc)."""
    _jnp()
    from old_kaldi_git_tpu.decoder.csr import fst_to_csr
    from old_kaldi_git_tpu.decoder.viterbi import ViterbiOptions, decode_batch
    from old_kaldi_git_tpu.fst.symbols import SymbolTable
    from old_kaldi_git_tpu.fst.vector_fst import VectorFst
    from old_kaldi_git_tpu.gmm.sgmm2 import Sgmm2Model
    from old_kaldi_git_tpu.lat.lattice import lattice_from_decode
    from old_kaldi_git_tpu.utils.batching import pad_feature_batch
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "sgmm2-latgen-faster [options] <sgmm2-mdl> <hclg-fst> "
        "<feats-rspecifier> <lat-wspecifier> [<words-wspecifier>]")

    class Opts:
        beam = 16.0
        lattice_beam = 10.0
        max_active = 7000
        acoustic_scale = 0.1
        word_symbol_table = ""
        spk_vecs = ""
        utt2spk = ""

    o = Opts()
    po.register("beam", o, "beam")
    po.register("lattice-beam", o, "lattice_beam")
    po.register("max-active", o, "max_active")
    po.register("acoustic-scale", o, "acoustic_scale")
    po.register("word-symbol-table", o, "word_symbol_table")
    po.register("spk-vecs", o, "spk_vecs")
    po.register("utt2spk", o, "utt2spk")
    args = po.parse(argv)
    if len(args) not in (4, 5):
        return _usage(po)
    model = Sgmm2Model.load(args[0])
    with open(args[1], "rb") as f:
        hclg = VectorFst.read(f)
    csr = fst_to_csr(hclg, model.tm.tid_to_pdf_array())
    feats = dict(SequentialTableReader(args[2], "mat"))
    if not feats:
        raise KaldiError("no features")
    keys, padded, nf = pad_feature_batch(feats)
    spk_vecs = None
    if o.spk_vecs:
        vecs = dict(SequentialTableReader(o.spk_vecs, "vec"))
        u2s = _read_utt2spk(o.utt2spk) if o.utt2spk else {}
        spk_vecs = [vecs.get(u2s.get(k, k)) for k in keys]
    loglikes = model.sgmm.loglikes_batch(
        padded, spk_vecs=spk_vecs).astype(np.float32)
    results = decode_batch(
        csr, loglikes, nf,
        ViterbiOptions(beam=o.beam, max_active=o.max_active,
                       acoustic_scale=o.acoustic_scale),
        want_lattice=True,
    )
    words_tab = (SymbolTable.read(o.word_symbol_table)
                 if o.word_symbol_table else None)
    wwriter = TableWriter(args[4], "text") if len(args) == 5 else None
    n = 0
    with TableWriter(args[3], "lat") as w:
        for i, (key, res) in enumerate(zip(keys, results)):
            if res is None:
                log.warning("decode failed for %s", key)
                continue
            lat = lattice_from_decode(
                csr, loglikes[i, :nf[i]], res.frame_states, res.frame_costs,
                o.acoustic_scale, o.lattice_beam,
            )
            if lat is not None:
                w[key] = lat
            if wwriter is not None:
                wwriter[key] = " ".join(
                    words_tab[x] if words_tab else str(x) for x in res.words)
            n += 1
    if wwriter is not None:
        wwriter.close()
    log.info("sgmm2-latgen-faster: decoded %d/%d", n, len(keys))
    return 0
