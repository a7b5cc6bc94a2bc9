"""CLI tools for the GMM training pipeline (reference src/bin + src/gmmbin).

Covers the train_mono.sh / train_deltas.sh / train_lda_mllt.sh /
train_sat.sh binary inventory (SURVEY.md §3.2): model init, training-graph
compilation, equal/Viterbi alignment, statistic accumulation (map) + summing
(reduce) + MLE updates, tree building, posterior tools, LDA/MLLT/fMLLR
estimation, and transform application — each a thin wrapper over the
library, composable through ark pipes exactly like the reference.

Registered into the same TOOLS registry as old_kaldi_git_tpu.bin.tools.
"""

from __future__ import annotations

import struct
import sys
from typing import Dict, List, Optional

import numpy as np

from old_kaldi_git_tpu.bin.tools import TOOLS, tool, _jnp
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger
from old_kaldi_git_tpu.utils.parse_options import ParseOptions

log = get_logger("bin")


def _usage(po) -> int:
    print(po.print_usage(), file=sys.stderr)
    return 1


# ---------------------------------------------------------------------------
# generic small-acc file helpers (token-framed named float64 arrays)
# ---------------------------------------------------------------------------


def _write_arrays(path: str, kind: str, arrays: Dict[str, np.ndarray]) -> None:
    from old_kaldi_git_tpu.utils import io_funcs as iof

    with open(path, "wb") as f:
        iof.init_kaldi_output_stream(f, True)
        iof.write_token(f, f"<{kind}>")
        iof.write_int32(f, len(arrays))
        for name, a in arrays.items():
            a = np.asarray(a, np.float64)
            iof.write_token(f, name)
            iof.write_int32(f, a.ndim)
            for d in a.shape:
                iof.write_int32(f, int(d))
            iof.write_matrix(f, a.reshape(a.shape[0] if a.ndim else 1, -1),
                             dtype=np.float64)
        iof.write_token(f, f"</{kind}>")


def _read_arrays(path: str, kind: str) -> Dict[str, np.ndarray]:
    from old_kaldi_git_tpu.utils import io_funcs as iof

    with open(path, "rb") as f:
        if not iof.init_kaldi_input_stream(f):
            raise KaldiError(f"{path}: acc file must be binary")
        iof.expect_token(f, f"<{kind}>")
        n = iof.read_int32(f)
        out: Dict[str, np.ndarray] = {}
        for _ in range(n):
            name = iof.read_token(f)
            ndim = iof.read_int32(f)
            shape = tuple(iof.read_int32(f) for _ in range(ndim))
            out[name] = iof.read_matrix(f).reshape(shape)
        iof.expect_token(f, f"</{kind}>")
        return out


def _load_model(path: str):
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel

    return AmGmmModel.load(path)


def _load_tree(path: str):
    from old_kaldi_git_tpu.tree.context_dep import ContextDependency

    with open(path, "rb") as f:
        return ContextDependency.read(f)


def _read_ali_table(rspec: str) -> Dict[str, np.ndarray]:
    from old_kaldi_git_tpu.utils.table import SequentialTableReader

    return {k: np.asarray(v, np.int32)
            for k, v in SequentialTableReader(rspec, "ivec")}


# ---------------------------------------------------------------------------
# model init (gmm-init-mono, gmm-init-model)
# ---------------------------------------------------------------------------


@tool("gmm-init-mono")
def gmm_init_mono_tool(argv: List[str]) -> int:
    """Flat-start monophone model from global feature stats
    (reference gmmbin/gmm-init-mono.cc: topo + dim → 0.mdl + tree)."""
    from old_kaldi_git_tpu.fst.lang import load_lang_dir
    from old_kaldi_git_tpu.gmm.diag_gmm import AmDiagGmm, AmGmmModel
    from old_kaldi_git_tpu.hmm.topology import HmmTopology
    from old_kaldi_git_tpu.hmm.transition_model import TransitionModel
    from old_kaldi_git_tpu.tree.context_dep import monophone_context_dependency
    from old_kaldi_git_tpu.utils.table import SequentialTableReader

    po = ParseOptions(
        "gmm-init-mono [options] <lang-dir> <feats-rspecifier> "
        "<model-out> <tree-out>"
    )

    class Opts:
        silence_phone = "SIL"
        num_states = 3
        sil_num_states = 5
        perturb_factor = 0.0

    o = Opts()
    po.register("silence-phone", o, "silence_phone")
    po.register("num-states", o, "num_states")
    po.register("sil-num-states", o, "sil_num_states")
    po.register("perturb-factor", o, "perturb_factor")
    args = po.parse(argv)
    if len(args) != 4:
        return _usage(po)
    lang = load_lang_dir(args[0], silence_phone=o.silence_phone)
    n = 0
    s = ss = None
    for _, feats in SequentialTableReader(args[1], "mat"):
        x = np.asarray(feats, np.float64)
        s = x.sum(0) if s is None else s + x.sum(0)
        ss = (x**2).sum(0) if ss is None else ss + (x**2).sum(0)
        n += len(x)
    if not n:
        raise KaldiError("gmm-init-mono: no features")
    glob_mean = s / n
    glob_var = np.maximum(ss / n - glob_mean**2, 1e-3)
    phones = lang.real_phone_ids
    topo = HmmTopology.standard(
        phones, silence_phones=[lang.silence_id],
        num_states=o.num_states, sil_num_states=o.sil_num_states,
    )
    ctx_dep = monophone_context_dependency(
        phones, {p: topo.num_pdf_classes(p) for p in phones}
    )
    tm = TransitionModel(ctx_dep, topo)
    am = AmDiagGmm.init_mono(
        ctx_dep.num_pdfs, glob_mean, glob_var, perturb=o.perturb_factor
    )
    AmGmmModel(tm, am).save(args[2])
    with open(args[3], "wb") as f:
        ctx_dep.write(f)
    log.info("gmm-init-mono: %d pdfs, dim %d from %d frames",
             ctx_dep.num_pdfs, len(glob_mean), n)
    return 0


@tool("gmm-init-model")
def gmm_init_model_tool(argv: List[str]) -> int:
    """Tree + tree-stats (+old model for the topology) → single-Gaussian
    leaf model (reference gmmbin/gmm-init-model.cc)."""
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
    from old_kaldi_git_tpu.gmm.mle import init_am_from_tree_stats
    from old_kaldi_git_tpu.hmm.transition_model import TransitionModel
    from old_kaldi_git_tpu.tree.build_tree import read_tree_stats

    po = ParseOptions(
        "gmm-init-model <tree> <tree-stats> <topo-model> <model-out>"
    )
    args = po.parse(argv)
    if len(args) != 4:
        return _usage(po)
    ctx_dep = _load_tree(args[0])
    with open(args[1], "rb") as f:
        stats = read_tree_stats(f)
    topo = _load_model(args[2]).tm.topo
    tm = TransitionModel(ctx_dep, topo)
    am = init_am_from_tree_stats(ctx_dep, stats)
    AmGmmModel(tm, am).save(args[3])
    log.info("gmm-init-model: %d pdfs", ctx_dep.num_pdfs)
    return 0


# ---------------------------------------------------------------------------
# training graphs + alignment
# ---------------------------------------------------------------------------


@tool("compile-train-graphs")
def compile_train_graphs_tool(argv: List[str]) -> int:
    """Per-utterance HCLG training graphs → fst table
    (reference bin/compile-train-graphs.cc)."""
    from old_kaldi_git_tpu.decoder.graph import GraphCompiler
    import old_kaldi_git_tpu.fst.holder  # noqa: F401  (registers "fst")
    from old_kaldi_git_tpu.fst.lang import load_lang_dir
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "compile-train-graphs [options] <tree> <model> <lang-dir> "
        "<transcript-rspecifier> <graphs-wspecifier>"
    )

    class Opts:
        transition_scale = 1.0
        self_loop_scale = 0.1
        silence_phone = "SIL"

    o = Opts()
    po.register("transition-scale", o, "transition_scale")
    po.register("self-loop-scale", o, "self_loop_scale")
    po.register("silence-phone", o, "silence_phone")
    args = po.parse(argv)
    if len(args) != 5:
        return _usage(po)
    ctx_dep = _load_tree(args[0])
    model = _load_model(args[1])
    lang = load_lang_dir(args[2], silence_phone=o.silence_phone)
    compiler = GraphCompiler(
        lang, ctx_dep, model.tm,
        transition_scale=o.transition_scale, self_loop_scale=o.self_loop_scale,
    )
    n = 0
    with TableWriter(args[4], "fst") as w:
        for key, text in SequentialTableReader(args[3], "text"):
            words = text.split()
            try:
                w[key] = compiler.compile_graph_from_text(words)
                n += 1
            except KaldiError as e:
                log.warning("%s: %s", key, e)
    log.info("compile-train-graphs: %d graphs", n)
    return 0


def _batch_align(model, graphs_rspec, feats_rspec, ali_wspec,
                 beam, acoustic_scale, careful_zero_acoustics=False):
    import old_kaldi_git_tpu.fst.holder  # noqa: F401
    from old_kaldi_git_tpu.decoder.csr import fst_to_csr
    from old_kaldi_git_tpu.decoder.viterbi import ViterbiOptions, align_batch
    from old_kaldi_git_tpu.utils.batching import pad_feature_batch
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    graphs = dict(SequentialTableReader(graphs_rspec, "fst"))
    feats = {k: np.asarray(v, np.float32)
             for k, v in SequentialTableReader(feats_rspec, "mat")
             if k in graphs}
    if not feats:
        raise KaldiError("no utterances with both graph and features")
    tid2pdf = model.tm.tid_to_pdf_array()
    keys, padded, num_frames = pad_feature_batch(feats)
    csr = [fst_to_csr(graphs[k], tid2pdf) for k in keys]
    if careful_zero_acoustics:
        loglikes = np.zeros(
            (len(keys), padded.shape[1], model.am.num_pdfs), np.float32)
    else:
        # device-resident: align_batch consumes them on device
        loglikes = model.am.loglikes_batch(padded)
    vopts = ViterbiOptions(beam=beam, acoustic_scale=acoustic_scale)
    alis, scores = align_batch(csr, loglikes, num_frames, vopts)
    ok = 0
    with TableWriter(ali_wspec, "ivec") as w:
        for i, k in enumerate(keys):
            if alis[i] is None:
                log.warning("%s: alignment failed", k)
                continue
            w[k] = np.asarray(alis[i], np.int32)
            ok += 1
    log.info("aligned %d/%d utterances", ok, len(keys))
    return 0 if ok else 1


@tool("align-equal-compiled")
def align_equal_compiled_tool(argv: List[str]) -> int:
    """Initial equal-ish alignment: Viterbi with zero acoustic scores picks
    any valid path through the graph (reference bin/align-equal-compiled.cc
    — the uniform start for train_mono)."""
    po = ParseOptions(
        "align-equal-compiled <model> <graphs-rspecifier> <feats-rspecifier> "
        "<ali-wspecifier>"
    )
    args = po.parse(argv)
    if len(args) != 4:
        return _usage(po)
    _jnp()
    return _batch_align(_load_model(args[0]), args[1], args[2], args[3],
                        beam=1e9, acoustic_scale=1.0,
                        careful_zero_acoustics=True)


@tool("gmm-align-compiled")
def gmm_align_compiled_tool(argv: List[str]) -> int:
    """Batched Viterbi alignment over per-utterance graphs
    (reference gmmbin/gmm-align-compiled.cc; the TPU build aligns the whole
    batch in one lax.scan program — SURVEY.md §2.8 P9)."""
    po = ParseOptions(
        "gmm-align-compiled [options] <model> <graphs-rspecifier> "
        "<feats-rspecifier> <ali-wspecifier>"
    )

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
    return _batch_align(_load_model(args[0]), args[1], args[2], args[3],
                        beam=o.beam, acoustic_scale=o.acoustic_scale)


@tool("convert-ali")
def convert_ali_tool(argv: List[str]) -> int:
    """Re-map alignments across models/trees (reference bin/convert-ali.cc)."""
    from old_kaldi_git_tpu.hmm.hmm_utils import convert_alignment
    from old_kaldi_git_tpu.utils.table import TableWriter

    po = ParseOptions(
        "convert-ali <old-model> <new-model> <new-tree> <ali-rspecifier> "
        "<ali-wspecifier>"
    )
    args = po.parse(argv)
    if len(args) != 5:
        return _usage(po)
    old_tm = _load_model(args[0]).tm
    new_tm = _load_model(args[1]).tm
    ctx_dep = _load_tree(args[2])
    n = 0
    with TableWriter(args[4], "ivec") as w:
        for k, ali in _read_ali_table(args[3]).items():
            w[k] = np.asarray(
                convert_alignment(ali, old_tm, new_tm, ctx_dep), np.int32)
            n += 1
    log.info("convert-ali: %d utterances", n)
    return 0


# ---------------------------------------------------------------------------
# GMM stats: accumulate (map) / sum (reduce) / estimate
# ---------------------------------------------------------------------------


@tool("gmm-acc-stats-ali")
def gmm_acc_stats_ali_tool(argv: List[str]) -> int:
    """Accumulate GMM + transition stats from alignments
    (reference gmmbin/gmm-acc-stats-ali.cc; P2 map step)."""
    from old_kaldi_git_tpu.gmm.mle import AccumAmDiagGmm, write_accs
    from old_kaldi_git_tpu.hmm.hmm_utils import alignment_to_pdfs
    from old_kaldi_git_tpu.utils.table import SequentialTableReader

    po = ParseOptions(
        "gmm-acc-stats-ali <model> <feats-rspecifier> <ali-rspecifier> "
        "<stats-out>"
    )
    args = po.parse(argv)
    if len(args) != 4:
        return _usage(po)
    model = _load_model(args[0])
    alis = _read_ali_table(args[2])
    accs = AccumAmDiagGmm(model.am)
    trans_stats = np.zeros(model.tm.num_tids + 1)
    n = frames = 0
    for k, feats in SequentialTableReader(args[1], "mat"):
        if k not in alis:
            continue
        ali = alis[k]
        if len(ali) != len(feats):
            log.warning("%s: ali length %d != frames %d, skipping",
                        k, len(ali), len(feats))
            continue
        pdfs = alignment_to_pdfs(model.tm, ali)
        accs.accumulate(model.am, np.asarray(feats), pdfs)
        model.tm.accumulate(ali, trans_stats)
        n += 1
        frames += len(ali)
    with open(args[3], "wb") as f:
        write_accs(f, accs, trans_stats)
    log.info("gmm-acc-stats-ali: %d utts, %d frames, avg like/frame %.4f",
             n, frames, accs.tot_like / max(accs.tot_frames, 1.0))
    return 0


@tool("gmm-sum-accs")
def gmm_sum_accs_tool(argv: List[str]) -> int:
    """Sum accumulator files (reference gmmbin/gmm-sum-accs.cc; P2 reduce)."""
    from old_kaldi_git_tpu.gmm.mle import read_accs, write_accs

    po = ParseOptions("gmm-sum-accs <stats-out> <stats-in1> <stats-in2> ...")
    args = po.parse(argv)
    if len(args) < 2:
        return _usage(po)
    total = trans_total = None
    for path in args[1:]:
        with open(path, "rb") as f:
            accs, trans = read_accs(f)
        if total is None:
            total, trans_total = accs, trans
        else:
            total.add(accs)
            trans_total += trans
    with open(args[0], "wb") as f:
        write_accs(f, total, trans_total)
    log.info("gmm-sum-accs: summed %d acc files", len(args) - 1)
    return 0


@tool("gmm-est")
def gmm_est_tool(argv: List[str]) -> int:
    """MLE re-estimation (+ transition update, optional mixup)
    (reference gmmbin/gmm-est.cc)."""
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
    from old_kaldi_git_tpu.gmm.mle import (
        MleDiagGmmOptions,
        mixup,
        mle_am_diag_gmm_update,
        read_accs,
    )

    po = ParseOptions("gmm-est [options] <model-in> <stats-in> <model-out>")
    gopts = MleDiagGmmOptions()

    class Opts:
        mix_up = 0
        perturb_factor = 0.01
        transition_floor = 0.01

    o = Opts()
    po.register_dataclass(gopts)
    po.register("mix-up", o, "mix_up")
    po.register("perturb-factor", o, "perturb_factor")
    po.register("transition-floor", o, "transition_floor")
    args = po.parse(argv)
    if len(args) != 3:
        return _usage(po)
    model = _load_model(args[0])
    with open(args[1], "rb") as f:
        accs, trans_stats = read_accs(f)
    log.info("gmm-est: avg like/frame %.4f over %.0f frames",
             accs.tot_like / max(accs.tot_frames, 1.0), accs.tot_frames)
    am = mle_am_diag_gmm_update(model.am, accs, gopts)
    model.tm.mle_update(trans_stats, floor=o.transition_floor)
    if o.mix_up > 0:
        am = mixup(am, o.mix_up, occs=accs.occ.sum(axis=1),
                   perturb_factor=o.perturb_factor)
    AmGmmModel(model.tm, am).save(args[2])
    return 0


@tool("gmm-mixup")
def gmm_mixup_tool(argv: List[str]) -> int:
    """Split Gaussians up to --mix-up total (reference gmmbin/gmm-mixup.cc)."""
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
    from old_kaldi_git_tpu.gmm.mle import mixup

    po = ParseOptions("gmm-mixup --mix-up=N <model-in> <occs?> <model-out>")

    class Opts:
        mix_up = 0
        perturb_factor = 0.01

    o = Opts()
    po.register("mix-up", o, "mix_up")
    po.register("perturb-factor", o, "perturb_factor")
    args = po.parse(argv)
    if len(args) not in (2, 3):
        return _usage(po)
    model = _load_model(args[0])
    occs = None
    if len(args) == 3:
        occ_arrays = _read_arrays(args[1], "Occs")
        occs = occ_arrays["occs"]
    out = args[-1]
    am = mixup(model.am, o.mix_up, occs=occs,
               perturb_factor=o.perturb_factor)
    AmGmmModel(model.tm, am).save(out)
    return 0


@tool("gmm-boost-silence")
def gmm_boost_silence_tool(argv: List[str]) -> int:
    """Scale silence-pdf mixture weights (reference
    gmmbin/gmm-boost-silence.cc — makes alignment robust to noise by
    boosting silence likelihoods)."""
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel

    po = ParseOptions(
        "gmm-boost-silence [options] <silence-phones-colon-list> "
        "<model-in> <model-out>"
    )

    class Opts:
        boost = 1.0

    o = Opts()
    po.register("boost", o, "boost")
    args = po.parse(argv)
    if len(args) != 3:
        return _usage(po)
    sil = {int(p) for p in args[0].split(":") if p}
    model = _load_model(args[1])
    tm = model.tm
    # pdfs reachable from silence phones
    pdfs = sorted({
        tm.tid_to_pdf(tid) for tid in range(1, tm.num_tids + 1)
        if tm.tid_to_phone(tid) in sil
    })
    import math

    # scaling the (unnormalized) weights adds log(boost) to each component's
    # gconst, i.e. boosts the pdf's likelihood uniformly
    for pdf in pdfs:
        gmm = model.am.pdfs[pdf]
        gmm.weights = gmm.weights * o.boost
    model.am.invalidate()
    model.save(args[2])
    log.info("gmm-boost-silence: boosted %d pdfs by %.2f (log %.2f)",
             len(pdfs), o.boost, math.log(max(o.boost, 1e-10)))
    return 0


@tool("gmm-compute-likes")
def gmm_compute_likes_tool(argv: List[str]) -> int:
    """Per-frame pdf log-likelihood matrices
    (reference gmmbin/gmm-compute-likes.cc)."""
    from old_kaldi_git_tpu.utils.batching import pad_feature_batch
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "gmm-compute-likes <model> <feats-rspecifier> <likes-wspecifier>"
    )
    args = po.parse(argv)
    if len(args) != 3:
        return _usage(po)
    _jnp()
    model = _load_model(args[0])
    feats = {k: np.asarray(v, np.float32)
             for k, v in SequentialTableReader(args[1], "mat")}
    keys, padded, num_frames = pad_feature_batch(feats)
    loglikes = np.asarray(model.am.loglikes_batch(padded))
    with TableWriter(args[2], "mat") as w:
        for i, k in enumerate(keys):
            w[k] = loglikes[i, : num_frames[i]]
    return 0


# ---------------------------------------------------------------------------
# tree building
# ---------------------------------------------------------------------------


@tool("acc-tree-stats")
def acc_tree_stats_tool(argv: List[str]) -> int:
    """Accumulate phonetic-context Gaussian stats for tree building
    (reference bin/acc-tree-stats.cc)."""
    from old_kaldi_git_tpu.tree.build_tree import (
        accumulate_tree_stats,
        write_tree_stats,
    )
    from old_kaldi_git_tpu.utils.table import SequentialTableReader

    po = ParseOptions(
        "acc-tree-stats [options] <model> <feats-rspecifier> "
        "<ali-rspecifier> <tree-stats-out>"
    )

    class Opts:
        context_width = 3
        central_position = 1

    o = Opts()
    po.register("context-width", o, "context_width")
    po.register("central-position", o, "central_position")
    args = po.parse(argv)
    if len(args) != 4:
        return _usage(po)
    model = _load_model(args[0])
    alis = _read_ali_table(args[2])
    stats: Dict[tuple, object] = {}
    n = 0
    for k, feats in SequentialTableReader(args[1], "mat"):
        if k not in alis:
            continue
        accumulate_tree_stats(
            alis[k], np.asarray(feats), model.tm,
            N=o.context_width, P=o.central_position, stats=stats,
        )
        n += 1
    with open(args[3], "wb") as f:
        write_tree_stats(f, stats)
    log.info("acc-tree-stats: %d utts → %d events", n, len(stats))
    return 0


@tool("sum-tree-stats")
def sum_tree_stats_tool(argv: List[str]) -> int:
    """Sum tree-stats files (reference bin/sum-tree-stats.cc)."""
    from old_kaldi_git_tpu.tree.build_tree import (
        read_tree_stats,
        sum_tree_stats,
        write_tree_stats,
    )

    po = ParseOptions("sum-tree-stats <stats-out> <stats-in1> ...")
    args = po.parse(argv)
    if len(args) < 2:
        return _usage(po)
    total: Dict[tuple, object] = {}
    for path in args[1:]:
        with open(path, "rb") as f:
            sum_tree_stats(total, read_tree_stats(f))
    with open(args[0], "wb") as f:
        write_tree_stats(f, total)
    return 0


@tool("cluster-phones")
def cluster_phones_tool(argv: List[str]) -> int:
    """Auto-generate questions by agglomerative phone clustering
    (reference bin/cluster-phones + bin/compile-questions; one text line of
    space-separated phone-ids per question)."""
    from old_kaldi_git_tpu.tree.build_tree import (
        cluster_phones_into_questions,
        read_tree_stats,
    )

    po = ParseOptions(
        "cluster-phones [options] <tree-stats> <phone-list-colon> "
        "<questions-out>"
    )

    class Opts:
        central_position = 1

    o = Opts()
    po.register("central-position", o, "central_position")
    args = po.parse(argv)
    if len(args) != 3:
        return _usage(po)
    with open(args[0], "rb") as f:
        stats = read_tree_stats(f)
    phones = [int(p) for p in args[1].split(":") if p]
    questions = cluster_phones_into_questions(
        stats, phones, P=o.central_position)
    with open(args[2], "w") as f:
        for q in questions:
            f.write(" ".join(str(p) for p in sorted(q)) + "\n")
    log.info("cluster-phones: %d questions", len(questions))
    return 0


@tool("build-tree")
def build_tree_tool(argv: List[str]) -> int:
    """Greedy likelihood-gain tree building (reference bin/build-tree.cc).
    The topology comes from <topo-model>; questions default to automatic
    clustering when no --questions file is given."""
    from old_kaldi_git_tpu.tree.build_tree import build_tree, read_tree_stats

    po = ParseOptions(
        "build-tree [options] <tree-stats> <topo-model> <tree-out>"
    )

    class Opts:
        max_leaves = 1000
        thresh = 20.0
        context_width = 3
        central_position = 1
        questions = ""

    o = Opts()
    po.register("max-leaves", o, "max_leaves")
    po.register("thresh", o, "thresh")
    po.register("context-width", o, "context_width")
    po.register("central-position", o, "central_position")
    po.register("questions", o, "questions")
    args = po.parse(argv)
    if len(args) != 3:
        return _usage(po)
    with open(args[0], "rb") as f:
        stats = read_tree_stats(f)
    topo = _load_model(args[1]).tm.topo
    phones = topo.phones
    questions = None
    if o.questions:
        with open(o.questions) as f:
            questions = [
                {int(p) for p in ln.split()} for ln in f if ln.split()
            ]
    ctx_dep = build_tree(
        stats, phones, {p: topo.num_pdf_classes(p) for p in phones},
        N=o.context_width, P=o.central_position, questions=questions,
        max_leaves=o.max_leaves, thresh=o.thresh,
    )
    with open(args[2], "wb") as f:
        ctx_dep.write(f)
    log.info("build-tree: %d leaves", ctx_dep.num_pdfs)
    return 0


# ---------------------------------------------------------------------------
# posterior tools
# ---------------------------------------------------------------------------


@tool("ali-to-pdf")
def ali_to_pdf_tool(argv: List[str]) -> int:
    """Transition-id alignments → pdf-id sequences (bin/ali-to-pdf.cc)."""
    from old_kaldi_git_tpu.hmm.hmm_utils import alignment_to_pdfs
    from old_kaldi_git_tpu.utils.table import TableWriter

    po = ParseOptions("ali-to-pdf <model> <ali-rspecifier> <pdf-wspecifier>")
    args = po.parse(argv)
    if len(args) != 3:
        return _usage(po)
    tm = _load_model(args[0]).tm
    with TableWriter(args[2], "ivec") as w:
        for k, ali in _read_ali_table(args[1]).items():
            w[k] = np.asarray(alignment_to_pdfs(tm, ali), np.int32)
    return 0


@tool("ali-to-post")
def ali_to_post_tool(argv: List[str]) -> int:
    """Alignments → unit posteriors (bin/ali-to-post.cc)."""
    from old_kaldi_git_tpu.hmm.posterior import ali_to_post
    from old_kaldi_git_tpu.utils.table import TableWriter

    po = ParseOptions("ali-to-post <ali-rspecifier> <post-wspecifier>")
    args = po.parse(argv)
    if len(args) != 2:
        return _usage(po)
    with TableWriter(args[1], "post") as w:
        for k, ali in _read_ali_table(args[0]).items():
            w[k] = ali_to_post(ali)
    return 0


@tool("weight-silence-post")
def weight_silence_post_tool(argv: List[str]) -> int:
    """Down-weight silence frames in posteriors
    (bin/weight-silence-post.cc)."""
    from old_kaldi_git_tpu.hmm.posterior import weight_silence_post
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "weight-silence-post <silence-weight> <silence-phones-colon> "
        "<model> <post-rspecifier> <post-wspecifier>"
    )
    args = po.parse(argv)
    if len(args) != 5:
        return _usage(po)
    weight = float(args[0])
    sil = [int(p) for p in args[1].split(":") if p]
    tm = _load_model(args[2]).tm
    with TableWriter(args[4], "post") as w:
        for k, post in SequentialTableReader(args[3], "post"):
            w[k] = weight_silence_post(post, tm, sil, weight)
    return 0


@tool("post-to-pdf-post")
def post_to_pdf_post_tool(argv: List[str]) -> int:
    """Tid posteriors → pdf posteriors (bin/post-to-pdf-post.cc)."""
    from old_kaldi_git_tpu.hmm.posterior import post_to_pdf_post
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "post-to-pdf-post <model> <post-rspecifier> <post-wspecifier>"
    )
    args = po.parse(argv)
    if len(args) != 3:
        return _usage(po)
    tm = _load_model(args[0]).tm
    with TableWriter(args[2], "post") as w:
        for k, post in SequentialTableReader(args[1], "post"):
            w[k] = post_to_pdf_post(post, tm)
    return 0


@tool("post-to-weights")
def post_to_weights_tool(argv: List[str]) -> int:
    """Per-frame posterior mass (bin/post-to-weights.cc)."""
    from old_kaldi_git_tpu.hmm.posterior import post_to_weights
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions("post-to-weights <post-rspecifier> <weights-wspecifier>")
    args = po.parse(argv)
    if len(args) != 2:
        return _usage(po)
    with TableWriter(args[1], "vec") as w:
        for k, post in SequentialTableReader(args[0], "post"):
            w[k] = np.asarray(post_to_weights(post), np.float32)
    return 0


# ---------------------------------------------------------------------------
# transforms: LDA / MLLT / fMLLR + application
# ---------------------------------------------------------------------------


def _post_weights_per_pdf(post, tm):
    """(pdf_ids, weights, frame_idx) flattened from a pdf- or tid-posterior;
    tid entries are mapped to pdfs via the transition model."""
    idx, pdfs, ws = [], [], []
    num_tids = tm.num_tids
    for t, frame in enumerate(post):
        for i, w in frame:
            pdf = tm.tid_to_pdf(i) if 1 <= i <= num_tids else i
            idx.append(t)
            pdfs.append(pdf)
            ws.append(w)
    return (np.asarray(idx, np.int64), np.asarray(pdfs, np.int64),
            np.asarray(ws, np.float64))


@tool("acc-lda")
def acc_lda_tool(argv: List[str]) -> int:
    """LDA class stats from pdf posteriors (reference bin/acc-lda.cc)."""
    from old_kaldi_git_tpu.transform.lda import LdaEstimate
    from old_kaldi_git_tpu.utils.table import SequentialTableReader

    po = ParseOptions(
        "acc-lda <model> <feats-rspecifier> <post-rspecifier> <lda-acc-out>"
    )
    args = po.parse(argv)
    if len(args) != 4:
        return _usage(po)
    model = _load_model(args[0])
    from old_kaldi_git_tpu.utils.table import RandomAccessTableReader

    posts = RandomAccessTableReader(args[2], "post")
    acc: Optional[LdaEstimate] = None
    for k, feats in SequentialTableReader(args[1], "mat"):
        if k not in posts:
            continue
        x = np.asarray(feats, np.float64)
        if acc is None:
            acc = LdaEstimate(model.am.num_pdfs, x.shape[1])
        t, pdfs, ws = _post_weights_per_pdf(posts[k], model.tm)
        acc.accumulate(x[t], pdfs, ws)
    if acc is None:
        raise KaldiError("acc-lda: no data")
    _write_arrays(args[3], "LdaAccs", {
        "counts": acc.counts, "first": acc.first, "second": acc.second,
    })
    return 0


@tool("est-lda")
def est_lda_tool(argv: List[str]) -> int:
    """Estimate the LDA transform from accs (reference bin/est-lda.cc)."""
    from old_kaldi_git_tpu.transform.lda import LdaEstimate

    po = ParseOptions("est-lda [options] <lda-acc1> ... <lda-mat-out>")

    class Opts:
        dim = 40

    o = Opts()
    po.register("dim", o, "dim")
    args = po.parse(argv)
    if len(args) < 2:
        return _usage(po)
    acc: Optional[LdaEstimate] = None
    for path in args[:-1]:
        arrays = _read_arrays(path, "LdaAccs")
        a = LdaEstimate(arrays["counts"].shape[0], arrays["first"].shape[1])
        a.counts, a.first, a.second = (
            arrays["counts"], arrays["first"], arrays["second"])
        if acc is None:
            acc = a
        else:
            acc.add(a)
    mat = acc.estimate(o.dim)
    from old_kaldi_git_tpu.utils import io_funcs as iof

    with open(args[-1], "wb") as f:
        iof.init_kaldi_output_stream(f, True)
        iof.write_matrix(f, mat, dtype=np.float32)
    log.info("est-lda: [%d, %d] transform", mat.shape[0], mat.shape[1])
    return 0


@tool("gmm-acc-mllt")
def gmm_acc_mllt_tool(argv: List[str]) -> int:
    """MLLT (STC) stats from posteriors (reference gmmbin/gmm-acc-mllt.cc)."""
    from old_kaldi_git_tpu.transform.mllt import MlltAccs
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
    )

    po = ParseOptions(
        "gmm-acc-mllt <model> <feats-rspecifier> <post-rspecifier> "
        "<mllt-acc-out>"
    )
    args = po.parse(argv)
    if len(args) != 4:
        return _usage(po)
    model = _load_model(args[0])
    posts = RandomAccessTableReader(args[2], "post")
    acc: Optional[MlltAccs] = None
    for k, feats in SequentialTableReader(args[1], "mat"):
        if k not in posts:
            continue
        x = np.asarray(feats, np.float64)
        if acc is None:
            acc = MlltAccs(x.shape[1])
        t, pdfs, ws = _post_weights_per_pdf(posts[k], model.tm)
        acc.accumulate(model.am, x[t], pdfs, ws)
    if acc is None:
        raise KaldiError("gmm-acc-mllt: no data")
    _write_arrays(args[3], "MlltAccs", {"G": acc.G, "beta": np.asarray([acc.beta])})
    return 0


@tool("est-mllt")
def est_mllt_tool(argv: List[str]) -> int:
    """Estimate the MLLT rotation (reference bin/est-mllt.cc); compose with
    transform-feats / gmm-transform-means."""
    from old_kaldi_git_tpu.transform.mllt import MlltAccs, update_mllt

    po = ParseOptions("est-mllt <mllt-acc1> ... <mllt-mat-out>")
    args = po.parse(argv)
    if len(args) < 2:
        return _usage(po)
    acc: Optional[MlltAccs] = None
    for path in args[:-1]:
        arrays = _read_arrays(path, "MlltAccs")
        a = MlltAccs(arrays["G"].shape[1])
        a.G = arrays["G"]
        a.beta = float(arrays["beta"][0])
        if acc is None:
            acc = a
        else:
            acc.add(a)
    m, objf = update_mllt(acc)
    from old_kaldi_git_tpu.utils import io_funcs as iof

    with open(args[-1], "wb") as f:
        iof.init_kaldi_output_stream(f, True)
        iof.write_matrix(f, m, dtype=np.float32)
    log.info("est-mllt: objf improvement %.4f", objf)
    return 0


@tool("gmm-transform-means")
def gmm_transform_means_tool(argv: List[str]) -> int:
    """Apply a square transform to GMM means
    (reference gmmbin/gmm-transform-means.cc, used after est-mllt)."""
    from old_kaldi_git_tpu.transform.mllt import transform_gmm_means
    from old_kaldi_git_tpu.utils import io_funcs as iof

    po = ParseOptions("gmm-transform-means <mat> <model-in> <model-out>")
    args = po.parse(argv)
    if len(args) != 3:
        return _usage(po)
    with open(args[0], "rb") as f:
        iof.init_kaldi_input_stream(f)
        m = iof.read_matrix(f)
    model = _load_model(args[1])
    transform_gmm_means(model.am, m)
    model.save(args[2])
    return 0


@tool("gmm-est-fmllr")
def gmm_est_fmllr_tool(argv: List[str]) -> int:
    """Per-speaker fMLLR transforms from posteriors
    (reference gmmbin/gmm-est-fmllr.cc)."""
    from old_kaldi_git_tpu.transform.fmllr import (
        FmllrAccs,
        compute_fmllr_transform,
    )
    from old_kaldi_git_tpu.utils.data_dir import _read_map
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
        TableWriter,
    )

    po = ParseOptions(
        "gmm-est-fmllr [options] <model> <feats-rspecifier> "
        "<post-rspecifier> <transform-wspecifier>"
    )

    class Opts:
        spk2utt = ""
        fmllr_min_count = 500.0

    o = Opts()
    po.register("spk2utt", o, "spk2utt")
    po.register("fmllr-min-count", o, "fmllr_min_count")
    args = po.parse(argv)
    if len(args) != 4:
        return _usage(po)
    model = _load_model(args[0])
    posts = RandomAccessTableReader(args[2], "post")
    feats = dict(SequentialTableReader(args[1], "mat"))
    spk2utt = ({k: v.split() for k, v in _read_map(o.spk2utt).items()}
               if o.spk2utt else {k: [k] for k in feats})
    n = 0
    with TableWriter(args[3], "mat") as w:
        for spk, utts in spk2utt.items():
            acc: Optional[FmllrAccs] = None
            for u in utts:
                if u not in feats or u not in posts:
                    continue
                x = np.asarray(feats[u], np.float64)
                if acc is None:
                    acc = FmllrAccs(x.shape[1])
                t, pdfs, ws = _post_weights_per_pdf(posts[u], model.tm)
                acc.accumulate(model.am, x[t], pdfs, ws)
            if acc is None:
                continue
            trans = compute_fmllr_transform(
                acc, min_count=o.fmllr_min_count)
            if trans is not None:
                w[spk] = trans.astype(np.float32)
                n += 1
    log.info("gmm-est-fmllr: %d transforms", n)
    return 0


@tool("transform-feats")
def transform_feats_tool(argv: List[str]) -> int:
    """Apply a (possibly per-speaker) affine/linear transform to features
    (reference featbin/transform-feats.cc)."""
    from old_kaldi_git_tpu.transform.fmllr import apply_affine_transform
    from old_kaldi_git_tpu.utils.data_dir import _read_map
    from old_kaldi_git_tpu.utils import io_funcs as iof
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
        TableWriter,
    )

    po = ParseOptions(
        "transform-feats [options] <transform-(file|rspecifier)> "
        "<feats-rspecifier> <feats-wspecifier>"
    )

    class Opts:
        utt2spk = ""

    o = Opts()
    po.register("utt2spk", o, "utt2spk")
    args = po.parse(argv)
    if len(args) != 3:
        return _usage(po)
    per_spk = ":" in args[0] and not args[0].endswith(".mat")
    utt2spk = _read_map(o.utt2spk) if o.utt2spk else None
    if per_spk:
        trans = RandomAccessTableReader(args[0], "mat")
    else:
        with open(args[0], "rb") as f:
            iof.init_kaldi_input_stream(f)
            global_mat = iof.read_matrix(f)
    n = 0
    with TableWriter(args[2], "mat") as w:
        for k, feats in SequentialTableReader(args[1], "mat"):
            x = np.asarray(feats, np.float64)
            if per_spk:
                spk = utt2spk[k] if utt2spk and k in utt2spk else k
                if spk not in trans:
                    log.warning("%s: no transform for speaker %s", k, spk)
                    continue
                m = np.asarray(trans[spk], np.float64)
            else:
                m = np.asarray(global_mat, np.float64)
            if m.shape[1] == x.shape[1]:  # linear
                y = x @ m.T
            elif m.shape[1] == x.shape[1] + 1:  # affine
                y = apply_affine_transform(x, m)
            else:
                raise KaldiError(
                    f"{k}: transform {m.shape} vs feats dim {x.shape[1]}")
            w[k] = y.astype(np.float32)
            n += 1
    log.info("transform-feats: %d utterances", n)
    return 0


@tool("compose-transforms")
def compose_transforms_tool(argv: List[str]) -> int:
    """Compose two (affine or linear) transforms: out = A ∘ B
    (reference featbin/compose-transforms.cc)."""
    from old_kaldi_git_tpu.utils import io_funcs as iof

    po = ParseOptions("compose-transforms <A-file> <B-file> <out-file>")
    args = po.parse(argv)
    if len(args) != 3:
        return _usage(po)

    def read_mat(path):
        with open(path, "rb") as f:
            iof.init_kaldi_input_stream(f)
            return np.asarray(iof.read_matrix(f), np.float64)

    a, b = read_mat(args[0]), read_mat(args[1])
    # y = a(b(x)); whether a is affine is decided by shape consistency with
    # b's output dimension (reference compose-transforms semantics)
    if a.shape[1] == b.shape[0]:
        # a linear; b linear or affine — either way plain matmul composes
        # (an affine b's bias column just gets mapped through a)
        out = a @ b
    elif a.shape[1] == b.shape[0] + 1:
        lin, bias = a[:, :-1], a[:, -1]
        if b.shape[1] == b.shape[0]:  # b linear
            out = np.concatenate([lin @ b, bias[:, None]], axis=1)
        else:  # b affine [q, r+1]
            out = np.concatenate(
                [lin @ b[:, :-1], (lin @ b[:, -1] + bias)[:, None]],
                axis=1)
    else:
        raise KaldiError(
            f"compose-transforms: incompatible {a.shape} ∘ {b.shape}")
    with open(args[2], "wb") as f:
        iof.init_kaldi_output_stream(f, True)
        iof.write_matrix(f, out, dtype=np.float32)
    return 0


# ---------------------------------------------------------------------------
# matrix/vector utilities + misc
# ---------------------------------------------------------------------------


@tool("copy-matrix")
def copy_matrix_tool(argv: List[str]) -> int:
    """Copy matrix table/file, optionally scaled
    (reference bin/copy-matrix.cc)."""
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "copy-matrix [options] <mat-rspecifier> <mat-wspecifier>"
    )

    class Opts:
        scale = 1.0

    o = Opts()
    po.register("scale", o, "scale")
    args = po.parse(argv)
    if len(args) != 2:
        return _usage(po)
    with TableWriter(args[1], "mat") as w:
        for k, m in SequentialTableReader(args[0], "mat"):
            w[k] = np.asarray(m) * o.scale
    return 0


@tool("copy-vector")
def copy_vector_tool(argv: List[str]) -> int:
    """Copy vector table (reference bin/copy-vector.cc)."""
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions("copy-vector [options] <vec-rspecifier> <vec-wspecifier>")

    class Opts:
        scale = 1.0

    o = Opts()
    po.register("scale", o, "scale")
    args = po.parse(argv)
    if len(args) != 2:
        return _usage(po)
    with TableWriter(args[1], "vec") as w:
        for k, v in SequentialTableReader(args[0], "vec"):
            w[k] = np.asarray(v) * o.scale
    return 0


@tool("copy-int-vector")
def copy_int_vector_tool(argv: List[str]) -> int:
    """Copy int-vector (alignment) tables (reference bin/copy-int-vector.cc)."""
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions("copy-int-vector <ivec-rspecifier> <ivec-wspecifier>")
    args = po.parse(argv)
    if len(args) != 2:
        return _usage(po)
    with TableWriter(args[1], "ivec") as w:
        for k, v in SequentialTableReader(args[0], "ivec"):
            w[k] = np.asarray(v, np.int32)
    return 0


@tool("sum-matrices")
def sum_matrices_tool(argv: List[str]) -> int:
    """Sum matrices across files (reference bin/sum-matrices.cc)."""
    from old_kaldi_git_tpu.utils import io_funcs as iof

    po = ParseOptions("sum-matrices <mat-out> <mat-in1> <mat-in2> ...")
    args = po.parse(argv)
    if len(args) < 2:
        return _usage(po)
    total = None
    for path in args[1:]:
        with open(path, "rb") as f:
            iof.init_kaldi_input_stream(f)
            m = np.asarray(iof.read_matrix(f), np.float64)
        total = m if total is None else total + m
    with open(args[0], "wb") as f:
        iof.init_kaldi_output_stream(f, True)
        iof.write_matrix(f, total, dtype=np.float32)
    return 0


@tool("show-transitions")
def show_transitions_tool(argv: List[str]) -> int:
    """Human-readable transition-model dump
    (reference bin/show-transitions.cc)."""
    po = ParseOptions("show-transitions <phones.txt> <model>")
    args = po.parse(argv)
    if len(args) != 2:
        return _usage(po)
    names: Dict[int, str] = {}
    with open(args[0]) as f:
        for ln in f:
            parts = ln.split()
            if len(parts) == 2:
                names[int(parts[1])] = parts[0]
    tm = _load_model(args[1]).tm
    for ts in range(len(tm.tuples)):
        phone, hmm_state, pdf = tm.tuples[ts]
        print(f"Transition-state {ts + 1}: phone = "
              f"{names.get(phone, phone)} hmm-state = {hmm_state} "
              f"pdf = {pdf}")
        lo, hi = tm.state2id[ts], tm.state2id[ts + 1]
        for tid in range(lo, hi):
            p = float(np.exp(tm.log_probs[tid]))
            print(f" Transition-id = {tid} p = {p:.2f}")
    return 0


@tool("align-text")
def align_text_tool(argv: List[str]) -> int:
    """Pairwise text alignment for error analysis
    (reference bin/align-text.cc: ref/hyp → aligned pairs with <eps>)."""
    from old_kaldi_git_tpu.utils.edit_distance import edit_distance
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "align-text <ref-rspecifier> <hyp-rspecifier> <alignment-wspecifier>"
    )
    args = po.parse(argv)
    if len(args) != 3:
        return _usage(po)
    hyps = dict(SequentialTableReader(args[1], "text"))
    with TableWriter(args[2], "text") as w:
        for k, ref_text in SequentialTableReader(args[0], "text"):
            if k not in hyps:
                continue
            ref = ref_text.split()
            hyp = hyps[k].split()
            # DP backtrace for the aligned pair sequence
            R, H = len(ref), len(hyp)
            dp = np.zeros((R + 1, H + 1), np.int32)
            dp[:, 0] = np.arange(R + 1)
            dp[0, :] = np.arange(H + 1)
            for i in range(1, R + 1):
                for j in range(1, H + 1):
                    dp[i, j] = min(
                        dp[i - 1, j - 1] + (ref[i - 1] != hyp[j - 1]),
                        dp[i - 1, j] + 1,
                        dp[i, j - 1] + 1,
                    )
            pairs = []
            i, j = R, H
            while i > 0 or j > 0:
                if (i > 0 and j > 0
                        and dp[i, j] == dp[i - 1, j - 1]
                        + (ref[i - 1] != hyp[j - 1])):
                    pairs.append((ref[i - 1], hyp[j - 1]))
                    i, j = i - 1, j - 1
                elif i > 0 and dp[i, j] == dp[i - 1, j] + 1:
                    pairs.append((ref[i - 1], "<eps>"))
                    i -= 1
                else:
                    pairs.append(("<eps>", hyp[j - 1]))
                    j -= 1
            pairs.reverse()
            w[k] = " ; ".join(f"{a} {b}" for a, b in pairs)
    return 0


@tool("make-h-transducer")
def make_h_transducer_tool(argv: List[str]) -> int:
    """Standalone Ha construction (reference bin/make-h-transducer.cc);
    ilabel-info is one text line per CLG ilabel: space-separated phone
    window ids."""
    from old_kaldi_git_tpu.hmm.hmm_utils import make_h_transducer

    po = ParseOptions(
        "make-h-transducer [options] <ilabel-info-file> <tree> <model> "
        "<fst-out>"
    )

    class Opts:
        transition_scale = 1.0

    o = Opts()
    po.register("transition-scale", o, "transition_scale")
    args = po.parse(argv)
    if len(args) != 4:
        return _usage(po)
    ilabel_info: List[List[int]] = []
    with open(args[0]) as f:
        for ln in f:
            ilabel_info.append([int(x) for x in ln.split()])
    ctx_dep = _load_tree(args[1])
    tm = _load_model(args[2]).tm
    ha, disambig = make_h_transducer(
        ilabel_info, ctx_dep, tm, transition_scale=o.transition_scale)
    with open(args[3], "wb") as f:
        ha.write(f)
    log.info("make-h-transducer: %d states, %d disambig tids",
             ha.num_states, len(disambig))
    return 0


@tool("add-self-loops")
def add_self_loops_tool(argv: List[str]) -> int:
    """Add self-loop arcs with probability scaling
    (reference bin/add-self-loops.cc, the final mkgraph step)."""
    from old_kaldi_git_tpu.fst.vector_fst import VectorFst
    from old_kaldi_git_tpu.hmm.hmm_utils import add_self_loops

    po = ParseOptions(
        "add-self-loops [options] <model> <fst-in> <fst-out>"
    )

    class Opts:
        self_loop_scale = 0.1

    o = Opts()
    po.register("self-loop-scale", o, "self_loop_scale")
    args = po.parse(argv)
    if len(args) != 3:
        return _usage(po)
    tm = _load_model(args[0]).tm
    with open(args[1], "rb") as f:
        fst = VectorFst.read(f)
    out = add_self_loops(fst, tm, self_loop_scale=o.self_loop_scale)
    with open(args[2], "wb") as f:
        out.write(f)
    return 0


# ---------------------------------------------------------------------------
# Gaussian-level posteriors + basis-fMLLR
# (reference gmmbin/gmm-post-to-gpost.cc, gmm-est-fmllr-gpost.cc,
#  gmm-basis-fmllr-training.cc, gmm-est-basis-fmllr.cc)
# ---------------------------------------------------------------------------


@tool("gmm-post-to-gpost")
def gmm_post_to_gpost_tool(argv: List[str]) -> int:
    """Transition-id posteriors → per-Gaussian posteriors
    (reference gmmbin/gmm-post-to-gpost.cc)."""
    from old_kaldi_git_tpu.hmm.posterior import post_to_gpost
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
        TableWriter,
    )

    po = ParseOptions(
        "gmm-post-to-gpost [options] <model> <feats-rspecifier> "
        "<post-rspecifier> <gpost-wspecifier>"
    )
    args = po.parse(argv)
    if len(args) != 4:
        return _usage(po)
    model = _load_model(args[0])
    posts = RandomAccessTableReader(args[2], "post")
    n = 0
    with TableWriter(args[3], "gpost") as w:
        for utt, feats in SequentialTableReader(args[1], "mat"):
            if utt not in posts:
                continue
            w[utt] = post_to_gpost(posts[utt], model.tm, model.am, feats)
            n += 1
    log.info("gmm-post-to-gpost: %d utterances", n)
    return 0


def _est_fmllr_from_accs_loop(o, args, accumulate):
    """Shared per-speaker loop of gmm-est-fmllr{,-gpost}: `accumulate(acc,
    model, feats, entry)` folds one utterance into the speaker's stats."""
    from old_kaldi_git_tpu.transform.fmllr import (
        FmllrAccs,
        compute_fmllr_transform,
    )
    from old_kaldi_git_tpu.utils.data_dir import _read_map
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
        TableWriter,
    )

    model = _load_model(args[0])
    holder = "gpost" if o.gpost else "post"
    posts = RandomAccessTableReader(args[2], holder)
    feats = dict(SequentialTableReader(args[1], "mat"))
    spk2utt = ({k: v.split() for k, v in _read_map(o.spk2utt).items()}
               if o.spk2utt else {k: [k] for k in feats})
    n = 0
    with TableWriter(args[3], "mat") as w:
        for spk, utts in spk2utt.items():
            acc = None
            for u in utts:
                if u not in feats or u not in posts:
                    continue
                x = np.asarray(feats[u], np.float64)
                if acc is None:
                    acc = FmllrAccs(x.shape[1])
                accumulate(acc, model, x, posts[u])
            if acc is None:
                continue
            trans = compute_fmllr_transform(acc, min_count=o.fmllr_min_count)
            if trans is not None:
                w[spk] = trans.astype(np.float32)
                n += 1
    return n


@tool("gmm-est-fmllr-gpost")
def gmm_est_fmllr_gpost_tool(argv: List[str]) -> int:
    """Per-speaker fMLLR from Gaussian-level posteriors
    (reference gmmbin/gmm-est-fmllr-gpost.cc) — same estimation as
    gmm-est-fmllr but responsibilities come pre-computed in the gpost
    table (e.g. from a previous model, for 2-pass SAT decoding)."""
    po = ParseOptions(
        "gmm-est-fmllr-gpost [options] <model> <feats-rspecifier> "
        "<gpost-rspecifier> <transform-wspecifier>"
    )

    class Opts:
        spk2utt = ""
        fmllr_min_count = 500.0
        gpost = True

    o = Opts()
    po.register("spk2utt", o, "spk2utt")
    po.register("fmllr-min-count", o, "fmllr_min_count")
    args = po.parse(argv)
    if len(args) != 4:
        return _usage(po)

    def accumulate(acc, model, x, gpost):
        acc.accumulate_gpost(model.am, x, gpost)

    n = _est_fmllr_from_accs_loop(o, args, accumulate)
    log.info("gmm-est-fmllr-gpost: %d transforms", n)
    return 0


def _spk_fmllr_accs(args, spk2utt_opt):
    """Per-speaker FmllrAccs from (model, feats, post) table args."""
    from old_kaldi_git_tpu.transform.fmllr import FmllrAccs
    from old_kaldi_git_tpu.utils.data_dir import _read_map
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
    )

    model = _load_model(args[0])
    posts = RandomAccessTableReader(args[2], "post")
    feats = dict(SequentialTableReader(args[1], "mat"))
    spk2utt = ({k: v.split() for k, v in _read_map(spk2utt_opt).items()}
               if spk2utt_opt else {k: [k] for k in feats})
    out = {}
    for spk, utts in spk2utt.items():
        acc = None
        for u in utts:
            if u not in feats or u not in posts:
                continue
            x = np.asarray(feats[u], np.float64)
            if acc is None:
                acc = FmllrAccs(x.shape[1])
            t, pdfs, ws = _post_weights_per_pdf(posts[u], model.tm)
            acc.accumulate(model.am, x[t], pdfs, ws)
        if acc is not None and acc.beta > 0:
            out[spk] = acc
    return out


@tool("gmm-basis-fmllr-training")
def gmm_basis_fmllr_training_tool(argv: List[str]) -> int:
    """Learn an fMLLR basis from training-speaker statistics
    (reference gmmbin/gmm-basis-fmllr-training.cc)."""
    from old_kaldi_git_tpu.transform.basis_fmllr import estimate_fmllr_basis

    po = ParseOptions(
        "gmm-basis-fmllr-training [options] <model> <feats-rspecifier> "
        "<post-rspecifier> <basis-out>"
    )

    class Opts:
        spk2utt = ""
        num_bases = 0  # 0 → min(D*(D+1), 200)

    o = Opts()
    po.register("spk2utt", o, "spk2utt")
    po.register("num-bases", o, "num_bases")
    args = po.parse(argv)
    if len(args) != 4:
        return _usage(po)
    accs = _spk_fmllr_accs(args, o.spk2utt)
    if not accs:
        log.warning("gmm-basis-fmllr-training: no speaker stats")
        return 1
    basis = estimate_fmllr_basis(
        list(accs.values()), o.num_bases if o.num_bases > 0 else None)
    basis.save(args[3])
    log.info(
        "gmm-basis-fmllr-training: %d bases from %d speakers → %s",
        basis.num_bases, len(accs), args[3])
    return 0


@tool("gmm-est-basis-fmllr")
def gmm_est_basis_fmllr_tool(argv: List[str]) -> int:
    """Per-speaker transforms in a learned fMLLR basis
    (reference gmmbin/gmm-est-basis-fmllr.cc); works from far fewer
    adaptation frames than gmm-est-fmllr."""
    from old_kaldi_git_tpu.transform.basis_fmllr import (
        BasisFmllr,
        compute_fmllr_basis_transform,
    )
    from old_kaldi_git_tpu.utils.table import TableWriter

    po = ParseOptions(
        "gmm-est-basis-fmllr [options] <model> <basis-in> "
        "<feats-rspecifier> <post-rspecifier> <transform-wspecifier>"
    )

    class Opts:
        spk2utt = ""
        size_scale = 0.2
        fmllr_min_count = 10.0
        num_iters = 10

    o = Opts()
    po.register("spk2utt", o, "spk2utt")
    po.register("size-scale", o, "size_scale")
    po.register("fmllr-min-count", o, "fmllr_min_count")
    po.register("num-iters", o, "num_iters")
    args = po.parse(argv)
    if len(args) != 5:
        return _usage(po)
    basis = BasisFmllr.load(args[1])
    accs = _spk_fmllr_accs([args[0], args[2], args[3]], o.spk2utt)
    n = 0
    with TableWriter(args[4], "mat") as w:
        for spk, acc in accs.items():
            res = compute_fmllr_basis_transform(
                acc, basis, size_scale=o.size_scale,
                num_iters=o.num_iters, min_count=o.fmllr_min_count)
            if res is None:
                continue
            w[spk] = res[0].astype(np.float32)
            n += 1
    log.info("gmm-est-basis-fmllr: %d transforms", n)
    return 0


# ---------------------------------------------------------------------------
# Linear VTLN (reference gmmbin/gmm-init-lvtln.cc,
# gmm-train-lvtln-special.cc, gmm-est-lvtln-trans.cc)
# ---------------------------------------------------------------------------


@tool("gmm-init-lvtln")
def gmm_init_lvtln_tool(argv: List[str]) -> int:
    """Initialize a LinearVtln object with identity transforms."""
    from old_kaldi_git_tpu.transform.lvtln import LinearVtln

    po = ParseOptions("gmm-init-lvtln [options] <lvtln-out>")

    class Opts:
        dim = 13
        num_classes = 31
        min_warp = 0.85
        max_warp = 1.25

    o = Opts()
    po.register("dim", o, "dim")
    po.register("num-classes", o, "num_classes")
    po.register("min-warp", o, "min_warp")
    po.register("max-warp", o, "max_warp")
    args = po.parse(argv)
    if len(args) != 1:
        return _usage(po)
    warps = np.linspace(o.min_warp, o.max_warp, o.num_classes)
    LinearVtln.init(o.dim, warps.tolist()).save(args[0])
    log.info("gmm-init-lvtln: %d classes, warps %.2f..%.2f, dim %d",
             o.num_classes, o.min_warp, o.max_warp, o.dim)
    return 0


@tool("gmm-train-lvtln-special")
def gmm_train_lvtln_special_tool(argv: List[str]) -> int:
    """Fit one LVTLN class by least squares from paired
    (warped, unwarped) feature tables."""
    from old_kaldi_git_tpu.transform.lvtln import LinearVtln, train_lvtln_class
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
    )

    po = ParseOptions(
        "gmm-train-lvtln-special [options] <class-index> <lvtln-in> "
        "<lvtln-out> <feats-unwarped-rspecifier> <feats-warped-rspecifier>"
    )
    args = po.parse(argv)
    if len(args) != 5:
        return _usage(po)
    c = int(args[0])
    lvtln = LinearVtln.load(args[1])
    warped = RandomAccessTableReader(args[4], "mat")
    pairs = []
    for key, y in SequentialTableReader(args[3], "mat"):
        if key in warped:
            pairs.append((np.asarray(warped[key]), np.asarray(y)))
    if not pairs:
        raise KaldiError("no paired utterances")
    lvtln.set_transform(c, train_lvtln_class(pairs))
    lvtln.save(args[2])
    log.info("gmm-train-lvtln-special: class %d from %d utterances",
             c, len(pairs))
    return 0


@tool("gmm-est-lvtln-trans")
def gmm_est_lvtln_trans_tool(argv: List[str]) -> int:
    """Per-speaker LVTLN class selection: writes the chosen [D, D+1]
    transform and the warp factor."""
    from old_kaldi_git_tpu.transform.fmllr import FmllrAccs
    from old_kaldi_git_tpu.transform.lvtln import (
        LinearVtln,
        select_lvtln_transform,
    )
    from old_kaldi_git_tpu.utils.data_dir import _read_map
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
        TableWriter,
    )

    po = ParseOptions(
        "gmm-est-lvtln-trans [options] <model> <lvtln> <feats-rspecifier> "
        "<post-rspecifier> <transform-wspecifier> <warp-wspecifier>"
    )

    class Opts:
        spk2utt = ""
        min_count = 10.0
        estimate_offset = True

    o = Opts()
    po.register("spk2utt", o, "spk2utt")
    po.register("min-count", o, "min_count")
    po.register("estimate-offset", o, "estimate_offset")
    args = po.parse(argv)
    if len(args) != 6:
        return _usage(po)
    model = _load_model(args[0])
    lvtln = LinearVtln.load(args[1])
    posts = RandomAccessTableReader(args[3], "post")
    feats = dict(SequentialTableReader(args[2], "mat"))
    spk2utt = ({k: v.split() for k, v in _read_map(o.spk2utt).items()}
               if o.spk2utt else {k: [k] for k in feats})
    n = 0
    with TableWriter(args[4], "mat") as wt, \
            TableWriter(args[5], "text") as ww:
        for spk, utts in spk2utt.items():
            acc = None
            for u in utts:
                if u not in feats or u not in posts:
                    continue
                x = np.asarray(feats[u], np.float64)
                if acc is None:
                    acc = FmllrAccs(x.shape[1])
                t, pdfs, ws = _post_weights_per_pdf(posts[u], model.tm)
                acc.accumulate(model.am, x[t], pdfs, ws)
            if acc is None:
                continue
            res = select_lvtln_transform(
                acc, lvtln, estimate_offset=o.estimate_offset,
                min_count=o.min_count)
            if res is None:
                continue
            w, warp, _c, _impr = res
            wt[spk] = w.astype(np.float32)
            ww[spk] = f"{warp:.4f}"
            n += 1
    log.info("gmm-est-lvtln-trans: %d speakers", n)
    return 0


# ---------------------------------------------------------------------------
# Regression-tree MLLR/fMLLR (reference gmmbin/gmm-make-regtree.cc,
# gmm-est-regtree-fmllr.cc, gmm-est-regtree-mllr.cc,
# gmm-decode-faster-regtree-{fmllr,mllr}.cc)
# ---------------------------------------------------------------------------


@tool("gmm-make-regtree")
def gmm_make_regtree_tool(argv: List[str]) -> int:
    """Cluster the model's Gaussians into a regression tree."""
    from old_kaldi_git_tpu.transform.regtree import RegressionTree

    po = ParseOptions("gmm-make-regtree [options] <model> <regtree-out>")

    class Opts:
        max_leaves = 32
        seed = 0

    o = Opts()
    po.register("max-leaves", o, "max_leaves")
    po.register("seed", o, "seed")
    args = po.parse(argv)
    if len(args) != 2:
        return _usage(po)
    model = _load_model(args[0])
    RegressionTree.build(model.am, o.max_leaves, seed=o.seed).save(args[1])
    return 0


def _est_regtree(argv: List[str], kind: str) -> int:
    from old_kaldi_git_tpu.transform.regtree import (
        RegressionTree,
        RegtreeFmllrAccs,
        RegtreeMllrAccs,
        estimate_regtree_fmllr,
        estimate_regtree_mllr,
    )
    from old_kaldi_git_tpu.utils.data_dir import _read_map
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
        TableWriter,
    )

    po = ParseOptions(
        f"gmm-est-regtree-{kind} [options] <model> <regtree> "
        "<feats-rspecifier> <post-rspecifier> <xforms-wspecifier>"
    )

    class Opts:
        spk2utt = ""
        min_count = 1000.0

    o = Opts()
    po.register("spk2utt", o, "spk2utt")
    po.register("min-count", o, "min_count")
    args = po.parse(argv)
    if len(args) != 5:
        return _usage(po)
    model = _load_model(args[0])
    tree = RegressionTree.load(args[1])
    posts = RandomAccessTableReader(args[3], "post")
    feats = dict(SequentialTableReader(args[2], "mat"))
    spk2utt = ({k: v.split() for k, v in _read_map(o.spk2utt).items()}
               if o.spk2utt else {k: [k] for k in feats})
    dim = model.am.dim
    n = 0
    with TableWriter(args[4], "regx") as w:
        for spk, utts in spk2utt.items():
            acc = (RegtreeFmllrAccs(dim, tree.num_baseclasses)
                   if kind == "fmllr"
                   else RegtreeMllrAccs(dim, tree.num_baseclasses))
            got = False
            for u in utts:
                if u not in feats or u not in posts:
                    continue
                x = np.asarray(feats[u], np.float64)
                t, pdfs, ws = _post_weights_per_pdf(posts[u], model.tm)
                acc.accumulate(model.am, tree, x[t], pdfs, ws)
                got = True
            if not got:
                continue
            if kind == "fmllr":
                w[spk] = estimate_regtree_fmllr(acc, tree, o.min_count)
            else:
                w[spk] = estimate_regtree_mllr(acc, tree, o.min_count)
            n += 1
    log.info("gmm-est-regtree-%s: %d speakers", kind, n)
    return 0


@tool("gmm-est-regtree-fmllr")
def gmm_est_regtree_fmllr_tool(argv: List[str]) -> int:
    """Per-speaker regression-tree fMLLR feature transforms."""
    return _est_regtree(argv, "fmllr")


@tool("gmm-est-regtree-mllr")
def gmm_est_regtree_mllr_tool(argv: List[str]) -> int:
    """Per-speaker regression-tree MLLR mean transforms."""
    return _est_regtree(argv, "mllr")


def _decode_regtree(argv: List[str], kind: str) -> int:
    _jnp()
    from old_kaldi_git_tpu.decoder.csr import fst_to_csr
    from old_kaldi_git_tpu.decoder.viterbi import ViterbiOptions, decode_batch
    from old_kaldi_git_tpu.fst.symbols import SymbolTable
    from old_kaldi_git_tpu.fst.vector_fst import VectorFst
    from old_kaldi_git_tpu.transform.regtree import (
        RegressionTree,
        apply_mllr_to_model,
        regtree_fmllr_loglikes,
    )
    from old_kaldi_git_tpu.utils.data_dir import _read_map
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
        TableWriter,
    )

    po = ParseOptions(
        f"gmm-decode-faster-regtree-{kind} [options] <model> <regtree> "
        "<hclg-fst> <feats-rspecifier> <xforms-rspecifier> "
        "<words-wspecifier> [<ali-wspecifier>]"
    )

    class Opts:
        beam = 16.0
        max_active = 7000
        acoustic_scale = 0.1
        word_symbol_table = ""
        utt2spk = ""

    o = Opts()
    po.register("beam", o, "beam")
    po.register("max-active", o, "max_active")
    po.register("acoustic-scale", o, "acoustic_scale")
    po.register("word-symbol-table", o, "word_symbol_table")
    po.register("utt2spk", o, "utt2spk")
    args = po.parse(argv)
    if len(args) not in (6, 7):
        return _usage(po)
    model = _load_model(args[0])
    tree = RegressionTree.load(args[1])
    with open(args[2], "rb") as f:
        hclg = VectorFst.read(f)
    csr = fst_to_csr(hclg, model.tm.tid_to_pdf_array())
    xforms = RandomAccessTableReader(args[4], "regx")
    utt2spk = _read_map(o.utt2spk) if o.utt2spk else {}
    feats = dict(SequentialTableReader(args[3], "mat"))
    if not feats:
        log.warning("no features")
        return 1
    # adapted per-utterance loglikes, padded into one decode batch
    keys = sorted(feats)
    P = model.am.num_pdfs
    nf = np.asarray([len(feats[k]) for k in keys])
    T = int(nf.max())
    loglikes = np.full((len(keys), T, P), -1e30, np.float32)
    mllr_models: Dict[str, object] = {}
    for i, k in enumerate(keys):
        spk = utt2spk.get(k, k)
        x = np.asarray(feats[k], np.float64)
        if spk not in xforms:
            ll = model.am.loglikes_numpy(x)
        elif kind == "fmllr":
            ll = regtree_fmllr_loglikes(model.am, tree, xforms[spk], x)
        else:
            if spk not in mllr_models:
                mllr_models[spk] = apply_mllr_to_model(
                    model.am, tree, xforms[spk])
            ll = mllr_models[spk].loglikes_numpy(x)
        loglikes[i, :len(x)] = ll
    results = decode_batch(
        csr, loglikes, nf,
        ViterbiOptions(beam=o.beam, max_active=o.max_active,
                       acoustic_scale=o.acoustic_scale),
    )
    words_tab = (
        SymbolTable.read(o.word_symbol_table) if o.word_symbol_table else None
    )
    awriter = TableWriter(args[6], "ivec") if len(args) == 7 else None
    n = 0
    with TableWriter(args[5], "text") as w:
        for key, res in zip(keys, results):
            if res is None:
                log.warning("decode failed for %s", key)
                continue
            w[key] = " ".join(
                words_tab[x] if words_tab else str(x) for x in res.words
            )
            if awriter is not None:
                awriter[key] = np.asarray(res.alignment, np.int32)
            n += 1
    if awriter is not None:
        awriter.close()
    log.info("gmm-decode-faster-regtree-%s: decoded %d/%d", kind, n,
             len(keys))
    return 0


@tool("gmm-decode-faster-regtree-fmllr")
def gmm_decode_faster_regtree_fmllr_tool(argv: List[str]) -> int:
    """Best-path decode with per-speaker regression-tree fMLLR features."""
    return _decode_regtree(argv, "fmllr")


@tool("gmm-decode-faster-regtree-mllr")
def gmm_decode_faster_regtree_mllr_tool(argv: List[str]) -> int:
    """Best-path decode with per-speaker regression-tree MLLR means."""
    return _decode_regtree(argv, "mllr")


# ---------------------------------------------------------------------------
# fMPE (reference src/transform/fmpe.{h,cc}; gmmbin/fmpe-init.cc,
# gmm-fmpe-acc-stats.cc, fmpe-sum-accs.cc, fmpe-est.cc,
# fmpe-apply-transform.cc)
# ---------------------------------------------------------------------------


@tool("fmpe-init")
def fmpe_init_tool(argv: List[str]) -> int:
    """Initialize an fMPE object (zero projection) from a diagonal UBM."""
    from old_kaldi_git_tpu.gmm.diag_gmm import DiagGmm
    from old_kaldi_git_tpu.transform.fmpe import (
        DEFAULT_CONTEXTS,
        Fmpe,
        parse_contexts,
    )

    po = ParseOptions("fmpe-init [options] <diag-ubm> <fmpe-out>")

    class Opts:
        context_expansion = ""
        post_scale = 5.0
        num_gselect = 25

    o = Opts()
    po.register("context-expansion", o, "context_expansion")
    po.register("post-scale", o, "post_scale")
    po.register("num-gselect", o, "num_gselect")
    args = po.parse(argv)
    if len(args) != 2:
        return _usage(po)
    ubm = DiagGmm.load(args[0])
    ctx = (parse_contexts(o.context_expansion)
           if o.context_expansion else DEFAULT_CONTEXTS)
    Fmpe.init(ubm, ctx, o.post_scale, o.num_gselect).save(args[1])
    log.info("fmpe-init: %d Gaussians, %d contexts, dim %d",
             ubm.num_mix, len(ctx), ubm.dim)
    return 0


@tool("gmm-get-stats-deriv")
def gmm_get_stats_deriv_tool(argv: List[str]) -> int:
    """Per-Gaussian derivative of the discriminative objective wrt the
    model parameters + ML occupancies (reference
    gmmbin/gmm-get-stats-deriv.cc) — input to the fMPE INDIRECT
    differential.  Needs the signed MPE/MMI posteriors AND the ML
    alignment the model will be re-estimated from."""
    from old_kaldi_git_tpu.transform.fmpe import Fmpe, ModelDerivStats
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
    )

    po = ParseOptions(
        "gmm-get-stats-deriv [options] <model> <fmpe> <feats-rspecifier> "
        "<signed-post-rspecifier> <ali-rspecifier> <deriv-stats-out>")

    class Opts:
        apply_fmpe = True

    o = Opts()
    po.register("apply-fmpe", o, "apply_fmpe")
    args = po.parse(argv)
    if len(args) != 6:
        return _usage(po)
    model = _load_model(args[0])
    fmpe = Fmpe.load(args[1])
    posts = RandomAccessTableReader(args[3], "post")
    alis = RandomAccessTableReader(args[4], "ivec")
    stats = ModelDerivStats(model.am)
    n = 0
    for key, x in SequentialTableReader(args[2], "mat"):
        if key not in posts or key not in alis:
            continue
        x = np.asarray(x, np.float64)
        xt = x + fmpe.offsets(x) if o.apply_fmpe else x
        stats.accumulate(model.am, model.tm, xt, posts[key],
                         np.asarray(alis[key]))
        n += 1
    stats.save(args[5])
    log.info("gmm-get-stats-deriv: %d utterances", n)
    return 0


@tool("gmm-fmpe-acc-stats")
def gmm_fmpe_acc_stats_tool(argv: List[str]) -> int:
    """Accumulate fMPE projection-gradient stats from signed (MPE/sMBR)
    posteriors — the direct differential, plus the indirect differential
    through the model's ML re-estimation when --model-derivs (a
    gmm-get-stats-deriv file) and --ali are given (see
    transform/fmpe.py)."""
    from old_kaldi_git_tpu.transform.fmpe import (
        Fmpe,
        FmpeAccs,
        ModelDerivStats,
        model_deriv_direct,
        model_deriv_indirect,
    )
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
    )

    po = ParseOptions(
        "gmm-fmpe-acc-stats [options] <model> <fmpe> <feats-rspecifier> "
        "<signed-post-rspecifier> <accs-out>"
    )

    class Opts:
        model_derivs = ""
        ali = ""

    o = Opts()
    po.register("model-derivs", o, "model_derivs")
    po.register("ali", o, "ali")
    args = po.parse(argv)
    if len(args) != 5:
        return _usage(po)
    model = _load_model(args[0])
    fmpe = Fmpe.load(args[1])
    posts = RandomAccessTableReader(args[3], "post")
    deriv_stats = (ModelDerivStats.load(o.model_derivs, model.am)
                   if o.model_derivs else None)
    if deriv_stats is not None and not o.ali:
        raise KaldiError("--model-derivs needs --ali (the ML alignment)")
    alis = RandomAccessTableReader(o.ali, "ivec") if o.ali else None
    accs = FmpeAccs.zeros_like(fmpe)
    n = 0
    for key, x in SequentialTableReader(args[2], "mat"):
        if key not in posts:
            continue
        x = np.asarray(x, np.float64)
        # gradient is taken at the fMPE-transformed features, like the
        # reference (the transform composes with itself across iterations)
        xt = x + fmpe.offsets(x)
        deriv = model_deriv_direct(model.am, model.tm, xt, posts[key])
        if deriv_stats is not None and key in alis:
            deriv = deriv + model_deriv_indirect(
                model.am, model.tm, xt, np.asarray(alis[key]), deriv_stats)
        accs.add(fmpe.acc_from_deriv(x, deriv))
        n += 1
    accs.save(args[4])
    log.info("gmm-fmpe-acc-stats: %d utterances%s", n,
             " (direct+indirect)" if deriv_stats is not None else "")
    return 0


@tool("fmpe-sum-accs")
def fmpe_sum_accs_tool(argv: List[str]) -> int:
    """Sum fMPE stat files (src/gmmbin/fmpe-sum-accs.cc)."""
    from old_kaldi_git_tpu.transform.fmpe import FmpeAccs

    po = ParseOptions("fmpe-sum-accs <accs-out> <accs-in1> [<accs-in2> ...]")
    args = po.parse(argv)
    if len(args) < 2:
        return _usage(po)
    tot = FmpeAccs.load(args[1])
    for p in args[2:]:
        tot.add(FmpeAccs.load(p))
    tot.save(args[0])
    return 0


@tool("fmpe-est")
def fmpe_est_tool(argv: List[str]) -> int:
    """Update the fMPE projection from summed stats."""
    from old_kaldi_git_tpu.transform.fmpe import Fmpe, FmpeAccs

    po = ParseOptions("fmpe-est [options] <fmpe-in> <accs> <fmpe-out>")

    class Opts:
        learning_rate = 0.1

    o = Opts()
    po.register("learning-rate", o, "learning_rate")
    args = po.parse(argv)
    if len(args) != 3:
        return _usage(po)
    fmpe = Fmpe.load(args[0])
    fmpe.update(FmpeAccs.load(args[1]), o.learning_rate)
    fmpe.save(args[2])
    return 0


@tool("fmpe-apply-transform")
def fmpe_apply_transform_tool(argv: List[str]) -> int:
    """x' = x + offset(x) over a feature table."""
    from old_kaldi_git_tpu.transform.fmpe import Fmpe
    from old_kaldi_git_tpu.utils.table import (
        SequentialTableReader,
        TableWriter,
    )

    po = ParseOptions(
        "fmpe-apply-transform <fmpe> <feats-rspecifier> <feats-wspecifier>")
    args = po.parse(argv)
    if len(args) != 3:
        return _usage(po)
    fmpe = Fmpe.load(args[0])
    n = 0
    with TableWriter(args[2], "mat") as w:
        for key, x in SequentialTableReader(args[1], "mat"):
            w[key] = fmpe.apply(np.asarray(x))
            n += 1
    log.info("fmpe-apply-transform: %d utterances", n)
    return 0


@tool("compile-questions")
def compile_questions_tool(argv: List[str]) -> int:
    """Validate/normalize a question set against a model's phone inventory
    (reference bin/compile-questions.cc compiles questions + topo into the
    Questions object; our build-tree consumes the text question file
    directly, so this tool normalizes: drops out-of-inventory phones,
    dedupes, sorts, and appends the all-phones question the reference adds
    automatically)."""
    po = ParseOptions(
        "compile-questions [options] <topo-model> <questions-in> "
        "<questions-out>")
    args = po.parse(argv)
    if len(args) != 3:
        return _usage(po)
    model = _load_model(args[0])
    inventory = set(model.tm.topo.phones)
    seen = set()
    out: List[List[int]] = []
    with open(args[1]) as f:
        for line in f:
            q = sorted({int(p) for p in line.split()} & inventory)
            if q and tuple(q) not in seen:
                seen.add(tuple(q))
                out.append(q)
    allq = sorted(inventory)
    if tuple(allq) not in seen:
        out.append(allq)
    with open(args[2], "w") as f:
        for q in out:
            f.write(" ".join(str(p) for p in q) + "\n")
    log.info("compile-questions: %d questions over %d phones",
             len(out), len(inventory))
    return 0


@tool("build-tree-two-level")
def build_tree_two_level_tool(argv: List[str]) -> int:
    """Two-level tree (reference bin/build-tree-two-level.cc): fine tree
    with --max-leaves-second leaves, then its leaves clustered bottom-up
    by likelihood loss into --max-leaves-first coarse groups; writes the
    fine tree + the leaf→coarse int-vector mapping (the multi-codebook /
    SGMM sharing structure)."""
    from old_kaldi_git_tpu.tree.build_tree import (
        build_tree,
        cluster_leaves,
        read_tree_stats,
    )
    from old_kaldi_git_tpu.utils.io_funcs import (
        init_kaldi_output_stream,
        write_int_vector,
    )

    po = ParseOptions(
        "build-tree-two-level [options] <tree-stats> <topo-model> "
        "<tree-out> <mapping-out>"
    )

    class Opts:
        max_leaves_first = 100
        max_leaves_second = 1000
        thresh = 20.0
        context_width = 3
        central_position = 1
        questions = ""

    o = Opts()
    po.register("max-leaves-first", o, "max_leaves_first")
    po.register("max-leaves-second", o, "max_leaves_second")
    po.register("thresh", o, "thresh")
    po.register("context-width", o, "context_width")
    po.register("central-position", o, "central_position")
    po.register("questions", o, "questions")
    args = po.parse(argv)
    if len(args) != 4:
        return _usage(po)
    with open(args[0], "rb") as f:
        stats = read_tree_stats(f)
    topo = _load_model(args[1]).tm.topo
    phones = topo.phones
    questions = None
    if o.questions:
        with open(o.questions) as f:
            questions = [
                {int(p) for p in ln.split()} for ln in f if ln.split()
            ]
    ctx_dep = build_tree(
        stats, phones, {p: topo.num_pdf_classes(p) for p in phones},
        N=o.context_width, P=o.central_position, questions=questions,
        max_leaves=o.max_leaves_second, thresh=o.thresh,
    )
    mapping = cluster_leaves(stats, ctx_dep, o.max_leaves_first)
    with open(args[2], "wb") as f:
        ctx_dep.write(f)
    with open(args[3], "wb") as f:
        init_kaldi_output_stream(f, True)
        write_int_vector(f, mapping)
    log.info("build-tree-two-level: %d fine leaves → %d coarse",
             ctx_dep.num_pdfs, max(mapping) + 1)
    return 0
