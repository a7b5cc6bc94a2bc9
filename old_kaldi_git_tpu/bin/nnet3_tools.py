"""nnet3 / chain CLI tool family.

Reference parity (SURVEY.md §2 nnet3bin/chainbin rows): nnet3-init,
nnet3-copy, nnet3-am-init, egs extraction/shuffling, nnet3-train,
nnet3-compute-prob, nnet3-align-compiled, nnet3-latgen-faster,
chain-est-phone-lm, chain-make-den-fst, nnet3-chain-{init,get-egs,train,
compute-prob}.  The reference's per-iteration job fan-out + model
averaging (P3) is covered by nnet3-train over sharded egs + nnet3-average;
a single multi-chip run does the same reduction with an in-step psum.

Design notes:
- egs/cegs formats and merging live in models/egs.py; merging into
  minibatches happens inside nnet3-train (--minibatch-size) because one
  jitted step consumes a whole [B, T, ...] batch (the ExampleMerger role).
- nnet3-merge-egs therefore has no separate on-disk artifact here.
"""

from __future__ import annotations

import sys
from typing import List

import numpy as np

from old_kaldi_git_tpu.bin.tools import _jnp, tool
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger
from old_kaldi_git_tpu.utils.parse_options import ParseOptions

log = get_logger("nnet3_tools")


# ---------------------------------------------------------------------------
# model creation / surgery
# ---------------------------------------------------------------------------

@tool("nnet3-init")
def nnet3_init_tool(argv: List[str]) -> int:
    """Initialize a raw nnet from an xconfig file
    (reference nnet3bin/nnet3-init.cc + xconfig_to_configs.py combined:
    our xconfig front-end IS the config format)."""
    from old_kaldi_git_tpu.models.am_nnet import AmNnet
    from old_kaldi_git_tpu.models.xconfig import parse_xconfig

    po = ParseOptions("nnet3-init [options] <xconfig-file> <raw-nnet-out>")

    class Opts:
        srand = 0

    o = Opts()
    po.register("srand", o, "srand")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with open(args[0]) as f:
        config = parse_xconfig(f.read())
    am = AmNnet.init(config, seed=o.srand)
    am.save(args[1])
    log.info("initialized nnet: %d layers, input %d, outputs %d",
             len(config.layers), config.input_dim, config.num_outputs)
    return 0


@tool("nnet3-copy")
def nnet3_copy_tool(argv: List[str]) -> int:
    """Copy a raw nnet, optionally scaling parameters or setting priors
    (reference nnet3-copy / nnet3-am-copy roles)."""
    import jax

    from old_kaldi_git_tpu.models.am_nnet import AmNnet

    po = ParseOptions("nnet3-copy [options] <raw-nnet-in> <raw-nnet-out>")

    class Opts:
        scale = 1.0
        prior_counts_vec = ""  # Kaldi vector file of pdf counts
        edits = ""  # semicolon-separated directives (nnet-utils ReadEditConfig)
        edits_config = ""  # file of directives, one per line

    o = Opts()
    po.register("scale", o, "scale")
    po.register("prior-counts-vec", o, "prior_counts_vec")
    po.register("edits", o, "edits")
    po.register("edits-config", o, "edits_config")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    am = AmNnet.load(args[0])
    if o.edits or o.edits_config:
        from old_kaldi_git_tpu.models.edits import apply_edits

        edits = o.edits
        if o.edits_config:
            with open(o.edits_config) as f:
                edits = (edits + ";" if edits else "") + f.read()
        am = apply_edits(am, edits)
    if o.scale != 1.0:
        am.variables = dict(am.variables)
        am.variables["params"] = jax.tree.map(
            lambda x: np.asarray(x) * o.scale, am.variables["params"]
        )
    if o.prior_counts_vec:
        from old_kaldi_git_tpu.utils.io_funcs import (
            init_kaldi_input_stream,
            read_vector,
        )

        with open(o.prior_counts_vec, "rb") as f:
            init_kaldi_input_stream(f)
            counts = read_vector(f)
        am.set_priors_from_alignment_counts(counts)
    am.save(args[1])
    return 0


@tool("nnet3-am-init")
def nnet3_am_init_tool(argv: List[str]) -> int:
    """Bundle a raw nnet with the transition model of an existing system →
    the decodable 'final.mdl' (reference nnet3-am-init: TransitionModel +
    AmNnetSimple in one file)."""
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
    from old_kaldi_git_tpu.models.am_nnet import AmNnet, AmNnetModel

    po = ParseOptions(
        "nnet3-am-init <gmm-model-with-transitions> <raw-nnet> <am-nnet-out>"
    )
    args = po.parse(argv)
    if len(args) != 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    tm = AmGmmModel.load(args[0]).tm
    am = AmNnet.load(args[1])
    AmNnetModel(am, tm).save(args[2])
    return 0


# ---------------------------------------------------------------------------
# egs tools
# ---------------------------------------------------------------------------

@tool("nnet3-get-egs")
def nnet3_get_egs_tool(argv: List[str]) -> int:
    """Cut utterances into fixed-width CE egs
    (reference nnet3bin/nnet3-get-egs.cc; labels = pdf alignment from
    ali-to-pdf)."""
    from old_kaldi_git_tpu.models.egs import get_ce_egs
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
        TableWriter,
    )

    po = ParseOptions(
        "nnet3-get-egs [options] <feats-rspecifier> <pdf-ali-rspecifier> "
        "<egs-wspecifier>"
    )

    class Opts:
        frames_per_eg = 64

    o = Opts()
    po.register("frames-per-eg", o, "frames_per_eg")
    args = po.parse(argv)
    if len(args) != 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    alis = RandomAccessTableReader(args[1], "ivec")
    n = 0
    with TableWriter(args[2], "egs") as w:
        for key, f in SequentialTableReader(args[0], "mat"):
            if key not in alis:
                log.warning("no alignment for %s", key)
                continue
            for i, eg in enumerate(get_ce_egs(f, alis[key], o.frames_per_eg)):
                w[f"{key}-{i}"] = eg
                n += 1
    log.info("wrote %d egs", n)
    return 0 if n else 1


@tool("nnet3-copy-egs")
def nnet3_copy_egs_tool(argv: List[str]) -> int:
    """Copy egs to one or more outputs round-robin
    (reference nnet3-copy-egs job-archive splitting)."""
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "nnet3-copy-egs <egs-rspecifier> <egs-wspecifier1> [<egs-wspecifier2> ...]"
    )

    class Opts:
        chain = False

    o = Opts()
    po.register("chain", o, "chain")
    args = po.parse(argv)
    if len(args) < 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    holder = "cegs" if o.chain else "egs"
    writers = [TableWriter(a, holder) for a in args[1:]]
    for i, (key, eg) in enumerate(SequentialTableReader(args[0], holder)):
        writers[i % len(writers)][key] = eg
    for w in writers:
        w.close()
    return 0


@tool("nnet3-shuffle-egs")
def nnet3_shuffle_egs_tool(argv: List[str]) -> int:
    """Randomize eg order (reference nnet3-shuffle-egs)."""
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "nnet3-shuffle-egs [options] <egs-rspecifier> <egs-wspecifier>"
    )

    class Opts:
        srand = 0
        chain = False

    o = Opts()
    po.register("srand", o, "srand")
    po.register("chain", o, "chain")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    holder = "cegs" if o.chain else "egs"
    pairs = list(SequentialTableReader(args[0], holder))
    rng = np.random.default_rng(o.srand)
    rng.shuffle(pairs)
    with TableWriter(args[1], holder) as w:
        for key, eg in pairs:
            w[key] = eg
    return 0


# ---------------------------------------------------------------------------
# CE training / diagnostics
# ---------------------------------------------------------------------------

def _ce_eval(am, egs, batch_size: int = 128):
    """Masked CE/acc over an eg list; returns (ce, acc, frames)."""
    import jax
    import jax.numpy as jnp

    from old_kaldi_git_tpu.models.egs import batch_ce_egs, iter_merged

    tot_ll = tot_acc = tot_n = 0.0
    for group in iter_merged(egs, batch_size):
        bf, bl, bm = batch_ce_egs(group)
        logits = am.logits(jnp.asarray(bf))
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, jnp.asarray(bl)[..., None],
                                 axis=-1)[..., 0]
        acc = (jnp.argmax(logits, -1) == jnp.asarray(bl))
        m = jnp.asarray(bm)
        tot_ll += float((ll * m).sum())
        tot_acc += float((acc * m).sum())
        tot_n += float(m.sum())
    n = max(tot_n, 1.0)
    return -tot_ll / n, tot_acc / n, int(tot_n)


@tool("nnet3-train")
def nnet3_train_tool(argv: List[str]) -> int:
    """One pass of minibatch CE training over an egs archive
    (reference nnet3bin/nnet3-train.cc; minibatch merging happens here —
    the ExampleMerger role — since one jitted step consumes a batch)."""
    _jnp()
    import jax

    from old_kaldi_git_tpu.models.am_nnet import AmNnet
    from old_kaldi_git_tpu.models.egs import batch_ce_egs, iter_merged
    from old_kaldi_git_tpu.models.train import (
        NnetTrainOptions,
        TrainState,
        make_ce_train_step,
        make_optimizer,
    )

    po = ParseOptions(
        "nnet3-train [options] <raw-nnet-in> <egs-rspecifier> <raw-nnet-out>"
    )

    class Opts:
        minibatch_size = 128
        num_epochs = 1
        initial_lr = 1e-3
        final_lr = 1e-4
        max_change = 2.0
        srand = 0

    o = Opts()
    for name, attr in (("minibatch-size", "minibatch_size"),
                       ("num-epochs", "num_epochs"),
                       ("initial-lr", "initial_lr"),
                       ("final-lr", "final_lr"),
                       ("max-change", "max_change"),
                       ("srand", "srand")):
        po.register(name, o, attr)
    args = po.parse(argv)
    if len(args) != 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    from old_kaldi_git_tpu.utils.table import SequentialTableReader

    am = AmNnet.load(args[0])
    egs = [eg for _k, eg in SequentialTableReader(args[1], "egs")]
    if not egs:
        log.error("no egs")
        return 1
    # sort by length so each minibatch has a near-uniform shape (one XLA
    # compilation per distinct (B, T) pair)
    egs.sort(key=lambda e: e.feats.shape[0])
    steps = max(1, len(egs) // o.minibatch_size) * o.num_epochs
    nopts = NnetTrainOptions(initial_lr=o.initial_lr, final_lr=o.final_lr,
                             max_param_change=o.max_change)
    optimizer = make_optimizer(nopts, steps, lr_factors=am.lr_factors)
    model = am.model()
    params = am.variables["params"]
    state = TrainState(params, am.variables.get("batch_stats", {}),
                       optimizer.init(params), 0)
    step_fn = make_ce_train_step(model, optimizer)
    rng = np.random.default_rng(o.srand)
    for epoch in range(o.num_epochs):
        # shuffle then re-chunk in sorted runs: shuffle groups, not items
        losses, accs = [], []
        groups = list(iter_merged(egs, o.minibatch_size))
        rng.shuffle(groups)
        for group in groups:
            bf, bl, bm = batch_ce_egs(group)
            state, metrics = step_fn(state, bf, bl, bm)
            losses.append(float(metrics["loss"]))
            accs.append(float(metrics["acc"]))
        mean_loss = float(np.mean(losses))
        log.info("epoch %d: CE %.4f acc %.3f (%d steps)", epoch,
                 mean_loss, float(np.mean(accs)), len(losses))
        if not np.isfinite(mean_loss):
            raise KaldiError(
                "model diverged (non-finite CE) — rerun with a lower "
                "learning rate (reference train.py halves the lr and "
                "redoes the iteration)"
            )
    out = AmNnet(
        am.config,
        {"params": jax.tree.map(np.asarray, state.params),
         "batch_stats": jax.tree.map(np.asarray, state.batch_stats)},
        am.log_priors,
        am.lr_factors,
    )
    out.save(args[2])
    return 0


@tool("nnet3-compute-prob")
def nnet3_compute_prob_tool(argv: List[str]) -> int:
    """CE objective + frame accuracy on an egs archive without updating
    (reference nnet3bin/nnet3-compute-prob.cc)."""
    _jnp()
    from old_kaldi_git_tpu.models.am_nnet import AmNnet
    from old_kaldi_git_tpu.utils.table import SequentialTableReader

    po = ParseOptions("nnet3-compute-prob <raw-nnet> <egs-rspecifier>")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    am = AmNnet.load(args[0])
    egs = [eg for _k, eg in SequentialTableReader(args[1], "egs")]
    ce, acc, n = _ce_eval(am, egs)
    print(f"log-probability per frame: {-ce:.4f} accuracy: {acc:.4f} "
          f"({n} frames)")
    return 0


# ---------------------------------------------------------------------------
# nnet3 decode / align
# ---------------------------------------------------------------------------

@tool("nnet3-align-compiled")
def nnet3_align_compiled_tool(argv: List[str]) -> int:
    """Batched Viterbi alignment with an nnet3 AM over per-utterance graphs
    (reference nnet3bin/nnet3-align-compiled.cc)."""
    from old_kaldi_git_tpu.bin.train_tools import _batch_align
    from old_kaldi_git_tpu.models.am_nnet import AmNnetModel

    po = ParseOptions(
        "nnet3-align-compiled [options] <am-nnet-model> <graphs-rspecifier> "
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
        print(po.print_usage(), file=sys.stderr)
        return 1
    _jnp()
    return _batch_align(AmNnetModel.load(args[0]), args[1], args[2], args[3],
                        beam=o.beam, acoustic_scale=o.acoustic_scale)


@tool("nnet3-latgen-faster")
def nnet3_latgen_faster_tool(argv: List[str]) -> int:
    """Batched lattice-generating decode with an nnet3 AM
    (reference nnet3bin/nnet3-latgen-faster.cc).  --frame-subsampling-factor
    3 decodes chain models (graph built with self-loop-scale 1.0)."""
    _jnp()
    from old_kaldi_git_tpu.decoder.csr import fst_to_csr
    from old_kaldi_git_tpu.decoder.viterbi import ViterbiOptions, decode_batch
    from old_kaldi_git_tpu.fst.symbols import SymbolTable
    from old_kaldi_git_tpu.fst.vector_fst import VectorFst
    from old_kaldi_git_tpu.lat.lattice import lattice_from_decode
    from old_kaldi_git_tpu.models.am_nnet import AmNnetModel
    from old_kaldi_git_tpu.utils.batching import pad_feature_batch
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "nnet3-latgen-faster [options] <am-nnet-model> <hclg-fst> "
        "<feats-rspecifier> <lattice-wspecifier> [<words-wspecifier>]"
    )

    class Opts:
        beam = 16.0
        max_active = 7000
        acoustic_scale = 1.0
        lattice_beam = 10.0
        word_symbol_table = ""
        frame_subsampling_factor = 1
        use_priors = True

    o = Opts()
    for name, attr in (("beam", "beam"), ("max-active", "max_active"),
                       ("acoustic-scale", "acoustic_scale"),
                       ("lattice-beam", "lattice_beam"),
                       ("word-symbol-table", "word_symbol_table"),
                       ("frame-subsampling-factor",
                        "frame_subsampling_factor"),
                       ("use-priors", "use_priors")):
        po.register(name, o, attr)
    args = po.parse(argv)
    if len(args) not in (4, 5):
        print(po.print_usage(), file=sys.stderr)
        return 1
    bundle = AmNnetModel.load(args[0])
    with open(args[1], "rb") as f:
        hclg = VectorFst.read(f)
    csr = fst_to_csr(hclg, bundle.tm.tid_to_pdf_array())
    feats = dict(SequentialTableReader(args[2], "mat"))
    if not feats:
        log.warning("no features")
        return 1
    keys, padded, nf = pad_feature_batch(feats)
    fsf = o.frame_subsampling_factor
    if o.use_priors and bundle.am.log_priors is not None:
        ll = np.asarray(bundle.am.loglikes_batch_chunked(padded))
        if fsf > 1:
            ll = ll[:, ::fsf]
    else:
        ll = np.asarray(bundle.am.logits(padded, output_stride=fsf))
    if fsf > 1:
        nf = [(n + fsf - 1) // fsf for n in nf]
    results = decode_batch(
        csr, ll, nf,
        ViterbiOptions(beam=o.beam, max_active=o.max_active,
                       acoustic_scale=o.acoustic_scale),
        want_lattice=True,
    )
    words_tab = (
        SymbolTable.read(o.word_symbol_table) if o.word_symbol_table else None
    )
    wwriter = TableWriter(args[4], "text") if len(args) == 5 else None
    n_done = 0
    with TableWriter(args[3], "lat") as lw:
        for i, (k, res) in enumerate(zip(keys, results)):
            if res is None:
                log.warning("decode failed for %s", k)
                continue
            lat = lattice_from_decode(
                csr, ll[i, : nf[i]], res.frame_states, res.frame_costs,
                o.acoustic_scale, o.lattice_beam,
            )
            if lat is not None:
                lw[k] = lat
            if wwriter is not None:
                wwriter[k] = " ".join(
                    words_tab[w] if words_tab else str(w) for w in res.words
                )
            n_done += 1
    if wwriter is not None:
        wwriter.close()
    log.info("decoded %d/%d utterances", n_done, len(keys))
    return 0


# ---------------------------------------------------------------------------
# chain tools
# ---------------------------------------------------------------------------

@tool("chain-est-phone-lm")
def chain_est_phone_lm_tool(argv: List[str]) -> int:
    """Un-smoothed phone n-gram from alignment phone sequences
    (reference chainbin/chain-est-phone-lm.cc; input = ali-to-phones
    output)."""
    from old_kaldi_git_tpu.chain.phone_lm import estimate_phone_lm
    from old_kaldi_git_tpu.utils.table import SequentialTableReader

    po = ParseOptions(
        "chain-est-phone-lm [options] <phone-seqs-rspecifier> <phone-lm-out>"
    )

    class Opts:
        ngram_order = 2

    o = Opts()
    po.register("ngram-order", o, "ngram_order")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    seqs = [list(map(int, v))
            for _k, v in SequentialTableReader(args[0], "ivec")]
    lm = estimate_phone_lm(seqs, o.ngram_order)
    with open(args[1], "wb") as f:
        lm.write(f)
    log.info("phone LM: %d states %d arcs from %d sequences",
             lm.num_states, lm.num_arcs, len(seqs))
    return 0


@tool("chain-make-den-fst")
def chain_make_den_fst_tool(argv: List[str]) -> int:
    """Phone LM ∘ chain topology → denominator graph tensors
    (reference chainbin/chain-make-den-fst.cc; also carries the
    normalization-FST weights — SURVEY.md §2.6 chain row)."""
    import pickle

    from old_kaldi_git_tpu.chain.den_graph import make_denominator_graph
    from old_kaldi_git_tpu.fst.vector_fst import VectorFst
    from old_kaldi_git_tpu.tree.context_dep import ContextDependency

    po = ParseOptions("chain-make-den-fst <tree-file> <phone-lm-fst> <den-out>")
    args = po.parse(argv)
    if len(args) != 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with open(args[0], "rb") as f:
        ctx_dep = ContextDependency.read(f)
    with open(args[1], "rb") as f:
        phone_lm = VectorFst.read(f)
    den = make_denominator_graph(phone_lm, ctx_dep)
    with open(args[2], "wb") as f:
        pickle.dump(den, f)
    log.info("den graph: %d states %d arcs %d pdfs",
             den.num_states, len(den.pdf), den.num_pdfs)
    return 0


@tool("nnet3-chain-init")
def nnet3_chain_init_tool(argv: List[str]) -> int:
    """Assemble an untrained chain model bundle: chain tree + den graph +
    xconfig nnet + chain transition model (the nnet3-am-init role for
    chain systems)."""
    import pickle

    from old_kaldi_git_tpu.chain.topology import chain_topology
    from old_kaldi_git_tpu.hmm.transition_model import TransitionModel
    from old_kaldi_git_tpu.models.am_nnet import AmNnet
    from old_kaldi_git_tpu.models.xconfig import parse_xconfig
    from old_kaldi_git_tpu.recipes.chain import ChainModel
    from old_kaldi_git_tpu.tree.context_dep import ContextDependency

    po = ParseOptions(
        "nnet3-chain-init [options] <tree-file> <den-file> <xconfig-file> "
        "<phones:colon-list> <chain-mdl-out>"
    )

    class Opts:
        frame_subsampling_factor = 3
        srand = 0

    o = Opts()
    po.register("frame-subsampling-factor", o, "frame_subsampling_factor")
    po.register("srand", o, "srand")
    args = po.parse(argv)
    if len(args) != 5:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with open(args[0], "rb") as f:
        ctx_dep = ContextDependency.read(f)
    with open(args[1], "rb") as f:
        den = pickle.load(f)
    with open(args[2]) as f:
        config = parse_xconfig(f.read())
    phones = [int(x) for x in args[3].split(":") if x]
    tm = TransitionModel(ctx_dep, chain_topology(phones))
    am = AmNnet.init(config, seed=o.srand)
    ChainModel(am, ctx_dep, tm, den, o.frame_subsampling_factor).save(args[4])
    return 0


@tool("nnet3-chain-get-egs")
def nnet3_chain_get_egs_tool(argv: List[str]) -> int:
    """Chain egs: supervision windows + normalization weights + xent labels
    per utterance (reference chainbin/nnet3-chain-get-egs.cc)."""
    import pickle

    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
    from old_kaldi_git_tpu.models.egs import get_chain_egs
    from old_kaldi_git_tpu.tree.context_dep import ContextDependency
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
        TableWriter,
    )

    po = ParseOptions(
        "nnet3-chain-get-egs [options] <gmm-model> <chain-tree> <den-file> "
        "<feats-rspecifier> <ali-rspecifier> <cegs-wspecifier>"
    )

    class Opts:
        frame_subsampling_factor = 3
        left_tolerance = 5
        right_tolerance = 5

    o = Opts()
    po.register("frame-subsampling-factor", o, "frame_subsampling_factor")
    po.register("left-tolerance", o, "left_tolerance")
    po.register("right-tolerance", o, "right_tolerance")
    args = po.parse(argv)
    if len(args) != 6:
        print(po.print_usage(), file=sys.stderr)
        return 1
    gmm = AmGmmModel.load(args[0])
    with open(args[1], "rb") as f:
        ctx_dep = ContextDependency.read(f)
    with open(args[2], "rb") as f:
        den = pickle.load(f)
    alis = RandomAccessTableReader(args[4], "ivec")
    n = n_err = 0
    with TableWriter(args[5], "cegs") as w:
        for key, feats in SequentialTableReader(args[3], "mat"):
            if key not in alis:
                continue
            try:
                for i, eg in enumerate(get_chain_egs(
                    np.asarray(feats, np.float32), alis[key], gmm.tm,
                    ctx_dep, den, o.frame_subsampling_factor,
                    o.left_tolerance, o.right_tolerance,
                )):
                    w[f"{key}-{i}"] = eg
                    n += 1
            except KaldiError as e:
                log.warning("supervision failed for %s: %s", key, e)
                n_err += 1
    log.info("wrote %d chain egs (%d failed)", n, n_err)
    return 0 if n else 1


@tool("nnet3-chain-train")
def nnet3_chain_train_tool(argv: List[str]) -> int:
    """LF-MMI training over a chain egs archive
    (reference chainbin/nnet3-chain-train.cc)."""
    _jnp()
    import jax

    from old_kaldi_git_tpu.chain.loss import ChainLossOptions
    from old_kaldi_git_tpu.models.am_nnet import AmNnet
    from old_kaldi_git_tpu.models.egs import batch_chain_egs, iter_merged
    from old_kaldi_git_tpu.models.tdnn import apply_orthonormal_constraints
    from old_kaldi_git_tpu.models.train import (
        NnetTrainOptions,
        TrainState,
        make_optimizer,
    )
    from old_kaldi_git_tpu.recipes.chain import ChainModel, make_chain_step
    from old_kaldi_git_tpu.utils.table import SequentialTableReader

    po = ParseOptions(
        "nnet3-chain-train [options] <chain-mdl-in> <cegs-rspecifier> "
        "<chain-mdl-out>"
    )

    class Opts:
        minibatch_size = 8
        num_epochs = 1
        initial_lr = 1e-3
        final_lr = 1e-4
        leaky_hmm_coefficient = 0.1
        l2_regularize = 5e-5
        xent_regularize = 0.1
        srand = 0

    o = Opts()
    for name, attr in (("minibatch-size", "minibatch_size"),
                       ("num-epochs", "num_epochs"),
                       ("initial-lr", "initial_lr"),
                       ("final-lr", "final_lr"),
                       ("leaky-hmm-coefficient", "leaky_hmm_coefficient"),
                       ("l2-regularize", "l2_regularize"),
                       ("xent-regularize", "xent_regularize"),
                       ("srand", "srand")):
        po.register(name, o, attr)
    args = po.parse(argv)
    if len(args) != 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    cm = ChainModel.load(args[0])
    egs = [eg for _k, eg in SequentialTableReader(args[1], "cegs")]
    if not egs:
        log.error("no chain egs")
        return 1
    egs.sort(key=lambda e: e.feats.shape[0])
    loss_opts = ChainLossOptions(
        leaky_hmm_coefficient=o.leaky_hmm_coefficient,
        l2_regularize=o.l2_regularize,
        xent_regularize=o.xent_regularize,
    )
    steps = max(1, len(egs) // o.minibatch_size) * o.num_epochs
    nopts = NnetTrainOptions(initial_lr=o.initial_lr, final_lr=o.final_lr)
    optimizer = make_optimizer(nopts, steps, lr_factors=cm.am.lr_factors)
    model = cm.am.model()
    params = cm.am.variables["params"]
    state = TrainState(params, cm.am.variables.get("batch_stats", {}),
                       optimizer.init(params), 0)
    step_fn = make_chain_step(model, cm.den, optimizer, loss_opts,
                              cm.frame_subsampling_factor)
    rng = np.random.default_rng(o.srand)
    for epoch in range(o.num_epochs):
        groups = list(iter_merged(egs, o.minibatch_size))
        rng.shuffle(groups)
        objs = []
        for group in groups:
            bf, pdf_seq, allowed, nf, sl, adv, xent = batch_chain_egs(group)
            state, _loss, metrics = step_fn(
                state, bf, pdf_seq, allowed, nf, sl, adv, xent
            )
            objs.append(float(metrics["objf"]))
            if state.step % 4 == 0:
                state = TrainState(
                    apply_orthonormal_constraints(state.params),
                    state.batch_stats, state.opt_state, state.step,
                )
        mean_obj = float(np.mean(objs)) if objs else float("nan")
        log.info("epoch %d: objf %.4f (%d steps)", epoch, mean_obj, len(objs))
        if objs and not np.isfinite(mean_obj):
            raise KaldiError(
                "chain model diverged (non-finite objective) — rerun with "
                "a lower learning rate"
            )
    out_am = AmNnet(
        cm.am.config,
        {"params": jax.tree.map(np.asarray, state.params),
         "batch_stats": jax.tree.map(np.asarray, state.batch_stats)},
        cm.am.log_priors,
        cm.am.lr_factors,
    )
    ChainModel(out_am, cm.ctx_dep, cm.tm, cm.den,
               cm.frame_subsampling_factor).save(args[2])
    return 0


@tool("nnet3-chain-compute-prob")
def nnet3_chain_compute_prob_tool(argv: List[str]) -> int:
    """Chain objective on a cegs archive without updating
    (reference chainbin/nnet3-chain-compute-prob.cc)."""
    _jnp()
    import jax.numpy as jnp

    from old_kaldi_git_tpu.chain.loss import ChainLossOptions, chain_loss
    from old_kaldi_git_tpu.models.egs import batch_chain_egs, iter_merged
    from old_kaldi_git_tpu.recipes.chain import ChainModel
    from old_kaldi_git_tpu.utils.table import SequentialTableReader

    po = ParseOptions(
        "nnet3-chain-compute-prob [options] <chain-mdl> <cegs-rspecifier>"
    )

    class Opts:
        leaky_hmm_coefficient = 0.1

    o = Opts()
    po.register("leaky-hmm-coefficient", o, "leaky_hmm_coefficient")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    cm = ChainModel.load(args[0])
    egs = [eg for _k, eg in SequentialTableReader(args[1], "cegs")]
    if not egs:
        log.error("no chain egs")
        return 1
    egs.sort(key=lambda e: e.feats.shape[0])
    fsf = cm.frame_subsampling_factor
    loss_opts = ChainLossOptions(leaky_hmm_coefficient=o.leaky_hmm_coefficient,
                                 l2_regularize=0.0, xent_regularize=0.0)
    tot_obj = tot_frames = 0.0
    for group in iter_merged(egs, 8):
        bf, pdf_seq, allowed, nf, sl, adv, _xent = batch_chain_egs(group)
        logits = cm.am.logits(
            jnp.asarray(bf), output_stride=fsf)[:, : allowed.shape[1]]
        _loss, metrics = chain_loss(
            logits, cm.den, jnp.asarray(pdf_seq), jnp.asarray(allowed),
            jnp.asarray(nf), jnp.asarray(sl), jnp.asarray(adv), loss_opts,
        )
        frames = float(np.sum(nf))
        tot_obj += float(metrics["objf"]) * frames
        tot_frames += frames
    print(f"chain objective per frame: {tot_obj / max(tot_frames, 1):.4f} "
          f"({int(tot_frames)} frames)")
    return 0


@tool("chain-build-tree")
def chain_build_tree_tool(argv: List[str]) -> int:
    """Build the chain tree (1-state topology): monophone or left-biphone
    from GMM alignment stats (reference steps/nnet3/chain/build_tree.sh
    --context-width=2 --central-position=1)."""
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
    from old_kaldi_git_tpu.tree.context_dep import monophone_context_dependency
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
    )

    po = ParseOptions(
        "chain-build-tree [options] <gmm-model> <feats-rspecifier> "
        "<ali-rspecifier> <tree-out>"
    )

    class Opts:
        context_width = 1
        max_leaves = 500
        thresh = 100.0

    o = Opts()
    po.register("context-width", o, "context_width")
    po.register("max-leaves", o, "max_leaves")
    po.register("thresh", o, "thresh")
    args = po.parse(argv)
    if len(args) != 4:
        print(po.print_usage(), file=sys.stderr)
        return 1
    gmm = AmGmmModel.load(args[0])
    phones = gmm.tm.topo.phones
    if o.context_width == 1:
        ctx_dep = monophone_context_dependency(phones, {p: 1 for p in phones})
    else:
        from old_kaldi_git_tpu.tree.build_tree import (
            accumulate_tree_stats,
            build_tree,
        )
        from old_kaldi_git_tpu.tree.event_map import KEY_PDF_CLASS, make_event

        alis = RandomAccessTableReader(args[2], "ivec")
        stats: dict = {}
        for k, feats in SequentialTableReader(args[1], "mat"):
            if k not in alis:
                continue
            accumulate_tree_stats(
                alis[k], np.asarray(feats, np.float32), gmm.tm, N=2, P=1,
                stats=stats,
            )
        pooled: dict = {}
        for event, st in stats.items():
            d = dict(event)
            d[KEY_PDF_CLASS] = 0
            ev = make_event(sorted(d.items()))
            if ev in pooled:
                pooled[ev].add(st)
            else:
                pooled[ev] = st.copy()
        ctx_dep = build_tree(
            pooled, phones, {p: 1 for p in phones}, N=2, P=1,
            max_leaves=o.max_leaves, thresh=o.thresh,
        )
    with open(args[3], "wb") as f:
        ctx_dep.write(f)
    log.info("chain tree: %d pdfs (context width %d)",
             ctx_dep.num_pdfs, o.context_width)
    return 0


@tool("nnet3-adjust-priors")
def nnet3_adjust_priors_tool(argv: List[str]) -> int:
    """Set priors to the average model posterior over an egs sample
    (reference nnet3bin/nnet3-adjust-priors.cc / ComputePriors; preferred
    over hard alignment counts, which give unvisited pdfs a spurious
    -log-prior decode boost)."""
    _jnp()
    from old_kaldi_git_tpu.models.am_nnet import AmNnet
    from old_kaldi_git_tpu.models.egs import batch_ce_egs
    from old_kaldi_git_tpu.utils.table import SequentialTableReader

    po = ParseOptions(
        "nnet3-adjust-priors [options] <raw-nnet-in> <egs-rspecifier> "
        "<raw-nnet-out>"
    )

    class Opts:
        max_egs = 512

    o = Opts()
    po.register("max-egs", o, "max_egs")
    args = po.parse(argv)
    if len(args) != 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    am = AmNnet.load(args[0])
    egs = []
    for _k, eg in SequentialTableReader(args[1], "egs"):
        egs.append(eg)
        if len(egs) >= o.max_egs:
            break
    if not egs:
        log.error("no egs")
        return 1
    bf, _bl, bm = batch_ce_egs(egs)
    nf = bm.sum(axis=1).astype(np.int32)
    am.set_priors_from_posteriors(bf, nf)
    am.save(args[2])
    return 0


@tool("online2-wav-nnet3-latgen-faster")
def online2_wav_nnet3_latgen_tool(argv: List[str]) -> int:
    """Simulated-real-time streaming decode with an nnet3 AM
    (reference online2bin/online2-wav-nnet3-latgen-faster.cc): chunked
    audio → streaming features → chunked AM evaluation with receptive-field
    context → carried-beam decoding with endpointing; prints RTF."""
    import time as _time

    from old_kaldi_git_tpu.decoder.csr import fst_to_csr
    from old_kaldi_git_tpu.decoder.viterbi import ViterbiOptions
    from old_kaldi_git_tpu.feat.compute import MfccOptions
    from old_kaldi_git_tpu.fst.symbols import SymbolTable
    from old_kaldi_git_tpu.fst.vector_fst import VectorFst
    from old_kaldi_git_tpu.models.am_nnet import AmNnetModel
    from old_kaldi_git_tpu.online.streaming import (
        OnlineFeaturePipeline,
        StreamingDecoder,
    )
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    jnp = _jnp()
    po = ParseOptions(
        "online2-wav-nnet3-latgen-faster [options] <am-nnet-model> "
        "<hclg-fst> <wav-rspecifier> <words-wspecifier>"
    )

    class Opts:
        beam = 16.0
        max_active = 7000
        acoustic_scale = 1.0
        chunk_seconds = 0.5
        word_symbol_table = ""
        samp_freq = 16000.0
        silence_phone_id = 1

    o = Opts()
    for name, attr in (("beam", "beam"), ("max-active", "max_active"),
                       ("acoustic-scale", "acoustic_scale"),
                       ("chunk-seconds", "chunk_seconds"),
                       ("word-symbol-table", "word_symbol_table"),
                       ("samp-freq", "samp_freq"),
                       ("silence-phone-id", "silence_phone_id")):
        po.register(name, o, attr)
    args = po.parse(argv)
    if len(args) != 4:
        print(po.print_usage(), file=sys.stderr)
        return 1
    bundle = AmNnetModel.load(args[0])
    with open(args[1], "rb") as f:
        hclg = VectorFst.read(f)
    csr = fst_to_csr(hclg, bundle.tm.tid_to_pdf_array())
    words_tab = (
        SymbolTable.read(o.word_symbol_table) if o.word_symbol_table else None
    )
    mfcc_opts = MfccOptions()
    mfcc_opts.frame_opts.samp_freq = o.samp_freq
    mfcc_opts.frame_opts.dither = 0.0

    # looped evaluation: the AM runs as a streaming stack with carried
    # recurrent state / per-layer context buffers (models/streaming_am.py),
    # so the decoder consumes finalized loglike frames directly
    from old_kaldi_git_tpu.models.streaming_am import StreamingAmNnet

    vopts = ViterbiOptions(beam=o.beam, max_active=o.max_active,
                           acoustic_scale=o.acoustic_scale)
    chunk = int(o.chunk_seconds * o.samp_freq)
    tot_audio = tot_wall = 0.0
    identity = lambda x: x  # noqa: E731 — loglikes pass through
    with TableWriter(args[3], "text") as w:
        for key, wave in SequentialTableReader(args[2], "wav"):
            pipe = OnlineFeaturePipeline(mfcc_opts)
            sam = StreamingAmNnet(bundle.am)
            dec = StreamingDecoder(
                csr, identity, silence_phones=[o.silence_phone_id],
                tid_to_phone=bundle.tm.tid_to_phone_array(), opts=vopts,
            )
            samples = wave.data[0]
            t0 = _time.perf_counter()
            for lo in range(0, len(samples), chunk):
                feats = pipe.accept_waveform(samples[lo: lo + chunk])
                dec.advance(sam.accept(feats))
                if dec.endpoint_detected():
                    log.info("%s: endpoint detected", key)
                    break
            else:
                dec.advance(sam.accept(pipe.input_finished(), final=True),
                            final=True)
            wall = _time.perf_counter() - t0
            hyp = dec.best_words()
            text = " ".join(
                words_tab[x] if words_tab else str(x) for x in hyp
            )
            w[key] = text
            dur = len(samples) / o.samp_freq
            tot_audio += dur
            tot_wall += wall
            print(f"{key} ({dur:.2f}s, RTF {wall / max(dur, 1e-9):.3f}): {text}")
    if tot_audio:
        print(f"overall RTF {tot_wall / tot_audio:.3f} "
              f"({tot_audio:.1f}s audio in {tot_wall:.1f}s)")
    return 0


# ---------------------------------------------------------------------------
# egs merging + chain egs aliases + model combination
# ---------------------------------------------------------------------------

def _merge_egs_impl(argv: List[str], chain: bool) -> int:
    """Shared body of nnet3-merge-egs / nnet3-chain-merge-egs: the
    ExampleMerger's shape-matching role (reference nnet-example-utils.cc).
    Actual stacking into [B, T, ...] arrays happens inside the training
    step (one jitted program per shape), so merging here = sorting the
    stream into same-shape runs of --minibatch-size so downstream batches
    pad minimally and compile once per shape."""
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    name = "nnet3-chain-merge-egs" if chain else "nnet3-merge-egs"
    po = ParseOptions(f"{name} [options] <egs-rspecifier> <egs-wspecifier>")

    class Opts:
        minibatch_size = 128 if not chain else 8

    o = Opts()
    po.register("minibatch-size", o, "minibatch_size")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    holder = "cegs" if chain else "egs"
    pairs = list(SequentialTableReader(args[0], holder))
    pairs.sort(key=lambda kv: kv[1].feats.shape[0])
    n_shapes = len({eg.feats.shape[0] for _k, eg in pairs})
    with TableWriter(args[1], holder) as w:
        for key, eg in pairs:
            w[key] = eg
    log.info("%s: %d egs in %d shape groups (minibatch %d)",
             name, len(pairs), n_shapes, o.minibatch_size)
    return 0 if pairs else 1


@tool("nnet3-merge-egs")
def nnet3_merge_egs_tool(argv: List[str]) -> int:
    """Group egs into same-shape minibatch runs
    (reference nnet3bin/nnet3-merge-egs.cc; see _merge_egs_impl)."""
    return _merge_egs_impl(argv, chain=False)


@tool("nnet3-chain-merge-egs")
def nnet3_chain_merge_egs_tool(argv: List[str]) -> int:
    """Chain variant of nnet3-merge-egs
    (reference chainbin/nnet3-chain-merge-egs.cc)."""
    return _merge_egs_impl(argv, chain=True)


@tool("nnet3-chain-copy-egs")
def nnet3_chain_copy_egs_tool(argv: List[str]) -> int:
    """Round-robin split/copy of chain egs
    (reference chainbin/nnet3-chain-copy-egs.cc)."""
    return nnet3_copy_egs_tool(["--chain=true"] + argv)


@tool("nnet3-chain-shuffle-egs")
def nnet3_chain_shuffle_egs_tool(argv: List[str]) -> int:
    """Randomize chain-eg order
    (reference chainbin/nnet3-chain-shuffle-egs.cc)."""
    return nnet3_shuffle_egs_tool(["--chain=true"] + argv)


@tool("nnet3-combine")
def nnet3_combine_tool(argv: List[str]) -> int:
    """Combination of the last N iteration models with weights optimized on
    held-out egs (reference nnet3bin/nnet3-combine.cc; library:
    models/train.py combine_models)."""
    _jnp()
    from old_kaldi_git_tpu.models.am_nnet import AmNnet
    from old_kaldi_git_tpu.models.train import combine_models
    from old_kaldi_git_tpu.utils.table import SequentialTableReader

    po = ParseOptions(
        "nnet3-combine [options] <nnet-in-1> [<nnet-in-2> ...] "
        "<valid-egs-rspecifier> <nnet-out>"
    )

    class Opts:
        num_steps = 60
        max_egs = 128

    o = Opts()
    po.register("num-steps", o, "num_steps")
    po.register("max-egs", o, "max_egs")
    args = po.parse(argv)
    if len(args) < 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    ams = [AmNnet.load(p) for p in args[:-2]]
    egs = [eg for _k, eg in SequentialTableReader(args[-2], "egs")]
    if not egs:
        log.error("no valid egs")
        return 1
    egs = sorted(egs, key=lambda e: e.feats.shape[0])[: o.max_egs]
    # combine_models takes utterance dicts — egs are just short utterances
    feats = {f"eg{i}": e.feats for i, e in enumerate(egs)}
    labels = {f"eg{i}": e.labels for i, e in enumerate(egs)}
    out = combine_models(ams, feats, labels, num_steps=o.num_steps)
    out.save(args[-1])
    return 0


@tool("nnet3-chain-combine")
def nnet3_chain_combine_tool(argv: List[str]) -> int:
    """Chain-model combination optimized on the LF-MMI objective of
    held-out cegs (reference chainbin/nnet3-chain-combine.cc; library:
    recipes/chain.py combine_chain_models)."""
    _jnp()
    from old_kaldi_git_tpu.recipes.chain import ChainModel, combine_chain_models
    from old_kaldi_git_tpu.utils.table import SequentialTableReader

    po = ParseOptions(
        "nnet3-chain-combine [options] <chain-mdl-1> [<chain-mdl-2> ...] "
        "<valid-cegs-rspecifier> <chain-mdl-out>"
    )

    class Opts:
        num_steps = 40
        max_egs = 32

    o = Opts()
    po.register("num-steps", o, "num_steps")
    po.register("max-egs", o, "max_egs")
    args = po.parse(argv)
    if len(args) < 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    cms = [ChainModel.load(p) for p in args[:-2]]
    egs = [eg for _k, eg in SequentialTableReader(args[-2], "cegs")]
    if not egs:
        log.error("no valid cegs")
        return 1
    out = combine_chain_models(cms, egs, num_steps=o.num_steps,
                               max_egs=o.max_egs)
    out.save(args[-1])
    return 0


@tool("online2-tcp-nnet3-decode-faster")
def online2_tcp_nnet3_decode_tool(argv: List[str]) -> int:
    """TCP streaming decode server
    (reference online2bin/online2-tcp-nnet3-decode-faster.cc): clients
    stream raw S16LE PCM; the server answers with partial hypotheses
    (lines ending '\\r') and, on endpoint or stream end, the final
    utterance text (ending '\\n'), then resets for the next utterance on
    the same connection.  --num-connections bounds how many connections
    are served (0 = forever); --port-file records the bound port (for
    --port-num=0 ephemeral ports, used by tests/orchestration)."""
    import socket

    from old_kaldi_git_tpu.decoder.csr import fst_to_csr
    from old_kaldi_git_tpu.decoder.viterbi import ViterbiOptions
    from old_kaldi_git_tpu.feat.compute import MfccOptions
    from old_kaldi_git_tpu.fst.symbols import SymbolTable
    from old_kaldi_git_tpu.fst.vector_fst import VectorFst
    from old_kaldi_git_tpu.models.am_nnet import AmNnetModel
    from old_kaldi_git_tpu.models.streaming_am import StreamingAmNnet
    from old_kaldi_git_tpu.online.streaming import (
        OnlineFeaturePipeline,
        StreamingDecoder,
    )

    _jnp()
    po = ParseOptions(
        "online2-tcp-nnet3-decode-faster [options] <am-nnet-model> "
        "<hclg-fst>"
    )

    class Opts:
        port_num = 5050
        port_file = ""
        num_connections = 0
        beam = 16.0
        max_active = 7000
        acoustic_scale = 1.0
        chunk_length_secs = 0.18
        samp_freq = 16000.0
        silence_phone_id = 1
        word_symbol_table = ""
        read_timeout = 10.0

    o = Opts()
    for name, attr in (
        ("port-num", "port_num"), ("port-file", "port_file"),
        ("num-connections", "num_connections"), ("beam", "beam"),
        ("max-active", "max_active"), ("acoustic-scale", "acoustic_scale"),
        ("chunk-length-secs", "chunk_length_secs"),
        ("samp-freq", "samp_freq"),
        ("silence-phone-id", "silence_phone_id"),
        ("word-symbol-table", "word_symbol_table"),
        ("read-timeout", "read_timeout"),
    ):
        po.register(name, o, attr)
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    bundle = AmNnetModel.load(args[0])
    with open(args[1], "rb") as f:
        hclg = VectorFst.read(f)
    csr = fst_to_csr(hclg, bundle.tm.tid_to_pdf_array())
    words_tab = (SymbolTable.read(o.word_symbol_table)
                 if o.word_symbol_table else None)
    mfcc_opts = MfccOptions()
    mfcc_opts.frame_opts.samp_freq = o.samp_freq
    mfcc_opts.frame_opts.dither = 0.0
    vopts = ViterbiOptions(beam=o.beam, max_active=o.max_active,
                           acoustic_scale=o.acoustic_scale)
    tid_to_phone = bundle.tm.tid_to_phone_array()
    identity = lambda x: x  # noqa: E731

    def text_of(word_ids) -> str:
        return " ".join(
            words_tab[x] if words_tab else str(x) for x in word_ids)

    chunk_bytes = max(2, 2 * int(o.chunk_length_secs * o.samp_freq))
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("", o.port_num))
    srv.listen(1)
    port = srv.getsockname()[1]
    log.info("TCP server listening on port %d", port)
    if o.port_file:
        with open(o.port_file, "w") as f:
            f.write(str(port))
    served = 0
    try:
        while o.num_connections == 0 or served < o.num_connections:
            conn, addr = srv.accept()
            served += 1
            log.info("connection from %s", addr)
            conn.settimeout(o.read_timeout)

            def fresh():
                return (
                    OnlineFeaturePipeline(mfcc_opts),
                    StreamingAmNnet(bundle.am),
                    StreamingDecoder(
                        csr, identity,
                        silence_phones=[o.silence_phone_id],
                        tid_to_phone=tid_to_phone, opts=vopts),
                )

            pipe, sam, dec = fresh()
            buf = b""
            saw_audio = False
            try:
                while True:
                    try:
                        data = conn.recv(65536)
                    except socket.timeout:
                        log.warning("read timeout, closing connection")
                        break
                    if not data:
                        break
                    buf += data
                    while len(buf) >= chunk_bytes:
                        raw, buf = buf[:chunk_bytes], buf[chunk_bytes:]
                        samples = np.frombuffer(
                            raw, "<i2").astype(np.float32)
                        dec.advance(sam.accept(pipe.accept_waveform(samples)))
                        saw_audio = True
                        conn.sendall(
                            (text_of(dec.best_words()) + "\r").encode())
                        if dec.endpoint_detected():
                            final = text_of(dec.best_words())
                            conn.sendall((final + "\n").encode())
                            log.info("endpoint: %s", final)
                            pipe, sam, dec = fresh()
                            saw_audio = False
                # stream end: flush remaining samples + finalize
                if buf:
                    samples = np.frombuffer(
                        buf[: 2 * (len(buf) // 2)], "<i2").astype(np.float32)
                    dec.advance(sam.accept(pipe.accept_waveform(samples)))
                    saw_audio = True
                if saw_audio:
                    dec.advance(sam.accept(pipe.input_finished(), final=True),
                                final=True)
                    final = text_of(dec.best_words())
                    conn.sendall((final + "\n").encode())
                    log.info("final: %s", final)
            except (BrokenPipeError, ConnectionResetError):
                log.warning("client disconnected")
            finally:
                conn.close()
    finally:
        srv.close()
    return 0


@tool("nnet3-discriminative-train")
def nnet3_discriminative_train_tool(argv: List[str]) -> int:
    """Lattice-based sequence training (MMI / sMBR / MPFE) of an am-nnet
    (reference nnet3bin/nnet3-discriminative-train.cc; the degs bundle is
    read here as separate feats/ali/lattice tables)."""
    _jnp()
    from old_kaldi_git_tpu.models.am_nnet import AmNnetModel
    from old_kaldi_git_tpu.models.discriminative import (
        DiscriminativeOptions,
        train_discriminative,
    )
    from old_kaldi_git_tpu.utils.table import SequentialTableReader

    po = ParseOptions(
        "nnet3-discriminative-train [options] <am-nnet-in> "
        "<feats-rspecifier> <num-ali-rspecifier> <den-lat-rspecifier> "
        "<am-nnet-out>"
    )

    class Opts:
        criterion = "smbr"
        acoustic_scale = 0.1
        num_epochs = 1
        minibatch_size = 8
        learning_rate = 2e-4
        silence_phones = ""

    o = Opts()
    po.register("criterion", o, "criterion")
    po.register("acoustic-scale", o, "acoustic_scale")
    po.register("num-epochs", o, "num_epochs")
    po.register("minibatch-size", o, "minibatch_size")
    po.register("learning-rate", o, "learning_rate")
    po.register("silence-phones", o, "silence_phones")
    args = po.parse(argv)
    if len(args) != 5:
        print(po.print_usage(), file=sys.stderr)
        return 1
    bundle = AmNnetModel.load(args[0])
    feats = {k: np.asarray(v, np.float32)
             for k, v in SequentialTableReader(args[1], "mat")}
    alis = dict(SequentialTableReader(args[2], "ivec"))
    lats = dict(SequentialTableReader(args[3], "lat"))
    sil = tuple(int(p) for p in o.silence_phones.split(":") if p)
    am2 = train_discriminative(
        bundle.am, feats, alis, lats, bundle.tm,
        DiscriminativeOptions(
            criterion=o.criterion, acoustic_scale=o.acoustic_scale,
            num_epochs=o.num_epochs, minibatch_size=o.minibatch_size,
            learning_rate=o.learning_rate, silence_phones=sil))
    AmNnetModel(am2, bundle.tm).save(args[4])
    return 0


@tool("nnet3-discriminative-compute-objf")
def nnet3_discriminative_compute_objf_tool(argv: List[str]) -> int:
    """Average sequence objective over a dataset (reference
    nnet3bin/nnet3-discriminative-compute-objf.cc)."""
    _jnp()
    from old_kaldi_git_tpu.models.am_nnet import AmNnetModel
    from old_kaldi_git_tpu.models.discriminative import (
        DiscriminativeOptions,
        compute_discriminative_objf,
    )
    from old_kaldi_git_tpu.utils.table import SequentialTableReader

    po = ParseOptions(
        "nnet3-discriminative-compute-objf [options] <am-nnet> "
        "<feats-rspecifier> <num-ali-rspecifier> <den-lat-rspecifier>"
    )

    class Opts:
        criterion = "smbr"
        acoustic_scale = 0.1

    o = Opts()
    po.register("criterion", o, "criterion")
    po.register("acoustic-scale", o, "acoustic_scale")
    args = po.parse(argv)
    if len(args) != 4:
        print(po.print_usage(), file=sys.stderr)
        return 1
    bundle = AmNnetModel.load(args[0])
    feats = {k: np.asarray(v, np.float32)
             for k, v in SequentialTableReader(args[1], "mat")}
    alis = dict(SequentialTableReader(args[2], "ivec"))
    lats = dict(SequentialTableReader(args[3], "lat"))
    objf = compute_discriminative_objf(
        bundle.am, feats, alis, lats, bundle.tm,
        DiscriminativeOptions(criterion=o.criterion,
                              acoustic_scale=o.acoustic_scale))
    print(f"{o.criterion} objf per frame: {objf:.6f}")
    return 0
