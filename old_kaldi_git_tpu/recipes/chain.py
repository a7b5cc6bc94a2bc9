"""Chain (LF-MMI) training recipe — BASELINE config 4 shape.

Parity with reference steps/nnet3/chain/train.py + local/chain/run_tdnn.sh
(SURVEY.md §3.4): GMM alignments → chain topology + tree → phone LM → den
graph → supervision chunks → LF-MMI training of a TDNN-F → decode with a
chain graph (self-loop-scale 1.0, acoustic scale 1.0, frame subsampling 3).

The per-iteration job fan-out + nnet3-average of the reference collapses
into one jitted data-parallel step (SURVEY.md §2.8 P3).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from old_kaldi_git_tpu.chain.den_graph import DenominatorGraph, make_denominator_graph
from old_kaldi_git_tpu.chain.loss import ChainLossOptions, chain_loss
from old_kaldi_git_tpu.chain.phone_lm import estimate_phone_lm
from old_kaldi_git_tpu.chain.supervision import (
    alignment_to_supervision,
    pad_supervisions,
)
from old_kaldi_git_tpu.chain.topology import chain_topology
from old_kaldi_git_tpu.decoder.csr import CsrGraph, fst_to_csr
from old_kaldi_git_tpu.decoder.graph import mkgraph
from old_kaldi_git_tpu.decoder.viterbi import ViterbiOptions, decode_batch
from old_kaldi_git_tpu.fst.lang import Lang
from old_kaldi_git_tpu.fst.vector_fst import VectorFst
from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
from old_kaldi_git_tpu.hmm.hmm_utils import alignment_to_phones, alignment_to_pdfs
from old_kaldi_git_tpu.hmm.transition_model import TransitionModel
from old_kaldi_git_tpu.models.am_nnet import AmNnet
from old_kaldi_git_tpu.models.tdnn import make_tdnnf
from old_kaldi_git_tpu.models.train import (
    NnetTrainOptions,
    TrainState,
    _check_divergence,
    make_optimizer,
)
from old_kaldi_git_tpu.models.tdnn import apply_orthonormal_constraints
from old_kaldi_git_tpu.tree.context_dep import (
    ContextDependency,
    monophone_context_dependency,
)
from old_kaldi_git_tpu.utils.log import get_logger
from old_kaldi_git_tpu.utils.parse_options import options_dataclass

log = get_logger("chain")


@options_dataclass
class ChainTrainOptions:
    num_epochs: int = 10
    minibatch_size: int = 8
    frame_subsampling_factor: int = 3
    left_tolerance: int = 5
    right_tolerance: int = 5
    phone_lm_order: int = 2
    hidden_dim: int = 256
    bottleneck_dim: int = 64
    num_layers: int = 5
    initial_lr: float = 1e-3
    final_lr: float = 1e-4
    optimizer: str = "adam"  # adam | sgd | ng-sgd | ng-sgd-act
    leaky_hmm_coefficient: float = 0.1
    l2_regularize: float = 5e-5
    xent_regularize: float = 0.1
    # backstitch (nnet3-chain-train --backstitch-training-scale/-interval)
    backstitch_scale: float = 0.0
    backstitch_interval: int = 1
    # halved-LR divergence retries per epoch (train/common.py behavior)
    max_lr_retries: int = 2
    seed: int = 0
    # 1 = per-phone pdfs; 2 = left-biphone tree built from alignment stats
    # (the chain recipes' build_tree.sh --context-width=2 --central-position=1)
    tree_context_width: int = 1
    tree_max_leaves: int = 500
    tree_thresh: float = 100.0
    # tdnnf layers past this index use time_stride=frame_subsampling_factor
    # (the reference tdnn_1d chain stride pattern), letting the trunk run
    # at the subsampled rate in decode/training; 0 = all layers stride 1
    # (pre-r5 architecture, full-rate trunk)
    num_full_rate_layers: int = 3


@dataclasses.dataclass
class ChainModel:
    am: AmNnet
    ctx_dep: ContextDependency
    tm: TransitionModel
    den: DenominatorGraph
    frame_subsampling_factor: int

    def save(self, path: str) -> None:
        import pickle

        with open(path, "wb") as f:
            pickle.dump(
                {
                    "am": {"config": self.am.config,
                           "variables": jax.tree.map(np.asarray,
                                                     self.am.variables),
                           "log_priors": self.am.log_priors,
                           "ivector_dim": self.am.ivector_dim},
                    "ctx_dep": self.ctx_dep,
                    "tm": self.tm,
                    "den": self.den,
                    "fsf": self.frame_subsampling_factor,
                    "lrf": self.am.lr_factors,
                },
                f,
            )

    @staticmethod
    def load(path: str) -> "ChainModel":
        import pickle

        with open(path, "rb") as f:
            d = pickle.load(f)
        am = AmNnet(d["am"]["config"], d["am"]["variables"],
                    d["am"]["log_priors"], d.get("lrf"),
                    d["am"].get("ivector_dim", 0))
        return ChainModel(am, d["ctx_dep"], d["tm"], d["den"], d["fsf"])


def make_chain_step(model, den, optimizer, loss_opts: ChainLossOptions,
                    fsf: int, ng_activation: bool = False,
                    backstitch_scale: float = 0.0,
                    backstitch_interval: int = 1):
    """Jitted LF-MMI(+xent) train step over batched supervision arrays —
    shared by train_chain and the nnet3-chain-train CLI tool.  With
    ng_activation=True the model runs NG-instrumented and the per-layer
    activation/derivative Fisher factors feed the "ng-sgd-act" optimizer
    (same seam as models/train.py make_ce_train_step).  backstitch_scale
    and the trailing lr_scale step argument follow make_ce_train_step
    (nnet-training.cc backstitch; halved-LR divergence retry hook)."""

    def loss_fn(params, batch_stats, bf, b_pdf, b_allowed, b_nf, b_sl,
                b_adv, b_xent, dropout_rng, pert=None):
        variables = {"params": params, "batch_stats": batch_stats}
        mutable = ["batch_stats"]
        if pert is not None:
            variables["perturbations"] = pert
            mutable = ["batch_stats", "ng_in"]
        logits_sub, mutated = model.apply(
            variables, bf, train=True,
            dropout_rng=dropout_rng, mutable=mutable,
            output_stride=fsf,
            **({"ng_collect": True} if pert is not None else {}),
        )
        logits = logits_sub[:, : b_allowed.shape[1]]
        loss, metrics = chain_loss(
            logits, den, b_pdf, b_allowed, b_nf, b_sl, b_adv, loss_opts
        )
        if loss_opts.xent_regularize > 0:
            logp = jax.nn.log_softmax(logits, axis=-1)
            ll = jnp.take_along_axis(logp, b_xent[..., None], axis=-1)[..., 0]
            mask = jnp.arange(logits.shape[1])[None, :] < b_nf[:, None]
            xent = -(ll * mask).sum() / jnp.maximum(mask.sum(), 1.0)
            loss = loss + loss_opts.xent_regularize * xent
            metrics = {**metrics, "xent": xent}
        aux = (mutated["batch_stats"], metrics,
               mutated.get("ng_in") if pert is not None else None)
        return loss, aux

    grad_all = jax.value_and_grad(loss_fn, has_aux=True)

    def one_update(params, opt_state, batch_stats, args, rng, scale):
        (loss, (new_bs, metrics, _)), grads = grad_all(
            params, batch_stats, *args, rng)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * scale, updates)
        return (optax.apply_updates(params, updates), new_opt, new_bs,
                loss, metrics)

    @jax.jit
    def step_fn_jit(state, bf, b_pdf, b_allowed, b_nf, b_sl, b_adv, b_xent,
                    lr_scale):
        rng = jax.random.fold_in(jax.random.PRNGKey(0), state.step)
        args = (bf, b_pdf, b_allowed, b_nf, b_sl, b_adv, b_xent)

        def plain(state):
            p, o, bs, loss, metrics = one_update(
                state.params, state.opt_state, state.batch_stats, args,
                rng, lr_scale)
            return TrainState(p, bs, o, state.step + 1), loss, metrics

        if backstitch_scale <= 0:
            return plain(state)

        def backstitch(state):
            a = backstitch_scale
            p1, o1, _b1, loss, metrics = one_update(
                state.params, state.opt_state, state.batch_stats, args,
                rng, -a * lr_scale)
            p2, o2, b2, _l, _m = one_update(
                p1, o1, state.batch_stats, args, rng, (1.0 + a) * lr_scale)
            return TrainState(p2, b2, o2, state.step + 1), loss, metrics

        return jax.lax.cond(
            state.step % backstitch_interval == 0, backstitch, plain, state)

    def step_fn(state, bf, b_pdf, b_allowed, b_nf, b_sl, b_adv, b_xent,
                lr_scale=1.0):
        return step_fn_jit(state, bf, b_pdf, b_allowed, b_nf, b_sl, b_adv,
                           b_xent, jnp.float32(lr_scale))

    if not ng_activation:
        return step_fn

    from old_kaldi_git_tpu.models.natural_gradient import (
        activation_fisher_stats,
    )

    @jax.jit
    def ng_step_fn(state, pert, bf, b_pdf, b_allowed, b_nf, b_sl, b_adv,
                   b_xent, lr_scale):
        rng = jax.random.fold_in(jax.random.PRNGKey(0), state.step)

        def wrapped(params, pert):
            return loss_fn(params, state.batch_stats, bf, b_pdf, b_allowed,
                           b_nf, b_sl, b_adv, b_xent, rng, pert=pert)

        (loss, (new_bs, metrics, ng_in)), (g_params, g_pert) = (
            jax.value_and_grad(wrapped, argnums=(0, 1), has_aux=True)(
                state.params, pert))
        stats = activation_fisher_stats(ng_in, g_pert)
        updates, new_opt = optimizer.update(
            g_params, state.opt_state, state.params, ng_stats=stats)
        updates = jax.tree.map(lambda u: u * lr_scale, updates)
        new_params = optax.apply_updates(state.params, updates)
        return (TrainState(new_params, new_bs, new_opt, state.step + 1),
                loss, metrics)

    pert_cache = {}

    def step_with_perturbations(state, bf, b_pdf, b_allowed, b_nf, b_sl,
                                b_adv, b_xent, lr_scale=1.0):
        key = bf.shape[:2]
        if key not in pert_cache:
            shapes = jax.eval_shape(
                lambda r, x: model.init(
                    r, x, train=True, dropout_rng=jax.random.PRNGKey(0),
                    ng_collect=True, output_stride=fsf),
                jax.random.PRNGKey(0), jnp.zeros(bf.shape, jnp.float32))
            pert_cache[key] = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype),
                shapes["perturbations"])
        return ng_step_fn(state, pert_cache[key], bf, b_pdf, b_allowed,
                          b_nf, b_sl, b_adv, b_xent, jnp.float32(lr_scale))

    return step_with_perturbations


def combine_chain_models(
    cms, egs, num_steps: int = 40, lr: float = 0.3, max_egs: int = 32,
    loss_opts: Optional[ChainLossOptions] = None,
):
    """Optimized chain-model combination (reference chainbin/
    nnet3-chain-combine.cc): one softmax-parameterized weight per model,
    optimized on the LF-MMI objective of held-out chain egs.  Mirrors
    models/train.py combine_models but with the chain objective; the
    stacked-parameter contraction keeps the whole search on the MXU."""
    from old_kaldi_git_tpu.models.egs import batch_chain_egs

    if len(cms) == 1:
        return cms[0]
    base = cms[0]
    opts = loss_opts or ChainLossOptions(xent_regularize=0.0)
    model = base.am.model()
    fsf = base.frame_subsampling_factor
    stacked = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
        *[cm.am.variables["params"] for cm in cms],
    )
    stacked_bs = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
        *[cm.am.variables.get("batch_stats", {}) for cm in cms],
    )
    bf, pdf_seq, allowed, nf, sl, adv, _x = batch_chain_egs(
        sorted(egs, key=lambda e: e.feats.shape[0])[:max_egs])
    bf, pdf_seq, allowed = jnp.asarray(bf), jnp.asarray(pdf_seq), jnp.asarray(allowed)
    nf, sl, adv = jnp.asarray(nf), jnp.asarray(sl), jnp.asarray(adv)

    def objf(logw):
        w = jax.nn.softmax(logw)
        params = jax.tree.map(lambda s: jnp.tensordot(w, s, axes=1), stacked)
        bs = jax.tree.map(lambda s: jnp.tensordot(w, s, axes=1), stacked_bs)
        logits = model.apply(
            {"params": params, "batch_stats": bs}, bf, train=False,
            output_stride=fsf)
        logits = logits[:, : allowed.shape[1]]
        loss, _m = chain_loss(
            logits, base.den, pdf_seq, allowed, nf, sl, adv, opts)
        return loss

    opt = optax.adam(lr)

    @jax.jit
    def run(logw0):
        def body(carry, _):
            logw, opt_state = carry
            loss, g = jax.value_and_grad(objf)(logw)
            updates, opt_state = opt.update(g, opt_state, logw)
            return (optax.apply_updates(logw, updates), opt_state), loss

        (logw, _), losses = jax.lax.scan(
            body, (logw0, opt.init(logw0)), None, length=num_steps)
        return logw, losses

    logw, losses = run(jnp.zeros(len(cms), jnp.float32))
    w = np.asarray(jax.nn.softmax(logw))
    log.info(
        "combine_chain_models: %d models, loss %.4f → %.4f, weights %s",
        len(cms), float(losses[0]), float(losses[-1]), np.round(w, 3),
    )
    params = jax.tree.map(
        lambda s: np.asarray(jnp.tensordot(jnp.asarray(w), s, axes=1)),
        stacked)
    bs = jax.tree.map(
        lambda s: np.asarray(jnp.tensordot(jnp.asarray(w), s, axes=1)),
        stacked_bs)
    am = AmNnet(base.am.config, {"params": params, "batch_stats": bs},
                base.am.log_priors, base.am.lr_factors)
    return ChainModel(am, base.ctx_dep, base.tm, base.den, fsf)


def build_chain_objects(
    gmm_model: AmGmmModel,
    alignments: Dict[str, np.ndarray],
    lang: Lang,
    opts: ChainTrainOptions,
    feats: Optional[Dict[str, np.ndarray]] = None,
) -> Tuple[ContextDependency, TransitionModel, DenominatorGraph]:
    """Chain topo/tree, phone LM, denominator graph.

    tree_context_width=2 (+feats) builds a left-biphone tree from the GMM
    alignment stats with all pdf-classes pooled to the chain topology's
    single class (reference steps/nnet3/chain/build_tree.sh)."""
    phones = lang.real_phone_ids
    topo = chain_topology(phones)
    if opts.tree_context_width == 2 and feats is not None:
        from old_kaldi_git_tpu.tree.build_tree import (
            accumulate_tree_stats,
            build_tree,
        )
        from old_kaldi_git_tpu.tree.event_map import KEY_PDF_CLASS, make_event

        stats: dict = {}
        for k, ali in alignments.items():
            if ali is None or k not in feats:
                continue
            accumulate_tree_stats(
                ali, feats[k], gmm_model.tm, N=2, P=1, stats=stats
            )
        # pool the GMM topology's pdf-classes into the chain topo's single
        # class (the reference converts alignments to the chain topology;
        # pooling the per-state stats is equivalent for tree purposes)
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
            max_leaves=opts.tree_max_leaves, thresh=opts.tree_thresh,
        )
        log.info("chain biphone tree: %d pdfs", ctx_dep.num_pdfs)
    else:
        ctx_dep = monophone_context_dependency(phones, {p: 1 for p in phones})
    tm = TransitionModel(ctx_dep, topo)
    phone_seqs = [
        alignment_to_phones(gmm_model.tm, ali)
        for ali in alignments.values()
        if ali is not None
    ]
    phone_lm = estimate_phone_lm(phone_seqs, opts.phone_lm_order)
    den = make_denominator_graph(phone_lm, ctx_dep)
    return ctx_dep, tm, den


def train_chain(
    gmm_model: AmGmmModel,
    feats: Dict[str, np.ndarray],
    alignments: Dict[str, np.ndarray],
    lang: Lang,
    opts: Optional[ChainTrainOptions] = None,
    ivectors: Optional[Dict[str, np.ndarray]] = None,
) -> ChainModel:
    """ivectors: per-utterance online [T, R] (or [R]) i-vectors appended to
    every frame's features (reference chain recipes'
    --online-ivector-dir); ChainModel.am.ivector_dim records the width so
    decode_chain can demand matching inputs."""
    opts = opts or ChainTrainOptions()
    # the tree is built from the BASE features (reference
    # steps/nnet3/chain/build_tree.sh uses the GMM-stage features without
    # iVectors) — append iVectors only afterwards, for the nnet inputs
    ctx_dep, tm, den = build_chain_objects(
        gmm_model, alignments, lang, opts, feats=feats
    )
    ivector_dim = 0
    if ivectors is not None:
        from old_kaldi_git_tpu.recipes.nnet3 import append_ivector_feats

        feats = append_ivector_feats(feats, ivectors)
        ivector_dim = int(np.asarray(
            next(iter(ivectors.values()))).shape[-1])
    keys = sorted(k for k, a in alignments.items() if a is not None and k in feats)
    sups = []
    sup_keys = []
    for k in keys:
        try:
            sups.append(
                alignment_to_supervision(
                    alignments[k], gmm_model.tm, ctx_dep,
                    opts.frame_subsampling_factor,
                    opts.left_tolerance, opts.right_tolerance,
                    den=den,
                )
            )
            sup_keys.append(k)
        except Exception as e:  # skip pathological utterances
            log.warning("supervision failed for %s: %s", k, e)
    pdf_seq, allowed, sup_frames, seq_len, advance_lp = pad_supervisions(sups)

    input_dim = next(iter(feats.values())).shape[1]
    config = make_tdnnf(
        input_dim, ctx_dep.num_pdfs, opts.hidden_dim, opts.bottleneck_dim,
        opts.num_layers,
        subsampled_stride=(opts.frame_subsampling_factor
                           if opts.num_full_rate_layers else 0),
        num_full_rate_layers=opts.num_full_rate_layers,
    )
    am = AmNnet.init(config, seed=opts.seed)
    model = am.model()
    log.info(
        "train_chain: %d utts, %d chain pdfs, den %d states/%d arcs",
        len(sup_keys), ctx_dep.num_pdfs, den.num_states, len(den.pdf),
    )

    # features padded at the FULL rate; logits subsampled inside the step
    fsf = opts.frame_subsampling_factor
    Tfull = max(feats[k].shape[0] for k in sup_keys)
    Tfull = ((Tfull + fsf - 1) // fsf) * fsf
    D = input_dim
    feats_padded = np.zeros((len(sup_keys), Tfull, D), np.float32)
    # xent targets: hard pdf labels at the subsampled rate
    Tsub = allowed.shape[1]
    xent_labels = np.zeros((len(sup_keys), Tsub), np.int32)
    from old_kaldi_git_tpu.chain.supervision import chain_xent_labels

    for i, k in enumerate(sup_keys):
        t = feats[k].shape[0]
        feats_padded[i, :t] = feats[k]
        # chain pdf per frame from the GMM alignment phones
        xent_labels[i] = chain_xent_labels(
            alignments[k], gmm_model.tm, ctx_dep, fsf, Tsub
        )

    loss_opts = ChainLossOptions(
        leaky_hmm_coefficient=opts.leaky_hmm_coefficient,
        l2_regularize=opts.l2_regularize,
        xent_regularize=opts.xent_regularize,
    )
    num_steps = opts.num_epochs * max(1, len(sup_keys) // opts.minibatch_size)
    nnet_opts = NnetTrainOptions(initial_lr=opts.initial_lr,
                                 final_lr=opts.final_lr,
                                 optimizer=opts.optimizer)
    optimizer = make_optimizer(nnet_opts, num_steps)
    params = am.variables["params"]
    state = TrainState(params, am.variables.get("batch_stats", {}),
                       optimizer.init(params), 0)

    step_fn = make_chain_step(
        model, den, optimizer, loss_opts, fsf,
        ng_activation=(nnet_opts.optimizer == "ng-sgd-act"),
        backstitch_scale=opts.backstitch_scale,
        backstitch_interval=opts.backstitch_interval)

    rng = np.random.default_rng(opts.seed)
    order = np.arange(len(sup_keys))
    B = opts.minibatch_size
    epoch, retries, lr_scale, prev_loss = 0, 0, 1.0, None
    while epoch < opts.num_epochs:
        snapshot = state
        rng.shuffle(order)
        objs, xents = [], []
        # full batches; if the dataset is smaller than one minibatch, train
        # on the whole dataset (a dead `or [0]` fallback here used to be
        # skipped by the len guard, silently doing ZERO steps)
        batches = [order[i: i + B] for i in range(0, len(order) - B + 1, B)]
        if not batches:
            batches = [order]
        for idx in batches:
            state, loss, metrics = step_fn(
                state, feats_padded[idx], pdf_seq[idx], allowed[idx],
                sup_frames[idx], seq_len[idx], advance_lp[idx],
                xent_labels[idx], lr_scale,
            )
            objs.append(float(metrics["objf"]))
            xents.append(float(metrics.get("xent", 0.0)))
            if state.step % 4 == 0:
                state = TrainState(
                    apply_orthonormal_constraints(state.params),
                    state.batch_stats, state.opt_state, state.step,
                )
        # the chain objective is maximized: divergence check runs on -objf
        mean_loss = -float(np.mean(objs)) if objs else float("nan")
        e, objf_snapshot, xent_mean = epoch, -mean_loss, (
            float(np.mean(xents)) if xents else 0.0)
        state, prev_loss, epoch, retries, lr_scale = _check_divergence(
            state, snapshot, mean_loss, prev_loss, epoch, retries, lr_scale,
            opts.max_lr_retries,
            lambda: log.info(
                "chain epoch %d: objf %.4f xent %.4f (%d steps)",
                e, objf_snapshot, xent_mean, len(objs)),
        )

    out_am = AmNnet(
        config,
        {"params": jax.tree.map(np.asarray, state.params),
         "batch_stats": jax.tree.map(np.asarray, state.batch_stats)},
        None,  # chain models use raw logits, no priors
        ivector_dim=ivector_dim,
    )
    return ChainModel(out_am, ctx_dep, tm, den, fsf)


def make_chain_decode_graph(
    chain: ChainModel, lang: Lang, g: VectorFst
) -> CsrGraph:
    """Chain decode graph: self-loop-scale 1.0 (reference mkgraph for chain)."""
    hclg = mkgraph(lang, g, chain.ctx_dep, chain.tm, self_loop_scale=1.0)
    return fst_to_csr(hclg, chain.tm.tid_to_pdf_array())


def decode_chain(
    chain: ChainModel,
    graph: CsrGraph,
    lang: Lang,
    feats: Dict[str, np.ndarray],
    beam: float = 16.0,
    max_active: int = 7000,
    acoustic_scale: float = 1.0,
    ivectors: Optional[Dict[str, np.ndarray]] = None,
) -> Dict[str, List[str]]:
    if chain.am.ivector_dim and ivectors is None:
        raise ValueError(
            f"chain model expects {chain.am.ivector_dim}-dim i-vectors; "
            "pass ivectors= (reference --online-ivector-dir convention)")
    if ivectors is not None:
        from old_kaldi_git_tpu.recipes.nnet3 import append_ivector_feats

        feats = append_ivector_feats(feats, ivectors)
    keys = sorted(feats)
    fsf = chain.frame_subsampling_factor
    T = max(feats[k].shape[0] for k in keys)
    T = ((T + fsf - 1) // fsf) * fsf
    D = feats[keys[0]].shape[1]
    padded = np.zeros((len(keys), T, D), np.float32)
    nf = np.zeros(len(keys), np.int32)
    for i, k in enumerate(keys):
        padded[i, : feats[k].shape[0]] = feats[k]
        nf[i] = (feats[k].shape[0] + fsf - 1) // fsf
    logits = chain.am.logits(jnp.asarray(padded),
                             output_stride=fsf)  # device-resident
    results = decode_batch(
        graph, logits, nf,
        ViterbiOptions(beam=beam, max_active=max_active, acoustic_scale=acoustic_scale),
    )
    return {
        k: ([lang.words[w] for w in res.words] if res else [])
        for k, res in zip(keys, results)
    }


def train_chain_e2e(
    feats: Dict[str, np.ndarray],
    transcripts: Dict[str, Sequence[str]],
    lang: Lang,
    opts: Optional[ChainTrainOptions] = None,
) -> ChainModel:
    """Flat-start LF-MMI (reference steps/nnet3/chain/e2e/ +
    chain-generic-numerator): no GMM system, no alignments — the numerator
    of every utterance is its full training graph (monophone chain tree;
    the reference's e2e biphone init is a no-cluster variant, see
    build_chain_objects for the aligned biphone path).  Phone LM comes
    from lexicon-phonemized transcripts."""
    from old_kaldi_git_tpu.chain.e2e import (
        NumeratorGraphBatch,
        chain_e2e_loss,
        normalize_numerator_csr,
    )
    from old_kaldi_git_tpu.decoder.csr import fst_to_csr
    from old_kaldi_git_tpu.decoder.graph import GraphCompiler

    opts = opts or ChainTrainOptions()
    phones = lang.real_phone_ids
    topo = chain_topology(phones)
    if opts.tree_context_width == 2:
        # full unclustered left-biphone (reference gmm-init-biphone):
        # no alignments exist to build a data-driven tree from
        from old_kaldi_git_tpu.tree.context_dep import (
            biphone_context_dependency,
        )

        ctx_dep = biphone_context_dependency(phones, {p: 1 for p in phones})
    else:
        ctx_dep = monophone_context_dependency(
            phones, {p: 1 for p in phones})
    tm = TransitionModel(ctx_dep, topo)

    # phone LM from lexicon-phonemized transcripts (first pronunciation).
    # CRITICAL: include silence-augmented variants — the training graphs
    # allow optional silence, and if the den LM never saw silence the den
    # graph has NO silence-emitting state at all, making long-silence
    # numerator paths an unbounded objective exploit (measured: the model
    # parks on silence pdfs and objf diverges to +55/frame).  The
    # reference's e2e recipe likewise feeds silence-bearing phone
    # transcripts to its phone LM.
    first_pron = {}
    for word, _prob, pron in lang.lexicon.entries:
        first_pron.setdefault(word, [lang.phones[p] for p in pron])
    sil = lang.silence_id
    keys = sorted(k for k in transcripts if k in feats)
    phone_seqs = []
    for k in keys:
        seq, seq_sil = [], [sil]
        for w in transcripts[k]:
            seq.extend(first_pron[w])
            seq_sil.extend(first_pron[w])
            seq_sil.append(sil)
        phone_seqs.append(seq)
        phone_seqs.append(seq_sil)
    phone_lm = estimate_phone_lm(phone_seqs, opts.phone_lm_order)
    den = make_denominator_graph(phone_lm, ctx_dep)

    # per-utterance numerator graphs (tid level → pdf level CSR)
    compiler = GraphCompiler(lang, ctx_dep, tm)
    tid2pdf = tm.tid_to_pdf_array()
    graphs = [
        normalize_numerator_csr(
            compiler.compile_csr_from_text(transcripts[k]),
            tm, den)
        for k in keys
    ]
    gbatch = NumeratorGraphBatch.from_csr_graphs(graphs)
    log.info(
        "train_chain_e2e: %d utts, %d pdfs, num graphs ≤%d states/%d arcs, "
        "den %d states",
        len(keys), ctx_dep.num_pdfs, gbatch.num_states,
        gbatch.src.shape[1], den.num_states,
    )

    input_dim = next(iter(feats.values())).shape[1]
    config = make_tdnnf(
        input_dim, ctx_dep.num_pdfs, opts.hidden_dim, opts.bottleneck_dim,
        opts.num_layers,
        subsampled_stride=(opts.frame_subsampling_factor
                           if opts.num_full_rate_layers else 0),
        num_full_rate_layers=opts.num_full_rate_layers,
    )
    am = AmNnet.init(config, seed=opts.seed)
    model = am.model()

    fsf = opts.frame_subsampling_factor
    Tfull = max(feats[k].shape[0] for k in keys)
    Tfull = ((Tfull + fsf - 1) // fsf) * fsf
    feats_padded = np.zeros((len(keys), Tfull, input_dim), np.float32)
    nf_sub = np.zeros(len(keys), np.int32)
    for i, k in enumerate(keys):
        t = feats[k].shape[0]
        feats_padded[i, :t] = feats[k]
        nf_sub[i] = (t + fsf - 1) // fsf
    loss_opts = ChainLossOptions(
        leaky_hmm_coefficient=opts.leaky_hmm_coefficient,
        l2_regularize=opts.l2_regularize,
        xent_regularize=0.0,  # no alignment targets in flat-start
    )
    num_steps = opts.num_epochs * max(1, len(keys) // opts.minibatch_size)
    nnet_opts = NnetTrainOptions(initial_lr=opts.initial_lr,
                                 final_lr=opts.final_lr)
    optimizer = make_optimizer(nnet_opts, num_steps)
    params = am.variables["params"]
    state = TrainState(params, am.variables.get("batch_stats", {}),
                       optimizer.init(params), 0)

    def loss_fn(params, batch_stats, bf, b_nf, bg, dropout_rng):
        logits_sub, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, bf, train=True,
            dropout_rng=dropout_rng, mutable=["batch_stats"],
            output_stride=fsf,
        )
        logits = logits_sub
        loss, metrics = chain_e2e_loss(logits, den, bg, b_nf, loss_opts)
        return loss, (mutated["batch_stats"], metrics)

    @jax.jit
    def step_fn_jit(state, bf, b_nf, b_src, b_dst, b_pdf, b_w, b_m, b_init,
                    b_final, lr_scale):
        from old_kaldi_git_tpu.chain.e2e import NumeratorGraphBatch as NGB

        bg = NGB(b_src, b_dst, b_pdf, b_w, b_m, b_init, b_final)
        rng = jax.random.fold_in(jax.random.PRNGKey(0), state.step)
        (loss, (new_bs, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, bf, b_nf, bg, rng)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        updates = jax.tree.map(lambda u: u * lr_scale, updates)
        new_params = optax.apply_updates(state.params, updates)
        return (TrainState(new_params, new_bs, new_opt, state.step + 1),
                loss, metrics)

    def step_fn(state, *args, lr_scale=1.0):
        return step_fn_jit(state, *args, jnp.float32(lr_scale))

    rng = np.random.default_rng(opts.seed)
    order = np.arange(len(keys))
    B = opts.minibatch_size
    epoch, retries, lr_scale, prev_loss = 0, 0, 1.0, None
    while epoch < opts.num_epochs:
        snapshot = state
        rng.shuffle(order)
        objs = []
        batches = [order[i: i + B] for i in range(0, len(order) - B + 1, B)]
        if not batches:  # dataset smaller than one minibatch
            batches = [order]
        for idx in batches:
            state, loss, metrics = step_fn(
                state, feats_padded[idx], nf_sub[idx], gbatch.src[idx],
                gbatch.dst[idx], gbatch.pdf[idx], gbatch.weight[idx],
                gbatch.mask[idx], gbatch.init_lp[idx], gbatch.final_lp[idx],
                lr_scale=lr_scale,
            )
            objs.append(float(metrics["objf"]))
            if state.step % 4 == 0:
                state = TrainState(
                    apply_orthonormal_constraints(state.params),
                    state.batch_stats, state.opt_state, state.step,
                )
        mean_loss = -float(np.mean(objs)) if objs else float("nan")
        e, objf_log, nsteps = epoch, -mean_loss, len(objs)
        state, prev_loss, epoch, retries, lr_scale = _check_divergence(
            state, snapshot, mean_loss, prev_loss, epoch, retries, lr_scale,
            opts.max_lr_retries,
            lambda: log.info("chain-e2e epoch %d: objf %.4f (%d steps)",
                             e, objf_log, nsteps),
        )
    out_am = AmNnet(
        config,
        {"params": jax.tree.map(np.asarray, state.params),
         "batch_stats": jax.tree.map(np.asarray, state.batch_stats)},
        None,
    )
    return ChainModel(out_am, ctx_dep, tm, den, fsf)
