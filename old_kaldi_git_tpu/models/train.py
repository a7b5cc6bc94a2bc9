"""Cross-entropy training for neural acoustic models.

Parity with reference src/nnet3/nnet-training.{h,cc} (NnetTrainer):
objective = per-frame CE against aligned pdf-ids, max-change clipping
(per-component and global), momentum, l2 regularization, periodic
semi-orthogonal re-constraint for TDNN-F factors, objective logging
(ObjectiveFunctionInfo).

TPU re-design (SURVEY.md §2.8 P3): the reference's parallel-SGD +
model-averaging over N jobs becomes synchronous data parallelism — ONE
jitted step over a batch sharded on the mesh "data" axis; XLA inserts the
gradient psum.  Natural-gradient preconditioning is approximated by Adam by
default (both whiten per-parameter updates); plain momentum-SGD is available
for recipe fidelity.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from old_kaldi_git_tpu.models.am_nnet import AmNnet
from old_kaldi_git_tpu.models.tdnn import TdnnModel, apply_orthonormal_constraints
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger
from old_kaldi_git_tpu.utils.parse_options import options_dataclass

log = get_logger("nnet-train")


def _check_divergence(state, snapshot, mean_loss, prev_loss, epoch, retries,
                      lr_scale, max_retries, on_accept):
    """Divergence recovery shared by the CE and chain epoch loops
    (reference steps/libs/nnet3/train/common.py halved-LR re-run +
    nnet3-train's fatal non-finite check).

    Returns (state, prev_loss, epoch, retries, lr_scale): on divergence
    (non-finite objective, or >10% relative + 0.1 absolute worse than the
    previous epoch) rewinds to `snapshot`, halves the LR scale and retries
    the same epoch up to `max_retries` times; on acceptance calls
    `on_accept`, advances the epoch and restores full LR."""
    diverged = (not np.isfinite(mean_loss)) or (
        prev_loss is not None
        and mean_loss > prev_loss + 0.1 * abs(prev_loss) + 0.1
    )
    if diverged and retries < max_retries:
        log.warning(
            "epoch %d diverged (objf %.4f, previous %s); rewinding and "
            "retrying with LR scale %.3f",
            epoch, mean_loss, prev_loss, lr_scale * 0.5,
        )
        return snapshot, prev_loss, epoch, retries + 1, lr_scale * 0.5
    if not np.isfinite(mean_loss):
        raise KaldiError(
            f"non-finite objective {mean_loss} after {max_retries} "
            "halved-LR retries; aborting (nnet3-train KALDI_ERR behavior)"
        )
    on_accept()
    return state, mean_loss, epoch + 1, 0, 1.0


@options_dataclass
class NnetTrainOptions:
    num_epochs: int = 6
    minibatch_size: int = 16
    chunk_width: int = 140
    initial_lr: float = 1e-3
    final_lr: float = 1e-4
    max_param_change: float = 2.0  # global l2 of the update per step
    max_change_per_component: float = 0.75
    momentum: float = 0.0
    l2_regularize: float = 0.0
    optimizer: str = "adam"  # adam | sgd
    orthonormal_interval: int = 4  # steps between tdnnf re-constraints
    # backstitch (nnet-training.cc backstitch-training-scale/-interval):
    # every `interval` steps, first step AGAINST the update scaled by
    # -alpha, recompute the gradient there, then step by (1 + alpha)
    backstitch_scale: float = 0.0
    backstitch_interval: int = 1
    # divergence recovery (steps/libs/nnet3/train/common.py): if an epoch's
    # objective diverges (non-finite, or worse than the previous epoch by
    # >10% relative + 0.1 absolute), rewind it and retry with halved LR,
    # up to this many times; a non-finite objective after the retries
    # aborts like nnet3-train's KALDI_ERR
    max_lr_retries: int = 2
    seed: int = 0


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["params", "batch_stats", "opt_state", "step"],
    meta_fields=[],
)
@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: int


def scale_by_max_change(global_max: float, per_component_max: float):
    """optax transform applying Kaldi-style max-change clipping to the final
    update (after learning rate)."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        # per-component: top-level modules of the params dict
        def clip_tree(tree):
            leaves = jax.tree.leaves(tree)
            norm = jnp.sqrt(sum(jnp.sum(jnp.square(l)) for l in leaves) + 1e-20)
            scale = jnp.minimum(1.0, per_component_max / norm)
            return jax.tree.map(lambda l: l * scale, tree)

        if isinstance(updates, dict):
            updates = {k: clip_tree(v) for k, v in updates.items()}
        leaves = jax.tree.leaves(updates)
        gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(l)) for l in leaves) + 1e-20)
        gscale = jnp.minimum(1.0, global_max / gnorm)
        updates = jax.tree.map(lambda l: l * gscale, updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def scale_by_name_factors(factors):
    """optax transform scaling updates of top-level param collections whose
    name glob-matches an entry of `factors` (reference per-component
    learning-rate-factor, nnet-utils.cc ReadEditConfig /
    UpdatableComponent::learning_rate_factor_; set via nnet3-copy --edits).
    Matching is resolved at trace time (names are static), so the jitted
    update just carries the constant scales."""
    import fnmatch

    def factor_for(name: str) -> float:
        f = 1.0
        for pat, v in factors.items():
            if fnmatch.fnmatch(name, pat):
                f = float(v)
        return f

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        if isinstance(updates, dict):
            updates = {
                k: jax.tree.map(lambda l, _f=factor_for(k): l * _f, v)
                for k, v in updates.items()
            }
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(opts: NnetTrainOptions, num_steps: int, lr_factors=None):
    lr = optax.linear_schedule(opts.initial_lr, opts.final_lr, max(num_steps, 1))
    if opts.optimizer == "adam":
        core = optax.scale_by_adam()
    elif opts.optimizer == "sgd":
        core = (
            optax.trace(decay=opts.momentum)
            if opts.momentum > 0
            else optax.identity()
        )
    elif opts.optimizer == "ng-sgd":
        # reference NnetTrainer default: NG preconditioning + momentum
        from old_kaldi_git_tpu.models.natural_gradient import (
            scale_by_natural_gradient,
        )

        core = optax.chain(
            scale_by_natural_gradient(),
            optax.trace(decay=opts.momentum) if opts.momentum > 0
            else optax.identity(),
        )
    elif opts.optimizer == "ng-sgd-act":
        # reference-faithful factors from activations/output-derivs
        # (natural-gradient-online.cc); needs the instrumented model path
        # (make_ce_train_step ng_activation=True threads `ng_stats` in)
        from old_kaldi_git_tpu.models.natural_gradient import (
            scale_by_natural_gradient_activations,
        )

        core = optax.chain(
            scale_by_natural_gradient_activations(),
            optax.trace(decay=opts.momentum) if opts.momentum > 0
            else optax.identity(),
        )
    else:
        raise ValueError(f"unknown optimizer {opts.optimizer}")
    return optax.chain(
        optax.add_decayed_weights(opts.l2_regularize),
        core,
        optax.scale_by_learning_rate(lr),
        scale_by_name_factors(lr_factors) if lr_factors else optax.identity(),
        scale_by_max_change(opts.max_param_change, opts.max_change_per_component),
    )


def make_ce_train_step(
    model: TdnnModel, optimizer, ng_activation: bool = False,
    backstitch_scale: float = 0.0, backstitch_interval: int = 1,
) -> Callable:
    """Jitted CE step: (state, feats [B,T,D], labels [B,T], mask [B,T]
    [, lr_scale]) → (state, metrics).  Under a data-sharded batch XLA
    reduces grads with a psum over the mesh automatically.

    lr_scale multiplies the final update — the divergence-recovery hook
    (halved-LR retry, reference steps/libs/nnet3/train/common.py).

    backstitch_scale > 0 enables backstitch training (nnet-training.cc):
    on applicable steps the update is applied at scale -alpha, the
    gradient is recomputed at that point, and a (1 + alpha)-scaled update
    follows — a cheap bias correction for SGD noise.

    With ng_activation=True the model runs instrumented (ng_collect): the
    per-layer input rows and output-derivative rows (gradient wrt zero
    flax perturbations) become Fisher factors threaded into the optimizer
    as the `ng_stats` extra arg — the reference NG-SGD estimator."""

    def loss_fn(params, batch_stats, feats, labels, mask, dropout_rng):
        logits, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            feats,
            train=True,
            dropout_rng=dropout_rng,
            mutable=["batch_stats"],
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        denom = jnp.maximum(mask.sum(), 1.0)
        loss = -(ll * mask).sum() / denom
        acc = ((jnp.argmax(logits, -1) == labels) * mask).sum() / denom
        return loss, (mutated["batch_stats"], acc)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def one_update(params, opt_state, batch_stats, feats, labels, mask,
                   rng, scale):
        (loss, (new_bs, acc)), grads = grad_fn(
            params, batch_stats, feats, labels, mask, rng)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * scale, updates)
        return optax.apply_updates(params, updates), new_opt, new_bs, loss, acc

    @jax.jit
    def step(state: TrainState, feats, labels, mask, lr_scale):
        # per-step dropout key (deterministic in step index, like the
        # reference's srand+iteration convention)
        rng = jax.random.fold_in(jax.random.PRNGKey(0), state.step)

        def plain(state):
            p, o, bs, loss, acc = one_update(
                state.params, state.opt_state, state.batch_stats,
                feats, labels, mask, rng, lr_scale)
            return TrainState(p, bs, o, state.step + 1), loss, acc

        if backstitch_scale <= 0:
            new_state, loss, acc = plain(state)
            return new_state, {"loss": loss, "acc": acc}

        def backstitch(state):
            a = backstitch_scale
            p1, o1, _bs1, loss, acc = one_update(
                state.params, state.opt_state, state.batch_stats,
                feats, labels, mask, rng, -a * lr_scale)
            p2, o2, bs2, _l2, _a2 = one_update(
                p1, o1, state.batch_stats, feats, labels, mask, rng,
                (1.0 + a) * lr_scale)
            return TrainState(p2, bs2, o2, state.step + 1), loss, acc

        new_state, loss, acc = jax.lax.cond(
            state.step % backstitch_interval == 0, backstitch, plain, state)
        return new_state, {"loss": loss, "acc": acc}

    def step_wrapper(state, feats, labels, mask, lr_scale=1.0):
        return step(state, feats, labels, mask, jnp.float32(lr_scale))

    if not ng_activation:
        return step_wrapper

    from old_kaldi_git_tpu.models.natural_gradient import (
        activation_fisher_stats,
    )

    def ng_loss_fn(params, pert, batch_stats, feats, labels, mask,
                   dropout_rng):
        logits, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats,
             "perturbations": pert},
            feats,
            train=True,
            dropout_rng=dropout_rng,
            ng_collect=True,
            mutable=["batch_stats", "ng_in"],
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        denom = jnp.maximum(mask.sum(), 1.0)
        loss = -(ll * mask).sum() / denom
        acc = ((jnp.argmax(logits, -1) == labels) * mask).sum() / denom
        return loss, (mutated["batch_stats"], acc, mutated["ng_in"])

    @jax.jit
    def ng_step(state: TrainState, pert, feats, labels, mask, lr_scale):
        rng = jax.random.fold_in(jax.random.PRNGKey(0), state.step)
        (loss, (new_bs, acc, ng_in)), (g_params, g_pert) = (
            jax.value_and_grad(ng_loss_fn, argnums=(0, 1), has_aux=True)(
                state.params, pert, state.batch_stats, feats, labels, mask,
                rng
            )
        )
        stats = activation_fisher_stats(ng_in, g_pert)
        updates, new_opt = optimizer.update(
            g_params, state.opt_state, state.params, ng_stats=stats)
        updates = jax.tree.map(lambda u: u * lr_scale, updates)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_bs, new_opt, state.step + 1),
            {"loss": loss, "acc": acc},
        )

    pert_cache: Dict[Tuple[int, int], Any] = {}

    def step_with_perturbations(state: TrainState, feats, labels, mask,
                                lr_scale=1.0):
        key = feats.shape[:2]
        if key not in pert_cache:
            shapes = jax.eval_shape(
                lambda r, x: model.init(
                    r, x, train=True, dropout_rng=jax.random.PRNGKey(0),
                    ng_collect=True),
                jax.random.PRNGKey(0), jnp.zeros(feats.shape, jnp.float32))
            pert_cache[key] = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype),
                shapes["perturbations"])
        return ng_step(state, pert_cache[key], feats, labels, mask,
                       jnp.float32(lr_scale))

    return step_with_perturbations


def _chunk_batches(
    feats: Dict[str, np.ndarray],
    labels: Dict[str, np.ndarray],
    chunk: int,
    batch: int,
    rng: np.random.Generator,
):
    """Cut utterances into fixed chunks (the egs model: reference
    nnet3-get-egs + ExampleMerger minibatching by matched shapes)."""
    keys = sorted(feats)
    pieces = []
    for k in keys:
        f, l = feats[k], labels[k]
        t = min(len(l), f.shape[0])
        for s in range(0, t, chunk):
            e = min(s + chunk, t)
            if e - s < chunk // 2 and s > 0:
                # merge short tail into previous chunk window
                s = max(0, e - chunk)
            pieces.append((k, s, e))
    rng.shuffle(pieces)
    D = next(iter(feats.values())).shape[1]
    for i in range(0, len(pieces), batch):
        group = pieces[i : i + batch]
        B = len(group)
        bf = np.zeros((B, chunk, D), np.float32)
        bl = np.zeros((B, chunk), np.int32)
        bm = np.zeros((B, chunk), np.float32)
        for j, (k, s, e) in enumerate(group):
            n = e - s
            bf[j, :n] = feats[k][s:e]
            bl[j, :n] = labels[k][s:e]
            bm[j, :n] = 1.0
        yield bf, bl, bm


def train_ce(
    am: AmNnet,
    feats: Dict[str, np.ndarray],
    pdf_labels: Dict[str, np.ndarray],
    opts: Optional[NnetTrainOptions] = None,
    valid_frac: float = 0.1,
) -> AmNnet:
    """Train the AmNnet with cross-entropy on aligned pdf labels."""
    opts = opts or NnetTrainOptions()
    rng = np.random.default_rng(opts.seed)
    model = am.model()
    num_chunks = sum(
        max(1, feats[k].shape[0] // opts.chunk_width) for k in feats
    )
    steps_per_epoch = max(1, num_chunks // opts.minibatch_size)
    optimizer = make_optimizer(opts, steps_per_epoch * opts.num_epochs)
    params = am.variables["params"]
    batch_stats = am.variables.get("batch_stats", {})
    state = TrainState(params, batch_stats, optimizer.init(params), 0)
    step_fn = make_ce_train_step(
        model, optimizer, ng_activation=(opts.optimizer == "ng-sgd-act"),
        backstitch_scale=opts.backstitch_scale,
        backstitch_interval=opts.backstitch_interval)

    epoch = 0
    retries = 0
    lr_scale = 1.0
    prev_loss = None
    while epoch < opts.num_epochs:
        snapshot = state
        losses, accs = [], []
        for bf, bl, bm in _chunk_batches(
            feats, pdf_labels, opts.chunk_width, opts.minibatch_size, rng
        ):
            state, metrics = step_fn(state, bf, bl, bm, lr_scale)
            losses.append(float(metrics["loss"]))
            accs.append(float(metrics["acc"]))
            if (
                opts.orthonormal_interval
                and state.step % opts.orthonormal_interval == 0
            ):
                state = TrainState(
                    apply_orthonormal_constraints(state.params),
                    state.batch_stats,
                    state.opt_state,
                    state.step,
                )
        mean_loss = float(np.mean(losses))
        state, prev_loss, epoch, retries, lr_scale = _check_divergence(
            state, snapshot, mean_loss, prev_loss, epoch, retries, lr_scale,
            opts.max_lr_retries,
            lambda: log.info(
                "epoch %d: CE %.4f acc %.3f (%d steps)",
                epoch, mean_loss, float(np.mean(accs)), len(losses)),
        )

    new_vars = {
        "params": jax.tree.map(np.asarray, state.params),
        "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
    }
    out = AmNnet(am.config, new_vars, am.log_priors)
    # priors from averaged model posteriors over (a sample of) the training
    # data — reference nnet3-adjust-priors; hard alignment counts leave
    # aligner-skipped pdfs with ~zero prior and a spurious decode boost
    from old_kaldi_git_tpu.utils.batching import pad_feature_batch

    _, sample, nf = pad_feature_batch(feats, keys=sorted(feats)[:64])
    out.set_priors_from_posteriors(sample, nf)
    return out


def average_models(ams: Sequence[AmNnet], weights: Optional[Sequence[float]] = None) -> AmNnet:
    """Parameter-average models with identical configs.

    ~ nnet3-average (the reference's P3 data parallelism combines per-job
    models this way each iteration; our synchronous pmean makes it
    unnecessary for training, but averaging checkpoints is still the
    standard final-model combination, cf. nnet3-combine)."""
    if not ams:
        raise ValueError("average_models: no models")
    if weights is None:
        weights = [1.0 / len(ams)] * len(ams)
    if len(weights) != len(ams):
        raise ValueError(
            f"average_models: {len(weights)} weights for {len(ams)} models"
        )
    total = float(sum(weights))

    def avg(*leaves):
        out = np.zeros_like(np.asarray(leaves[0], np.float64))
        for w, leaf in zip(weights, leaves):
            out += (w / total) * np.asarray(leaf, np.float64)
        return out.astype(np.asarray(leaves[0]).dtype)

    variables = jax.tree.map(avg, *[am.variables for am in ams])
    log_priors = None
    if ams[0].log_priors is not None:
        prior = np.zeros_like(np.exp(ams[0].log_priors), dtype=np.float64)
        for w_i, am in zip(weights, ams):
            prior += (w_i / total) * np.exp(am.log_priors)
        log_priors = np.log(prior).astype(np.float32)
    return AmNnet(ams[0].config, variables, log_priors)


def combine_models(
    ams: Sequence[AmNnet],
    feats: Dict[str, np.ndarray],
    pdf_labels: Dict[str, np.ndarray],
    num_steps: int = 60,
    lr: float = 0.3,
    max_utts: int = 64,
) -> AmNnet:
    """Optimized model combination (reference nnet3-combine /
    src/nnet3/nnet-combine.cc): find convex-ish combination weights over the
    last-iteration models that maximize the CE objective on the given
    (held-out) examples.

    The reference optimizes per-component weights with L-BFGS on the CPU;
    here ONE weight per model, softmax-parameterized and optimized with Adam
    — the whole search is a single jitted loop over a stacked parameter
    tree, so it runs on the MXU (stack-axis contraction = matmul)."""
    if len(ams) == 1:
        return ams[0]
    from old_kaldi_git_tpu.utils.batching import pad_feature_batch

    model = ams[0].model()
    stacked = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
        *[am.variables["params"] for am in ams],
    )
    stacked_bs = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
        *[am.variables.get("batch_stats", {}) for am in ams],
    )
    keys = [k for k in sorted(feats) if k in pdf_labels][:max_utts]
    keys, x, nf = pad_feature_batch(feats, keys=keys)
    T = x.shape[1]
    y = np.zeros((len(keys), T), np.int32)
    m = np.zeros((len(keys), T), np.float32)
    for i, k in enumerate(keys):
        t = min(int(nf[i]), len(pdf_labels[k]))
        y[i, :t] = pdf_labels[k][:t]
        m[i, :t] = 1.0
    x, y, m = jnp.asarray(x), jnp.asarray(y), jnp.asarray(m)

    def objf(logw):
        w = jax.nn.softmax(logw)
        params = jax.tree.map(lambda s: jnp.tensordot(w, s, axes=1), stacked)
        bs = jax.tree.map(lambda s: jnp.tensordot(w, s, axes=1), stacked_bs)
        logits = model.apply(
            {"params": params, "batch_stats": bs}, x, train=False
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, y[..., None], axis=-1)[..., 0]
        return -(ll * m).sum() / jnp.maximum(m.sum(), 1.0)

    opt = optax.adam(lr)

    @jax.jit
    def run(logw0):
        def body(carry, _):
            logw, opt_state = carry
            loss, g = jax.value_and_grad(objf)(logw)
            updates, opt_state = opt.update(g, opt_state, logw)
            return (optax.apply_updates(logw, updates), opt_state), loss

        (logw, _), losses = jax.lax.scan(
            body, (logw0, opt.init(logw0)), None, length=num_steps
        )
        return logw, losses

    logw0 = jnp.zeros(len(ams), jnp.float32)
    logw, losses = run(logw0)
    w = np.asarray(jax.nn.softmax(logw))
    log.info(
        "combine_models: %d models, CE %.4f → %.4f, weights %s",
        len(ams), float(losses[0]), float(losses[-1]), np.round(w, 3),
    )
    params = jax.tree.map(
        lambda s: np.asarray(jnp.tensordot(jnp.asarray(w), s, axes=1)),
        stacked,
    )
    bs = jax.tree.map(
        lambda s: np.asarray(jnp.tensordot(jnp.asarray(w), s, axes=1)),
        stacked_bs,
    )
    out = AmNnet(
        ams[0].config, {"params": params, "batch_stats": bs},
        ams[0].log_priors,
    )
    return out
