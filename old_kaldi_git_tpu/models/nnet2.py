"""nnet2-equivalent stack: p-norm DNNs + parallel SGD with model averaging.

Reference parity: src/nnet2/ (Dan Povey's first DNN stack) — the capability
rows the nnet3 plane does not already cover:

* ``PnormComponent`` + ``NormalizeComponent`` (nnet-component.h): group
  p-norm "maxout-like" nonlinearity followed by radial renormalization —
  the signature nnet2 architecture (affine → pnorm → normalize stacks).
* ``FixedAffineComponent``: a non-trainable input preconditioning transform
  (reference estimates it LDA-style via steps/nnet2/get_lda.sh); here
  estimated as a whitening transform of the spliced input features.
* ``SpliceComponent``: input splicing over ±context (static gather).
* **Parallel SGD with periodic model averaging** (§2.8 P3; Povey et al.
  2014 "Parallel training of DNNs with natural gradient and parameter
  averaging"): each outer iteration trains ``num_jobs`` replicas on
  disjoint data shards and averages parameters — the nnet2/nnet3 recipes'
  distributed strategy (nnet-am-average role), with the
  ``num-jobs-initial → num-jobs-final`` ramp.

TPU formulation: the reference's N independent single-GPU jobs become ONE
jitted program — `jax.vmap` over a leading jobs axis of stacked parameters,
`lax.scan` over each job's minibatches, then a tree-mean (the average).  On
a mesh the jobs axis shards like any other batch axis, so the same program
scales out; per-step `pmean` (nnet3-era semantics) remains available via
models/train.py.  NG preconditioning (the thing that makes averaging work)
is available as the ng-sgd optax transform for the single-replica path;
the vmapped path uses plain momentum SGD, faithful to nnet2's `--use-
preconditioning=false` mode.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from old_kaldi_git_tpu.models.tdnn import splice
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger
from old_kaldi_git_tpu.utils.parse_options import options_dataclass

log = get_logger("nnet2")


def group_pnorm(x: jnp.ndarray, output_dim: int, p: float = 2.0) -> jnp.ndarray:
    """PnormComponent: y_i = (sum_{j in group i} |x_j|^p)^(1/p).

    Reference nnet2/nnet-component.cc PnormComponent::Propagate (via
    cudamatrix GroupPnorm); group size = input_dim / output_dim."""
    D = x.shape[-1]
    if D % output_dim:
        raise KaldiError(f"pnorm input {D} not divisible by {output_dim}")
    g = x.reshape(x.shape[:-1] + (output_dim, D // output_dim))
    if p == 2.0:  # the recipes' default; rsqrt path stays fused on TPU
        return jnp.sqrt(jnp.sum(g * g, axis=-1) + 1e-20)
    return jnp.power(jnp.sum(jnp.power(jnp.abs(g), p), axis=-1) + 1e-20,
                     1.0 / p)


def radial_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """NormalizeComponent: scale each frame to unit RMS (nnet2 semantics:
    y = x * sqrt(D) / ||x||, floored to avoid blowup on silence frames)."""
    D = x.shape[-1]
    rms = jnp.sqrt(jnp.mean(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(rms, 1e-6)


@dataclasses.dataclass(frozen=True)
class Nnet2Config:
    input_dim: int
    output_dim: int
    left_context: int = 4
    right_context: int = 4
    pnorm_input_dim: int = 512
    pnorm_output_dim: int = 64
    num_hidden_layers: int = 2
    p: float = 2.0
    # FixedAffineComponent (W [spliced_dim, spliced_dim], b [spliced_dim]);
    # None = identity.  Tuples of bytes keep the dataclass hashable for flax.
    fixed_affine: Optional[Tuple[bytes, bytes, int]] = None

    @property
    def spliced_dim(self) -> int:
        return self.input_dim * (self.left_context + self.right_context + 1)

    def fixed_affine_arrays(self):
        if self.fixed_affine is None:
            return None
        wb, bb, d = self.fixed_affine
        w = np.frombuffer(wb, np.float32).reshape(d, d)
        return w, np.frombuffer(bb, np.float32)


def make_fixed_affine(feats_spliced: np.ndarray) -> Tuple[bytes, bytes, int]:
    """Whitening preconditioning transform over spliced features — the
    FixedAffineComponent the reference estimates LDA-style on egs
    (steps/nnet2/get_lda.sh with --within-class-factor preconditioning)."""
    X = feats_spliced.reshape(-1, feats_spliced.shape[-1]).astype(np.float64)
    mu = X.mean(0)
    cov = np.cov(X - mu, rowvar=False) + 1e-4 * np.eye(X.shape[1])
    evals, evecs = np.linalg.eigh(cov)
    W = (evecs / np.sqrt(np.maximum(evals, 1e-8))) @ evecs.T  # symmetric
    b = -W @ mu
    d = X.shape[1]
    return (W.astype(np.float32).tobytes(),
            b.astype(np.float32).tobytes(), d)


class Nnet2Model(nn.Module):
    """Splice → (fixed affine) → N × (affine → pnorm → normalize) → affine."""

    config: Nnet2Config

    @nn.compact
    def __call__(self, feats: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = self.config
        x = splice(feats, tuple(range(-c.left_context, c.right_context + 1)))
        fa = c.fixed_affine_arrays()
        if fa is not None:
            # y = W x + b row-wise, i.e. x @ W.T + b: correct for any
            # (possibly non-symmetric, LDA-style) FixedAffineComponent
            x = x @ jnp.asarray(fa[0]).T + jnp.asarray(fa[1])
        for i in range(c.num_hidden_layers):
            x = nn.Dense(c.pnorm_input_dim, name=f"affine{i}")(x)
            x = group_pnorm(x, c.pnorm_output_dim, c.p)
            x = radial_normalize(x)
        return nn.Dense(c.output_dim, name="final_affine")(x)


@dataclasses.dataclass
class AmNnet2:
    """AmNnet (nnet2/am-nnet.h) role: model + priors → pseudo-loglikes."""

    config: Nnet2Config
    params: Dict[str, Any]
    log_priors: Optional[np.ndarray] = None

    @staticmethod
    def init(config: Nnet2Config, seed: int = 0) -> "AmNnet2":
        model = Nnet2Model(config)
        with jax.default_device(jax.devices("cpu")[0]):
            variables = model.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, 8, config.input_dim), jnp.float32))
        return AmNnet2(config, jax.tree.map(np.asarray, variables["params"]))

    def logits(self, feats: jnp.ndarray) -> jnp.ndarray:
        return Nnet2Model(self.config).apply(
            {"params": self.params}, jnp.asarray(feats, jnp.float32))

    def loglikes_batch(self, feats: jnp.ndarray) -> jnp.ndarray:
        logp = jax.nn.log_softmax(self.logits(feats), axis=-1)
        if self.log_priors is not None:
            logp = logp - jnp.asarray(self.log_priors)
        return logp

    def set_priors_from_alignment_counts(self, counts: np.ndarray) -> None:
        p = np.asarray(counts, np.float64) + 0.5
        p = np.maximum(p / p.sum(), 0.01 / len(p))
        self.log_priors = np.log(p).astype(np.float32)


@options_dataclass
class Nnet2TrainOptions:
    """Knobs named after steps/nnet2/train_pnorm_simple.sh."""

    num_epochs: int = 10
    minibatch_size: int = 4
    num_jobs_initial: int = 2
    num_jobs_final: int = 4
    initial_lr: float = 2e-3
    final_lr: float = 2e-4
    momentum: float = 0.0
    # per-job preconditioner: 'adam' (stand-in for the reference's online
    # NG preconditioning — what makes averaging work) or 'sgd' (the
    # reference's --use-preconditioning=false mode)
    optimizer: str = "adam"
    seed: int = 0


def _ce_loss(params, model, bf, bl, bm):
    logits = model.apply({"params": params}, bf)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, bl[..., None], axis=-1)[..., 0]
    tot = jnp.maximum(jnp.sum(bm), 1.0)
    return -jnp.sum(ll * bm) / tot


def train_nnet2_parallel(
    am: AmNnet2,
    feats: Dict[str, np.ndarray],
    labels: Dict[str, np.ndarray],  # per-frame pdf ids
    opts: Optional[Nnet2TrainOptions] = None,
) -> AmNnet2:
    """Parallel-SGD-with-averaging trainer (steps/nnet2/train_pnorm* +
    nnet-am-average): per iteration, `num_jobs` replicas each run SGD over a
    disjoint shard (vmapped — one program), then parameters are averaged;
    jobs ramp num_jobs_initial → num_jobs_final across iterations and the
    learning rate decays geometrically (the reference's exponential
    schedule)."""
    opts = opts or Nnet2TrainOptions()
    model = Nnet2Model(am.config)
    keys = sorted(k for k in labels if k in feats)
    if not keys:
        raise KaldiError("no labeled utterances")
    Tmax = max(feats[k].shape[0] for k in keys)
    D = am.config.input_dim
    N = len(keys)
    bf = np.zeros((N, Tmax, D), np.float32)
    bl = np.zeros((N, Tmax), np.int32)
    bm = np.zeros((N, Tmax), np.float32)
    counts = np.zeros(am.config.output_dim, np.float64)
    for i, k in enumerate(keys):
        t = min(feats[k].shape[0], len(labels[k]))
        bf[i, :t] = feats[k][:t]
        bl[i, :t] = labels[k][:t]
        bm[i, :t] = 1.0
        counts += np.bincount(labels[k][:t],
                              minlength=am.config.output_dim)

    grad_fn = jax.value_and_grad(_ce_loss)
    import optax

    # descent-direction updates; the lr is applied outside so it can ramp
    if opts.optimizer == "adam":
        inner = optax.chain(optax.scale_by_adam(), optax.scale(-1.0))
    else:
        inner = optax.chain(
            optax.trace(decay=opts.momentum) if opts.momentum > 0
            else optax.identity(), optax.scale(-1.0))

    @jax.jit
    def run_iteration(stacked_params, stacked_opt, jf, jl, jm, lr):
        """[J, NB, B, ...] shards → per-job scan of SGD steps, vmapped."""

        def one_job(params, ost, f, l, m):
            def step(carry, batch):
                p, s = carry
                loss, g = grad_fn(p, model, *batch)
                u, s = inner.update(g, s, p)
                p = jax.tree.map(lambda pi, ui: pi + lr * ui, p, u)
                return (p, s), loss

            (params, ost), losses = jax.lax.scan(step, (params, ost),
                                                 (f, l, m))
            return params, ost, jnp.mean(losses)

        new_p, new_s, losses = jax.vmap(one_job)(stacked_params, stacked_opt,
                                                 jf, jl, jm)
        avg = jax.tree.map(lambda x: jnp.mean(x, axis=0), new_p)
        return avg, new_s, jnp.mean(losses)

    params = am.params
    rng = np.random.default_rng(opts.seed)
    B = opts.minibatch_size
    for it in range(opts.num_epochs):
        frac = it / max(opts.num_epochs - 1, 1)
        J = int(round(opts.num_jobs_initial
                      + frac * (opts.num_jobs_final - opts.num_jobs_initial)))
        J = max(1, min(J, max(1, N // B)))
        lr = opts.initial_lr * (opts.final_lr / opts.initial_lr) ** frac
        order = rng.permutation(N)
        nb = max(1, N // (J * B))  # minibatches per job (equal across jobs)
        take = J * nb * B
        idx = order[:take] if take <= N else np.resize(order, take)
        sel = idx.reshape(J, nb, B)
        stacked = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (J,) + x.shape), params)
        opt0 = inner.init(params)  # fresh per iteration, like fresh jobs
        stacked_opt = jax.tree.map(
            lambda x: jnp.broadcast_to(jnp.asarray(x),
                                       (J,) + jnp.asarray(x).shape), opt0)
        params, _, loss = run_iteration(
            stacked, stacked_opt, bf[sel], bl[sel], bm[sel], lr)
        log.info("nnet2 iter %d: %d jobs, lr %.2e, CE %.4f",
                 it, J, lr, float(loss))
    out = AmNnet2(am.config, jax.tree.map(np.asarray, params))
    out.set_priors_from_alignment_counts(counts)
    return out
