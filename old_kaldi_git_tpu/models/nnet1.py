"""nnet1-equivalent stack: Karel Veselý's simple layer-list DNN.

Reference parity: src/nnet/ + src/nnetbin/ — the remaining §2.6 row.  The
capabilities that distinguish nnet1 from the nnet3 plane:

* ``Nnet`` as a plain layer LIST (nnet-nnet.h), not a graph: splice →
  [AffineTransform → Sigmoid]* → AffineTransform → Softmax.
* ``nnet-train-frmshuff``: frame-level globally-shuffled minibatch SGD —
  egs are individual spliced frames, not sequences.
* Losses ``Xent`` and ``Mse`` (nnet-loss.h) with frame-accuracy reporting.
* The **newbob** learning-rate schedule (steps/nnet/train.sh): hold the LR
  while cross-validation improves, halve it once per-epoch CV improvement
  drops below start_halving_impr, stop at end_halving_impr.

TPU formulation: frames are pre-spliced into a [F, spliced_dim] matrix, one
jitted scan runs all minibatches of an epoch (pure MXU matmuls — a frame
MLP is the friendliest possible TPU workload), CV evaluation is one batched
forward.  Priors from label counts give pseudo-loglikes for decoding
(nnet-forward --class-frame-counts role).
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

log = get_logger("nnet1")


@dataclasses.dataclass(frozen=True)
class Nnet1Config:
    input_dim: int
    output_dim: int
    hidden_dim: int = 256
    num_hidden_layers: int = 2
    left_context: int = 5
    right_context: int = 5

    @property
    def spliced_dim(self) -> int:
        return self.input_dim * (self.left_context + self.right_context + 1)


class Nnet1Model(nn.Module):
    """Layer list over pre-spliced frames [*, spliced_dim] → logits."""

    config: Nnet1Config

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        for i in range(c.num_hidden_layers):
            x = nn.sigmoid(nn.Dense(c.hidden_dim, name=f"affine{i}")(x))
        return nn.Dense(c.output_dim, name="final_affine")(x)


@dataclasses.dataclass
class AmNnet1:
    config: Nnet1Config
    params: Dict[str, Any]
    log_priors: Optional[np.ndarray] = None
    # the nnet1 "feature_transform" (steps/nnet/train.sh): splice + global
    # CMVN over the spliced dims, prepended to the net and saved with it
    feat_shift: Optional[np.ndarray] = None  # [spliced_dim]
    feat_scale: Optional[np.ndarray] = None  # [spliced_dim]

    @staticmethod
    def init(config: Nnet1Config, seed: int = 0) -> "AmNnet1":
        model = Nnet1Model(config)
        with jax.default_device(jax.devices("cpu")[0]):
            variables = model.init(jax.random.PRNGKey(seed),
                                   jnp.zeros((1, config.spliced_dim)))
        return AmNnet1(config, jax.tree.map(np.asarray, variables["params"]))

    def _splice(self, feats: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        x = splice(jnp.asarray(feats, jnp.float32),
                   tuple(range(-c.left_context, c.right_context + 1)))
        if self.feat_shift is not None:
            x = (x + jnp.asarray(self.feat_shift)) * jnp.asarray(
                self.feat_scale)
        return x

    def loglikes_batch(self, feats: jnp.ndarray) -> jnp.ndarray:
        """[B, T, D] → [B, T, P] pseudo-loglikes (nnet-forward role)."""
        logits = Nnet1Model(self.config).apply(
            {"params": self.params}, self._splice(feats))
        logp = jax.nn.log_softmax(logits, axis=-1)
        if self.log_priors is not None:
            logp = logp - jnp.asarray(self.log_priors)
        return logp


@options_dataclass
class Nnet1TrainOptions:
    """steps/nnet/train.sh knobs (newbob schedule)."""

    max_epochs: int = 20
    minibatch_size: int = 256
    learn_rate: float = 8e-3  # the recipes' default 0.008
    momentum: float = 0.0
    loss: str = "xent"  # xent | mse
    start_halving_impr: float = 0.01
    end_halving_impr: float = 0.001
    halving_factor: float = 0.5
    cv_fraction: float = 0.1
    seed: int = 777  # the nnet1 scripts' traditional seed


def train_nnet1_frmshuff(
    am: AmNnet1,
    feats: Dict[str, np.ndarray],
    labels: Dict[str, np.ndarray],
    opts: Optional[Nnet1TrainOptions] = None,
) -> AmNnet1:
    """nnet-train-frmshuff + newbob: globally frame-shuffled minibatch SGD
    with cross-validation-driven LR halving.  For loss='mse' the labels
    dict must instead map to float targets [T, output_dim]."""
    opts = opts or Nnet1TrainOptions()
    c = am.config
    model = Nnet1Model(c)
    keys = sorted(k for k in labels if k in feats)
    if not keys:
        raise KaldiError("no labeled utterances")
    helper = AmNnet1(c, am.params)  # no transform yet: raw spliced frames
    xs, ys = [], []
    for k in keys:
        t = min(feats[k].shape[0], len(labels[k]))
        xs.append(np.asarray(helper._splice(feats[k][None, :t])[0]))
        ys.append(np.asarray(labels[k][:t]))
    X = np.concatenate(xs, 0)
    Y = np.concatenate(ys, 0)
    # feature_transform: global CMVN over the spliced dims (the nnet1
    # scripts' compute-cmvn-stats on the spliced egs); saved with the model
    if am.feat_shift is None:
        feat_shift = (-X.mean(0)).astype(np.float32)
        feat_scale = (1.0 / np.maximum(X.std(0), 1e-3)).astype(np.float32)
    else:
        feat_shift, feat_scale = am.feat_shift, am.feat_scale
    X = (X + feat_shift) * feat_scale
    rng = np.random.default_rng(opts.seed)
    perm = rng.permutation(len(X))
    X, Y = X[perm], Y[perm]
    ncv = max(1, int(len(X) * opts.cv_fraction))
    Xcv, Ycv = X[:ncv], Y[:ncv]
    Xtr, Ytr = X[ncv:], Y[ncv:]
    B = opts.minibatch_size
    nb = max(1, len(Xtr) // B)
    Xtr, Ytr = Xtr[: nb * B], Ytr[: nb * B]
    xent = opts.loss == "xent"

    def loss_fn(params, bx, by):
        logits = model.apply({"params": params}, bx)
        if xent:
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(
                jnp.take_along_axis(logp, by[:, None], axis=-1))
        return 0.5 * jnp.mean(jnp.sum((logits - by) ** 2, -1))

    grad_fn = jax.value_and_grad(loss_fn)

    @jax.jit
    def run_epoch(params, mom, bx, by, lr):
        def step(carry, batch):
            p, v = carry
            loss, g = grad_fn(p, *batch)
            v = jax.tree.map(lambda vi, gi: opts.momentum * vi + gi, v, g)
            p = jax.tree.map(lambda pi, vi: pi - lr * vi, p, v)
            return (p, v), loss

        (params, mom), losses = jax.lax.scan(step, (params, mom), (bx, by))
        return params, mom, jnp.mean(losses)

    @jax.jit
    def cv_loss(params):
        return loss_fn(params, jnp.asarray(Xcv), jnp.asarray(Ycv))

    params = am.params
    mom = jax.tree.map(jnp.zeros_like, params)
    lr = opts.learn_rate
    prev_cv = float(cv_loss(params))
    halving = False
    log.info("nnet1: %d train / %d cv frames, initial CV %.4f",
             len(Xtr), ncv, prev_cv)
    for epoch in range(opts.max_epochs):
        order = rng.permutation(len(Xtr)).reshape(nb, B)
        cand_params, cand_mom, tr = run_epoch(
            params, mom, jnp.asarray(Xtr[order]), jnp.asarray(Ytr[order]),
            lr)
        cv = float(cv_loss(cand_params))
        rel = (prev_cv - cv) / max(abs(prev_cv), 1e-9)
        accepted = cv < prev_cv
        log.info(
            "nnet1 epoch %d: lr %.2e train %.4f CV %.4f (rel impr %.4f) %s",
            epoch, lr, float(tr), cv, rel,
            "accepted" if accepted else "rejected")
        if accepted:
            params, mom = cand_params, cand_mom
            prev_cv = cv
        # else: keep the previous snapshot — the reference train_scheduler.sh
        # reloads the last accepted nnet when an epoch degrades the CV loss
        if halving or rel < opts.start_halving_impr:
            halving = True
            lr *= opts.halving_factor
        if halving and rel < opts.end_halving_impr and epoch > 0:
            break
    out = AmNnet1(c, jax.tree.map(np.asarray, params),
                  feat_shift=feat_shift, feat_scale=feat_scale)
    if xent:
        counts = np.bincount(Y, minlength=c.output_dim).astype(np.float64)
        p = np.maximum((counts + 0.5) / (counts.sum() + 0.5 * len(counts)),
                       0.01 / len(counts))
        out.log_priors = np.log(p).astype(np.float32)
    return out
