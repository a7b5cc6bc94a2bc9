"""nnet3 discriminative sequence training: MMI / sMBR / MPFE.

Reference parity: src/nnet3/nnet-discriminative-{example,training,
diagnostics}.{h,cc} + nnet3bin/nnet3-discriminative-train — lattice-based
sequence objectives for neural acoustic models.  The reference's
discriminative egs bundle (feats, numerator alignment, denominator
lattice); each minibatch re-scores the den lattice's acoustic costs with
the CURRENT model, runs lattice forward-backward on the host, and
backprops the per-frame objective derivative through the network.

The same split here, arranged for the TPU:
  device: forward pass → pseudo-loglikes [B, T, P] (one jit program);
  host:   per-utterance lattice rescore + forward-backward → the
          objective's derivative w.r.t. the log-posteriors, grad [B, T, P]
          (pointer-chasing over ragged arcs, like the reference's CPU
          lattice code);
  device: one jitted update step whose surrogate loss is
          -(grad · log_softmax(logits)) — its autodiff gradient w.r.t.
          the logits is exactly the criterion derivative (grad is a
          constant w.r.t. params, the reference's supply-the-derivative
          pattern in nnet-training.cc).

Criteria (per-frame derivative w.r.t. log p(pdf)):
  mmi:   onehot(num pdf) - gamma_den      (num fixed to the alignment,
         like the reference's default; per-frame zero-sum)
  smbr / mpfe: the signed accuracy posteriors of
         lat/discriminative.py forward_backward_mpe_variants, mapped
         tid → pdf (also zero-sum per frame)
Boosted MMI: boost the den lattices beforehand with lattice-boost-ali.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from old_kaldi_git_tpu.lat.discriminative import forward_backward_mpe_variants
from old_kaldi_git_tpu.lat.lattice import (
    lattice_arc_posteriors,
    lattice_state_times,
    lattice_total_logprob,
)
from old_kaldi_git_tpu.lat.rescore import rescore_lattice_acoustics
from old_kaldi_git_tpu.models.am_nnet import AmNnet
from old_kaldi_git_tpu.models.train import NnetTrainOptions, make_optimizer
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger

log = get_logger("nnet3_discriminative")


@dataclasses.dataclass
class DiscriminativeOptions:
    criterion: str = "smbr"  # smbr | mpfe | mmi
    acoustic_scale: float = 0.1
    num_epochs: int = 2
    minibatch_size: int = 8
    learning_rate: float = 2e-4
    silence_phones: Tuple[int, ...] = ()
    one_best_check: bool = False  # log num/den best-path agreement


def discriminative_grad(
    tm,
    loglikes: np.ndarray,  # [T, P] current pseudo-loglikes
    num_ali: Sequence[int],
    den_lat,
    criterion: str = "smbr",
    acoustic_scale: float = 0.1,
    silence_phones: Sequence[int] = (),
) -> Tuple[np.ndarray, float]:
    """(dF/dlogp [T, P], objective) for one utterance.  The den lattice is
    rescored in place with the current loglikes first (reference
    DiscriminativeComputation)."""
    T, P = loglikes.shape
    lattice_state_times(den_lat)
    rescore_lattice_acoustics(den_lat, loglikes, tm.tid_to_pdf)
    grad = np.zeros((T, P))
    ali = np.asarray(num_ali)[:T]
    pdfs = np.asarray([tm.tid_to_pdf(t) for t in ali])
    if criterion == "mmi":
        post = lattice_arc_posteriors(den_lat, lm_scale=1.0,
                                      ac_scale=acoustic_scale)
        times = den_lat.state_time
        for s in range(den_lat.num_states):
            t = times[s]
            for a, p in zip(den_lat.arcs[s], post[s]):
                if a.ilabel and 0 <= t < T and p > 0:
                    grad[t, tm.tid_to_pdf(a.ilabel)] -= p
        grad[np.arange(len(pdfs)), pdfs] += 1.0
        # objective: (num acoustic loglike - den total)/T.  The den total
        # includes its graph costs (a model-independent offset), the num
        # term only acoustics — constants differ but deltas, which is what
        # the epoch logs and compute-objf trends report, are exact.
        num_ll = acoustic_scale * loglikes[
            np.arange(len(pdfs)), pdfs].sum()
        den_ll = lattice_total_logprob(den_lat, lm_scale=1.0,
                                       ac_scale=acoustic_scale)
        objf = float(num_ll - den_ll) / max(T, 1)
        grad *= acoustic_scale  # dF/dlogp includes the scale
    elif criterion in ("smbr", "mpfe"):
        post, acc = forward_backward_mpe_variants(
            den_lat, tm, ali, criterion=criterion,
            silence_phones=silence_phones, lm_scale=1.0,
            ac_scale=acoustic_scale)
        for t, frame in enumerate(post):
            if t >= T:
                break
            for tid, w in frame:
                grad[t, tm.tid_to_pdf(tid)] += acoustic_scale * w
        objf = acc / max(T, 1)
    else:
        raise KaldiError(f"bad criterion {criterion!r}")
    return grad, objf


def train_discriminative(
    am: AmNnet,
    feats: Dict[str, np.ndarray],
    num_ali: Dict[str, np.ndarray],
    den_lats: Dict[str, object],
    tm,
    opts: Optional[DiscriminativeOptions] = None,
) -> AmNnet:
    """Sequence-train an AmNnet; returns the updated model (priors kept)."""
    import copy

    import jax
    import jax.numpy as jnp
    import optax

    opts = opts or DiscriminativeOptions()
    keys = sorted(k for k in feats if k in num_ali and k in den_lats)
    if not keys:
        raise KaldiError("no utterances with feats+ali+lattice")
    model = am.model()
    log_priors = (jnp.asarray(am.log_priors)
                  if am.log_priors is not None else None)
    topts = NnetTrainOptions(
        num_epochs=opts.num_epochs, minibatch_size=opts.minibatch_size,
        initial_lr=opts.learning_rate, final_lr=opts.learning_rate,
        optimizer="sgd")
    steps = max(1, (len(keys) // opts.minibatch_size) * opts.num_epochs)
    optimizer = make_optimizer(topts, steps)
    params = am.variables["params"]
    batch_stats = am.variables.get("batch_stats", {})
    opt_state = optimizer.init(params)

    def fwd(p, bs, x):
        out = model.apply({"params": p, "batch_stats": bs}, x, train=False)
        logp = jax.nn.log_softmax(out, axis=-1)
        ll = logp - log_priors if log_priors is not None else logp
        return logp, ll

    fwd_j = jax.jit(fwd)

    def surrogate(p, bs, x, g):
        logp, _ = fwd(p, bs, x)
        return -jnp.sum(g * logp)

    @jax.jit
    def update(p, bs, os, x, g):
        grads = jax.grad(surrogate)(p, bs, x, g)
        upd, os2 = optimizer.update(grads, os, p)
        return optax.apply_updates(p, upd), os2

    rng = np.random.default_rng(0)
    T_pad = max(len(feats[k]) for k in keys)
    D = feats[keys[0]].shape[1]
    for epoch in range(opts.num_epochs):
        order = list(keys)
        rng.shuffle(order)
        objfs = []
        for lo in range(0, len(order), opts.minibatch_size):
            batch = order[lo:lo + opts.minibatch_size]
            x = np.zeros((len(batch), T_pad, D), np.float32)
            for i, k in enumerate(batch):
                x[i, :len(feats[k])] = feats[k]
            logp, ll = fwd_j(params, batch_stats, jnp.asarray(x))
            ll_h = np.asarray(ll)
            g = np.zeros((len(batch), T_pad, ll_h.shape[-1]), np.float32)
            for i, k in enumerate(batch):
                lat = copy.deepcopy(den_lats[k])
                t = len(feats[k])
                gi, objf = discriminative_grad(
                    tm, ll_h[i, :t], num_ali[k], lat,
                    criterion=opts.criterion,
                    acoustic_scale=opts.acoustic_scale,
                    silence_phones=opts.silence_phones)
                g[i, :t] = gi
                objfs.append(objf)
            params, opt_state = update(
                params, batch_stats, opt_state, jnp.asarray(x),
                jnp.asarray(g))
        log.info("discriminative epoch %d (%s): objf %.4f",
                 epoch, opts.criterion, float(np.mean(objfs)))
    new_vars = {"params": jax.tree.map(np.asarray, params),
                "batch_stats": jax.tree.map(np.asarray, batch_stats)}
    return AmNnet(am.config, new_vars, am.log_priors)


def compute_discriminative_objf(
    am: AmNnet,
    feats: Dict[str, np.ndarray],
    num_ali: Dict[str, np.ndarray],
    den_lats: Dict[str, object],
    tm,
    opts: Optional[DiscriminativeOptions] = None,
) -> float:
    """Average per-frame objective over a dataset
    (nnet3-discriminative-compute-objf role)."""
    import copy

    import jax.numpy as jnp

    opts = opts or DiscriminativeOptions()
    tot = frames = 0.0
    for k in sorted(feats):
        if k not in num_ali or k not in den_lats:
            continue
        ll = np.asarray(am.loglikes_batch(
            jnp.asarray(np.asarray(feats[k], np.float32)[None])))[0]
        _, objf = discriminative_grad(
            tm, ll, num_ali[k], copy.deepcopy(den_lats[k]),
            criterion=opts.criterion, acoustic_scale=opts.acoustic_scale,
            silence_phones=opts.silence_phones)
        tot += objf * len(ll)
        frames += len(ll)
    return tot / max(frames, 1.0)
