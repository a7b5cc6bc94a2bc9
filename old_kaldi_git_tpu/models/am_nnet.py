"""Neural acoustic-model wrapper with priors.

Parity with reference src/nnet3/am-nnet-simple.h (AmNnetSimple) +
nnet-am-decodable-simple: holds (model, params, batch stats, priors,
left/right context); produces pseudo-loglikelihoods
log p(x|pdf) ∝ log softmax(logits) - log prior for the decoder, batched
[B, T, num_pdfs] (the array-first decodable contract, SURVEY.md §7.1).
"""

from __future__ import annotations

import dataclasses
import pickle
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from old_kaldi_git_tpu.models.tdnn import TdnnConfig, TdnnModel
from old_kaldi_git_tpu.utils.log import get_logger

log = get_logger("amnnet")


@dataclasses.dataclass
class AmNnet:
    config: TdnnConfig
    variables: Dict[str, Any]  # {'params': ..., 'batch_stats': ...}
    log_priors: Optional[np.ndarray] = None  # [num_pdfs]
    # per-layer learning-rate factors {top-level-param-name-glob: factor},
    # set via nnet3-copy --edits "set-learning-rate-factor ..." (reference
    # nnet-utils.cc ReadEditConfig); applied by the trainer's optimizer
    lr_factors: Optional[Dict[str, float]] = None
    # trailing i-vector width of the input features: config.input_dim =
    # acoustic dim + ivector_dim, and every eval path expects features with
    # the online i-vector already appended per frame (reference
    # AmNnetSimple models trained with --online-ivector-dir; the decode
    # tools must be fed matching i-vectors or the input dim won't line up)
    ivector_dim: int = 0

    def model(self) -> TdnnModel:
        return TdnnModel(self.config)

    @staticmethod
    def init(config: TdnnConfig, seed: int = 0) -> "AmNnet":
        model = TdnnModel(config)
        # initialize on CPU: param init is tiny compute but the experimental
        # TPU backend takes minutes to compile the init graph
        with jax.default_device(jax.devices("cpu")[0]):
            variables = model.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, 8, config.input_dim), jnp.float32),
                train=False,
            )
        return AmNnet(config, jax.tree.map(np.asarray, dict(variables)))

    def set_priors_from_alignment_counts(
        self, counts: np.ndarray, prior_floor_frac: float = 0.01
    ) -> None:
        """Reference sets priors from the train-data pdf occupancy.

        Priors are floored at prior_floor_frac/num_pdfs: dividing by a
        near-zero prior for a pdf the alignments never visited would hand it
        an arbitrarily large pseudo-loglike boost (observed: undertrained
        nets + unvisited silence skip-states decode everything as silence).
        """
        p = np.asarray(counts, np.float64) + 0.5
        p = p / p.sum()
        p = np.maximum(p, prior_floor_frac / len(p))
        self.log_priors = np.log(p).astype(np.float32)

    def set_priors_from_posteriors(
        self, feats_sample: np.ndarray, num_frames: Optional[np.ndarray] = None
    ) -> None:
        """Reference nnet3-adjust-priors / ComputePriors: priors = average
        model posterior over training data.  Unlike hard alignment counts,
        every pdf gets its realistic mass under the model, so no pdf picks
        up a spurious -log-prior boost (hard-count priors give ~zero mass to
        pdfs the aligner skips — e.g. silence skip states — and decoding
        then drowns in boosted silence)."""
        feats_sample = jnp.asarray(feats_sample, jnp.float32)
        post = jax.nn.softmax(self.logits(feats_sample), axis=-1)  # [B, T, P]
        if num_frames is not None:
            T = post.shape[1]
            mask = (
                jnp.arange(T)[None, :] < jnp.asarray(num_frames)[:, None]
            ).astype(post.dtype)
            post = post * mask[:, :, None]
            denom = jnp.sum(mask)
        else:
            denom = post.shape[0] * post.shape[1]
        p = np.asarray(jnp.sum(post, axis=(0, 1)) / denom, np.float64)
        p = np.maximum(p / p.sum(), 1e-8)
        self.log_priors = np.log(p).astype(np.float32)

    def _jit_eval(self, kind: str, stride: int):
        """Cached jitted evaluators: un-jitted flax `apply` dispatches
        every layer op eagerly, and on a tunneled backend the per-op
        dispatch costs more than the model compute.  Keyed by
        (kind, stride); `log_priors` rides as a traced argument so
        set_priors_* needs no cache invalidation."""
        cache = self.__dict__.setdefault("_jit_cache", {})
        key = (kind, stride)
        if key not in cache:
            model = self.model()
            if kind == "logits":
                def f(variables, x):
                    return model.apply(variables, x, train=False,
                                       output_stride=stride)
            else:
                def f(variables, x, lp):
                    logits = model.apply(variables, x, train=False,
                                         output_stride=stride)
                    out = jax.nn.log_softmax(logits, axis=-1)
                    return out if lp is None else out - lp
            cache[key] = jax.jit(f)
        return cache[key]

    def logits(self, feats: jnp.ndarray, output_stride: int = 1
               ) -> jnp.ndarray:
        """output_stride > 1 evaluates the prefinal/output layers only at
        every stride-th frame (reference frame-subsampling decode for
        chain models) — [B, ceil(T/stride), num_pdfs]."""
        return self._jit_eval("logits", output_stride)(
            self.variables, jnp.asarray(feats, jnp.float32))

    def loglikes_batch(self, feats: jnp.ndarray) -> jnp.ndarray:
        """[B, T, D] → [B, T, num_pdfs] pseudo-loglikes (log-softmax − prior)."""
        lp = (None if self.log_priors is None
              else jnp.asarray(self.log_priors))
        return self._jit_eval("loglikes", 1)(
            self.variables, jnp.asarray(feats, jnp.float32), lp)

    def loglikes_batch_chunked(
        self, feats: jnp.ndarray, chunk: int = 150,
    ) -> jnp.ndarray:
        """Chunked evaluation with receptive-field overlap: equals
        loglikes_batch exactly for finite-context models (TDNN/TDNN-F) while
        bounding activation memory to O(chunk) frames.

        ~ the reference's chunked decodables (DecodableAmNnetSimple
        --frames-per-chunk with extra left/right context; the 'looped'
        computation's role for unbounded utterances).  Recurrent layers
        (lstmp/blstmp) have unbounded context: fall back to whole-utterance
        evaluation for them."""
        if any(l.kind in ("lstmp", "blstmp") for l in self.config.layers):
            return self.loglikes_batch(feats)
        feats = jnp.asarray(feats, jnp.float32)
        B, T, D = feats.shape
        if T <= chunk:
            return self.loglikes_batch(feats)
        lctx = self.config.left_context
        rctx = self.config.right_context
        outs = []
        for s0 in range(0, T, chunk):
            e0 = min(s0 + chunk, T)
            lo = max(0, s0 - lctx)
            hi = min(T, e0 + rctx)
            piece = self.loglikes_batch(feats[:, lo:hi])
            outs.append(piece[:, s0 - lo: s0 - lo + (e0 - s0)])
        return jnp.concatenate(outs, axis=1)

    # -- serialization (framework-native; models are pytrees) -----------------
    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(
                {
                    "config": self.config,
                    "variables": jax.tree.map(np.asarray, self.variables),
                    "log_priors": self.log_priors,
                    "lr_factors": self.lr_factors,
                    "ivector_dim": self.ivector_dim,
                },
                f,
            )

    @staticmethod
    def load(path: str) -> "AmNnet":
        with open(path, "rb") as f:
            d = pickle.load(f)
        return AmNnet(d["config"], d["variables"], d["log_priors"],
                      d.get("lr_factors"), d.get("ivector_dim", 0))


@dataclasses.dataclass
class AmNnetModel:
    """The nnet3 'final.mdl' bundle: TransitionModel + AmNnet (+ priors in
    the AmNnet).  Reference parity: src/nnet3/am-nnet-simple.h models are
    always written behind a TransitionModel in final.mdl; the decode/align
    tools need the tid→pdf map from it."""

    am: AmNnet
    tm: Any  # TransitionModel

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(
                {
                    "kind": "am-nnet-model",
                    "config": self.am.config,
                    "variables": jax.tree.map(np.asarray, self.am.variables),
                    "log_priors": self.am.log_priors,
                    "ivector_dim": self.am.ivector_dim,
                    "tm": self.tm,
                },
                f,
            )

    @staticmethod
    def load(path: str) -> "AmNnetModel":
        with open(path, "rb") as f:
            d = pickle.load(f)
        if d.get("kind") != "am-nnet-model":
            raise ValueError(f"{path}: not an AmNnetModel bundle")
        return AmNnetModel(
            AmNnet(d["config"], d["variables"], d["log_priors"],
                   ivector_dim=d.get("ivector_dim", 0)),
            d["tm"],
        )
