"""Recurrent (LSTM) word language model + lattice N-best rescoring.

Reference parity (SURVEY.md §2.4/§2.7 "lm-rescoring apps"):
src/lm/mikolov-rnnlm-lib.* / kaldi-rnnlm wrappers and the N-best
lattice-rescoring path the reference's vintage used for RNNLMs
(rnnlm rescoring via nbest-to-linear → scoring → reranking).

TPU-first: the model is an embedding + LSTMP stack (models/recurrent) with
a tied softmax, trained as one jitted step over padded sentence batches;
scoring batches all N-best hypotheses in one forward pass.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

import flax.linen as nn

from old_kaldi_git_tpu.models.recurrent import LstmpLayer
from old_kaldi_git_tpu.utils.log import get_logger
from old_kaldi_git_tpu.utils.parse_options import options_dataclass

log = get_logger("rnnlm")


@options_dataclass
class RnnLmOptions:
    embed_dim: int = 64
    cell_dim: int = 128
    recurrent_dim: int = 32
    num_epochs: int = 10
    batch_size: int = 32
    learning_rate: float = 3e-3
    seed: int = 0


class RnnLmModule(nn.Module):
    vocab: int  # including BOS/EOS
    embed_dim: int
    cell_dim: int
    recurrent_dim: int

    @nn.compact
    def __call__(self, tokens):  # [B, T] int32 → [B, T, vocab] logits
        x = nn.Embed(self.vocab, self.embed_dim, name="embed")(tokens)
        x = LstmpLayer(self.cell_dim, self.recurrent_dim, name="lstm")(x)
        return nn.Dense(self.vocab, name="softmax")(x)


@dataclasses.dataclass
class RnnLm:
    """vocab ids: 0 = BOS (input side), 1 = EOS (target side); real words
    are caller ids shifted by +2."""

    params: dict
    opts: RnnLmOptions
    vocab: int

    def _model(self) -> RnnLmModule:
        return RnnLmModule(self.vocab, self.opts.embed_dim,
                           self.opts.cell_dim, self.opts.recurrent_dim)

    def logprobs_batch(self, seqs: Sequence[Sequence[int]]) -> np.ndarray:
        """Total natural-log P(sentence) for each word-id sequence."""
        if not seqs:
            return np.zeros(0)
        B = len(seqs)
        T = max(len(s) for s in seqs) + 1  # +EOS
        inp = np.zeros((B, T), np.int32)  # BOS=0 then words
        tgt = np.full((B, T), 1, np.int32)  # EOS=1 padding/final target
        mask = np.zeros((B, T), np.float32)
        for b, s in enumerate(seqs):
            ws = [int(w) + 2 for w in s]
            inp[b, 1: 1 + len(ws)] = ws
            tgt[b, : len(ws)] = ws
            tgt[b, len(ws)] = 1  # EOS
            mask[b, : len(ws) + 1] = 1.0
        logits = self._model().apply({"params": self.params}, jnp.asarray(inp))
        logp = jax.nn.log_softmax(logits, axis=-1)
        tok_lp = jnp.take_along_axis(
            logp, jnp.asarray(tgt)[:, :, None], axis=2
        )[:, :, 0]
        return np.asarray(jnp.sum(tok_lp * jnp.asarray(mask), axis=1))

    def score(self, words: Sequence[int]) -> float:
        """-log P (graph-cost convention, for rescore_nbest)."""
        return float(-self.logprobs_batch([list(words)])[0])


def train_rnnlm(
    seqs: Sequence[Sequence[int]],
    num_words: int,
    opts: Optional[RnnLmOptions] = None,
) -> RnnLm:
    """Train on word-id sequences (ids in [1, num_words])."""
    opts = opts or RnnLmOptions()
    vocab = num_words + 3  # 0=BOS, 1=EOS, words at w+2 for w in [1, num_words]
    model = RnnLmModule(vocab, opts.embed_dim, opts.cell_dim,
                        opts.recurrent_dim)
    T = max(len(s) for s in seqs) + 1
    B_all = len(seqs)
    inp = np.zeros((B_all, T), np.int32)
    tgt = np.full((B_all, T), 1, np.int32)
    mask = np.zeros((B_all, T), np.float32)
    for b, s in enumerate(seqs):
        ws = [int(w) + 2 for w in s]
        inp[b, 1: 1 + len(ws)] = ws
        tgt[b, : len(ws)] = ws
        tgt[b, len(ws)] = 1
        mask[b, : len(ws) + 1] = 1.0
    rng = np.random.default_rng(opts.seed)
    params = model.init(jax.random.PRNGKey(opts.seed),
                        jnp.zeros((1, T), jnp.int32))["params"]
    tx = optax.chain(
        optax.clip_by_global_norm(5.0),  # LSTM grads explode without this
        optax.adam(opts.learning_rate),
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, bi, bt, bm):
        def loss_fn(p):
            logits = model.apply({"params": p}, bi)
            lp = jax.nn.log_softmax(logits, axis=-1)
            tok = jnp.take_along_axis(lp, bt[:, :, None], axis=2)[:, :, 0]
            return -jnp.sum(tok * bm) / jnp.maximum(jnp.sum(bm), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    n = len(seqs)
    for epoch in range(opts.num_epochs):
        order = rng.permutation(n)
        losses = []
        for i in range(0, n, opts.batch_size):
            sel = order[i: i + opts.batch_size]
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(inp[sel]),
                jnp.asarray(tgt[sel]), jnp.asarray(mask[sel]),
            )
            losses.append(float(loss))
        log.info("rnnlm epoch %d: ppl %.2f", epoch,
                 float(np.exp(np.mean(losses))))
    return RnnLm(params=jax.tree.map(np.asarray, params), opts=opts,
                 vocab=vocab)


def rescore_nbest_rnnlm(
    nbest: Sequence[Tuple[List[int], float]],
    rnnlm: RnnLm,
    old_lm_score,
    rnnlm_scale: float = 1.0,
) -> List[Tuple[List[int], float]]:
    """~ the reference's RNNLM N-best rescoring: replace the old LM score
    with rnnlm_scale·(−log P_rnn) on every hypothesis, batched in one
    forward pass."""
    if not nbest:
        return []
    lps = rnnlm.logprobs_batch([w for w, _ in nbest])
    out = []
    for (words, cost), lp in zip(nbest, lps):
        out.append(
            (words, cost - old_lm_score(words) + rnnlm_scale * float(-lp))
        )
    out.sort(key=lambda x: x[1])
    return out


def save_rnnlm(lm: RnnLm, path: str) -> None:
    import pickle

    with open(path, "wb") as f:
        pickle.dump({"kind": "rnnlm",
                     "params": jax.tree.map(np.asarray, lm.params),
                     "opts": lm.opts, "vocab": lm.vocab}, f)


def load_rnnlm(path: str) -> RnnLm:
    import pickle

    with open(path, "rb") as f:
        d = pickle.load(f)
    return RnnLm(d["params"], d["opts"], d["vocab"])
