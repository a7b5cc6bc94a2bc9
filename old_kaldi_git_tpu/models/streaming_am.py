"""Streaming ('looped') evaluation of nnet3-style models with carried state.

Reference parity (SURVEY.md §2.6 + §5 long-context row):
src/nnet3/nnet-compile-looped.cc + decodable-online-looped.{h,cc} — the
reference compiles a steady-state computation once and iterates it,
carrying recurrent state across chunks so unbounded streams decode in O(T).

TPU shape: each layer becomes a small streaming node —
- finite-context layers (tdnn / tdnnf / attention / prefinal / output)
  keep a short input-history buffer and emit an output frame as soon as its
  full receptive field has arrived (outputs are delayed by the layer's
  right context; edge clamping matches splice(), so chunked streaming
  output == whole-utterance output EXACTLY);
- lstmp layers carry their (c, r) scan state (1:1, no delay);
- blstmp is rejected (a backward scan cannot stream).

The whole stack composes into StreamingAmNnet: feed feature frames, get
loglike frames out (total latency = sum of layer right contexts — the same
'extra-right-context' the reference's online decodable pays).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from old_kaldi_git_tpu.models.am_nnet import AmNnet
from old_kaldi_git_tpu.models.tdnn import ReluBatchNorm, TdnnfLayer
from old_kaldi_git_tpu.utils.log import get_logger

log = get_logger("streaming-am")


class _FiniteCtxStream:
    """Streaming wrapper for a translation-invariant layer with left/right
    context (l, r): buffers input frames, emits outputs whose receptive
    field is complete.  apply_fn: [1, T, D] → [1, T, D']."""

    # slice lengths are padded (edge-replicated) up to a multiple of this,
    # so each layer compiles a bounded set of XLA shapes instead of one per
    # distinct chunk length (variable shapes re-trigger compilation)
    QUANTUM = 32

    def __init__(self, apply_fn, lctx: int, rctx: int):
        import jax

        # jit per layer: the padded-shape set is bounded, so each layer
        # compiles a handful of programs instead of eager op dispatch
        self.apply = jax.jit(apply_fn)
        self.l = lctx
        self.r = rctx
        self.hist: Optional[np.ndarray] = None  # retained input frames
        self.base = 0  # stream index of hist[0]
        self.n_emitted = 0

    def feed(self, frames: np.ndarray, final: bool = False) -> np.ndarray:
        if frames.size:
            self.hist = (frames.copy() if self.hist is None
                         else np.concatenate([self.hist, frames]))
        if self.hist is None:
            return np.zeros((0, 0), np.float32)
        total = self.base + len(self.hist)
        emit_upto = total if final else max(self.n_emitted, total - self.r)
        n_new = emit_upto - self.n_emitted
        if n_new <= 0:
            return np.zeros((0, 0), np.float32)
        # slice with full left context (or the true stream start, where
        # splice's clamp-to-first-frame IS the offline behavior) and full
        # right context (true end when final)
        lo = max(0, self.n_emitted - self.l)
        hi = min(total, emit_upto - 1 + self.r) + 1
        x = self.hist[lo - self.base: hi - self.base]
        q = self.QUANTUM
        n = x.shape[0]
        n_pad = (n + q - 1) // q * q
        if n_pad != n and not final:
            # mid-stream, every emitted output's receptive field lies in the
            # REAL frames (hi covers full right context), so end padding only
            # feeds outputs we discard — pad freely to bound the XLA shape
            # set.  On final=True the end-clamping region IS emitted, and for
            # composed splices (tdnnf) clamped indices ≠ replicated frames —
            # run the exact length there (one odd shape per stream end).
            x = np.concatenate([x, np.repeat(x[-1:], n_pad - n, axis=0)])
        y = np.asarray(self.apply(jnp.asarray(x[None])))[0]
        out = y[self.n_emitted - lo: emit_upto - lo]
        self.n_emitted = emit_upto
        # retain only what future outputs still need
        keep_from = max(self.base, emit_upto - self.l)
        self.hist = self.hist[keep_from - self.base:]
        self.base = keep_from
        return out


class _LstmpStream:
    """Carried-state LSTMP: 1:1 frames, output delayed up to QUANTUM-1
    frames mid-stream (inputs are consumed in fixed-size pieces so the
    scan compiles for a bounded set of lengths; the remainder is flushed
    exactly on final)."""

    QUANTUM = 32

    def __init__(self, module, variables):
        import jax

        self.module = module
        self.variables = variables
        self.carry = (
            jnp.zeros((1, module.cell_dim), jnp.float32),
            jnp.zeros((1, module.recurrent_dim), jnp.float32),
        )
        self.pending: Optional[np.ndarray] = None
        self._jfn = jax.jit(
            lambda carry, x: module.apply(
                variables, x, initial_carry=carry, return_carry=True
            )
        )

    def _run(self, x: np.ndarray) -> np.ndarray:
        y, carry = self._jfn(self.carry, jnp.asarray(x[None]))
        self.carry = carry
        return np.asarray(y)[0]

    def feed(self, frames: np.ndarray, final: bool = False) -> np.ndarray:
        if frames.size:
            self.pending = (frames.copy() if self.pending is None
                            else np.concatenate([self.pending, frames]))
        if self.pending is None or not self.pending.size:
            return np.zeros((0, 0), np.float32)
        q = self.QUANTUM
        n_run = len(self.pending) if final else len(self.pending) // q * q
        if n_run == 0:
            return np.zeros((0, 0), np.float32)
        out = self._run(self.pending[:n_run])
        self.pending = self.pending[n_run:]
        return out


class StreamingAmNnet:
    """Feed features chunk-wise, receive loglike frames (delayed by the
    model's total right context); equals loglikes_batch exactly."""

    def __init__(self, am: AmNnet):
        self.am = am
        cfg = am.config
        params = am.variables["params"]
        batch_stats = am.variables.get("batch_stats", {})

        def layer_vars(name):
            v = {"params": params[name]}
            if name in batch_stats:
                v["batch_stats"] = batch_stats[name]
            return v

        self.streams: List[object] = []
        for i, spec in enumerate(cfg.layers):
            if spec.kind == "tdnn":
                name = f"tdnn{i}"
                mod = ReluBatchNorm(spec.dim, spec.offsets)
                v = layer_vars(name)
                self.streams.append(_FiniteCtxStream(
                    lambda x, mod=mod, v=v: mod.apply(v, x, train=False),
                    max(0, -min(spec.offsets)), max(0, max(spec.offsets)),
                ))
            elif spec.kind == "tdnnf":
                name = f"tdnnf{i}"
                mod = TdnnfLayer(spec.dim, spec.bottleneck_dim,
                                 spec.time_stride, spec.bypass_scale, 0.0)
                v = layer_vars(name)
                ts = spec.time_stride
                self.streams.append(_FiniteCtxStream(
                    lambda x, mod=mod, v=v: mod.apply(v, x, train=False),
                    ts, ts,
                ))
            elif spec.kind == "lstmp":
                from old_kaldi_git_tpu.models.recurrent import LstmpLayer

                name = f"lstmp{i}"
                rec = spec.recurrent_dim or max(1, spec.dim // 4)
                mod = LstmpLayer(spec.dim, rec, spec.nonrecurrent_dim)
                self.streams.append(_LstmpStream(mod, layer_vars(name)))
            elif spec.kind == "pgru":
                from old_kaldi_git_tpu.models.recurrent import GruLayer

                name = f"pgru{i}"
                rec = spec.recurrent_dim or max(1, spec.dim // 4)
                mod = GruLayer(spec.dim, rec, spec.nonrecurrent_dim)
                # same (c, r) carry structure and chunk seam as LSTMP
                self.streams.append(_LstmpStream(mod, layer_vars(name)))
            elif spec.kind == "blstmp":
                raise ValueError(
                    "blstmp cannot stream (backward scan needs the future); "
                    "use whole-utterance evaluation"
                )
            elif spec.kind == "attention":
                from old_kaldi_git_tpu.models.recurrent import (
                    RestrictedAttentionLayer,
                )

                name = f"attention{i}"
                mod = RestrictedAttentionLayer(
                    spec.num_heads, spec.key_dim, spec.value_dim,
                    spec.num_left_inputs, spec.num_right_inputs,
                    spec.time_stride,
                )
                v = layer_vars(name)
                self.streams.append(_FiniteCtxStream(
                    lambda x, mod=mod, v=v: mod.apply(v, x, train=False),
                    spec.num_left_inputs * spec.time_stride,
                    spec.num_right_inputs * spec.time_stride,
                ))
            elif spec.kind == "conv":
                from old_kaldi_git_tpu.models.tdnn import TimeHeightConvLayer

                name = f"conv{i}"
                mod = TimeHeightConvLayer(
                    spec.dim, spec.height_in, spec.offsets,
                    spec.height_offsets, spec.height_subsample,
                )
                v = layer_vars(name)
                self.streams.append(_FiniteCtxStream(
                    lambda x, mod=mod, v=v: mod.apply(v, x, train=False),
                    max(0, -min(spec.offsets)), max(0, max(spec.offsets)),
                ))
            else:
                raise ValueError(f"unknown layer kind {spec.kind}")
        if cfg.final_hidden_dim:
            mod = ReluBatchNorm(cfg.final_hidden_dim, (0,))
            v = layer_vars("prefinal")
            self.streams.append(_FiniteCtxStream(
                lambda x, mod=mod, v=v: mod.apply(v, x, train=False), 0, 0,
            ))
        import flax.linen as nn

        out_mod = nn.Dense(cfg.num_outputs)
        out_v = layer_vars("output")
        self.streams.append(_FiniteCtxStream(
            lambda x: out_mod.apply(out_v, x), 0, 0,
        ))

    @property
    def total_right_context(self) -> int:
        return sum(getattr(s, "r", 0) for s in self.streams)

    def accept(self, feats: np.ndarray, final: bool = False) -> np.ndarray:
        """Feed [T, D] feature frames; returns newly final loglike frames
        [T', P] (log-softmax minus priors, like loglikes_batch)."""
        x = np.asarray(feats, np.float32)
        for s in self.streams:
            x = s.feed(x, final=final)
        if not x.size:
            return np.zeros((0, self.am.config.num_outputs), np.float32)
        import jax

        logp = jax.nn.log_softmax(jnp.asarray(x), axis=-1)
        if self.am.log_priors is not None:
            logp = logp - jnp.asarray(self.am.log_priors)
        return np.asarray(logp)
