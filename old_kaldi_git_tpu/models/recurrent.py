"""Recurrent + attention acoustic-model components.

Reference parity (SURVEY.md §2.6 src/nnet3):
  nnet-combined-component.{h,cc} LstmNonlinearityComponent + the xconfig
      `lstmp-layer` wiring (gates, cell clipping, recurrent + non-recurrent
      projection) → LstmpLayer here (one lax.scan over time; the reference
      builds the recurrence out of Descriptor offsets and per-frame matmuls,
      which XLA's scan replaces wholesale);
  `fast-lstmp-layer` decay/scale conventions are folded into the same cell;
  bidirectional recipes (blstm) → BlstmpLayer (two scans, concat);
  nnet-attention-component.{h,cc} RestrictedAttentionComponent →
      RestrictedAttentionLayer: per-head time-restricted self-attention over
      a fixed local window (static gathers + one softmax — no dynamic
      shapes, MXU-friendly).

All layers map [B, T, D] → [B, T, D'] and compose with the TDNN(-F) stack
in models/tdnn.py (mixed TDNN-LSTM/attention recipes).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class LstmpCell(nn.Module):
    """One step: (c, r), x_t → (c', r'), y where y = [r'; p] (projection)."""

    cell_dim: int
    recurrent_dim: int
    nonrecurrent_dim: int = 0
    cell_clip: float = 50.0

    @nn.compact
    def __call__(self, carry, x_t):
        c, r = carry
        z = nn.Dense(4 * self.cell_dim, name="gates")(
            jnp.concatenate([x_t, r], axis=-1)
        )
        i, f, g, o = jnp.split(z, 4, axis=-1)
        # forget-gate bias +1: standard init the reference also uses
        c_new = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        c_new = jnp.clip(c_new, -self.cell_clip, self.cell_clip)
        m = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        y = nn.Dense(
            self.recurrent_dim + self.nonrecurrent_dim, use_bias=False,
            name="proj",
        )(m)
        r_new = y[..., : self.recurrent_dim]
        return (c_new, r_new), y


class LstmpLayer(nn.Module):
    """LSTM with projection; [B, T, D] → [B, T, rec+nonrec]."""

    cell_dim: int
    recurrent_dim: int
    nonrecurrent_dim: int = 0
    cell_clip: float = 50.0
    reverse: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, initial_carry=None,
                 return_carry: bool = False):
        """initial_carry/return_carry: the streaming ('looped') seam — carry
        the (c, r) state across chunk boundaries (reference
        nnet-compile-looped.cc keeps recurrent state between chunks).
        Only meaningful for the forward direction."""
        B = x.shape[0]
        if self.reverse:
            if initial_carry is not None or return_carry:
                raise ValueError("carried state unsupported for reverse scan")
            x = x[:, ::-1]
        scan = nn.scan(
            LstmpCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        init = initial_carry if initial_carry is not None else (
            jnp.zeros((B, self.cell_dim), x.dtype),
            jnp.zeros((B, self.recurrent_dim), x.dtype),
        )
        carry, y = scan(
            self.cell_dim, self.recurrent_dim, self.nonrecurrent_dim,
            self.cell_clip, name="cell",
        )(init, x)
        if self.reverse:
            y = y[:, ::-1]
        return (y, carry) if return_carry else y


class GruCell(nn.Module):
    """One projected-GRU step (reference nnet-combined-component.{h,cc}
    GruNonlinearityComponent / OutputGruComponent + the xconfig
    pgru-layer wiring): carry (c, r), x_t → (c', r'), y.

      z = σ(W_z [x; r])                 update gate
      g = σ(W_r [x; r])                 reset gate
      h = tanh(W_h [x; g ⊙ r])          candidate
      c' = (1 − z) ⊙ h + z ⊙ c          cell (dim = cell_dim)
      y = W_p c'  (no bias)             projection [rec + nonrec]
      r' = y[:rec]

    Same (c, r) carry structure and projection convention as LstmpCell, so
    the streaming chunk seam is shared."""

    cell_dim: int
    recurrent_dim: int
    nonrecurrent_dim: int = 0

    @nn.compact
    def __call__(self, carry, x_t):
        c, r = carry
        xr = jnp.concatenate([x_t, r], axis=-1)
        z = jax.nn.sigmoid(nn.Dense(self.cell_dim, name="update")(xr))
        # reset gate acts on the projected recurrence (dim rec, not cell)
        gate_r = jax.nn.sigmoid(
            nn.Dense(self.recurrent_dim, name="reset")(xr))
        h = jnp.tanh(
            nn.Dense(self.cell_dim, name="cand")(
                jnp.concatenate([x_t, gate_r * r], axis=-1)))
        c_new = (1.0 - z) * h + z * c
        y = nn.Dense(
            self.recurrent_dim + self.nonrecurrent_dim, use_bias=False,
            name="proj",
        )(c_new)
        r_new = y[..., : self.recurrent_dim]
        return (c_new, r_new), y


class GruLayer(nn.Module):
    """Projected GRU; [B, T, D] → [B, T, rec+nonrec].  Same carry seam as
    LstmpLayer (initial_carry/return_carry for streaming chunks)."""

    cell_dim: int
    recurrent_dim: int
    nonrecurrent_dim: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False, initial_carry=None,
                 return_carry: bool = False):
        B = x.shape[0]
        scan = nn.scan(
            GruCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        init = initial_carry if initial_carry is not None else (
            jnp.zeros((B, self.cell_dim), x.dtype),
            jnp.zeros((B, self.recurrent_dim), x.dtype),
        )
        carry, y = scan(
            self.cell_dim, self.recurrent_dim, self.nonrecurrent_dim,
            name="cell",
        )(init, x)
        return (y, carry) if return_carry else y


class BlstmpLayer(nn.Module):
    """Bidirectional LSTMP: forward + backward scans, concatenated."""

    cell_dim: int
    recurrent_dim: int
    nonrecurrent_dim: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        fwd = LstmpLayer(
            self.cell_dim, self.recurrent_dim, self.nonrecurrent_dim,
            name="forward",
        )(x, train=train)
        bwd = LstmpLayer(
            self.cell_dim, self.recurrent_dim, self.nonrecurrent_dim,
            reverse=True, name="backward",
        )(x, train=train)
        return jnp.concatenate([fwd, bwd], axis=-1)


class RestrictedAttentionLayer(nn.Module):
    """Time-restricted multi-head self-attention.

    Head h at frame t attends over offsets
      {-num_left_inputs·s, …, 0, …, +num_right_inputs·s} (s = time_stride)
    with scores q_t·k_{t+o}/sqrt(key_dim); optionally the attention weights
    themselves are appended to the output (reference output_context=true).
    Edges clamp to the first/last frame (same convention as splice())."""

    num_heads: int = 4
    key_dim: int = 40
    value_dim: int = 60
    num_left_inputs: int = 5
    num_right_inputs: int = 2
    time_stride: int = 1
    output_context: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, T, _ = x.shape
        H, K, V = self.num_heads, self.key_dim, self.value_dim
        offsets = [
            o * self.time_stride
            for o in range(-self.num_left_inputs, self.num_right_inputs + 1)
        ]
        W = len(offsets)
        qkv = nn.Dense(H * (2 * K + V), name="qkv")(x)
        qkv = qkv.reshape(B, T, H, 2 * K + V)
        q = qkv[..., :K]  # [B, T, H, K]
        k = qkv[..., K: 2 * K]
        v = qkv[..., 2 * K:]

        def shift(a, o):
            idx = np.clip(np.arange(T) + o, 0, T - 1)
            return a[:, idx]

        k_win = jnp.stack([shift(k, o) for o in offsets], axis=2)  # [B,T,W,H,K]
        v_win = jnp.stack([shift(v, o) for o in offsets], axis=2)  # [B,T,W,H,V]
        scores = jnp.einsum("bthk,btwhk->btwh", q, k_win) / np.sqrt(K)
        w = jax.nn.softmax(scores, axis=2)  # [B, T, W, H]
        out = jnp.einsum("btwh,btwhv->bthv", w, v_win)  # [B, T, H, V]
        out = out.reshape(B, T, H * V)
        if self.output_context:
            out = jnp.concatenate(
                [out, w.transpose(0, 1, 3, 2).reshape(B, T, H * W)], axis=-1
            )
        return out
