"""TDNN and factored TDNN (TDNN-F) acoustic models.

Parity with reference src/nnet3 component zoo as used by the standard
recipes (SURVEY.md §2.6): Append/Offset splicing (nnet-descriptor.h) is a
static time-gather; relu-batchnorm layers (RectifiedLinear + Batchnorm
components); TDNN-F factorized layers with semi-orthogonal constraint
(nnet-utils.cc ConstrainOrthonormal) and scaled bypass; LogSoftmax output.

Everything is a flax.linen module over [B, T, D] with static splice offsets;
XLA fuses the gathers into the matmuls (no nnet3 computation compiler —
SURVEY.md §7.2 M6 note).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def splice(x: jnp.ndarray, offsets: Sequence[int]) -> jnp.ndarray:
    """Append(Offset(x, o) for o in offsets): [B, T, D] → [B, T, D*len]."""
    T = x.shape[-2]
    pieces = []
    for o in offsets:
        idx = np.clip(np.arange(T) + o, 0, T - 1)
        pieces.append(x[..., idx, :])
    return jnp.concatenate(pieces, axis=-1)


@dataclasses.dataclass(frozen=True)
class TdnnLayerSpec:
    kind: str  # "tdnn" | "tdnnf" | "lstmp" | "blstmp" | "pgru" | "attention" | "conv"
    dim: int  # output dim (tdnn/tdnnf), cell dim (lstmp/blstmp/pgru), filters (conv)
    offsets: Tuple[int, ...] = (0,)  # time offsets (tdnn splice / conv kernel)
    # general nnet3 Descriptor input (nnet-descriptor.h): named cross-layer
    # references, Sum/Scale/Const, IfDefined/Failover, Round, ReplaceIndex.
    # Empty = sequential (previous layer, spliced by `offsets`).  Access via
    # getattr(spec, "input_desc", "") — configs pickled before this field
    # existed lack it.
    input_desc: str = ""
    name: str = ""  # xconfig node name ("" = <kind><index>)
    bottleneck_dim: int = 0  # tdnnf only
    time_stride: int = 1  # tdnnf: factor context; attention: window stride
    bypass_scale: float = 0.66  # tdnnf
    dropout: float = 0.0
    recurrent_dim: int = 0  # lstmp/blstmp projection (0 → dim // 4)
    nonrecurrent_dim: int = 0
    num_heads: int = 4  # attention
    key_dim: int = 40
    value_dim: int = 60
    num_left_inputs: int = 5
    num_right_inputs: int = 2
    height_in: int = 0  # conv: input interpreted as [.., height_in, D//height_in]
    height_offsets: Tuple[int, ...] = (-1, 0, 1)  # conv kernel over height
    height_subsample: int = 1  # conv: stride over height


@dataclasses.dataclass(frozen=True)
class TdnnConfig:
    input_dim: int
    num_outputs: int  # pdfs
    layers: Tuple[TdnnLayerSpec, ...]
    final_hidden_dim: int = 0  # prefinal layer (0 = none)

    @property
    def left_context(self) -> int:
        return -sum(min(0, min(self._offs(l))) for l in self.layers)

    @property
    def right_context(self) -> int:
        return sum(max(0, max(self._offs(l))) for l in self.layers)

    @staticmethod
    def _offs(l: TdnnLayerSpec) -> Tuple[int, ...]:
        intrinsic: Tuple[int, ...]
        if l.kind == "tdnnf" and l.time_stride:
            intrinsic = (-l.time_stride, 0, l.time_stride)
        elif l.kind == "attention":
            intrinsic = (
                -l.num_left_inputs * l.time_stride,
                l.num_right_inputs * l.time_stride,
            )
        elif l.kind in ("lstmp", "blstmp", "pgru"):
            intrinsic = (0,)  # recurrent context is unbounded, not spliced
        else:
            intrinsic = l.offsets  # tdnn splice / conv time taps
        desc = getattr(l, "input_desc", "")
        if desc:
            from old_kaldi_git_tpu.models.descriptor import (
                offset_range,
                parse_descriptor,
            )

            lo, hi = offset_range(parse_descriptor(desc))
            return (lo + min(intrinsic), hi + max(intrinsic))
        return intrinsic


def ng_dense(mod: nn.Module, name: str, features: int, x,
             ng_collect: bool, use_bias: bool = True):
    """Dense with optional NG-SGD instrumentation (reference
    natural-gradient-online.cc estimates the Fisher factors from the
    affine component's INPUT rows and OUTPUT-DERIVATIVE rows, not from
    the aggregated gradient).  When `ng_collect` is set: the input rows
    are sowed into the 'ng_in' collection and the output passes through a
    zero flax perturbation, so grad wrt the 'perturbations' collection
    yields the per-row output derivatives — the two streams
    models/natural_gradient.py activation_fisher_stats consumes.  The
    sow/perturb names are the Dense module name + '_in'/'_out' (flax
    reserves bare names per scope across collections), so the stats tree
    aligns with the param tree path-for-path after stripping the
    suffix."""
    if ng_collect:
        mod.sow("ng_in", f"{name}_in", x)
    y = nn.Dense(features, use_bias=use_bias, name=name)(x)
    if ng_collect:
        y = mod.perturb(f"{name}_out", y)
    return y


class ReluBatchNorm(nn.Module):
    """relu-batchnorm-layer: Affine → ReLU → BatchNorm (no scale/offset,
    like the reference BatchNormComponent)."""

    dim: int
    offsets: Tuple[int, ...] = (0,)

    @nn.compact
    def __call__(self, x, train: bool = False, ng_collect: bool = False):
        x = splice(x, self.offsets)
        x = ng_dense(self, "affine", self.dim, x, ng_collect)
        x = nn.relu(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            use_bias=False,
            use_scale=False,
            momentum=0.99,
            axis_name=None,
            name="batchnorm",
        )(x)
        return x


class TimeHeightConvLayer(nn.Module):
    """Time-height convolution (reference
    nnet-convolutional-component.{h,cc} TimeHeightConvolutionComponent) +
    ReLU + BatchNorm, the CNN-TDNN front-end layer.

    The input feature vector is a [height_in, channels] grid (e.g. 40 mel
    bins x 1).  Convolution is expressed the TPU-native way: gather the
    (time_offset, height_offset) taps — edge-replication over time like
    every other layer's splice, zero padding over height — concatenate as
    channels, then one shared Dense = the convolution as a single MXU
    matmul (exactly how the reference lowers conv to PrecomputedIndexes +
    AddRows + matrix multiply, but fused by XLA instead of scheduled by
    the nnet3 compiler)."""

    num_filters: int
    height_in: int
    time_offsets: Tuple[int, ...] = (-1, 0, 1)
    height_offsets: Tuple[int, ...] = (-1, 0, 1)
    height_subsample: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False, ng_collect: bool = False):
        B, T, D = x.shape
        H = self.height_in
        if D % H:
            raise ValueError(f"input dim {D} not divisible by height {H}")
        C = D // H
        nt = len(self.time_offsets)
        xt = splice(x, self.time_offsets)  # [B, T, nt*H*C]
        x4 = xt.reshape(B, T, nt, H, C)
        taps = []
        for o in self.height_offsets:
            idx = np.arange(H) + o
            valid = (idx >= 0) & (idx < H)
            gathered = x4[:, :, :, np.clip(idx, 0, H - 1), :]
            taps.append(gathered * valid[None, None, None, :, None])
        # [B, T, H, nt*nh*C]: kernel taps as channels per (t, h) position
        y = jnp.concatenate(taps, axis=-1).transpose(0, 1, 3, 2, 4)
        y = y.reshape(B, T, H, nt * len(self.height_offsets) * C)
        y = ng_dense(self, "conv", self.num_filters, y,
                     ng_collect)  # shared over h
        y = y[:, :, ::self.height_subsample, :]
        y = y.reshape(B, T, -1)
        y = nn.relu(y)
        y = nn.BatchNorm(
            use_running_average=not train,
            use_bias=False,
            use_scale=False,
            momentum=0.99,
            name="batchnorm",
        )(y)
        return y


class TdnnfLayer(nn.Module):
    """Factored TDNN layer (reference TdnnComponent pairs in tdnnf recipes):
    linear-to-bottleneck with time context (semi-orthogonal), linear back up
    with time context, ReLU+BatchNorm, scaled residual bypass."""

    dim: int
    bottleneck_dim: int
    time_stride: int = 1
    bypass_scale: float = 0.66
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False, dropout_rng=None,
                 ng_collect: bool = False):
        ts = self.time_stride
        down_offsets = (-ts, 0) if ts else (0,)
        up_offsets = (0, ts) if ts else (0,)
        y = splice(x, down_offsets)
        # the "linear" factor, constrained semi-orthogonal during training
        y = ng_dense(self, "linear", self.bottleneck_dim, y, ng_collect,
                     use_bias=False)
        y = splice(y, up_offsets)
        y = ng_dense(self, "affine", self.dim, y, ng_collect)
        y = nn.relu(y)
        y = nn.BatchNorm(
            use_running_average=not train,
            use_bias=False,
            use_scale=False,
            momentum=0.99,
            name="batchnorm",
        )(y)
        if self.dropout > 0 and train:
            y = nn.Dropout(self.dropout, deterministic=False)(
                y, rng=dropout_rng
            )
        if x.shape[-1] == self.dim:
            y = y + self.bypass_scale * x
        return y


class TdnnModel(nn.Module):
    """Executes a TdnnConfig: sequential by default; layers carrying an
    `input_desc` Descriptor read any earlier node by name (skip
    connections, Failover'd recurrent edges, Round'd subsampled stacks —
    reference nnet3 DAG wiring, nnet-descriptor.h), evaluated as static
    gathers that XLA folds into the adjacent matmuls."""

    config: TdnnConfig

    @nn.compact
    def __call__(self, feats, train: bool = False, dropout_rng=None,
                 ng_collect: bool = False, output_stride: int = 1):
        x = feats
        env = {"input": feats, "__prev__": feats}
        # earliest tail position from which every remaining layer is a
        # sequential (desc-free) tdnn/tdnnf whose time offsets are all
        # multiples of output_stride: subsampling THERE is exact, and the
        # tail trunk runs at T/stride instead of computing every frame
        # and discarding stride-1 of stride at the end (reference nnet3
        # compiles only the needed frames past the stride-3 point —
        # nnet-computation-graph.cc dependency closure over Indexes)
        stride_at = len(self.config.layers)
        if output_stride > 1:
            for j in range(len(self.config.layers), 0, -1):
                spec = self.config.layers[j - 1]
                if getattr(spec, "input_desc", ""):
                    break
                if spec.kind == "tdnn":
                    if any(o % output_stride for o in spec.offsets):
                        break
                elif spec.kind == "tdnnf":
                    if spec.time_stride % output_stride:
                        break
                else:
                    break
                stride_at = j - 1
        sub = 1  # subsampling already applied to the running sequence
        for i, spec in enumerate(self.config.layers):
            if output_stride > 1 and i == stride_at:
                x = x[:, ::output_stride]
                env["__prev__"] = x
                sub = output_stride
            desc = getattr(spec, "input_desc", "")
            if desc:
                from old_kaldi_git_tpu.models.descriptor import (
                    eval_descriptor,
                    parse_descriptor,
                )

                x, _defined = eval_descriptor(
                    parse_descriptor(desc), env, xp=jnp)
            if spec.kind == "tdnn":
                offs = (0,) if desc else tuple(o // sub for o in spec.offsets)
                x = ReluBatchNorm(
                    spec.dim, offs, name=f"tdnn{i}"
                )(x, train=train, ng_collect=ng_collect)
            elif spec.kind == "tdnnf":
                x = TdnnfLayer(
                    spec.dim,
                    spec.bottleneck_dim,
                    spec.time_stride // sub,
                    spec.bypass_scale,
                    spec.dropout,
                    name=f"tdnnf{i}",
                )(x, train=train, dropout_rng=dropout_rng,
                  ng_collect=ng_collect)
            elif spec.kind in ("lstmp", "blstmp"):
                from old_kaldi_git_tpu.models.recurrent import (
                    BlstmpLayer,
                    LstmpLayer,
                )

                rec = spec.recurrent_dim or max(1, spec.dim // 4)
                cls = LstmpLayer if spec.kind == "lstmp" else BlstmpLayer
                x = cls(
                    spec.dim, rec, spec.nonrecurrent_dim, name=f"{spec.kind}{i}"
                )(x, train=train)
            elif spec.kind == "pgru":
                from old_kaldi_git_tpu.models.recurrent import GruLayer

                rec = spec.recurrent_dim or max(1, spec.dim // 4)
                x = GruLayer(
                    spec.dim, rec, spec.nonrecurrent_dim, name=f"pgru{i}"
                )(x, train=train)
            elif spec.kind == "attention":
                from old_kaldi_git_tpu.models.recurrent import (
                    RestrictedAttentionLayer,
                )

                x = RestrictedAttentionLayer(
                    spec.num_heads, spec.key_dim, spec.value_dim,
                    spec.num_left_inputs, spec.num_right_inputs,
                    spec.time_stride, name=f"attention{i}",
                )(x, train=train)
            elif spec.kind == "conv":
                x = TimeHeightConvLayer(
                    spec.dim, spec.height_in, spec.offsets,
                    spec.height_offsets, spec.height_subsample,
                    name=f"conv{i}",
                )(x, train=train, ng_collect=ng_collect)
            else:
                raise ValueError(f"unknown layer kind {spec.kind}")
            env["__prev__"] = x
            env[f"{spec.kind}{i}"] = x
            if getattr(spec, "name", ""):
                env[spec.name] = x
        if output_stride > sub:
            # frame-subsampled output (reference --frame-subsampling-factor
            # in nnet3-latgen-faster / chain egs): the prefinal + output
            # affines — the widest matmuls — run only at the subsampled
            # frames instead of computing 3x and discarding 2/3 (when the
            # trunk could not be subsampled earlier, i.e. stride-1 layers
            # all the way up)
            x = x[:, ::output_stride]
        if self.config.final_hidden_dim:
            x = ReluBatchNorm(self.config.final_hidden_dim, (0,), name="prefinal")(
                x, train=train, ng_collect=ng_collect
            )
        # recurrent/attention layers are not NG-instrumented (the reference
        # preconditions the affine components; its LSTM/attention
        # components carry their own update rules)
        x = ng_dense(self, "output", self.config.num_outputs, x, ng_collect)
        return x  # raw logits; log-softmax applied by the loss / decodable


def make_tdnn(
    input_dim: int,
    num_outputs: int,
    hidden_dim: int = 512,
    num_layers: int = 5,
    splice_context: int = 1,
) -> TdnnConfig:
    """Plain TDNN à la steps/nnet3 tdnn recipes: interleaved ±context."""
    layers = []
    for i in range(num_layers):
        offs = tuple(range(-splice_context, splice_context + 1)) if i % 2 == 0 else (0,)
        layers.append(TdnnLayerSpec("tdnn", hidden_dim, offs))
    return TdnnConfig(input_dim, num_outputs, tuple(layers))


def make_tdnnf(
    input_dim: int,
    num_outputs: int,
    hidden_dim: int = 768,
    bottleneck_dim: int = 96,
    num_layers: int = 9,
    time_stride: int = 1,
    subsampled_stride: int = 0,
    num_full_rate_layers: int = 3,
) -> TdnnConfig:
    """TDNN-F stack à la the chain tdnn_1d recipes (first layer time-stride 1,
    layer 2 stride 0 in some recipes — we keep uniform stride for simplicity).

    subsampled_stride > 0 gives the chain-net stride pattern (reference
    egs/librispeech tdnn_1d xconfig: tdnnf layers at time-stride 1 up
    front, the rest at stride 3): tdnnf layers past num_full_rate_layers
    use that stride, so under output_stride=subsampled_stride the trunk
    past the switch point runs at the subsampled frame rate (TdnnModel
    subsamples at the earliest stride-divisible tail position)."""
    layers = [TdnnLayerSpec("tdnn", hidden_dim, (-1, 0, 1))]
    for i in range(num_layers - 1):
        ts = time_stride
        if subsampled_stride and i + 1 > num_full_rate_layers:
            ts = subsampled_stride
        layers.append(
            TdnnLayerSpec(
                "tdnnf", hidden_dim, offsets=(0,), bottleneck_dim=bottleneck_dim,
                time_stride=ts,
            )
        )
    return TdnnConfig(input_dim, num_outputs, tuple(layers), final_hidden_dim=hidden_dim)


def make_tdnn_lstm(
    input_dim: int,
    num_outputs: int,
    hidden_dim: int = 512,
    cell_dim: int = 512,
    recurrent_dim: int = 128,
    num_blocks: int = 3,
) -> TdnnConfig:
    """TDNN-LSTM à la the tdnn_lstm chain recipes: blocks of two spliced
    TDNN layers followed by an LSTMP layer."""
    layers: list = [TdnnLayerSpec("tdnn", hidden_dim, (-1, 0, 1))]
    for _ in range(num_blocks):
        layers.append(TdnnLayerSpec("tdnn", hidden_dim, (-1, 0, 1)))
        layers.append(TdnnLayerSpec("tdnn", hidden_dim, (-1, 0, 1)))
        layers.append(
            TdnnLayerSpec("lstmp", cell_dim, recurrent_dim=recurrent_dim)
        )
    return TdnnConfig(input_dim, num_outputs, tuple(layers))


def make_tdnn_attention(
    input_dim: int,
    num_outputs: int,
    hidden_dim: int = 512,
    num_layers: int = 5,
    num_heads: int = 4,
    key_dim: int = 40,
    value_dim: int = 60,
) -> TdnnConfig:
    """TDNN stack with a time-restricted attention layer near the top
    (reference's attention recipes, RestrictedAttentionComponent)."""
    layers = [
        TdnnLayerSpec("tdnn", hidden_dim, (-1, 0, 1)) for _ in range(num_layers - 1)
    ]
    layers.append(
        TdnnLayerSpec(
            "attention", hidden_dim, num_heads=num_heads, key_dim=key_dim,
            value_dim=value_dim, num_left_inputs=5, num_right_inputs=2,
        )
    )
    return TdnnConfig(
        input_dim, num_outputs, tuple(layers), final_hidden_dim=hidden_dim
    )


# ---------------------------------------------------------------------------
# semi-orthogonal constraint (reference nnet-utils.cc ConstrainOrthonormal)
# ---------------------------------------------------------------------------

def constrain_orthonormal(w: jnp.ndarray, scale: float = 0.0) -> jnp.ndarray:
    """One step of the constrained-orthonormal update: for M [rows ≤ cols],
    M ← M - 1/(2σ²) (MMᵀ - σ²I) M where σ² = tr(MMᵀMMᵀ)/tr(MMᵀ) ("floating"
    scale, reference scale < 0 case used by tdnnf)."""
    transpose = w.shape[0] > w.shape[1]
    m = w.T if transpose else w
    mmt = m @ m.T
    if scale <= 0.0:
        trace_mmt = jnp.trace(mmt)
        trace_mmt2 = jnp.sum(mmt * mmt)
        sigma2 = trace_mmt2 / jnp.maximum(trace_mmt, 1e-10)
    else:
        sigma2 = jnp.asarray(scale * scale, w.dtype)
    ident = jnp.eye(mmt.shape[0], dtype=w.dtype) * sigma2
    update = (mmt - ident) @ m
    m = m - (0.25 / sigma2) * update
    return m.T if transpose else m


def apply_orthonormal_constraints(params, every_name: str = "linear") -> object:
    """Apply constrain_orthonormal to every kernel under a module named
    `every_name` (the tdnnf bottleneck factors)."""

    def walk(tree, under_linear=False):
        if isinstance(tree, dict):
            return {
                k: walk(
                    v, under_linear=(k == every_name) or under_linear
                )
                for k, v in tree.items()
            }
        if under_linear and hasattr(tree, "ndim") and tree.ndim == 2:
            return constrain_orthonormal(tree)
        return tree

    return walk(params)


def make_cnn_tdnnf(
    input_dim: int,
    num_outputs: int,
    height: int = 40,
    num_filters: Tuple[int, ...] = (32, 64),
    hidden_dim: int = 768,
    bottleneck_dim: int = 96,
    num_tdnnf_layers: int = 6,
    time_stride: int = 1,
) -> TdnnConfig:
    """CNN-TDNN-F à la the cnn_tdnn chain recipes: time-height conv
    front-end (halving the height each conv layer) over the mel grid, then
    a TDNN-F stack."""
    if input_dim % height:
        raise ValueError(f"input dim {input_dim} not divisible by {height}")
    layers = []
    h = height
    for f in num_filters:
        layers.append(TdnnLayerSpec(
            "conv", f, offsets=(-1, 0, 1), height_in=h,
            height_offsets=(-1, 0, 1), height_subsample=2))
        h = (h + 1) // 2
    layers.append(TdnnLayerSpec("tdnn", hidden_dim, (-1, 0, 1)))
    for _ in range(num_tdnnf_layers):
        layers.append(TdnnLayerSpec(
            "tdnnf", hidden_dim, offsets=(0,), bottleneck_dim=bottleneck_dim,
            time_stride=time_stride))
    return TdnnConfig(input_dim, num_outputs, tuple(layers),
                      final_hidden_dim=hidden_dim)
