"""Online natural-gradient (NG-SGD) preconditioning as an optax transform.

Reference parity (SURVEY.md §2.6): src/nnet3/natural-gradient-online.{h,cc}
(OnlineNaturalGradient, Povey et al. 2014 "Parallel training of DNNs with
natural gradient and parameter averaging").  The reference preconditions
each affine component's update on BOTH sides — the input (row) space and
the output-derivative (column) space — by the inverse of an online,
exponentially-decayed Fisher-factor estimate smoothed toward identity, then
renormalizes so the expected update magnitude is unchanged.  That
per-component decorrelation is what makes periodic model averaging across
jobs behave like synchronous SGD (§2.8 P3).

Two estimators are provided:

1. `scale_by_natural_gradient` — gradient-estimated factors
   (F_in ← (1-eta) F_in + eta·normalized(G Gᵀ), transposed for F_out): no
   model cooperation needed, composes with ANY jitted train step
   (recurrent nets included) — the XLA-native seam.
2. `scale_by_natural_gradient_activations` — the reference's actual
   estimator: F_in from the affine component's INPUT rows (with the bias
   column appended) and F_out from its OUTPUT-DERIVATIVE rows.  The rows
   are captured through the model (models/tdnn.py ng_dense: a 'ng_in' sow
   + a flax zero-perturbation whose gradient is the per-row output
   derivative), turned into per-layer factors by
   `activation_fisher_stats`, and threaded into the transform as the
   optax extra argument `ng_stats`.  optimizer="ng-sgd-act" in
   NnetTrainOptions wires the whole path.

TPU-shaped differences (deliberate, documented):
- The reference tracks a rank-R + identity factor updated from the
  minibatch's rank-one terms inside each component; here full [D, D]
  factors are kept: at TDNN widths (≤2k) a [D, D] factor is tiny next to
  the MXU matmuls, and eigendecompositions are amortized by
  `update_period` (the Shampoo-style trick).  The activation estimator
  row-subsamples each minibatch (deterministic stride) instead of
  rank-R-updating from every row.
- Smoothing and renormalization follow the reference: F_smooth = F +
  alpha·(tr(F)/D)·I, precondition G' = P_in G P_out with P = F_smooth⁻¹,
  then rescale G' to G's Frobenius norm (the reference's gamma scale, so
  the learning-rate semantics are untouched).

Only 2-D parameters are preconditioned; vectors (bias, batch-norm scales)
pass through — matching the reference, where OnlineNaturalGradient acts on
the affine components.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class _FactorState(NamedTuple):
    f_in: jnp.ndarray  # [din, din] decayed Fisher-factor estimate
    f_out: jnp.ndarray  # [dout, dout]
    p_in: jnp.ndarray  # [din, din] cached inverse preconditioner
    p_out: jnp.ndarray  # [dout, dout]


class NaturalGradientState(NamedTuple):
    step: jnp.ndarray
    factors: any  # pytree of _FactorState | None matching params


def _precondition(g, st, eta, alpha, recompute):
    din, dout = g.shape

    def norm_outer(m):
        d = m.shape[0]
        o = m @ m.T
        tr = jnp.trace(o)
        return o * (d / jnp.maximum(tr, 1e-20))

    f_in = (1.0 - eta) * st.f_in + eta * norm_outer(g)
    f_out = (1.0 - eta) * st.f_out + eta * norm_outer(g.T)

    def inv_smoothed(f):
        d = f.shape[0]
        rho = alpha * jnp.trace(f) / d
        return jnp.linalg.inv(f + (rho + 1e-8) * jnp.eye(d, dtype=f.dtype))

    p_in, p_out = jax.lax.cond(
        recompute,
        lambda: (inv_smoothed(f_in), inv_smoothed(f_out)),
        lambda: (st.p_in, st.p_out),
    )
    g2 = p_in @ g @ p_out
    # gamma renorm: keep the Frobenius norm of the raw gradient
    gn = jnp.sqrt(jnp.sum(jnp.square(g)))
    g2n = jnp.sqrt(jnp.sum(jnp.square(g2)))
    g2 = g2 * (gn / jnp.maximum(g2n, 1e-20))
    return g2, _FactorState(f_in, f_out, p_in, p_out)


def scale_by_natural_gradient(
    num_minibatches_history: float = 4.0,
    alpha: float = 4.0,
    update_period: int = 4,
) -> optax.GradientTransformation:
    """NG-SGD preconditioner (defaults = the reference's:
    --num-minibatches-history=4, --alpha=4; update_period amortizes the
    matrix inversions like the reference's self-debugging period)."""
    eta = 1.0 / float(num_minibatches_history)

    def maybe_state(p):
        if p.ndim != 2:
            return None
        din, dout = p.shape
        eye_in = jnp.eye(din, dtype=jnp.float32)
        eye_out = jnp.eye(dout, dtype=jnp.float32)
        return _FactorState(eye_in, eye_out,
                            eye_in / (1.0 + alpha), eye_out / (1.0 + alpha))

    def init_fn(params):
        factors = jax.tree.map(maybe_state, params)
        return NaturalGradientState(jnp.zeros((), jnp.int32), factors)

    def update_fn(updates, state, params=None):
        recompute = (state.step % update_period) == 0

        def apply(g, st):
            if st is None or g.ndim != 2:
                return g, st
            return _precondition(g, st, eta, alpha, recompute)

        flat_u, tdef = jax.tree.flatten(updates)
        flat_s = tdef.flatten_up_to(state.factors)
        out = [apply(g, s) for g, s in zip(flat_u, flat_s)]
        new_updates = tdef.unflatten([o[0] for o in out])
        new_factors = tdef.unflatten([o[1] for o in out])
        return new_updates, NaturalGradientState(state.step + 1, new_factors)

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# activation/derivative-estimated factors (the reference's estimator)
# ---------------------------------------------------------------------------


def activation_fisher_stats(ng_in, pert_grads, max_rows: int = 2048):
    """Per-layer Fisher factors from captured inputs and output derivs.

    `ng_in`: the 'ng_in' sow collection — nested dicts whose leaves are
    tuples holding the input rows of each instrumented Dense, keyed
    '<name>_in'.  `pert_grads`: gradient of the loss wrt the
    'perturbations' collection — same nesting, keyed '<name>_out', leaves
    shaped like the Dense outputs.  Returns a nested dict aligned with
    the param tree: {..., '<name>': {'f_in': [din+1, din+1],
    'f_out': [dout, dout]}} with the bias column appended to the input
    rows (the reference treats the affine component's parameters as the
    combined [din+1, dout] matrix).  Factors are normalized to mean
    diagonal 1 (scale lives in the gamma renorm, as in the reference).

    Rows are deterministically strided down to ≤ max_rows per minibatch —
    the cost knob replacing the reference's rank-R online updates."""

    def factor(rows):
        r2 = rows.reshape(-1, rows.shape[-1])
        n = r2.shape[0]
        stride = max(1, -(-n // max_rows))
        sub = r2[::stride].astype(jnp.float32)
        f = sub.T @ sub
        d = f.shape[0]
        return f * (d / jnp.maximum(jnp.trace(f), 1e-20))

    def walk(xs, gs):
        out = {}
        for k, v in xs.items():
            if isinstance(v, dict):
                sub = walk(v, gs.get(k, {}))
                if sub:
                    out[k] = sub
            elif k.endswith("_in"):
                name = k[:-3]
                g = gs.get(name + "_out")
                if g is None:
                    continue
                x = v[0] if isinstance(v, (tuple, list)) else v
                xr = x.reshape(-1, x.shape[-1])
                ones = jnp.ones((xr.shape[0], 1), xr.dtype)
                out[name] = {
                    "f_in": factor(jnp.concatenate([xr, ones], axis=1)),
                    "f_out": factor(g),
                }
        return out

    return walk(ng_in, pert_grads)


class NgActState(NamedTuple):
    step: jnp.ndarray
    factors: any  # nested dict mirroring the instrumented layers


def scale_by_natural_gradient_activations(
    num_minibatches_history: float = 4.0,
    alpha: float = 4.0,
    update_period: int = 4,
) -> "optax.GradientTransformationExtraArgs":
    """Reference-faithful NG-SGD: preconditions each instrumented affine
    component's combined [din+1, dout] gradient (kernel + bias row) by the
    inverses of the activation / output-derivative Fisher factors passed
    per step as the optax extra argument `ng_stats`
    (activation_fisher_stats output).  Layers without stats (batchnorm,
    recurrent, anything uninstrumented) pass through untouched."""
    eta = 1.0 / float(num_minibatches_history)

    def _factor_dims(node):
        k = node["kernel"]
        din = k.shape[0] + (1 if "bias" in node else 0)
        return din, k.shape[1]

    def _is_dense(node):
        return (isinstance(node, dict) and "kernel" in node
                and getattr(node["kernel"], "ndim", 0) == 2)

    def init_factors(params, stats_like=None):
        # factors exist for every Dense-shaped node; layers that never
        # receive stats just carry identity factors (zero-cost: their
        # update path is the identity branch)
        def walk(p):
            if _is_dense(p):
                din, dout = _factor_dims(p)
                eye_in = jnp.eye(din, dtype=jnp.float32)
                eye_out = jnp.eye(dout, dtype=jnp.float32)
                return _FactorState(eye_in, eye_out,
                                    eye_in / (1.0 + alpha),
                                    eye_out / (1.0 + alpha))
            if isinstance(p, dict):
                sub = {k: walk(v) for k, v in p.items()}
                return {k: v for k, v in sub.items() if v is not None} or None
            return None

        return walk(params)

    def init_fn(params):
        return NgActState(jnp.zeros((), jnp.int32), init_factors(params))

    def update_fn(updates, state, params=None, *, ng_stats=None,
                  **extra_args):
        del extra_args
        if ng_stats is None:
            return updates, state
        recompute = (state.step % update_period) == 0

        def inv_smoothed(f):
            d = f.shape[0]
            rho = alpha * jnp.trace(f) / d
            return jnp.linalg.inv(
                f + (rho + 1e-8) * jnp.eye(d, dtype=f.dtype))

        def precondition(node, st, stats):
            g = node["kernel"]
            has_bias = "bias" in node
            gc = (jnp.concatenate([g, node["bias"][None, :]], axis=0)
                  if has_bias else g)
            f_in_stat = stats["f_in"]
            if f_in_stat.shape[0] == gc.shape[0] + 1:
                # bias-free Dense: drop the appended ones row/column (the
                # raw-row factor is exactly the top-left block)
                f_in_stat = f_in_stat[:-1, :-1]
            f_in = (1.0 - eta) * st.f_in + eta * f_in_stat
            f_out = (1.0 - eta) * st.f_out + eta * stats["f_out"]
            p_in, p_out = jax.lax.cond(
                recompute,
                lambda: (inv_smoothed(f_in), inv_smoothed(f_out)),
                lambda: (st.p_in, st.p_out),
            )
            g2 = p_in @ gc @ p_out
            gn = jnp.sqrt(jnp.sum(jnp.square(gc)))
            g2n = jnp.sqrt(jnp.sum(jnp.square(g2)))
            g2 = g2 * (gn / jnp.maximum(g2n, 1e-20))
            out = dict(node)
            if has_bias:
                out["kernel"], out["bias"] = g2[:-1], g2[-1]
            else:
                out["kernel"] = g2
            return out, _FactorState(f_in, f_out, p_in, p_out)

        def walk2(u, st, stats):
            if _is_dense(u):
                if isinstance(st, _FactorState) and isinstance(stats, dict) \
                        and "f_in" in stats:
                    return precondition(u, st, stats)
                return u, st
            if isinstance(u, dict):
                new_u, new_st = {}, {}
                for k, v in u.items():
                    r_u, r_st = walk2(
                        v,
                        st.get(k) if isinstance(st, dict) else None,
                        stats.get(k) if isinstance(stats, dict) else None,
                    )
                    new_u[k] = r_u
                    if r_st is not None:
                        new_st[k] = r_st
                return new_u, (new_st or None)
            return u, st

        new_updates, new_factors = walk2(updates, state.factors, ng_stats)
        return new_updates, NgActState(state.step + 1, new_factors)

    return optax.GradientTransformationExtraArgs(init_fn, update_fn)
