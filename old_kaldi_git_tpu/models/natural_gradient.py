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

TPU-shaped differences (deliberate, documented):
- The reference tracks a rank-R + identity factor updated from the
  minibatch's rank-one terms inside each component.  Here the factors are
  estimated from the gradient matrices the optimizer already sees
  (F_in ← (1-eta) F_in + eta·normalized(G Gᵀ), and transposed for F_out),
  so the transform composes with any jitted train step without threading
  activations through the loss — the XLA-native seam.  Full (not low-rank)
  factors are kept: at TDNN widths (≤2k) a [D, D] factor is tiny next to
  the MXU matmuls, and eigendecompositions are amortized by
  `update_period` (the Shampoo-style trick).
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
