"""Batched small-table gather as a Pallas one-hot reduction.

The token-sparse decoder's per-arc loglike lookup `out[b, j] =
table[b, idx[b, j]]` (reference: lattice-faster-decoder.cc ProcessEmitting's
`-acoustic_cost` term via DecodableInterface::LogLikelihood) is a [B, E]
per-element gather from a [B, P] table.  XLA lowers that to the TPU's
serial gather path (~90M elem/s measured — benchmarks/
token_sparse_microbench.py), which at decode shape [64, 11904] costs
7.9 ms/frame and is one of the two dominant terms in the kernel roofline
(BASELINE.md).

But the table is SMALL (P ~ 2k pdfs -> one row is 8 KB): it fits VMEM
hundreds of times over.  This kernel rebuilds the gather as a one-hot
select + lane reduction entirely in VMEM:

    out[j] = sum_p  (iota_p == idx[j]) ? table[p] : 0

Exactly one term of the sum is nonzero, and f32 addition with 0.0 is
exact, so the result is bit-identical to the gather (up to +0.0/-0.0 on
a -0.0 table entry).  The compare/select/reduce runs on the VPU at full
vector width instead of the element-serial gather unit.

Blocking: TPU requires the last two block dims be (8k, 128k)-aligned, so
the grid tiles [B, E] into (8, BLK) blocks (B and E padded up); the
kernel statically unrolls the 8 batch rows, each a [BLK, Ppad] compare +
lane reduction against that row's VMEM-resident table.

Out-of-range indices (>= P) select nothing and return 0; the decoder
clamps its masked slots to P-1, so every lane is in range by contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
ROWS = 8  # batch rows per grid instance (sublane alignment)


def _gather_kernel(idx_ref, tab_ref, out_ref):
    blk = idx_ref.shape[1]
    ppad = tab_ref.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (blk, ppad), 1)
    for r in range(ROWS):
        hot = cols == idx_ref[r, :][:, None]
        out_ref[r, :] = jnp.sum(
            jnp.where(hot, tab_ref[r, :][None, :], jnp.float32(0.0)), axis=1
        )


@functools.partial(jax.jit, static_argnames=("blk", "interpret"))
def _pallas_gather(table, idx, blk: int, interpret: bool):
    b, p = table.shape
    _, e = idx.shape
    ppad = (p + LANE - 1) // LANE * LANE
    epad = (e + blk - 1) // blk * blk
    bpad = (b + ROWS - 1) // ROWS * ROWS
    table = jnp.pad(table, ((0, bpad - b), (0, ppad - p)))
    idx = jnp.pad(idx, ((0, bpad - b), (0, epad - e)))
    out = pl.pallas_call(
        _gather_kernel,
        grid=(bpad // ROWS, epad // blk),
        in_specs=[
            pl.BlockSpec((ROWS, blk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, ppad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, blk), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bpad, epad), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * bpad * epad * ppad,
            bytes_accessed=4 * (bpad * epad * 2 + bpad * ppad),
            transcendentals=0,
        ),
    )(idx, table)
    return out[:b, :e]


def batched_table_gather(table: jnp.ndarray, idx: jnp.ndarray,
                         blk: int = 512, interpret: bool = None
                         ) -> jnp.ndarray:
    """out[b, j] = table[b, idx[b, j]] — [B, P] f32 table, [B, E] int32
    indices in [0, P).  On TPU this is the Pallas one-hot kernel; on
    other backends it falls back to take_along_axis (identical
    semantics) rather than paying the interpreter.

    Out-of-range indices are clamped to [0, P) on EVERY path (the raw
    kernel would return 0.0 for them while take_along_axis clamps —
    clamping here keeps the two backends bit-identical on
    out-of-contract input)."""
    idx = jnp.clip(idx, 0, table.shape[1] - 1)
    if interpret is None:
        if jax.default_backend() != "tpu":
            return jnp.take_along_axis(table, idx, axis=1)
        interpret = False
    blk = min(blk, (max(idx.shape[1], LANE) + LANE - 1) // LANE * LANE)
    # keep the per-row [blk, ppad] one-hot intermediate ≲4 MB of VMEM so
    # large pdf tables (ppad ~ 8k) cannot blow the ~16 MB budget if the
    # where+sum fails to fuse into a streaming reduction
    ppad = (table.shape[1] + LANE - 1) // LANE * LANE
    if ppad * blk * 4 > (4 << 20):
        blk = max(LANE, ((1 << 20) // ppad) // LANE * LANE)
    # Mosaic requires the minor block dim be a LANE multiple
    blk = max(LANE, -(-blk // LANE) * LANE)
    return _pallas_gather(table, idx, blk=blk, interpret=interpret)
