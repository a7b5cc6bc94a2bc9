"""ops/gather_kernel.py: the one-hot Pallas batched-table gather must be
bit-identical to take_along_axis (it IS the decoder's loglike lookup —
reference lattice-faster-decoder.cc ProcessEmitting acoustic_cost)."""

import numpy as np
import jax.numpy as jnp

from old_kaldi_git_tpu.ops.gather_kernel import (
    _pallas_gather,
    batched_table_gather,
)


def test_interpret_matches_take_along_axis():
    rng = np.random.default_rng(0)
    for b, p, e, blk in [(4, 2000, 1300, 256), (8, 2048, 512, 512),
                         (3, 50, 7, 128), (9, 129, 257, 256)]:
        tab = jnp.asarray(rng.normal(size=(b, p)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, p, size=(b, e)).astype(np.int32))
        ref = jnp.take_along_axis(tab, idx, axis=1)
        out = _pallas_gather(tab, idx, blk=blk, interpret=True)
        assert out.shape == ref.shape
        assert bool((out == ref).all()), (b, p, e, blk)


def test_backend_dispatch_exact():
    rng = np.random.default_rng(1)
    tab = jnp.asarray(rng.normal(size=(5, 300)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 300, size=(5, 77)).astype(np.int32))
    ref = jnp.take_along_axis(tab, idx, axis=1)
    out = batched_table_gather(tab, idx)
    assert bool((out == ref).all())


def test_repeated_and_boundary_indices():
    tab = jnp.asarray(np.arange(12, dtype=np.float32).reshape(2, 6) * 1.5)
    idx = jnp.asarray(np.array([[0, 0, 5, 5, 3], [5, 4, 0, 1, 1]],
                               np.int32))
    ref = jnp.take_along_axis(tab, idx, axis=1)
    out = _pallas_gather(tab, idx, blk=128, interpret=True)
    assert bool((out == ref).all())


def test_out_of_range_indices_clamp_like_take_along_axis():
    """Both backends must share ONE semantics on out-of-contract input:
    indices are clamped to [0, P) (advisor r3 finding — the raw kernel
    returned 0.0 for them while the fallback clamped)."""
    rng = np.random.default_rng(2)
    tab = jnp.asarray(rng.normal(size=(3, 40)).astype(np.float32))
    idx = jnp.asarray(np.array([[-5, 0, 39, 40, 1000],
                                [7, -1, 2, 99, 39],
                                [0, 1, 2, 3, 4]], np.int32))
    clamped = jnp.clip(idx, 0, 39)
    ref = jnp.take_along_axis(tab, clamped, axis=1)
    out = batched_table_gather(tab, idx)
    assert bool((out == ref).all())


def test_compiled_tpu_kernel_matches_take_along_axis():
    """Run the COMPILED Pallas lowering (the only path used in
    production) against take_along_axis — TPU only."""
    import jax
    import pytest

    if jax.default_backend() != "tpu":
        pytest.skip("compiled Pallas path requires a TPU backend")
    rng = np.random.default_rng(3)
    for b, p, e in [(8, 2000, 1536), (4, 6000, 512)]:
        tab = jnp.asarray(rng.normal(size=(b, p)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, p, size=(b, e)).astype(np.int32))
        ref = jnp.take_along_axis(tab, idx, axis=1)
        out = batched_table_gather(tab, idx)
        assert bool((np.asarray(out) == np.asarray(ref)).all())
