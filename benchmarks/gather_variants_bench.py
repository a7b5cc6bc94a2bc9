"""Microbenchmark: arc-row gather variants for the token-sparse decoder.

BASELINE.md's r3 roofline put the [B,E,3] <- [A,3] arc-row gather at
8.17 ms/frame (B=64, E=11904) and called it "irreducible for this access
pattern".  The numbers here test that claim: XLA's TPU gather appears to
cost per-INDEX (a [B,E,3] row gather prices like a [B,E] element gather),
so fetching one padded per-STATE arc tile per token (B*K indices) instead
of one row per expanded arc (B*E indices) should cut the gather by the
mean active out-degree.

Usage: python benchmarks/gather_variants_bench.py
Env: GB_B, GB_K, GB_E, GB_S, GB_DEG, GB_MD, GB_ITERS
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("GB_B", 64))
K = int(os.environ.get("GB_K", 2048))
DEG = int(os.environ.get("GB_DEG", 4))  # mean out-degree
E = int(os.environ.get("GB_E", 11904))
S = int(os.environ.get("GB_S", 1_000_000))
A = S * DEG
ITERS = int(os.environ.get("GB_ITERS", 50))

rng = np.random.default_rng(0)


def timeit_scan(name, op, init_carry):
    @jax.jit
    def many(c):
        def step(c, _):
            return op(c), ()

        c, _ = jax.lax.scan(step, c, None, length=ITERS)
        return c

    out = many(init_carry)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = many(init_carry)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    per = (best - 0.022) / ITERS * 1e3
    print(f"{name:52s} {per:8.3f} ms/frame", flush=True)
    return per


def main():
    print(f"# B={B} K={K} E={E} S={S} A={A} iters={ITERS}")
    arcs0 = rng.integers(0, A, size=(B, E)).astype(np.int32)
    arcs_sorted = np.sort(arcs0, axis=1).astype(np.int32)
    toks0 = rng.integers(0, S, size=(B, K)).astype(np.int32)
    toks_sorted = np.sort(toks0, axis=1).astype(np.int32)

    packed3 = jnp.asarray(rng.integers(0, 2**30, size=(A, 3)).astype(np.int32))
    packed2 = jnp.asarray(rng.integers(0, 2**30, size=(A, 2)).astype(np.int32))
    flat = jnp.asarray(rng.integers(0, 2**30, size=A).astype(np.int32))

    d_arcs = jnp.asarray(arcs0)
    d_arcs_sorted = jnp.asarray(arcs_sorted)
    d_toks = jnp.asarray(toks0)
    d_toks_sorted = jnp.asarray(toks_sorted)

    def use3(r):  # [B, E, 3] -> data-dependent carry
        return (r[..., 0] + r[..., 1] + r[..., 2])

    timeit_scan(
        "row gather [B,E,3] <- [A,3]  (r3 baseline)",
        lambda a: (a + use3(jnp.take(packed3, a, axis=0))) % A, d_arcs)

    timeit_scan(
        "row gather [B,E,2] <- [A,2]  (8-byte rows)",
        lambda a: (a + (lambda r: r[..., 0] + r[..., 1])(
            jnp.take(packed2, a, axis=0))) % A, d_arcs)

    timeit_scan(
        "elem gather [B,E] <- [A]",
        lambda a: (a + flat[a]) % A, d_arcs)

    timeit_scan(
        "row gather [B,E,3], indices sorted + hint",
        lambda a: (a + use3(jnp.take(packed3, a, axis=0,
                                     indices_are_sorted=True))) % A,
        d_arcs_sorted)

    # per-state padded tiles: one index per TOKEN pulls that state's MD-row
    # block; downstream slots become K*MD
    for MD in (4, 8):
        tiles = jnp.asarray(
            rng.integers(0, 2**30, size=(S, MD, 2)).astype(np.int32))

        def tile_gather(tk, tiles=tiles, MD=MD):
            r = jnp.take(tiles, tk, axis=0)  # [B, K, MD, 2]
            v = r[..., 0] + r[..., 1]  # [B, K, MD]
            return (tk + v.sum(-1)) % S

        timeit_scan(f"tile gather [B,K,{MD},2] <- [S,{MD},2] (per token)",
                    tile_gather, d_toks)
        timeit_scan(f"tile gather [B,K,{MD},2], sorted tokens + hint",
                    lambda tk, tiles=tiles: (tk + (
                        lambda r: (r[..., 0] + r[..., 1]).sum(-1))(
                        jnp.take(tiles, tk, axis=0, indices_are_sorted=True)
                    )) % S, d_toks_sorted)

    # interleaved 3-word tiles (w, pdf, ns per arc row)
    for MD in (4,):
        tiles3 = jnp.asarray(
            rng.integers(0, 2**30, size=(S, MD, 3)).astype(np.int32))
        timeit_scan(
            f"tile gather [B,K,{MD},3] <- [S,{MD},3] (per token)",
            lambda tk: (tk + use3(jnp.take(tiles3, tk, axis=0)).sum(-1)) % S,
            d_toks)

    # flat-2D variant: [S, MD*3] rows
    for MD in (4,):
        tiles_f = jnp.asarray(
            rng.integers(0, 2**30, size=(S, MD * 3)).astype(np.int32))
        timeit_scan(
            f"tile gather [B,K,{MD}*3] <- [S,{MD}*3] (2-D rows)",
            lambda tk: (tk + jnp.take(tiles_f, tk, axis=0).sum(-1)) % S,
            d_toks)


if __name__ == "__main__":
    main()
