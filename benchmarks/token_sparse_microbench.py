"""Microbenchmark the component ops of the token-sparse decoder frame
update.  Each op runs inside a 100-step lax.scan (data-dependent carry so
nothing is DCE'd) to amortize the ~22 ms axon-tunnel dispatch latency —
single-op timings here are meaningless, only the scan slope is real.

Usage: python benchmarks/token_sparse_microbench.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

import os
B = int(os.environ.get("MB_B", 8))
K = int(os.environ.get("MB_K", 4096))
DEG = int(os.environ.get("MB_DEG", 6))
P = int(os.environ.get("MB_P", 2000))
E = int(os.environ.get("MB_E", K * DEG))
S = int(os.environ.get("MB_S", 1_000_000))
A = S * DEG
ITERS = int(os.environ.get("MB_ITERS", 100))

rng = np.random.default_rng(0)


def timeit_scan(name, op, init_carry):
    """op: carry -> carry (one frame's worth of the component)."""

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
    per = (best - 0.022) / ITERS * 1e3  # subtract dispatch, per-iter ms
    print(f"{name:45s} {per:8.3f} ms/frame")
    return per


def main():
    print(f"# B={B} K={K} E={E} S={S} A={A} iters={ITERS}")
    tok_state = jnp.asarray(
        rng.integers(0, S, size=(B, K)).astype(np.int32))
    tok_cost = jnp.asarray(rng.random((B, K)).astype(np.float32))
    cum0 = jnp.asarray(
        np.cumsum(rng.integers(1, DEG + 1, size=(B, K)), axis=1)
        .astype(np.int32))
    j = jnp.arange(E, dtype=jnp.int32)
    row_ptr = jnp.asarray(
        (np.arange(S + 1, dtype=np.int64) * DEG).astype(np.int32))
    arc_ns = jnp.asarray(rng.integers(0, S, size=A).astype(np.int32))
    arc_w = jnp.asarray(rng.random(A).astype(np.float32))
    arc_pdf = jnp.asarray(rng.integers(0, P, size=A).astype(np.int32))
    ll_t = jnp.asarray(rng.random((B, P)).astype(np.float32))
    arcs0 = jnp.asarray(rng.integers(0, A, size=(B, E)).astype(np.int32))
    kof0 = jnp.asarray(
        np.sort(rng.integers(0, K, size=(B, E)), axis=1).astype(np.int32))
    dest0 = jnp.asarray(rng.integers(0, S, size=(B, E)).astype(np.int32))
    cost0 = jnp.asarray(rng.random((B, E)).astype(np.float32))

    timeit_scan(
        "searchsorted [B,E] over [B,K]",
        lambda c: jax.vmap(
            lambda cc: jnp.searchsorted(cc, j, side="right")
        )(c).astype(jnp.int32)[:, :K] + c, cum0)

    def scatter_cummax(c):
        prev = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), c[:, :-1]], 1)
        pos = jnp.minimum(prev, E - 1)
        kk = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None], (B, K))
        scat = jnp.zeros((B, E), jnp.int32)
        scat = jax.vmap(lambda zz, pp, kv: zz.at[pp].max(kv))(scat, pos, kk)
        return jax.lax.cummax(scat, axis=1)[:, :K] + c

    timeit_scan("scatter+cummax k_of", scatter_cummax, cum0)

    timeit_scan(
        "take_along_axis [B,E]<-[B,K] f32",
        lambda c: c + jnp.take_along_axis(
            tok_cost, (c[:, :1].astype(jnp.int32) % K)
            + jnp.zeros((B, E), jnp.int32), 1)[:, :K], cost0[:, :K])

    timeit_scan(
        "gather ns[arc] [B,E]<-[A]",
        lambda a: (a + arc_ns[a]) % A, arcs0)

    timeit_scan(
        "gather w[arc] f32 [B,E]<-[A]  (+use)",
        lambda a: (a + (arc_w[a] > 0.5)) % A, arcs0)

    timeit_scan(
        "take_along_axis ll [B,E]<-[B,P]",
        lambda a: (a + jnp.take_along_axis(
            ll_t, a.astype(jnp.int32) % P, 1).astype(jnp.int32)) % A, arcs0)

    def sort3(c):
        d, cc, aa = c
        d2, c2, a2 = jax.lax.sort((d, cc, aa), dimension=1, num_keys=2)
        return (jnp.roll(d2, 1, axis=1), c2, a2)

    timeit_scan("lax.sort (dest,cost,arc) [B,E] 2-key", sort3,
                (dest0, cost0, arcs0))

    def topk(c):
        neg, idx = jax.lax.top_k(-c, K)
        return c.at[:, :K].add(-neg)

    timeit_scan("lax.top_k [B,E]->K", topk, cost0)

    def approx(c):
        neg, idx = jax.lax.approx_max_k(-c, K)
        return c.at[:, :K].add(-neg)

    timeit_scan("approx_max_k [B,E]->K", approx, cost0)

    def dense_relax(c):
        d, cc = c
        alpha = jnp.full((B, S), 1e30, jnp.float32)
        alpha = jax.vmap(lambda al, dd, c2: al.at[dd].min(c2))(alpha, d, cc)
        return (d, cc + alpha[:, :E] * 0 + jnp.min(alpha, 1, keepdims=True))

    timeit_scan("dense scatter-min [B,E]->[B,S]", dense_relax,
                (dest0, cost0))

    timeit_scan(
        "gather row_ptr [B,K]<-[S+1]",
        lambda s: (s + row_ptr[s]) % S, tok_state)

    def cumsum_only(c):
        return jnp.cumsum(c, axis=1) % 1000 + 1

    timeit_scan("cumsum [B,K]", cumsum_only, cum0 % 7 + 1)


if __name__ == "__main__":
    main()
