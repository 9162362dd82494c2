"""Micro-bench the cover-tree descent's per-iteration components on TPU.

Components at the msmarco profile shape (B=200, E=64, C=64, f_max=4096,
M=100k, d=384):
  a) children row gather [B, E*C, d] from [M, d]      (scattered rows)
  b) the same bytes as CSR slab slices [B, E, C, d]   (contiguous blocks)
  c) scalar metadata gathers [B, E*C] from [M] x4
  d) frontier reselect top_k_smallest([B, f_max+E*C]) -> f_max
  e) expansion select top_k_smallest([B, f_max]) -> E
  f) best update top_k_smallest([B, k+E*C]) -> k

Each timed as ITERS chained steps inside one jitted program (data-dependent
chaining so nothing is elided), amortising dispatch.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vectordb_retrieval_tpu.ops.distances import top_k_smallest
from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache

B, E, C, F, M, D, K = 200, 64, 64, 4096, 100_000, 384, 20
ITERS = 20


def timed(name, fn, *args):
    out = jax.jit(fn)(*args)
    jax.tree.map(np.asarray, out)
    t0 = time.time()
    out = jax.jit(fn)(*args)
    host = jax.tree.map(np.asarray, out)
    dt = (time.time() - t0) / ITERS
    print(f"{name:<44s} {dt*1e3:8.2f} ms/iter")
    return host


def chain(step):
    """Run ITERS steps, each seeded from the previous output's low bits."""

    def fn(idx0, *rest):
        def body(i, carry):
            idx = carry
            out = step(idx, *rest)
            return (idx + out) % M

        return jax.lax.fori_loop(0, ITERS, body, idx0)

    return fn


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((M + C, D), dtype=np.float32))
    scal = jnp.asarray(rng.standard_normal(M + C, dtype=np.float32))
    idx0 = jnp.asarray(rng.integers(0, M, (B, E * C)), jnp.int32)
    off0 = jnp.asarray(rng.integers(0, M, (B, E)), jnp.int32)
    fd0 = jnp.asarray(rng.standard_normal((B, F + E * C), dtype=np.float32))

    # a) scattered row gather
    def row_gather(idx, table):
        rows = table[idx]  # [B, E*C, D]
        return jnp.sum(rows, axis=(1, 2)).astype(jnp.int32)[:, None] % M

    timed("a) row gather [B,E*C,d]", chain(row_gather), idx0, table)

    # b) CSR slab slices: [B, E] offsets -> [B, E, C, d]
    def slab_slices(off, table):
        def one(o):
            return jax.lax.dynamic_slice(table, (o, 0), (C, D))

        blocks = jax.vmap(jax.vmap(one))(off)  # [B, E, C, D]
        return jnp.sum(blocks, axis=(1, 2, 3)).astype(jnp.int32)[:, None] % M

    timed("b) slab slices [B,E,C,d]", chain(slab_slices), off0, table)

    # c) scalar gathers x4
    def scalar_gathers(idx, scal):
        s = sum(scal[(idx + j) % M] for j in range(4))
        return jnp.sum(s, axis=1).astype(jnp.int32)[:, None] % M

    timed("c) scalar gathers [B,E*C] x4", chain(scalar_gathers), idx0, scal)

    # c2) scalar metadata as slab slices [B, E] -> [B, E, C] x4
    def scalar_slices(off, scal):
        def one(o):
            return jax.lax.dynamic_slice(scal, (o,), (C,))

        s = sum(
            jax.vmap(jax.vmap(lambda o, j=j: one((o + j) % M)))(off)
            for j in range(4)
        )
        return jnp.sum(s, axis=(1, 2)).astype(jnp.int32)[:, None] % M

    timed("c2) scalar slab slices x4", chain(scalar_slices), off0, scal)

    # d) frontier reselect
    def reselect(idx, fd0):
        d = fd0 + idx[:, :1].astype(jnp.float32)
        v, _ = top_k_smallest(d, F)
        return v[:, :1].astype(jnp.int32) % M

    timed(f"d) reselect top-{F} of {F+E*C}", chain(reselect), idx0, fd0)

    # e) expansion select
    def expsel(idx, fd0):
        d = fd0[:, :F] + idx[:, :1].astype(jnp.float32)
        v, _ = top_k_smallest(d, E)
        return v[:, :1].astype(jnp.int32) % M

    timed(f"e) expand select top-{E} of {F}", chain(expsel), idx0, fd0)

    # f) best update
    def bestup(idx, fd0):
        d = fd0[:, : K + E * C] + idx[:, :1].astype(jnp.float32)
        v, _ = top_k_smallest(d, K)
        return v[:, :1].astype(jnp.int32) % M

    timed(f"f) best top-{K} of {K+E*C}", chain(bestup), idx0, fd0)

    # g) the score itself: diff-form VPU distance on gathered [B,E*C,d]
    q = jnp.asarray(rng.standard_normal((B, D), dtype=np.float32))

    def score(idx, table, q):
        rows = table[idx]
        diff = rows - q[:, None, :]
        d = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        return jnp.sum(d, axis=1).astype(jnp.int32)[:, None] % M

    timed("g) gather+diff-score [B,E*C,d]", chain(score), idx0, table, q)

    def score_slab(off, table, q):
        def one(o):
            return jax.lax.dynamic_slice(table, (o, 0), (C, D))

        blocks = jax.vmap(jax.vmap(one))(off)
        diff = blocks - q[:, None, None, :]
        d = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        return jnp.sum(d, axis=(1, 2)).astype(jnp.int32)[:, None] % M

    timed("h) slab+diff-score [B,E,C,d]", chain(score_slab), off0, table, q)


if __name__ == "__main__":
    main()
