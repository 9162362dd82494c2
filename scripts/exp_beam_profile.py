"""Ablation profile of the beam search iteration: what actually costs?

Times stripped-down variants of the beam body, same shapes as production
(B=256, ef=125, W=48, R=32, N=20k, d=64, 5 iters).
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vectordb_retrieval_tpu.ops import distances as dops
from vectordb_retrieval_tpu.ops import graph as gops
from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache

N, D, K = 20_000, 64, 20
B = 256
REPEATS = 8
EF, W, ITERS = 125, 48, 5
R = 32


def timed(fn, queries_r, *arrays, label=""):
    def stream(qs, *arrs):
        def body(carry, qb):
            out = fn(qb + carry * jnp.float32(0.0), *arrs)
            return jnp.float32(0.0) + out.astype(jnp.float32).max() * 1e-38, out

        _, ids = jax.lax.scan(body, jnp.float32(0.0), qs)
        return ids

    compiled = jax.jit(stream)
    np.asarray(compiled(queries_r, *arrays))
    start = time.perf_counter()
    np.asarray(compiled(queries_r, *arrays))
    elapsed = time.perf_counter() - start
    per_batch = elapsed / REPEATS * 1000
    print(f"{label:42s} {per_batch:9.2f} ms/batch   {B*REPEATS/elapsed:9.0f} QPS")
    return elapsed


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    queries_r = jnp.asarray(
        rng.standard_normal((REPEATS, B, D)).astype(np.float32)
    )
    adjacency = jnp.asarray(
        rng.integers(0, N, size=(N, R)).astype(np.int32)
    )
    sqn = dops.sq_norms(x)
    nbr_vecs = jax.block_until_ready(x[adjacency])  # [N, R, d] f32
    nbr_sqn = sqn[adjacency]

    C = EF + W * R  # 1661 concat width

    # 1. full-pipeline shaped dummy loop: gather + dists + sort + topk
    ids0 = jnp.asarray(rng.integers(0, N, size=(B, EF)).astype(np.int32))

    def v_gather_only(q, adj, nv):
        def body(state, _):
            bid, acc = state
            sel = (bid[:, :W] + 1) % N
            nvec = nv[sel]  # [B, W, R, d]
            acc = acc + jnp.sum(nvec, axis=(1, 2, 3))
            bid = (bid + acc[:, None].astype(jnp.int32)) % N
            return (bid, acc), None

        (bid, acc), _ = jax.lax.scan(
            body, (ids0, jnp.zeros((B,), jnp.float32)), None, length=ITERS
        )
        return acc + 0.0 * q.sum()

    timed(v_gather_only, queries_r, adjacency, nbr_vecs,
          label="nbr-table gather [B,W] rows only")

    def row_gather_only(q, xv):
        def body(state, _):
            bid, acc = state
            sel = (bid + 1) % N  # [B, W*R] row gather
            nvec = xv[sel]  # [B, W*R, d]
            acc = acc + jnp.sum(nvec, axis=(1, 2))
            bid = (bid + acc[:, None].astype(jnp.int32)) % N
            return (bid, acc), None

        ids_wr = jnp.asarray(
            rng.integers(0, N, size=(B, W * R)).astype(np.int32)
        )
        (bid, acc), _ = jax.lax.scan(
            body, (ids_wr, jnp.zeros((B,), jnp.float32)), None, length=ITERS
        )
        return acc + 0.0 * q.sum()

    timed(row_gather_only, queries_r, x,
          label="plain gather [B,W*R] rows only")

    def einsum_only(q, nv):
        nvec = nv[ids0[:, :W]]  # hoistable? add data dep
        def body(acc, _):
            d = jnp.einsum(
                "bwrd,bd->bwr", nvec + acc * 0.0, q,
                preferred_element_type=jnp.float32,
            )
            return acc + d.sum() * 1e-30, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return acc

    timed(einsum_only, queries_r, nbr_vecs, label="einsum bwrd,bd only")

    def sort_only(q):
        keys = jnp.asarray(
            rng.integers(0, 2 * N, size=(B, C)).astype(np.int32)
        )
        vals = jnp.asarray(rng.standard_normal((B, C)).astype(np.float32))
        def body(state, _):
            k_, v_ = state
            order = jnp.argsort(k_, axis=1)
            sd = jnp.take_along_axis(v_, order, axis=1)
            sk = jnp.take_along_axis(k_, order, axis=1)
            return ((sk + 1) % (2 * N), sd + 1.0), None
        (k_, v_), _ = jax.lax.scan(body, (keys, vals), None, length=ITERS)
        return v_ + 0.0 * q.sum()

    timed(sort_only, queries_r, label=f"argsort+2x take [B,{C}] only")

    def topk_only(q):
        vals = jnp.asarray(rng.standard_normal((B, C)).astype(np.float32))
        def body(v, _):
            nv_, pos = jax.lax.approx_max_k(v, EF, recall_target=1.0)
            padded = jnp.zeros((B, C), jnp.float32).at[:, :EF].set(nv_)
            return padded + 1e-6, None
        v, _ = jax.lax.scan(body, vals, None, length=ITERS)
        return v + 0.0 * q.sum()

    timed(topk_only, queries_r, label=f"approx_max_k(EF) [B,{C}] only")

    def scatter_only(q):
        exp = jnp.zeros((B, EF), jnp.bool_)
        sel = jnp.asarray(rng.integers(0, EF, size=(B, W)).astype(np.int32))
        def body(state, _):
            e, s = state
            e = e | jnp.zeros_like(e).at[jnp.arange(B)[:, None], s].set(True)
            s = (s + jnp.sum(e, axis=1, keepdims=True).astype(jnp.int32)) % EF
            return (e, s), None
        (e, s), _ = jax.lax.scan(body, (exp, sel), None, length=ITERS)
        return e.astype(jnp.float32) + 0.0 * q.sum()

    timed(scatter_only, queries_r, label="beam_exp scatter only")

    # full production search for reference
    entries = jnp.arange(256, dtype=jnp.int32)
    fn_cur = lambda qb, xv, adj, ent, sq: gops.graph_search(
        qb, xv, adj, ent, K, ef=EF, expand=W, iters=ITERS,
        metric="l2", sqnorms=sq,
    )[1]
    timed(fn_cur, queries_r, x, adjacency, entries, sqn,
          label="full production beam")


if __name__ == "__main__":
    main()
