"""Sweep blockmin width w and repeat count for the flagship bench shape."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vectordb_retrieval_tpu.ops import distances as dops
from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache

N, D, K = 100_000, 384, 20
B = 256


def timed(label, fn, qs, *arrays):
    reps = qs.shape[0]

    def stream(qs, *arrs):
        def body(carry, qb):
            out = fn(qb + carry * jnp.float32(0.0), *arrs)
            first = jax.tree_util.tree_leaves(out)[0]
            return jnp.max(first).astype(jnp.float32) * jnp.float32(1e-38), ()

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), qs)
        return acc

    compiled = jax.jit(stream)
    np.asarray(compiled(qs, *arrays))
    t0 = time.perf_counter()
    np.asarray(compiled(qs, *arrays))
    dt = time.perf_counter() - t0
    print(f"{label:45s} {dt/reps*1e3:8.2f} ms/batch  {B*reps/dt:9.0f} QPS")


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(7)
    db = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    sqn = dops.sq_norms(db)
    np.asarray(jnp.sum(db))

    gt = None
    for reps in (20, 64):
        qs = jnp.asarray(
            rng.standard_normal((reps, B, D)).astype(np.float32)
        )
        for w in (8, 16, 32):
            timed(
                f"blockmin w={w:2d} reps={reps}",
                lambda qb, d_, s_, w=w: dops._exact_search_blockmin(
                    qb, d_, s_, K, "l2", 262_144, w=w
                ),
                qs, db, sqn,
            )
        # agreement check at this reps' first batch
        for w in (16, 32):
            d8, i8 = dops._exact_search_blockmin(qs[0], db, sqn, K, "l2", 262_144, w=8)
            dw, iw = dops._exact_search_blockmin(qs[0], db, sqn, K, "l2", 262_144, w=w)
            same = np.mean(np.asarray(i8) == np.asarray(iw))
            print(f"  ids agree w=8 vs w={w}: {same:.6f}")


if __name__ == "__main__":
    main()
