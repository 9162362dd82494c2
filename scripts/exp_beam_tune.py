"""Tune the sort-free beam (ef, W, iters, cand_keep) on random-20k.

Target: beat reference hnsw 23,886 QPS at recall@20 >= 0.9156
(BASELINE.md random row) with 256-query batches.
"""

from __future__ import annotations

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
REPEATS = 20
R = 32


def timed_stream(fn, queries_r, *arrays):
    def stream(qs, *arrs):
        def body(carry, qb):
            d, i = fn(qb + carry * jnp.float32(0.0), *arrs)
            return jnp.max(jnp.where(jnp.isfinite(d), d, 0.0)) * jnp.float32(
                1e-38
            ), i

        _, ids = jax.lax.scan(body, jnp.float32(0.0), qs)
        return ids

    compiled = jax.jit(stream)
    np.asarray(compiled(queries_r, *arrays))
    start = time.perf_counter()
    ids = np.asarray(compiled(queries_r, *arrays))
    elapsed = time.perf_counter() - start
    return ids, elapsed


def recall(ids, gt):
    hits = 0
    for i in range(ids.shape[0]):
        hits += len(set(ids[i].tolist()) & set(gt[i].tolist()))
    return hits / float(gt.shape[0] * gt.shape[1])


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    queries_r = jnp.asarray(
        rng.standard_normal((REPEATS, B, D)).astype(np.float32)
    )
    gt = np.asarray(dops.exact_search(queries_r[0], x, K, metric="l2")[1])

    configs = [
        # (degree, n_entry, ef, W, iters, cand_keep)
        (32, 312, 128, 32, 5, 64),   # round-2 baseline from first sweep
        (32, 1024, 128, 32, 4, 64),
        (32, 2048, 128, 48, 3, 96),
        (48, 1024, 128, 24, 3, 64),
        (48, 1024, 128, 24, 4, 64),
        (48, 2048, 128, 32, 3, 96),
        (64, 1024, 128, 16, 3, 64),
        (64, 1024, 128, 24, 3, 96),
        (64, 2048, 128, 24, 2, 96),
        (64, 2048, 128, 24, 3, 96),
    ]
    acache, ecache = {}, {}
    for r_, ne, ef, w, it, ck in configs:
        if r_ not in acache:
            print(f"building degree-{r_} graph...")
            acache[r_] = jax.block_until_ready(gops.build_knn_graph(x, r_))
        if ne not in ecache:
            ecache[ne] = jax.block_until_ready(
                gops.pick_entry_points(x, ne, seed=42)
            )
        adjacency = acache[r_]
        entries = ecache[ne]
        sqn = dops.sq_norms(x)
        fn = lambda qb, xv, adj, ent, sq, ef=ef, w=w, it=it, ck=ck: (
            gops.graph_search(
                qb, xv, adj, ent, K, ef=ef, expand=w, iters=it,
                metric="l2", sqnorms=sq, cand_keep=ck,
            )
        )
        ids, el = timed_stream(fn, queries_r, x, adjacency, entries, sqn)
        qps = B * REPEATS / el
        rec = recall(np.asarray(ids)[0], gt)
        flag = " <== PASS" if (qps > 23886 and rec >= 0.9156) else ""
        print(
            f"R={r_:2d} E={ne:4d} ef={ef:3d} W={w:2d} it={it:2d} "
            f"keep={ck:3d}: {qps:8.0f} QPS  recall@{K}={rec:.4f}{flag}"
        )


if __name__ == "__main__":
    main()
