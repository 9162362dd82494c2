"""Sweep block-graph search geometry at msmarco shape (100k x 384d cosine).

Round-3 VERDICT item 1: the reference's committed hnsw msmarco row is
0.9857 recall @ 7,872 QPS (reference benchmark_20260305_070532/
benchmark_summary.md:44).  The default block_geometry() mapping gives
0.965 @ 7.5k at efSearch 176 — this script sweeps (block_size, efb,
expand, iters) directly on built indexes to find a point that beats the
row on BOTH axes, then the winner is baked into models/graph.block_geometry.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vectordb_retrieval_tpu.data.datasets import Dataset
from vectordb_retrieval_tpu.ops import graph as gops
from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache

K = 20
B = 512
REPEATS = 3


def timed_stream(fn, queries_r, arrays):
    """Fused repeats: one program, results materialised inside the clock."""

    def stream(qs, arrs):
        def body(carry, qb):
            d, i = fn(qb + carry * jnp.float32(0.0), arrs)
            return jnp.max(
                jnp.where(jnp.isfinite(d), d, 0.0)
            ) * jnp.float32(1e-38), i

        _, ids = jax.lax.scan(body, jnp.float32(0.0), qs)
        return ids

    compiled = jax.jit(stream)
    np.asarray(compiled(queries_r, arrays))  # warm-up + compile
    start = time.perf_counter()
    ids = np.asarray(compiled(queries_r, arrays))
    elapsed = time.perf_counter() - start
    return ids[-1], elapsed


def recall(ids, gt):
    hits = 0
    for i in range(ids.shape[0]):
        hits += len(set(ids[i].tolist()) & set(gt[i, :K].tolist()))
    return hits / float(gt.shape[0] * K)


def main():
    enable_compilation_cache()
    ds = Dataset(
        "msmarco_surrogate",
        data_dir="data",
        options={
            "train_limit": 100_000, "test_size": 512, "ground_truth_k": 200,
        },
    ).load()
    x = np.asarray(ds.train_vectors, dtype=np.float32)
    q = np.asarray(ds.test_vectors, dtype=np.float32)
    gt = np.asarray(ds.ground_truth)
    # cosine: normalise once (matches GraphIndexer._build_block's handling)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    n = x.shape[0]
    queries_r = jnp.asarray(
        np.broadcast_to(q, (REPEATS,) + q.shape).copy()
    )

    import itertools

    spills = tuple(
        float(s) for s in os.environ.get("SPILLS", "0,0.1,0.2").split(",")
    )
    blocks = tuple(
        int(s) for s in os.environ.get("BLOCKS", "256").split(",")
    )
    slabs = tuple(os.environ.get("SLABS", "f32").split(","))
    for block, spill, slab in itertools.product(blocks, spills, slabs):
        n_blocks = -(-n // block)
        degree = max(
            4, min(int(os.environ.get("DEGREE", "32")), n_blocks - 1)
        )
        parts = gops.build_block_graph(
            jnp.asarray(x), n_blocks, degree, seed=42, spill=spill,
            slab_dtype=slab,
        )
        parts = jax.block_until_ready(parts)
        entries, entry_block, slot_ids, list_vecs, list_sqn, adj, mu = parts
        print(
            f"built block={block} spill={spill} slab={slab} "
            f"n_blocks={slot_ids.shape[0]} degree={degree}",
            flush=True,
        )

        geoms = [
            (32, 8, 4),
            (32, 8, 6),
            (32, 8, 9),
            (32, 8, 11),
            (32, 8, 14),
            (32, 8, 18),
        ]
        if os.environ.get("GEOMS"):
            geoms = [
                tuple(int(v) for v in g.split(":"))
                for g in os.environ["GEOMS"].split(",")
            ]
        for efb, expand, iters in geoms:
            if expand * iters >= n_blocks:
                continue

            def fn(qb, arrs, efb=efb, expand=expand, iters=iters,
                   dd=spill > 0):
                e, eb, sid, lv, lsq, ad, mu = arrs
                return gops.block_graph_search(
                    qb, e, eb, sid, lv, lsq, ad, mu, k=K,
                    efb=efb, expand=expand, iters=iters, metric="cosine",
                    dedup=dd,
                )

            ids, elapsed = timed_stream(fn, queries_r, parts)
            rec = recall(ids, gt)
            qps = REPEATS * B / elapsed
            print(
                f"block={block} spill={spill} slab={slab} efb={efb} "
                f"expand={expand} iters={iters} probes={expand * iters} "
                f"recall={rec:.4f} qps={qps:.0f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
