"""Geometry sweep for the node-mode beam on the glove surrogate.

Follow-up to exp_glove_ceiling.py: the 0.9602 committed row is a BUDGET
artifact (recall 0.995 at saturation, in-degree-0 = 0), not a graph hole.
Sweeps (reverse_edges, ef, iters) to find the cheapest point >= the
reference's 0.9750 (benchmark_20260305_070532 glove50 hnsw row).
"""

from __future__ import annotations

import argparse
import itertools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--k", type=int, default=20)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from vectordb_retrieval_tpu.data.datasets import Dataset
    from vectordb_retrieval_tpu.ops import distances as dops
    from vectordb_retrieval_tpu.ops import graph as gops

    ds = Dataset("glove50_surrogate", data_dir="data", options={})
    ds.load()
    x = jnp.asarray(np.asarray(ds.train_vectors, dtype=np.float32))
    q = jnp.asarray(np.asarray(ds.test_vectors, dtype=np.float32))[:256]
    n = x.shape[0]
    k = args.k
    _, gt = dops.exact_search(q, x, k, metric="l2")
    gt = np.asarray(gt)

    def recall(ids):
        ids = np.asarray(ids)
        hits = sum(
            len(set(ids[i].tolist()) & set(gt[i].tolist()))
            for i in range(ids.shape[0])
        )
        return hits / float(gt.shape[0] * k)

    entries = gops.pick_entry_points(x, min(2048, n), seed=42)
    sqn = dops.sq_norms(x)
    M = 16
    adjs = {
        rev: gops.build_knn_graph(x, 2 * M, reverse_edges=rev)
        for rev in (M, 2 * M)
    }
    for rev, ef, iters in itertools.product(
        (M, 2 * M), (125, 160, 200), (3, 4, 5)
    ):
        adj = adjs[rev]
        degree = adj.shape[1]
        expand = min(max(8, 1536 // degree), ef)
        t0 = time.time()
        _, i = gops.graph_search(
            q, x, adj, entries, k, ef=ef, expand=expand,
            iters=iters, metric="l2", sqnorms=sqn,
            cand_keep=max(k, 3 * ef // 4),
        )
        r = recall(i)
        # scored rows per query ~ expand*degree*iters (relative cost proxy)
        rows = expand * degree * iters
        print(
            f"rev={rev:2d} ef={ef:3d} it={iters}  recall={r:.4f}"
            f"  rows/q~{rows:6d}  wall={time.time()-t0:5.1f}s"
        )


if __name__ == "__main__":
    main()
