"""Diagnose the node-mode recall ceiling on the glove-shaped surrogate.

Round-3 committed row: hnsw glove50 0.9602 vs reference 0.9750 — the one
recall column still below the reference. The reverse-edge pass
(ops/graph.add_reverse_edges) keeps only the nearest ``rev`` INCOMING
edges per node, so a boundary row whose forward edges all point at
popular hubs can lose every backlink and become unreachable by any beam.

Measures: (a) in-degree-zero count of the concatenated adjacency,
(b) recall at the committed geometry, (c) recall at saturation ef/iters
(isolates reachability from budget), for build variants.
"""

from __future__ import annotations

import argparse
import os
import sys

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

    def run(adj, ef, iters, expand=None):
        degree = adj.shape[1]
        expand = expand or min(max(8, 1536 // degree), ef)
        d, i = gops.graph_search(
            q, x, adj, entries, k, ef=ef, expand=expand,
            iters=iters, metric="l2", sqnorms=sqn,
            cand_keep=max(k, 3 * ef // 4),
        )
        return recall(i)

    M = 16
    for label, kwargs in (
        ("rev=M (committed)", dict(reverse_edges=M)),
        ("rev=2M", dict(reverse_edges=2 * M)),
        ("rev=M forced-backlink", dict(reverse_edges=M)),
    ):
        forced = "forced" in label
        if forced and not hasattr(gops, "_FORCED_BACKLINK"):
            print(f"{label}: (not implemented yet — skipped)")
            continue
        adj = gops.build_knn_graph(x, 2 * M, **kwargs)
        adj_np = np.asarray(adj)
        present = np.zeros(n, dtype=bool)
        flat = adj_np.reshape(-1)
        present[flat[flat >= 0]] = True
        n_unreach = int((~present).sum())
        r_comm = run(adj, ef=125, iters=3)
        r_sat = run(adj, ef=512, iters=12)
        print(
            f"{label:24s} deg={adj_np.shape[1]:3d} in-deg-0={n_unreach:5d}"
            f"  recall(ef125,it3)={r_comm:.4f}  recall(ef512,it12)={r_sat:.4f}"
        )


if __name__ == "__main__":
    main()
