"""Profile the cover-tree descent at the msmarco roster shape.

Questions (docs/roadmap.md #4):
  * what does the tree look like (node count, fanout distribution, depth)?
  * how many while-loop iterations does the 512-query batch take, and how
    does (expand, f_max) trade iterations vs per-iteration cost?
  * is the per-iteration cost the scattered children/vector gathers
    (0.2 us/row HLO gathers, CLAUDE.md) or the f_max selection?

Usage: python scripts/exp_covertree_profile.py [--platform cpu] [--n 20000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--queries", type=int, default=512)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--dataset", default="msmarco_surrogate")
    ap.add_argument("--subdir", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from vectordb_retrieval_tpu.data.datasets import Dataset
    from vectordb_retrieval_tpu.models.covertree import CoverTree
    from vectordb_retrieval_tpu.ops import covertree as ctops
    from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache

    enable_compilation_cache()

    opts = {"n_train": args.n}
    if args.subdir:
        opts["subdir"] = args.subdir
        opts["test_size"] = args.queries
        opts["ground_truth_k"] = args.k
    ds = Dataset(args.dataset, options=opts).load()
    x = np.asarray(ds.train_vectors[: args.n], np.float32)
    q = np.asarray(ds.test_vectors[: args.queries], np.float32)
    print(f"dataset {args.dataset}: corpus {x.shape} queries {q.shape} "
          f"metric {ds.metric}")

    model = CoverTree(dimension=x.shape[1], metric=ds.metric)
    t0 = time.time()
    model.build_index(x)
    print(f"build: {time.time() - t0:.1f} s")

    meta = model.artifact.metadata
    data = model.artifact.data
    m = meta["n_nodes"]
    print(f"nodes M={m} (N={args.n}, virtual={m - args.n})")
    print("depth sizes:", meta["depth_sizes"])

    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12) \
        if ds.metric == "cosine" else q
    qj = jnp.asarray(qn)
    nq = q.shape[0]

    for kprime in (args.k + 12, 2 * args.k, args.k + 64, args.k + 236):
        def run():
            res = ctops.covertree_stream_search(
                qj, data["slab"], data["point_ids"], data["is_real"],
                data["radii"], data["parent_rel"],
                depth_sizes=tuple(meta["depth_sizes"]),
                k=args.k, kprime=kprime,
            )
            return jax.tree.map(np.asarray, res)

        res = run()  # warm/compile
        t0 = time.time()
        res = run()
        dt = time.time() - t0
        print(f"stream kprime={kprime:4d}: {dt*1e3:8.1f} ms "
              f"({nq/dt:8.1f} QPS)  depths={int(res.iters)} "
              f"ndis/query={res.ndis.mean():.0f} "
              f"overflow={int(res.overflow.sum())}")

    # recall sanity vs ground truth at k
    gt = np.asarray(ds.ground_truth[:nq, : args.k])
    hits = np.mean([
        len(set(res.ids[i].tolist()) & set(gt[i].tolist())) / args.k
        for i in range(nq)
    ])
    print(f"recall@{args.k} vs dataset GT: {hits:.4f}")

    # distance-level exactness vs the exact scan (tie-proof check)
    from vectordb_retrieval_tpu.ops import distances as dops

    vectors = data["slab"][data["row_pos"]]
    fd, _ = dops.exact_search(qj, vectors, args.k, metric="l2", refine=True)
    ed = np.sqrt(np.maximum(np.asarray(fd), 0.0))
    err = np.abs(np.sort(res.dists, 1) - np.sort(ed, 1))
    print(f"max |stream_d - exact_d| over top-{args.k}: {err.max():.2e}")


if __name__ == "__main__":
    main()
