"""Covertree 1M A/B on real TPU: node-level stream walk vs the round-4
block-granular walk (ops/covertree.covertree_blockwalk_search).

Builds one tree on the SIFT1M surrogate, times both descents with the
fused multi-pass protocol (artifact arrays passed as jit ARGUMENTS — a
closure would embed the 500 MB slab as an HLO constant), and reports
recall vs device ground truth plus the overflow rate.

Round-3 verdict weak #3 / next-#3: covertree trailed the exact scan 3x
at 1M (4,627 vs 13,856 QPS) because the per-node walk materialised
several [B, W] transients per depth; target >= 10k QPS at recall 1.0.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vectordb_retrieval_tpu.data.datasets import Dataset
from vectordb_retrieval_tpu.models.covertree import CoverTree
from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--descents", default="blockwalk,stream")
    args = ap.parse_args()
    enable_compilation_cache()

    ds = Dataset(
        "sift1m", data_dir="data",
        options={"subdir": "sift1m_synth", "test_size": args.b,
                 "ground_truth_k": args.k},
    ).load()
    x = np.asarray(ds.train_vectors)
    q = np.asarray(ds.test_vectors[: args.b], np.float32)
    gt = np.asarray(ds.ground_truth[: args.b, : args.k])

    algo = CoverTree(dimension=x.shape[1], metric="l2")
    t0 = time.time()
    algo.build_index(x)
    print(f"build {time.time()-t0:.1f}s nodes={algo.artifact.metadata['n_nodes']}",
          flush=True)

    leaves, treedef = jax.tree_util.tree_flatten(algo.artifact.data)
    qd = jnp.asarray(q)

    for descent in args.descents.split(","):
        algo.descent = descent

        @jax.jit
        def run(qb, lv):
            algo.artifact.data = jax.tree_util.tree_unflatten(treedef, lv)

            def pass_(carry, _):
                d, i = algo.device_kernel(qb + carry, args.k)
                chk = (jnp.max(d) + jnp.sum(i).astype(jnp.float32)) * 1e-38
                return chk, i

            chk, ids = jax.lax.scan(
                pass_, jnp.float32(0.0), None, length=args.iters
            )
            return chk, ids[-1]

        try:
            np.asarray(run(qd, leaves)[0])  # compile + warm
            t0 = time.perf_counter()
            chk, ids = run(qd, leaves)
            np.asarray(chk)
            dt = (time.perf_counter() - t0) / args.iters
        finally:
            algo.artifact.data = jax.tree_util.tree_unflatten(treedef, leaves)
        ids_np = np.asarray(ids)
        hits = sum(
            len(set(ids_np[i].tolist()) & set(gt[i].tolist()))
            for i in range(args.b)
        )
        rec = hits / float(args.b * args.k)
        print(
            f"{descent:10s} {dt*1e3:8.2f} ms/pass "
            f"({args.b/dt:9.0f} QPS)  recall@{args.k}={rec:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
