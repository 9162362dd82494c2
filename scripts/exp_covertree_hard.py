"""Covertree hard-regime (ndis~N) A/B: node-level stream walk vs the
block-granular walk (ops/covertree.covertree_blockwalk_search) on the
384d msmarco surrogate — the dataset where round-3's stream descent
bottomed out at 738 QPS vs the 8.8k exact scan (docs/roadmap.md #4,
round-4 VERDICT next-#8).

High-d cosine data prunes poorly (cover radii stay comparable to
inter-point distances for many depths), so the walk scores nearly every
node: the descent's value-add over the exact scan is ~zero and its
OVERHEAD is what shows. The stream walk pays several [B, W] f32
transients + a per-chunk [B, kp] top-k per depth; the blockwalk pays two
fused Pallas blockmin streams over the slab + [B, M/w] block arrays.

Timing protocol = the fused multi-pass chain (artifact arrays passed as
jit ARGUMENTS — a closure would embed the slab as an HLO constant), and
recall is checked against device ground truth. The exact-scan row
(models/exact via ops/distances) runs back-to-back as the speed-of-light
reference for the same k.

Reference semantics being preserved: covertree_v2_2.py:374-500 (dynamic
kth-bound prune); this is a pure execution-strategy A/B.
"""

from __future__ import annotations

import argparse
import json
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
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--descents", default="blockwalk,stream")
    ap.add_argument("--out", default="")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    enable_compilation_cache()

    ds = Dataset(
        "msmarco_surrogate", data_dir="data",
        options={"train_limit": args.n, "test_size": args.b,
                 "ground_truth_k": args.k},
    ).load()
    x = np.asarray(ds.train_vectors)
    q = np.asarray(ds.test_vectors[: args.b], np.float32)
    gt = np.asarray(ds.ground_truth[: args.b, : args.k])

    algo = CoverTree(dimension=x.shape[1], metric="cosine")
    t0 = time.time()
    algo.build_index(x)
    build_s = time.time() - t0
    print(f"build {build_s:.1f}s nodes={algo.artifact.metadata['n_nodes']}",
          flush=True)

    leaves, treedef = jax.tree_util.tree_flatten(algo.artifact.data)
    # cosine: the device kernel expects normalised queries
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    qd = jnp.asarray(qn)

    rows = {}
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
            dt = time.perf_counter() - t0
            ids = np.asarray(ids)
        except Exception as e:  # noqa: BLE001
            print(f"{descent}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        qps = args.b * args.iters / dt
        rec = float(
            np.mean([len(set(ids[i]) & set(gt[i])) / args.k
                     for i in range(args.b)])
        )
        ndis = float(np.mean(np.asarray(algo.last_ndis)) if hasattr(
            algo, "last_ndis") and algo.last_ndis is not None else -1)
        print(f"{descent}: {qps:,.0f} QPS  recall@{args.k} {rec:.4f}  "
              f"({dt*1e3/args.iters:.2f} ms/pass)", flush=True)
        rows[descent] = {"qps": qps, "recall": rec, "ms_per_pass":
                         dt * 1e3 / args.iters}

    if args.out and rows:
        payload = {"dataset": f"msmarco_surrogate n={args.n} d={x.shape[1]}",
                   "k": args.k, "b": args.b, "iters": args.iters,
                   "build_s": build_s, "rows": rows}
        out_dir = os.path.dirname(args.out)
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
