"""Calibrate the MiniLM-384d msmarco surrogate against reference recalls.

Reference (REAL MiniLM-L6-v2 100k msmarco, k=20, cosine —
benchmark_20260305_070532/benchmark_summary.md:43-50):
    ivf_flat (IVF100,Flat nprobe=10)   recall 0.9529
    ivf_pq   (IVF256,PQ64 nprobe=48)   recall 0.6986
    ivf_sq8  (IVF256,SQ8  nprobe=48)   recall 0.9471
    pq       (PQ64)                    recall 0.7757
    hnsw     (M=16, efSearch=100)      recall 0.9857
    lsh      (12 tables, 18 bits)      recall 0.3286

For each candidate knob setting the script generates the surrogate, runs
identically-configured algorithms, and prints the recall vector; pick the
setting minimising max |recall - reference| over the five primary rows and
bake it into data/datasets.py defaults. The round-2 synthetic (rank-64
gaussian mixture, embed_msmarco._encode_synthetic) measured ivf_pq 0.284 /
pq 0.241 — unusable as PQ-difficulty evidence; this script exists to close
that gap (round-2 VERDICT item 2).

Usage: python scripts/calibrate_msmarco_surrogate.py [--n 100000] [--quick]
"""

from __future__ import annotations

import argparse
import itertools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGETS = {
    "ivf_flat": 0.9529,
    "ivf_pq": 0.6986,
    "ivf_sq8": 0.9471,
    "pq": 0.7757,
    "hnsw": 0.9857,
}
K = 20


_KNOBS = frozenset({
    "anisotropy", "child_scale", "point_scale", "query_scale", "zipf",
    "spectrum_align", "cluster_var", "tail_df", "outlier_frac",
    "outlier_scale", "n_parents", "children_per_parent", "dim", "seed",
    "radius_var",
})


def run_setting(n_train: int, algos_filter=None, **opts):
    unknown = set(opts) - _KNOBS
    if unknown:  # silently-ignored keys cost a full grid cycle once
        raise SystemExit(f"unknown surrogate knobs: {sorted(unknown)}")
    from vectordb_retrieval_tpu.bench.metrics import recall_at_k
    from vectordb_retrieval_tpu.data.datasets import Dataset
    from vectordb_retrieval_tpu.models.composite import CompositeAlgorithm

    ds = Dataset(
        "msmarco_surrogate",
        data_dir="/tmp/msm_cal",
        options={
            "train_limit": n_train, "test_size": 200, "ground_truth_k": 20,
            "use_cache": False, **opts,
        },
    ).load()
    x, q = ds.train_vectors, ds.test_vectors
    gt = ds.ground_truth[:, :K]

    algos = {
        "ivf_flat": (
            {"type": "IVFIndexer", "index_type": "IVF100,Flat"},
            {"type": "ANNSearcher", "nprobe": 10},
        ),
        "ivf_pq": (
            {"type": "FactoryIndexer", "index_key": "IVF256,PQ64"},
            {"type": "ANNSearcher", "nprobe": 48},
        ),
        "ivf_sq8": (
            {"type": "FactoryIndexer", "index_key": "IVF256,SQ8"},
            {"type": "ANNSearcher", "nprobe": 48},
        ),
        "pq": (
            {"type": "FactoryIndexer", "index_key": "PQ64"},
            {"type": "ANNSearcher", "nprobe": 48},
        ),
        "hnsw": (
            {"type": "GraphIndexer", "M": 16, "efSearch": 100},
            {"type": "ANNSearcher", "efSearch": 100},
        ),
    }
    out = {}
    if algos_filter:
        algos = {k: v for k, v in algos.items() if k in algos_filter}
    for name, (idx, srch) in algos.items():
        algo = CompositeAlgorithm(
            dimension=x.shape[1], indexer=idx, searcher=srch, metric="cosine"
        )
        algo.build_index(x)
        _, ids = algo.batch_search(q, K)
        out[name] = recall_at_k(gt, ids, K)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--quick", action="store_true",
                    help="single shipped-defaults check, no grid")
    ap.add_argument("--grid", type=str, default="",
                    help="comma-separated settings; each is either "
                         "positional alpha:child:point[:query[:zipf]] or "
                         "key=val pairs joined by ':' (full knob set: "
                         "anisotropy child_scale point_scale query_scale "
                         "zipf spectrum_align cluster_var)")
    ap.add_argument("--platform", type=str, default="",
                    help="force jax platform (cpu for screening grids)")
    ap.add_argument("--algos", type=str, default="",
                    help="comma-separated subset to run (screening grids "
                         "drop the slow hnsw build; max|err| is then over "
                         "that subset only)")
    args = ap.parse_args()
    algos_filter = (
        tuple(a for a in args.algos.split(",") if a) or None
    )

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.quick:
        grid = [dict()]
    elif args.grid:
        grid = []
        for spec in args.grid.split(","):
            if "=" in spec:
                g = {}
                for kv in spec.split(":"):
                    key, val = kv.split("=")
                    g[key] = float(val)
            else:
                parts = [float(v) for v in spec.split(":")]
                g = {"anisotropy": parts[0], "child_scale": parts[1],
                     "point_scale": parts[2]}
                if len(parts) > 3:
                    g["query_scale"] = parts[3]
                if len(parts) > 4:
                    g["zipf"] = parts[4]
            grid.append(g)
    else:
        grid = [
            {"anisotropy": a, "child_scale": c, "point_scale": p}
            for a, c, p in itertools.product(
                (0.4, 0.6, 0.8), (0.7, 0.9), (0.4, 0.55, 0.7)
            )
        ]

    best, best_err = None, np.inf
    for opts in grid:
        rec = run_setting(args.n, algos_filter=algos_filter, **opts)
        errs = {k: rec[k] - TARGETS[k] for k in rec}
        max_err = max(abs(v) for v in errs.values())
        line = " ".join(f"{k}={rec[k]:.3f}({errs[k]:+.3f})" for k in rec)
        print(f"{opts} -> {line}  max|err|={max_err:.3f}", flush=True)
        if max_err < best_err:
            best, best_err = opts, max_err
    print(f"\nBEST: {best}  max|err|={best_err:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
