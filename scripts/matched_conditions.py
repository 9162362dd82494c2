"""Matched-conditions QPS: re-measure this framework under the REFERENCE's
exact timing protocol (VERDICT round-1 item 6).

The reference's committed QPS figures (BASELINE.md) come from
``time.time()`` around per-batch ``batch_search`` calls — batches of 128,
only 256 queries total — and its own notes flag the multi-thousand-QPS CPU
rows as tiny-batch-inflated (reference methodology/known_followups.md:50-55,
experiment_runner.py:430-464). This script runs OUR algorithms with that
identical protocol (same datasets, same hyperparameters, same batch size,
same query count, same wall-clock formula) so every cross-framework QPS
comparison shares a methodology; the honest fused-stream numbers live in
the committed benchmark_results/ runs for contrast.

faiss-cpu cannot be benchmarked on this host: the environment forbids
package installation and has no egress (import check recorded in the
output). The reference's committed CPU numbers are therefore compared
as-published.

Usage: python scripts/matched_conditions.py [--out docs/matched_conditions_rows.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# reference benchmark_config.yaml hyperparameters for the random/glove rows
ALGOS = {
    "exact": (
        {"type": "BruteForceIndexer"},
        {"type": "LinearSearcher"},
    ),
    "hnsw": (
        {"type": "GraphIndexer", "M": 16, "efConstruction": 200,
         "efSearch": 100},
        {"type": "ANNSearcher", "efSearch": 100},
    ),
    "ivf_flat": (
        {"type": "IVFIndexer", "index_type": "IVF100,Flat"},
        {"type": "ANNSearcher", "nprobe": 10},
    ),
    "ivf_pq": (
        {"type": "FactoryIndexer", "index_key": "IVF256,PQ{pqm}"},
        {"type": "ANNSearcher", "nprobe": 24},
    ),
    "ivf_sq8": (
        {"type": "FactoryIndexer", "index_key": "IVF256,SQ8"},
        {"type": "ANNSearcher", "nprobe": 24},
    ),
    "pq": (
        {"type": "FactoryIndexer", "index_key": "PQ{pqm}"},
        {"type": "ANNSearcher", "nprobe": 24},
    ),
}

DATASETS = {
    # name -> (dataset ctor args, pq m, reference QPS rows from BASELINE.md)
    "random": (
        {"name": "random", "options": {
            "dimensions": 64, "train_size": 20000, "test_size": 256,
            "ground_truth_k": 200, "seed": 7, "use_cache": False}},
        64,
        {"exact": 220.03, "hnsw": 23886, "ivf_flat": 111697,
         "ivf_pq": 43245, "ivf_sq8": 248897, "pq": 25606},
    ),
    "glove50_surrogate": (
        {"name": "glove50_surrogate", "options": {
            "train_limit": 20000, "test_size": 256, "ground_truth_k": 200,
            "seed": 11, "use_cache": False}},
        50,
        {"exact": 290.68, "hnsw": 213468, "ivf_flat": 259546,
         "ivf_pq": 95836, "ivf_sq8": 70534, "pq": 19837},
    ),
}

BATCH = 128  # reference query_batch_size (reference configs/benchmark_config.yaml:221)
K = 20


def reference_protocol_qps(algo, queries: np.ndarray, k: int):
    """QPS exactly as the reference computes it: time.time() per batch,
    n_queries / sum(batch wall-clock) (reference experiment_runner.py:430-464)."""
    total = 0.0
    ids = np.empty((queries.shape[0], k), dtype=np.int64)
    for start in range(0, queries.shape[0], BATCH):
        batch = queries[start : start + BATCH]
        t0 = time.time()
        _, bi = algo.batch_search(batch, k)
        total += time.time() - t0
        ids[start : start + BATCH] = bi
    return queries.shape[0] / max(total, 1e-12), ids


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/matched_conditions_rows.json")
    args = ap.parse_args()

    from vectordb_retrieval_tpu.bench.metrics import recall_at_k
    from vectordb_retrieval_tpu.data.datasets import Dataset
    from vectordb_retrieval_tpu.models.composite import CompositeAlgorithm
    from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache

    enable_compilation_cache()
    try:
        import faiss  # noqa: F401

        faiss_state = "available"
    except ImportError as exc:
        faiss_state = f"unavailable ({exc}); install forbidden, no egress"

    import jax

    rows = []
    for ds_name, (ds_args, pqm, ref_qps) in DATASETS.items():
        ds = Dataset(
            ds_args["name"], data_dir="/tmp/matched", options=ds_args["options"]
        ).load()
        x, q = ds.train_vectors, ds.test_vectors
        gt = ds.ground_truth[:, :K]
        for name, (idx, srch) in ALGOS.items():
            idx = {
                k2: (v.format(pqm=pqm) if isinstance(v, str) else v)
                for k2, v in idx.items()
            }
            algo = CompositeAlgorithm(
                dimension=x.shape[1], indexer=idx, searcher=srch, metric="l2"
            )
            algo.build_index(x)
            # warm-up: compile + cache outside the timed region (the
            # reference's FAISS calls have no compile step to exclude)
            algo.batch_search(q[:BATCH], K)
            qps, ids = reference_protocol_qps(algo, q, K)
            rec = recall_at_k(gt, ids, K)
            rows.append(
                {
                    "dataset": ds_name,
                    "algorithm": name,
                    "qps_reference_protocol": round(qps, 1),
                    "recall": round(float(rec), 4),
                    "qps_reference_published_cpu": ref_qps[name],
                }
            )
            print(json.dumps(rows[-1]), flush=True)

    out = {
        "protocol": "time.time() per 128-query batch, 256 queries, k=20 "
        "(reference experiment_runner.py:430-464)",
        "host": f"TPU via axon tunnel (~30 ms per program dispatch), "
        f"jax {jax.__version__}",
        "faiss_cpu": faiss_state,
        "rows": rows,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
