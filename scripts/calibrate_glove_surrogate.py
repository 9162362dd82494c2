"""Calibrate the GloVe-50 surrogate's difficulty against reference recalls.

Reference (REAL glove50, BASELINE.md rows 27-34, k=20):
    ivf_flat (IVF100, nprobe=10)      recall 0.8699
    ivf_pq   (IVF256,PQ50, nprobe=24) recall 0.9094
    ivf_sq8  (IVF256,SQ8,  nprobe=24) recall 0.9113
    pq       (PQ50)                   recall 0.9820
    hnsw     (M=16, efSearch=100)     recall 0.9750

For each candidate knob setting the script builds the surrogate, runs the
framework's identically-configured algorithms, and prints the recall
vector; pick the setting minimising max |recall - reference| and bake it
into data/datasets.py defaults.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGETS = {
    "ivf_flat": 0.8699,
    "ivf_pq": 0.9094,
    "ivf_sq8": 0.9113,
    "pq": 0.9820,
    "hnsw": 0.9750,
}
K = 20


def run_setting(**opts):
    from vectordb_retrieval_tpu.bench.metrics import recall_at_k
    from vectordb_retrieval_tpu.data.datasets import Dataset
    from vectordb_retrieval_tpu.models.composite import CompositeAlgorithm

    ds = Dataset(
        "glove50_surrogate",
        data_dir="/tmp/glove_cal",
        options={
            "train_limit": 20000, "test_size": 256, "ground_truth_k": 200,
            "seed": 11, "use_cache": False, **opts,
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
            {"type": "FactoryIndexer", "index_key": "IVF256,PQ50"},
            {"type": "ANNSearcher", "nprobe": 24},
        ),
        "ivf_sq8": (
            {"type": "FactoryIndexer", "index_key": "IVF256,SQ8"},
            {"type": "ANNSearcher", "nprobe": 24},
        ),
        "pq": (
            {"type": "FactoryIndexer", "index_key": "PQ50"},
            {"type": "ANNSearcher", "nprobe": 24},
        ),
        "hnsw": (
            {"type": "GraphIndexer", "M": 16, "efSearch": 100},
            {"type": "ANNSearcher", "efSearch": 100},
        ),
    }
    out = {}
    for name, (idx, srch) in algos.items():
        algo = CompositeAlgorithm(
            dimension=50, indexer=idx, searcher=srch, metric="l2"
        )
        algo.build_index(x)
        _, ids = algo.batch_search(q, K)
        out[name] = recall_at_k(gt, ids, K)
    return out


def main():
    from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache

    enable_compilation_cache()
    # The winning setting (maxerr 0.012 across the five reference rows) is
    # baked into datasets.py as the glove50_surrogate defaults; `{}` below
    # re-verifies it. The other rows are the searched neighbourhood.
    settings = [
        {},
        {"anisotropy": 0.4, "point_scale": 1.0},
        {"anisotropy": 0.2, "point_scale": 1.0, "child_scale": 1.0},
        {"anisotropy": 0.0, "point_scale": 1.3, "child_scale": 1.1},
        {"anisotropy": 0.0, "point_scale": 1.5, "child_scale": 1.3},
    ]
    print(f"{'setting':46s} " + " ".join(f"{k:>9s}" for k in TARGETS))
    print(f"{'REFERENCE (real glove50)':46s} "
          + " ".join(f"{v:9.4f}" for v in TARGETS.values()))
    best, best_err = None, 1e9
    for s in settings:
        rec = run_setting(**s)
        err = max(abs(rec[k] - TARGETS[k]) for k in TARGETS)
        tag = str(s) if s else "(defaults)"
        print(f"{tag:46s} " + " ".join(f"{rec[k]:9.4f}" for k in TARGETS)
              + f"   maxerr={err:.3f}")
        if err < best_err:
            best, best_err = s, err
    print(f"\nbest: {best} (maxerr {best_err:.3f})")


if __name__ == "__main__":
    main()
