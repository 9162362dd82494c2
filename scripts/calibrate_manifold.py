"""Calibrate the `manifold` dataset (data/datasets._load_manifold) against
the reference's REAL-msmarco pq/ivf_pq pair — the inequality the
gaussian-mixture surrogates provably cannot reproduce:

    reference msmarco (real MiniLM 100k x 384d, topk=20):
        pq     0.7757   (benchmark_20260305_070532/benchmark_summary.md:48)
        ivf_pq 0.6986   (:46)

Sweeps the loader's structure knobs at the reference algorithm configs
(PQ64; IVF256,PQ64 nprobe=48 — reference benchmark_config.yaml grammar)
and reports (pq, ivf_pq, gap) per setting. Run with --platform cpu for
calibration (results are recall-only; QPS comes from the TPU roster).
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

p = argparse.ArgumentParser()
p.add_argument("--platform", default=None)
p.add_argument("--n", type=int, default=100_000)
p.add_argument("--queries", type=int, default=256)
p.add_argument("--k", type=int, default=20)
p.add_argument("--grid", default="")
args = p.parse_args()

import jax  # noqa: E402

if args.platform:
    jax.config.update("jax_platforms", args.platform)

from vectordb_retrieval_tpu.bench.metrics import recall_at_k  # noqa: E402
from vectordb_retrieval_tpu.data.datasets import Dataset  # noqa: E402
from vectordb_retrieval_tpu.models.factory import (  # noqa: E402
    ANNSearcher, FactoryIndexer,
)
from vectordb_retrieval_tpu.utils.compat import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()

REF = {"pq": 0.7757, "ivf_pq": 0.6986}

# default sweep: intrinsic dim x point_scale (the two difficulty axes);
# patch count fixed near the msmarco topic scale
GRID = {
    "intrinsic_dim": [8, 12, 16],
    "point_scale": [0.35, 0.5, 0.7],
}
if args.grid:
    GRID = json.loads(args.grid)


def one(opts):
    ds = Dataset(
        "manifold",
        data_dir="data",
        options={
            "dim": 384,
            "train_limit": args.n,
            "test_size": args.queries,
            "ground_truth_k": args.k,
            "n_patches": 256,
            **opts,
        },
    ).load()
    x = np.asarray(ds.train_vectors)
    q = np.asarray(ds.test_vectors)
    gt = np.asarray(ds.ground_truth[:, : args.k])
    out = {}
    for name, key, nprobe in (
        ("pq", "PQ64", None),
        ("ivf_pq", "IVF256,PQ64", 48),
    ):
        t0 = time.time()
        art = FactoryIndexer(metric="l2", index_key=key).build(x, x.shape[1])
        s = ANNSearcher(metric="l2", **({"nprobe": nprobe} if nprobe else {}))
        s.attach(art)
        _, ids = s.batch_search(q, args.k)
        out[name] = round(float(recall_at_k(gt, np.asarray(ids), args.k)), 4)
        out[f"{name}_s"] = round(time.time() - t0, 1)
    return out


keys = list(GRID)
for combo in itertools.product(*(GRID[k] for k in keys)):
    opts = dict(zip(keys, combo))
    r = one(opts)
    gap = r["pq"] - r["ivf_pq"]
    err = abs(r["pq"] - REF["pq"]) + abs(r["ivf_pq"] - REF["ivf_pq"])
    print(
        json.dumps({"opts": opts, **r, "gap": round(gap, 4),
                    "refdist": round(err, 4)}),
        flush=True,
    )
