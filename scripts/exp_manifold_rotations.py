"""pq_rotations='auto' A/B + decision-threshold calibration (round-4
VERDICT #3: "a committed A/B on the `manifold` dataset showing
rotations/OPQ buying recall where per-list anisotropy exists, and a
decision rule for when the roster turns them on").

Two regimes, same reference algorithm config (IVF256,PQ64 nprobe 48 —
reference configs/benchmark_config.yaml grammar):

  manifold           per-list ORIENTED low-rank patches
                     (data/datasets._load_manifold) — the structure real
                     MiniLM embeddings carry and gaussian mixtures lack;
                     rotations must buy recall here.
  msmarco_surrogate  shared-frame gaussian mixture (the shipped roster
                     surrogate) — rotations are provably recall-neutral
                     here; 'auto' must stay OFF.

For each regime the script builds plain / pq_rotations='auto' /
pq_rotations=<bs> artifacts, reports end-to-end recall@k and the
held-out reconstruction gain that drives the auto decision
(ops/pq.rotation_gain, recorded in artifact metadata['pq_rot_auto']),
and emits one JSON document for the committed record.

The decision rule under test (models/factory.FactoryIndexer):
    enable rotations  iff  held-out residual-MSE gain >= PQ_ROT_AUTO_GAIN
measured at build time on the quantizer training sample — no search,
no labels, no extra data needed.

Usage: python scripts/exp_manifold_rotations.py [--platform cpu]
           [--n 100000] [--out benchmark_results/.../rotations_ab.json]
"""

from __future__ import annotations

import argparse
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
p.add_argument("--nprobe", type=int, default=48)
p.add_argument("--index-key", default="IVF256,PQ64")
p.add_argument("--rot-bs", type=int, default=128)
p.add_argument("--out", default="")
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

REGIMES = [
    # (dataset name, loader options, expectation comment)
    (
        "manifold",
        {
            "dim": 384,
            "train_limit": args.n,
            "test_size": args.queries,
            "ground_truth_k": args.k,
            "n_patches": 256,
            "intrinsic_dim": 12,
            "point_scale": 0.5,
        },
        "per-list oriented frames: rotations should WIN, auto ON",
    ),
    (
        "msmarco_surrogate",
        {
            "train_limit": args.n,
            "test_size": args.queries,
            "ground_truth_k": args.k,
        },
        "shared-frame gaussian mixture: rotations neutral, auto OFF",
    ),
]

doc = {"args": vars(args), "regimes": {}}

for name, opts, note in REGIMES:
    ds = Dataset(name, data_dir="data", options=dict(opts)).load()
    x = np.asarray(ds.train_vectors)
    q = np.asarray(ds.test_vectors)
    gt = np.asarray(ds.ground_truth[:, : args.k])
    rows = {}
    for variant, rot in (
        ("plain", 0),
        ("auto", "auto"),
        (f"rot{args.rot_bs}", args.rot_bs),
    ):
        t0 = time.time()
        art = FactoryIndexer(
            metric="l2", index_key=args.index_key, pq_rotations=rot
        ).build(x, x.shape[1])
        build_s = time.time() - t0
        s = ANNSearcher(metric="l2", nprobe=args.nprobe)
        s.attach(art)
        _, ids = s.batch_search(q, args.k)
        rows[variant] = {
            "recall": round(
                float(recall_at_k(gt, np.asarray(ids), args.k)), 4
            ),
            "build_s": round(build_s, 1),
            "pq_rot_auto": art.metadata.get("pq_rot_auto"),
            "rot_enabled": "list_rotations" in art.data,
        }
        print(name, variant, json.dumps(rows[variant]), flush=True)
    doc["regimes"][name] = {"note": note, "rows": rows}

print(json.dumps(doc))
if args.out:
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print("written", args.out)
