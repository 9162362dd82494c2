"""Structure-sensitivity probe: can per-cluster ORIENTED low-rank scatter
reproduce the reference's pq > ivf_pq inequality — and do per-list
rotations recover it?

Hypothesis (docs/roadmap.md #7): real MiniLM embeddings concentrate near
a global low-dim manifold whose local tangent ORIENTATION varies by
topic. Global PQ codes absolute positions (sees the global low-rank
concentration -> easy); residual IVF-PQ codes per-list scatter with ONE
shared codebook (sees mixed orientations -> hard). Every
energy-preserving gaussian-mixture knob moves the two together
(scripts/calibrate_msmarco_surrogate.py grid logs); orientation
heterogeneity is the axis none of them had.

Reference targets (benchmark_20260305_070532/benchmark_summary.md:46-48,
real MiniLM 100k x 384d): pq 0.7757 > ivf_pq 0.6986.

Usage: python scripts/exp_manifold_structure.py [--platform cpu] [--n 100000]
"""

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
p.add_argument("--d", type=int, default=384)
p.add_argument("--rank", type=int, default=16, help="local tangent rank")
p.add_argument("--orient", type=float, default=1.0,
               help="0 = shared frame, 1 = fully per-cluster orientation")
p.add_argument("--global-rank", type=int, default=48,
               help="rank of the parent/manifold subspace")
p.add_argument("--clusters", type=int, default=512)
p.add_argument("--queries", type=int, default=256)
p.add_argument("--k", type=int, default=20)
p.add_argument("--rot-bs", type=int, default=0,
               help="also run ivf_pq with pq_rotations=<bs>")
p.add_argument("--center-scale", type=float, default=2.0,
               help="cluster-center spread inside the global manifold")
p.add_argument("--point-scale", type=float, default=0.55,
               help="within-cluster tangent scatter")
args = p.parse_args()

import jax  # noqa: E402

if args.platform:
    jax.config.update("jax_platforms", args.platform)

import jax.numpy as jnp  # noqa: E402

from vectordb_retrieval_tpu.bench.metrics import recall_at_k  # noqa: E402
from vectordb_retrieval_tpu.models.factory import (  # noqa: E402
    ANNSearcher, FactoryIndexer,
)
from vectordb_retrieval_tpu.ops import distances as dops  # noqa: E402
from vectordb_retrieval_tpu.utils.compat import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()
rng = np.random.default_rng(7)
n, d, r = args.n, args.d, args.rank
C = args.clusters

# --- generator: global low-rank manifold + per-cluster oriented tangents
# global manifold frame [d, global_rank]
gq, _ = np.linalg.qr(rng.standard_normal((d, d)).astype(np.float64))
G = gq[:, : args.global_rank].astype(np.float32)
centers = (
    rng.standard_normal((C, args.global_rank)).astype(np.float32)
    * args.center_scale
) @ G.T

# per-cluster tangent frames: rank-r, interpolated between a SHARED frame
# (orient=0) and fully random per-cluster frames (orient=1); spectrum
# decays inside the tangent
spec = (np.arange(1, r + 1, dtype=np.float32)) ** -0.5
spec /= np.sqrt(np.mean(spec**2))
shared = gq[:, : r].astype(np.float32)
frames = np.empty((C, d, r), np.float32)
for c in range(C):
    fq, _ = np.linalg.qr(rng.standard_normal((d, d)).astype(np.float64))
    mix = (1.0 - args.orient) * shared + args.orient * fq[:, :r].astype(
        np.float32
    )
    mq, _ = np.linalg.qr(mix.astype(np.float64))
    frames[c] = mq[:, :r].astype(np.float32)

assign = rng.integers(0, C, size=n)
z = rng.standard_normal((n, r)).astype(np.float32) * spec * args.point_scale
x = centers[assign] + np.einsum("ndr,nr->nd", frames[assign], z)
x = np.ascontiguousarray(x, dtype=np.float32)

qi = rng.choice(n, args.queries, replace=False)
zq = (
    rng.standard_normal((args.queries, r)).astype(np.float32)
    * spec * 1.3 * args.point_scale
)
q = centers[assign[qi]] + np.einsum(
    "ndr,nr->nd", frames[assign[qi]], zq
)
q = np.ascontiguousarray(q, dtype=np.float32)

gt_d, gt_i = dops.exact_search(jnp.asarray(q), jnp.asarray(x), args.k, "l2")
gt = np.asarray(gt_i)

rows = {}


def run(name, indexer, nprobe=None):
    t0 = time.time()
    art = indexer.build(x, d)
    bt = time.time() - t0
    s = ANNSearcher(metric="l2", **({"nprobe": nprobe} if nprobe else {}))
    s.attach(art)
    _, ids = s.batch_search(q, args.k)
    rec = recall_at_k(gt, np.asarray(ids), args.k)
    rows[name] = {"recall": round(float(rec), 4), "build_s": round(bt, 1)}
    print(name, rows[name], flush=True)


# reference msmarco configs (benchmark_config.yaml:36-72 grammar)
run("pq64", FactoryIndexer(metric="l2", index_key="PQ64"))
run("ivf_pq", FactoryIndexer(metric="l2", index_key="IVF256,PQ64"), nprobe=48)
run("ivf_sq8", FactoryIndexer(metric="l2", index_key="IVF256,SQ8"), nprobe=48)
run("ivf_flat", FactoryIndexer(metric="l2", index_key="IVF100,Flat"), nprobe=10)
if args.rot_bs:
    run(
        f"ivf_pq_rot{args.rot_bs}",
        FactoryIndexer(
            metric="l2", index_key="IVF256,PQ64", pq_rotations=args.rot_bs
        ),
        nprobe=48,
    )

print(json.dumps({"args": vars(args), "rows": rows}))
