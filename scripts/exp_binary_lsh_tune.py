"""Binary-LSH (reference `faiss_lsh`, FAISS IndexLSH + rerank) candidate
frontier: recall@k vs rerank candidate multiplier.

The round-5 k=20 rosters run lsh_candidate_multiplier=16 (320 candidates
at k=20), which lands random at 0.64 recall vs the reference's published
0.9672 @ 2,087 QPS (BASELINE.md:47). The TPU rows have 20x QPS headroom
over the reference, so spending candidates on recall is nearly free —
this probe finds the smallest multiplier clearing the reference recall
per dataset (the fused Hamming scan is corpus-bound, so QPS is flat in
the multiplier until the rerank gather dominates).

Usage: python scripts/exp_binary_lsh_tune.py [--dataset random|glove50_surrogate]
           [--mults 16,32,64,128,256]
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
p.add_argument("--dataset", default="random")
p.add_argument("--k", type=int, default=20)
p.add_argument("--num-bits", type=int, default=256)
p.add_argument("--mults", default="16,32,64,128,256")
p.add_argument("--iters", type=int, default=8)
p.add_argument("--out", default="")
args = p.parse_args()

import jax  # noqa: E402

if args.platform:
    jax.config.update("jax_platforms", args.platform)
import jax.numpy as jnp  # noqa: E402

from vectordb_retrieval_tpu.bench.metrics import recall_at_k  # noqa: E402
from vectordb_retrieval_tpu.data.datasets import Dataset  # noqa: E402
from vectordb_retrieval_tpu.models.lsh import (  # noqa: E402
    BinaryLSHIndexer, binary_lsh_search,
)
from vectordb_retrieval_tpu.utils.compat import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()

OPTS = {
    "random": {"dimensions": 64, "train_size": 20000, "test_size": 256,
               "ground_truth_k": 200, "seed": 7},
    "glove50_surrogate": {"test_size": 256, "train_limit": 20000,
                          "ground_truth_k": 200, "seed": 11},
    "msmarco_surrogate": {"train_limit": 100000, "test_size": 256,
                          "ground_truth_k": 200},
}
metric = "cosine" if args.dataset.startswith("msmarco") else "l2"
ds = Dataset(
    args.dataset, data_dir="data", options=dict(OPTS[args.dataset])
).load()
x = np.asarray(ds.train_vectors)
q = np.asarray(ds.test_vectors, np.float32)
gt = np.asarray(ds.ground_truth[:, : args.k])

art = BinaryLSHIndexer(num_bits=args.num_bits, metric=metric).build(
    x, x.shape[1]
)
qd = jnp.asarray(q)
# artifact arrays MUST be jit ARGUMENTS: a closure embeds the corpus +
# code words as HLO constants — pathological program uploads through the
# tunnel (CLAUDE.md; the first version of this probe hung indefinitely)
leaves, treedef = jax.tree_util.tree_flatten(art.data)
rows = {}
for mult in (float(m) for m in args.mults.split(",")):

    @jax.jit
    def fn(qb, lv, _mult=mult):
        art.data = jax.tree_util.tree_unflatten(treedef, lv)
        return binary_lsh_search(art, qb, args.k, metric, _mult)

    d_, i_ = fn(qd, leaves)
    ids = np.asarray(i_)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(args.iters):
        d_, i_ = fn(qd, leaves)
    ids = np.asarray(i_)
    dt = (time.perf_counter() - t0) / args.iters
    rec = float(recall_at_k(gt, ids, args.k))
    qps = q.shape[0] / dt
    rows[str(int(mult))] = {"recall": round(rec, 4), "qps": round(qps)}
    print(f"mult {mult:>5.0f}: recall {rec:.4f}  {qps:>9,.0f} QPS", flush=True)

doc = {"dataset": args.dataset, "k": args.k, "num_bits": args.num_bits,
       "rows": rows}
print(json.dumps(doc))
if args.out:
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
