"""LSH recall/QPS tradeoff frontier on the 1M SIFT-shaped surrogate.

Round-2 VERDICT weak #6: every committed LSH row showed recall 1.0
(candidate_multiplier rerank + in-kernel fallback make small-N LSH
effectively exact), so the tradeoff the reference's LSH story centres on
(tuned recall 0.32-0.51, ref src/algorithms/lsh.py:31-39 guarantee
docstring) was never demonstrated. This sweeps tables x hash_size x
candidate_multiplier at 1M rows — where LSH genuinely trades recall for
probe work — and prints one frontier row per setting with the
sign-LSH / E2LSH collision-probability guarantee quoted per point.

Guarantee (reference lsh.py:31-39): for sign-LSH the per-table collision
probability of rows at angle theta is (1 - theta/pi)^hash_size; across T
independent tables P(candidate) = 1 - (1 - p)^T. For E2LSH with bucket
width w, p = collision prob of the floor-hash at distance r.

Usage: python scripts/exp_lsh_frontier.py [--limit 1000000] [--out md]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _norm_cdf(z: np.ndarray) -> np.ndarray:
    from math import sqrt

    from numpy import vectorize

    import math

    return 0.5 * (1.0 + np.vectorize(math.erf)(np.asarray(z) / sqrt(2.0)))


def sign_guarantee(num_tables: int, hash_size: int,
                   theta_deg: float) -> float:
    """P(two rows at angle theta collide in >=1 of T sign-LSH tables)
    (reference lsh.py:31-39: p1 = (1 - theta/pi)^hash_size)."""
    p1 = (1.0 - np.deg2rad(theta_deg) / np.pi) ** hash_size
    return float(1.0 - (1.0 - p1) ** num_tables)


def e2lsh_guarantee(num_tables: int, hash_size: int, width: float,
                    r: float) -> float:
    """P(collision in >=1 table) for E2LSH floor-hash at distance r.

    Per-hash (Datar et al. 2004): with u = w/r,
    p = 1 - 2*Phi(-u) - 2/(sqrt(2*pi)*u) * (1 - exp(-u^2/2)).
    """
    u = width / max(r, 1e-9)
    p = (1.0 - 2.0 * float(_norm_cdf(-u))
         - 2.0 / (np.sqrt(2 * np.pi) * u) * (1.0 - np.exp(-u * u / 2.0)))
    p1 = max(p, 0.0) ** hash_size
    return float(1.0 - (1.0 - p1) ** num_tables)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit", type=int, default=1_000_000)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument("--platform", type=str, default="",
                    help="force jax platform (cpu for smoke runs)")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp

    from vectordb_retrieval_tpu.bench.metrics import recall_at_k
    from vectordb_retrieval_tpu.data.native_io import read_fvecs
    from vectordb_retrieval_tpu.models.composite import CompositeAlgorithm
    from vectordb_retrieval_tpu.ops import distances as dops
    from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache

    enable_compilation_cache()
    x = read_fvecs("data/sift1m_synth/sift_base.fvecs", limit=args.limit)
    q = read_fvecs("data/sift1m_synth/sift_query.fvecs", limit=args.queries)
    xd = jnp.asarray(np.asarray(x))
    qd = jnp.asarray(np.asarray(q))
    gt_l2_d, gt_l2 = (np.asarray(v)
                      for v in dops.exact_search(qd, xd, args.k))
    xn, qn = dops.normalize(xd), dops.normalize(qd)
    gt_cos_d, gt_cos = (np.asarray(v)
                        for v in dops.exact_search(qn, xn, args.k,
                                                   metric="ip"))
    del xd, xn
    # measured per-dataset difficulty: median kth-NN angle (cosine rows)
    # and median kth-NN l2 distance (E2LSH rows) — the guarantee is quoted
    # at the HARDEST in-set neighbour, the one the recall@k target needs
    med_cos = float(np.median(np.clip(-gt_cos_d[:, -1], -1.0, 1.0)))
    theta_deg = float(np.degrees(np.arccos(med_cos)))
    med_r = float(np.sqrt(np.median(gt_l2_d[:, -1])))
    print(f"corpus {x.shape} queries {q.shape} k={args.k} "
          f"median kth-NN angle={theta_deg:.1f}deg l2 r={med_r:.1f}",
          flush=True)

    # frontier: long hashes / few tables = few collisions (fast+lossy);
    # short hashes / many tables = dense collisions (slow+high recall).
    # Sign-LSH (cosine) is the reference's guarantee story
    # (lsh.py:31-39); the E2LSH rows exercise the floor-hash family at a
    # data-scaled bucket width (w ~ r and 2r).
    settings = [
        dict(metric="cosine", num_tables=2, hash_size=18,
             candidate_multiplier=4.0),
        dict(metric="cosine", num_tables=4, hash_size=16,
             candidate_multiplier=4.0),
        dict(metric="cosine", num_tables=8, hash_size=16,
             candidate_multiplier=8.0),
        dict(metric="cosine", num_tables=8, hash_size=14,
             candidate_multiplier=8.0),
        dict(metric="cosine", num_tables=12, hash_size=14,
             candidate_multiplier=16.0),
        dict(metric="cosine", num_tables=12, hash_size=12,
             candidate_multiplier=16.0),
        dict(metric="cosine", num_tables=16, hash_size=12,
             candidate_multiplier=32.0),
        dict(metric="cosine", num_tables=24, hash_size=10,
             candidate_multiplier=32.0),
        dict(metric="cosine", num_tables=32, hash_size=8,
             candidate_multiplier=64.0),
        dict(metric="l2", num_tables=4, hash_size=6, width_r=1.0,
             candidate_multiplier=8.0),
        dict(metric="l2", num_tables=8, hash_size=6, width_r=1.0,
             candidate_multiplier=16.0),
        dict(metric="l2", num_tables=8, hash_size=8, width_r=2.0,
             candidate_multiplier=16.0),
        dict(metric="l2", num_tables=12, hash_size=8, width_r=2.0,
             candidate_multiplier=32.0),
    ]
    rows = []
    for s in settings:
        metric = s["metric"]
        width = s.get("width_r", 1.0) * med_r
        algo = CompositeAlgorithm(
            dimension=x.shape[1],
            indexer={
                "type": "LSHIndexer", "metric": metric,
                "num_tables": s["num_tables"], "hash_size": s["hash_size"],
                "bucket_width": width, "seed": 42,
            },
            searcher={
                "type": "LSHSearcher", "metric": metric,
                "candidate_multiplier": s["candidate_multiplier"],
                "fallback_to_bruteforce": False,  # the tradeoff, not exact
            },
            metric=metric,
        )
        t0 = time.time()
        algo.build_index(np.asarray(x))
        bt = time.time() - t0
        searcher = algo.searcher

        qs = jnp.asarray(np.repeat(np.asarray(q)[None], args.repeats, 0))

        # pass the artifact leaves as ARGUMENTS (closing over them would
        # lower the 1M-row tables as embedded HLO constants — GB-scale
        # programs and 413 upload errors on the tunnel; see
        # bench/experiment._timed_search which does the same swap)
        art = algo.artifact
        data_leaves, data_treedef = jax.tree_util.tree_flatten(art.data)

        def stream(qb_all, leaves):
            art.data = jax.tree_util.tree_unflatten(data_treedef, leaves)
            def body(carry, qb):
                d, i = searcher.device_kernel(
                    qb + carry * jnp.float32(0.0), args.k
                )
                return jnp.max(jnp.where(jnp.isfinite(d), d, 0.0)) * (
                    jnp.float32(1e-38)
                ), i
            _, ids = jax.lax.scan(body, jnp.float32(0.0), qb_all)
            return ids

        comp = jax.jit(stream)
        try:
            ids = np.asarray(comp(qs, data_leaves))  # compile+warm
            t0 = time.time()
            ids = np.asarray(comp(qs, data_leaves))
            el = time.time() - t0
        finally:
            art.data = jax.tree_util.tree_unflatten(
                data_treedef, data_leaves
            )
        qps = args.queries * args.repeats / el
        rec = recall_at_k(gt_cos if metric == "cosine" else gt_l2,
                          ids[0], args.k)
        if metric == "cosine":
            g = sign_guarantee(s["num_tables"], s["hash_size"], theta_deg)
        else:
            g = e2lsh_guarantee(s["num_tables"], s["hash_size"], width,
                                med_r)
        row = {**s, "recall": round(float(rec), 4), "qps": round(qps, 1),
               "build_s": round(bt, 1),
               "p_collide_kthNN": round(g, 4)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(f"\n(P(collide) quoted at the measured kth-NN difficulty: "
          f"theta={theta_deg:.1f}deg / r={med_r:.1f})")
    print("| family | tables | bits | mult | P(collide,kthNN) "
          "| recall | QPS |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        fam = "sign" if r["metric"] == "cosine" else "e2lsh"
        print(f"| {fam} | {r['num_tables']} | {r['hash_size']} | "
              f"{r['candidate_multiplier']} | {r['p_collide_kthNN']} | "
              f"{r['recall']} | {r['qps']} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
