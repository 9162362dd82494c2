"""Flagship benchmark: exact-search QPS on the MS MARCO-shaped workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload matches the reference's hardest exact-search row: 100,000 x 384-d
vectors (MiniLM-sized), topk=20, batched queries. Baseline: the reference's
CPU FAISS IndexFlat on the same shape reached 550.41 QPS at recall 1.0
(BASELINE.md, benchmark_20260305_070532 msmarco row). Exact search has
recall 1.0 by construction on both sides, so QPS is apples-to-apples.

Timing discipline: jit-compile + warm-up excluded; every timed region blocks
until device results are ready (async dispatch cannot inflate QPS).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_QPS = 550.41  # reference exact/msmarco row, BASELINE.md
N, D, K = 100_000, 384, 20
BATCH = 256
REPEATS = 20


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vectordb_retrieval_tpu.ops import distances as dops

    rng = np.random.default_rng(7)
    db = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    sqn = dops.sq_norms(db)
    queries = jnp.asarray(rng.standard_normal((BATCH, D)).astype(np.float32))
    db, sqn, queries = jax.block_until_ready((db, sqn, queries))

    def run():
        return dops.exact_search(queries, db, K, metric="l2", db_sqnorms=sqn)

    jax.block_until_ready(run())  # compile + warm-up

    start = time.perf_counter()
    for _ in range(REPEATS):
        out = run()
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start

    qps = (BATCH * REPEATS) / elapsed
    print(
        json.dumps(
            {
                "metric": "exact_search_qps_100k_384d_top20",
                "value": round(qps, 2),
                "unit": "queries/s",
                "vs_baseline": round(qps / BASELINE_QPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
