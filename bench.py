"""Flagship benchmark: exact-search QPS on the MS MARCO-shaped workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload matches the reference's hardest exact-search row: 100,000 x 384-d
vectors (MiniLM-sized), topk=20, 256-query batches. Baseline: the
reference's CPU FAISS IndexFlat on the same shape reached 550.41 QPS at
recall 1.0 (BASELINE.md, benchmark_20260305_070532 msmarco row). Exact
search has recall 1.0 by construction on both sides, so QPS is
apples-to-apples.

Timing discipline: the whole measured stream — REPEATS passes over REPEATS
distinct query batches — runs as ONE compiled program (a lax.scan whose
iterations carry a data dependency, so the compiler cannot elide passes),
and the clock stops only after results are materialised on the host.
``block_until_ready`` alone is not trusted: on tunneled runtimes it can
return before device work completes, silently inflating QPS.
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
    from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(7)
    db = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    sqn = dops.sq_norms(db)
    queries = jnp.asarray(
        rng.standard_normal((REPEATS, BATCH, D)).astype(np.float32)
    )
    _ = np.asarray(jnp.sum(db))  # force upload

    # db/sqn as ARGUMENTS (closure capture would embed them as HLO constants)
    def stream(qs, db_a, sqn_a):
        def body(carry, qb):
            d, i = dops.exact_search(
                qb + carry * jnp.float32(0.0),  # defeat loop hoisting
                db_a,
                K,
                metric="l2",
                db_sqnorms=sqn_a,
            )
            return jnp.max(d) * jnp.float32(1e-38), i

        _, ids = jax.lax.scan(body, jnp.float32(0.0), qs)
        return ids

    compiled = jax.jit(stream)
    try:
        np.asarray(compiled(queries, db, sqn))  # compile + warm-up (excluded)
    except Exception as exc:  # transient remote-compile flake: retry once
        if "remote_compile" not in str(exc):
            raise
        np.asarray(compiled(queries, db, sqn))

    start = time.perf_counter()
    ids = np.asarray(compiled(queries, db, sqn))
    elapsed = time.perf_counter() - start

    assert ids.shape == (REPEATS, BATCH, K)
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
