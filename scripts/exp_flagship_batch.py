"""Flagship batch-size A/B: BATCH 256 (shipped) vs 512 at equal totals.

The flagship stream (bench.py) folds REPEATS batches into one compiled
program; the per-batch [B, N] blockmin pass has a fixed per-iteration
cost, so doubling B halves the iteration count and may improve MXU
utilisation. 512-query batches at 100k rows are safe on the tunnel (the
documented worker crash was 1024 queries x 1M rows — 40x the transient);
this probe measures both back-to-back under the identical honest
protocol so host-load variance cancels.

Usage: python scripts/exp_flagship_batch.py
Prints one JSON line per variant.

Result (2026-08-21, v5e tunnel, ABA order): 256 -> 193.8k / 202.9k QPS,
512 -> 165.7k QPS. Doubling the batch LOSES ~17%: the [B, chunk]
transient distance block doubles (halving the streaming chunk budget in
exact_search's 256 MB bound, so the scan takes more, shorter steps) and
the blockmin selection row widens, while the matmul was already
MXU-saturated at B=256. The shipped flagship batch (bench.py BATCH=256)
stands.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, D, K = 100_000, 384, 20
TOTAL = 24_576  # queries per measured stream (bench.py: 96 x 256)
UNROLL = 32


def run(batch: int) -> float:
    import jax
    import jax.numpy as jnp

    from vectordb_retrieval_tpu.ops import distances as dops
    from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache

    enable_compilation_cache()
    repeats = TOTAL // batch
    rng = np.random.default_rng(7)
    db = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    sqn = dops.sq_norms(db)
    queries = jnp.asarray(
        rng.standard_normal((repeats, batch, D)).astype(np.float32)
    )
    _ = np.asarray(jnp.sum(db))

    def stream(qs, db_a, sqn_a):
        def body(carry, qb):
            d, i = dops.exact_search(
                qb + carry, db_a, K, metric="l2", db_sqnorms=sqn_a
            )
            chk = (jnp.max(d) + jnp.sum(i).astype(jnp.float32)) * jnp.float32(
                1e-38
            )
            return chk, i

        return jax.lax.scan(
            body, jnp.float32(0.0), qs, unroll=min(UNROLL, repeats)
        )

    compiled = jax.jit(stream)
    np.asarray(compiled(queries, db, sqn)[0])  # compile + warm up
    best = 0.0
    for _ in range(2):
        start = time.perf_counter()
        chk, ids = compiled(queries, db, sqn)
        np.asarray(chk)
        qps = TOTAL / (time.perf_counter() - start)
        best = max(best, qps)
    ids = np.asarray(ids)
    assert ids.shape == (repeats, batch, K)
    assert (ids >= 0).all() and (ids < N).all()
    return best


def main() -> None:
    for batch in (256, 512, 256):  # ABA to expose drift
        qps = run(batch)
        print(json.dumps({"batch": batch, "qps": round(qps, 1)}))


if __name__ == "__main__":
    main()
