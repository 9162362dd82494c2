"""Flagship full-path sweep: blockmin width w and selection slack on the
bench.py workload (100k x 384d f32, k=20, B=256), bench-style chained
multi-batch amortisation. Recall is checked vs the dense HIGH oracle.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vectordb_retrieval_tpu.ops import distances as dops

N, D, K, B, REPEATS = 100_000, 384, 20, 256, 64


def main() -> None:
    rng = np.random.default_rng(7)
    db = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    sqn = dops.sq_norms(db)
    qs = jnp.asarray(
        rng.standard_normal((REPEATS, B, D)).astype(np.float32)
    )
    _ = np.asarray(jnp.sum(db))

    # oracle on the first batch
    od, oi = dops.exact_search(qs[0], db, K, metric="l2", db_sqnorms=sqn)
    od = np.asarray(od)

    for w, slack in ((8, 16), (8, 8), (16, 16), (32, 16), (32, 8)):

        def stream(qall, db_a, sqn_a, w=w, slack=slack):
            def body(carry, qb):
                d, i = dops._exact_search_blockmin(
                    qb + carry, db_a, sqn_a, K, "l2", 131072,
                    w=w, slack=slack,
                )
                chk = (
                    jnp.max(d) + jnp.sum(i).astype(jnp.float32)
                ) * jnp.float32(1e-38)
                return chk, i

            return jax.lax.scan(body, jnp.float32(0.0), qall)

        compiled = jax.jit(stream)
        np.asarray(compiled(qs, db, sqn)[0])
        t0 = time.perf_counter()
        chk, ids = compiled(qs, db, sqn)
        np.asarray(chk)
        dt = time.perf_counter() - t0
        d1, _ = dops._exact_search_blockmin(
            qs[0], db, sqn, K, "l2", 131072, w=w, slack=slack
        )
        err = float(np.max(np.abs(np.sort(np.asarray(d1), 1) - np.sort(od, 1))))
        print(
            f"w={w:2d} slack={slack:2d}  {B*REPEATS/dt:9.0f} QPS "
            f"({dt/REPEATS*1e3:6.3f} ms/batch)  max|d err|={err:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache
    enable_compilation_cache()
    main()
