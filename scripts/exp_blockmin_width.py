"""Block-width sweep for the blockmin exact path.

The blockmin certificate holds at ANY block width w (any block containing
a true top-k element has blockmin <= d_k; at most k-1 blocks can rank
strictly below it). Widening w shrinks the selection problem (N/w block
minima per query) at the cost of more rescore candidates ((k+slack)*w),
which are cheap contiguous-slab gathers. This sweeps w at the flagship
(100k x 384d) and SIFT-1M (1M x 128d) shapes to find the QPS optimum,
checking exactness against the dense/merge path.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vectordb_retrieval_tpu.ops import distances as dops
from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache


def run_shape(n: int, d: int, b: int, k: int, iters: int, widths) -> None:
    rng = np.random.default_rng(0)
    db = jnp.asarray(rng.standard_normal((n, d), dtype=np.float32))
    sqn = dops.sq_norms(db)
    qs = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32))
    np.asarray(jnp.sum(db))  # force upload

    budget = max(4096, (1 << 26) // b)
    chunk = min(dops.DEFAULT_CHUNK_ROWS, budget)

    # reference result (current default width) for exactness check
    ref_d, _ = dops._exact_search_blockmin(qs, db, sqn, k, "l2", chunk)
    ref_d = np.asarray(ref_d)

    print(f"== shape N={n} d={d} B={b} k={k} chunk={chunk}")
    for w in widths:
        def stream(q, db_a, sqn_a):
            def body(carry, _):
                dd, ii = dops._exact_search_blockmin(
                    q + carry, db_a, sqn_a, k, "l2", chunk, w=w
                )
                chk = (jnp.max(dd) + jnp.sum(ii).astype(jnp.float32)) * (
                    jnp.float32(1e-38)
                )
                return chk, None

            chk, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return chk

        f = jax.jit(stream)
        np.asarray(f(qs, db, sqn))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(f(qs, db, sqn))
        dt = (time.perf_counter() - t0) / iters
        dv, _ = dops._exact_search_blockmin(qs, db, sqn, k, "l2", chunk, w=w)
        err = float(np.max(np.abs(np.asarray(dv) - ref_d)))
        print(
            f"  w={w:4d}  {dt*1e3:8.2f} ms/pass  ({b/dt:9.1f} QPS)"
            f"  maxerr={err:.2e}"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--k", type=int, default=None)
    ap.add_argument("--widths", default="8,16,32,64,128")
    ap.add_argument("--shapes", default="100000x384x256x20,1000000x128x256x100")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    enable_compilation_cache()
    widths = [int(x) for x in args.widths.split(",")]
    for spec in args.shapes.split(","):
        n, d, b, k = (int(x) for x in spec.split("x"))
        if args.k:
            k = args.k
        run_shape(n, d, b, k, args.iters, widths)


if __name__ == "__main__":
    main()
