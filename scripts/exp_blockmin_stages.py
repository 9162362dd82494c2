"""Stage-split timing of the blockmin exact path at the SIFT-1M shape.

Stages: (1) stream scan producing per-block minima; (2) + top-(k+slack)
block selection; (3) + block gather + exact rescore (the full path).
Each variant is timed as its own fused program with host materialisation,
ITERS passes chained data-dependently to amortise the tunnel dispatch.
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
from vectordb_retrieval_tpu.ops.distances import (
    _BLOCKMIN_SLACK,
    _BLOCKMIN_WIDTH,
    clamp_chunk,
    pairwise_distances,
    sq_norms,
    top_k_smallest,
)
from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--w", type=int, default=_BLOCKMIN_WIDTH)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    db = jnp.asarray(rng.standard_normal((args.n, args.d), dtype=np.float32))
    q0 = jnp.asarray(rng.standard_normal((args.b, args.d), dtype=np.float32))
    w, k, b, iters = args.w, args.k, args.b, args.iters
    n, dim = args.n, args.d
    budget = max(4096, (1 << 26) // b)
    chunk = clamp_chunk(min(65_536, budget), n, align=max(512, w))
    chunk = max(w, (chunk // w) * w)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n

    def prep(db):
        dbp = jnp.pad(db, ((0, pad), (0, 0))).reshape(n_chunks, chunk, dim)
        xn = sq_norms(db)
        pen = jnp.pad(xn, (0, pad), constant_values=jnp.inf).reshape(
            n_chunks, chunk
        )
        return dbp, pen

    def scan_bmins(q, dbp, pen):
        def step(_, inp):
            xc, pc = inp
            dist = pairwise_distances(q, xc, "l2", pc)
            return None, jnp.min(dist.reshape(b, chunk // w, w), axis=-1)

        _, bms = jax.lax.scan(step, None, (dbp, pen))
        return jnp.moveaxis(bms, 0, 1).reshape(b, -1)

    nb = k + _BLOCKMIN_SLACK

    def stage1(q, dbp, pen):
        bmins = scan_bmins(q, dbp, pen)
        return jnp.sum(bmins, axis=1)  # force the reduce, skip selection

    def stage2(q, dbp, pen):
        bmins = scan_bmins(q, dbp, pen)
        v, blk = top_k_smallest(bmins, nb)
        return v[:, 0] + blk[:, 0].astype(jnp.float32)

    def stage3(q, dbp, pen, db):
        v, i = dops.exact_search(q, db, k, metric="l2", db_sqnorms=None)
        return v[:, 0] + i[:, 0].astype(jnp.float32)

    def chained(fn, *extra):
        def run(q, dbp, pen, *extra):
            def body(i, carry):
                out = fn(carry, dbp, pen, *extra)
                return carry + (out[:, None] * 0.0).astype(jnp.float32)

            return jax.lax.fori_loop(0, iters, body, q)

        return run

    dbp, pen = prep(db)
    jax.block_until_ready((dbp, pen))
    for name, fn, extra in (
        ("stage1 scan+blockmin", stage1, ()),
        ("stage2 +selection", stage2, ()),
        ("stage3 full exact_search", stage3, (db,)),
    ):
        f = jax.jit(chained(fn))
        out = f(q0, dbp, pen, *extra)
        np.asarray(out)
        t0 = time.time()
        out = f(q0, dbp, pen, *extra)
        np.asarray(out)
        dt = (time.time() - t0) / iters
        print(f"{name:<28s} {dt*1e3:8.2f} ms/pass  "
              f"({b/dt:9.1f} QPS)")


if __name__ == "__main__":
    main()
