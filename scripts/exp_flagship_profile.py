"""Component profile of the flagship bench shape (100k x 384d, B=256, k=20).

Times, each as ONE compiled 20-repeat scan with results materialised in
the clock:
  a) full blockmin exact search (the bench path)
  b) stage 1 only (blockmin reduction)
  c) raw HIGH-precision dot only
  d) raw DEFAULT-precision dot only
  e) stage-1 at DEFAULT precision + enlarged slack + exact rescore
  f) selection only (approx_max_k over [B, N/w])
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vectordb_retrieval_tpu.ops import distances as dops
from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache

N, D, K = 100_000, 384, 20
B = 256
REPEATS = 20


def timed(label, fn, qs, *arrays):
    def stream(qs, *arrs):
        def body(carry, qb):
            out = fn(qb + carry * jnp.float32(0.0), *arrs)
            first = jax.tree_util.tree_leaves(out)[0]
            return jnp.max(first).astype(jnp.float32) * jnp.float32(1e-38), ()

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), qs)
        return acc

    compiled = jax.jit(stream)
    np.asarray(compiled(qs, *arrays))
    t0 = time.perf_counter()
    np.asarray(compiled(qs, *arrays))
    dt = time.perf_counter() - t0
    print(f"{label:55s} {dt/REPEATS*1e3:8.2f} ms/batch  {B*REPEATS/dt:9.0f} QPS")
    return dt


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(7)
    db = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    sqn = dops.sq_norms(db)
    qs = jnp.asarray(rng.standard_normal((REPEATS, B, D)).astype(np.float32))
    np.asarray(jnp.sum(db))

    w = 8
    chunk = 100352  # one chunk at this shape
    pad = chunk - N
    dbp = jnp.pad(db, ((0, pad), (0, 0)))
    pen = jnp.pad(sqn, (0, pad), constant_values=np.inf)

    timed("a) full blockmin exact (bench path)",
          lambda qb, d_, s_: dops.exact_search(qb, d_, K, metric="l2", db_sqnorms=s_),
          qs, db, sqn)

    def stage1(qb, dbp_, pen_):
        dist = dops.pairwise_distances(qb, dbp_, "l2", pen_)
        return jnp.min(dist.reshape(B, chunk // w, w), axis=-1)

    timed("b) stage 1 blockmin only (HIGH)", stage1, qs, dbp, pen)

    def rawdot(prec):
        def f(qb, dbp_):
            return jax.lax.dot_general(
                qb, dbp_, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
        return f

    timed("c) raw dot HIGH", rawdot(jax.lax.Precision.HIGH), qs, dbp)
    timed("d) raw dot DEFAULT", rawdot(jax.lax.Precision.DEFAULT), qs, dbp)

    def stage1_def(qb, dbp_, pen_):
        dots = jax.lax.dot_general(
            qb, dbp_, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        qn = jnp.sum(qb * qb, axis=-1)
        dist = qn[:, None] + pen_[None, :] - 2.0 * dots
        return jnp.min(dist.reshape(B, chunk // w, w), axis=-1)

    timed("e) stage 1 blockmin DEFAULT", stage1_def, qs, dbp, pen)

    bmins = stage1(qs[0], dbp, pen)

    def select(bm_noise, bm):
        vals, blk = dops.top_k_smallest(bm + bm_noise[:, :1] * 0, K + 16)
        return vals

    timed("f) selection approx_max_k over [B, N/w]",
          lambda qb, bm: select(qb, bm), qs[:, :, :1].reshape(REPEATS, B, 1) * 0, bmins)

    # g) full search with DEFAULT stage-1 + bigger slack + exact rescore
    def full_default(qb, dbp_, pen_, db_, sqn_):
        bm = stage1_def(qb, dbp_, pen_)
        nb = K + 40
        _, blk = dops.top_k_smallest(bm, nb)
        blocks = dbp_.reshape(-1, w, D)
        bvecs = blocks[blk]
        diff = bvecs - qb[:, None, None, :]
        cd = jnp.sum(diff * diff, axis=-1)
        cand = (blk[:, :, None] * w
                + jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)).reshape(B, nb * w)
        cd = jnp.where(cand < N, cd.reshape(B, nb * w), jnp.inf)
        vals, sel = dops.top_k_smallest(cd, K)
        ids = jnp.take_along_axis(cand, sel, axis=1)
        return vals, ids

    timed("g) DEFAULT stage1 + slack40 + exact rescore",
          lambda qb, a, b_, c, d_: full_default(qb, a, b_, c, d_),
          qs, dbp, pen, db, sqn)

    # recall check g vs exact
    gt_d, gt_i = dops.exact_search(qs[0], db, K, metric="l2", db_sqnorms=sqn)
    g_d, g_i = full_default(qs[0], dbp, pen, db, sqn)
    gt_i, g_i = np.asarray(gt_i), np.asarray(g_i)
    rec = np.mean([len(set(gt_i[i]) & set(g_i[i])) / K for i in range(B)])
    print(f"   g recall vs exact: {rec:.6f}")


if __name__ == "__main__":
    main()
