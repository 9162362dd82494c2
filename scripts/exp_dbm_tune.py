"""Tune dist_blockmin_pallas: isolate MXU / VPU-min / transpose costs.

Variants at a given (n, d, b, w), fused-timing protocol (CLAUDE.md):
  1. full kernel (current production config)
  2. kernel with transpose_out disabled (XLA transpose afterwards)
  3. matmul-only floor: same tiling, min replaced by a strided slice
     (isolates the VPU block-min + pen cost)
  4. w sweep at the same shape

Run at the flagship shape (100k x 384) and the SIFT shape (1M x 128).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vectordb_retrieval_tpu.ops import pallas_kernels as plk
from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache


def time_fn(name, fn, iters, *args):
    def chained(*a):
        def body(i, carry):
            out = fn(carry, *a[1:])
            return carry + (out * 0.0).astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, a[0])

    f = jax.jit(chained)
    np.asarray(f(*args))
    t0 = time.time()
    np.asarray(f(*args))
    dt = (time.time() - t0) / iters
    print(f"{name:<40s} {dt*1e3:8.2f} ms/pass", flush=True)
    return dt


def matmul_floor_kernel(qhi_ref, qlo_ref, db_ref, out_ref, *, w):
    db = db_ref[:]
    db_hi = db.astype(jnp.bfloat16)
    db_lo = (db - db_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dots = sum(
        jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for a, b in ((db_hi, qhi_ref[:]), (db_hi, qlo_ref[:]),
                     (db_lo, qhi_ref[:]))
    )
    t, b = dots.shape
    # strided slice instead of the block min: same output shape, no
    # reduction, no pen add, no transpose
    out_ref[:] = jax.lax.slice(dots, (0, 0), (t, b), (w, 1))


@functools.partial(jax.jit, static_argnames=("w", "tile"))
def matmul_floor(queries, payload, w: int, tile: int):
    b, d = queries.shape
    s = payload.shape[0]
    n_tiles = -(-s // tile)
    q_hi = queries.astype(jnp.bfloat16)
    q_lo = (queries - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return pl.pallas_call(
        functools.partial(matmul_floor_kernel, w=w),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile // w, b), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s // w, b), jnp.float32),
    )(q_hi, q_lo, payload)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=384)
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--w", type=int, default=8)
    ap.add_argument("--iters", type=int, default=24)
    args = ap.parse_args()
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    n, d, b, w = args.n, args.d, args.b, args.w
    s = plk.dist_blockmin_pad_rows(n, w)
    db = np.zeros((s, d), np.float32)
    db[:n] = rng.standard_normal((n, d), dtype=np.float32)
    pen = np.full((s,), np.inf, np.float32)
    pen[:n] = (db[:n] * db[:n]).sum(1)
    q0 = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32))
    db_j = jnp.asarray(db)
    pen_j = jnp.asarray(pen).reshape(s // w, w)
    gbytes = s * d * 4 / 1e9

    def full(q, db_j, pen_j):
        bm = plk.dist_blockmin_pallas(q, db_j, pen_j, w=w)
        return jnp.sum(bm, axis=1)[:, None] * jnp.zeros((1, d))

    dt = time_fn(f"full kernel w={w}", full, args.iters, q0, db_j, pen_j)
    print(f"  -> {gbytes/dt:.0f} GB/s effective")

    tile = plk.dist_blockmin_tile(b, d, 4, w)
    tile = max(8 * w, (min(tile, s) // (8 * w)) * (8 * w))
    if s % tile == 0:
        def floor(q, db_j):
            o = matmul_floor(q, db_j, w, tile)
            return jnp.sum(o, axis=1)[:, None] * jnp.zeros((1, d))

        dt2 = time_fn(f"matmul floor tile={tile}", floor, args.iters,
                      q0, db_j)
        print(f"  -> {gbytes/dt2:.0f} GB/s effective")
    else:
        print(f"(floor skipped: s={s} % tile={tile} != 0)")

    for w2 in (8, 16, 32, 64):
        if w2 == w or s % (8 * w2):
            continue
        pj = jnp.asarray(pen).reshape(s // w2, w2)

        def fw(q, db_j, pj, w2=w2):
            bm = plk.dist_blockmin_pallas(q, db_j, pj, w=w2)
            return jnp.sum(bm, axis=1)[:, None] * jnp.zeros((1, d))

        time_fn(f"full kernel w={w2}", fw, args.iters, q0, db_j, pj)


if __name__ == "__main__":
    main()
