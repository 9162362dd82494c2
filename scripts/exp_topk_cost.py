"""Cost surface of TPU selection primitives at beam shapes.

argsort / lax.top_k / approx_max_k / jnp.sort over [B=256, C] for the
beam's merge widths, inside a fused 5-iteration scan (matching beam use).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache

B, REPEATS, ITERS = 256, 8, 5


def timed(make_fn, label):
    compiled = jax.jit(make_fn)
    rng = np.random.default_rng(0)
    qs = jnp.asarray(rng.standard_normal((REPEATS, B, 8)).astype(np.float32))
    np.asarray(compiled(qs))
    start = time.perf_counter()
    np.asarray(compiled(qs))
    elapsed = time.perf_counter() - start
    print(f"{label:56s} {elapsed / REPEATS * 1000:9.2f} ms/batch")


def scan_wrap(body_fn, c):
    rng = np.random.default_rng(1)
    vals0 = jnp.asarray(rng.standard_normal((B, c)).astype(np.float32))

    def run(qs):
        def outer(carry, qb):
            def inner(v, _):
                return body_fn(v), None

            v, _ = jax.lax.scan(inner, vals0 + carry, None, length=ITERS)
            return carry + v.sum() * 1e-30 + qb.sum() * 1e-30, v[:, :8]

        _, out = jax.lax.scan(outer, jnp.float32(0.0), qs)
        return out

    return run


def main():
    enable_compilation_cache()
    for c in (256, 384, 640, 1664):
        def argsort_body(v, c=c):
            order = jnp.argsort(v, axis=1)
            return jnp.take_along_axis(v, order, axis=1) + 1e-6

        timed(scan_wrap(argsort_body, c), f"argsort f32 [{B},{c}]")

        def sort_body(v):
            return jnp.sort(v, axis=1) + 1e-6

        timed(scan_wrap(sort_body, c), f"jnp.sort vals [{B},{c}]")

        for k in (8, 16, 32, 64, 128):
            if k >= c:
                continue

            def amk_body(v, k=k, c=c):
                nv, idx = jax.lax.approx_max_k(v, k, recall_target=1.0)
                return v.at[:, :k].set(nv * (1 + 1e-6))

            timed(scan_wrap(amk_body, c), f"approx_max_k k={k} [{B},{c}]")

        for k in (32, 128):
            if k >= c:
                continue

            def topk_body(v, k=k, c=c):
                nv, idx = jax.lax.top_k(v, k)
                return v.at[:, :k].set(nv * (1 + 1e-6))

            timed(scan_wrap(topk_body, c), f"lax.top_k   k={k} [{B},{c}]")

    # rank-merge primitive: counting ranks of two sorted lists + scatter
    for ef, w in ((128, 32), (128, 64)):
        def merge_body(v, ef=ef, w=w):
            a = v[:, :ef]
            bvals = v[:, ef:ef + w]
            ra = jnp.sum(bvals[:, None, :] < a[:, :, None], axis=2)
            rb = jnp.sum(a[:, None, :] <= bvals[:, :, None], axis=2)
            pos_a = jnp.arange(ef)[None, :] + ra
            pos_b = jnp.arange(w)[None, :] + rb
            out = jnp.full((B, ef), jnp.inf, jnp.float32)
            rows = jnp.arange(B)[:, None]
            out = out.at[rows, pos_a].set(a, mode="drop")
            out = out.at[rows, pos_b].set(bvals, mode="drop")
            return v.at[:, :ef].set(out * (1 + 1e-6))

        timed(scan_wrap(merge_body, ef + w),
              f"rank-merge sorted {ef}+{w} (count+scatter)")


if __name__ == "__main__":
    main()
