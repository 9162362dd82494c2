"""Follow-up: approx_max_k WITH indices consumed + take_along_axis costs
+ pairwise-compare dedup cost at beam shapes."""

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

    def noop(v):
        return v + 1e-6

    timed(scan_wrap(noop, 256), "noop baseline (scan+tunnel overhead)")

    for c in (384, 1664):
        for k in (48, 128):
            def amk_idx_body(v, k=k, c=c):
                nv, idx = jax.lax.approx_max_k(v, k, recall_target=1.0)
                # consume indices: re-gather and add
                got = jnp.take_along_axis(v, idx, axis=1)
                return v.at[:, :k].set(got * (1 + 1e-6))

            timed(scan_wrap(amk_idx_body, c),
                  f"approx_max_k+take idx k={k} [{B},{c}]")

    for c in (384, 1664):
        for k in (48, 128, c):
            def take_body(v, k=k, c=c):
                idx = ((jnp.arange(k)[None, :] * 7 + v[:, :1].astype(jnp.int32))
                       % c)
                got = jnp.take_along_axis(v, idx, axis=1)
                return v.at[:, :k].set(got * (1 + 1e-6))

            timed(scan_wrap(take_body, c),
                  f"take_along_axis k={k} from [{B},{c}]")

    # pairwise dedup compare: cand ids [B, CW] vs beam ids [B, EF]
    for cw, ef in ((512, 128), (1536, 128), (64, 128), (128, 128)):
        def dedup_body(v, cw=cw, ef=ef):
            ids_c = (v[:, :cw] * 1000).astype(jnp.int32)
            ids_b = (v[:, :ef] * 777).astype(jnp.int32)
            dup = jnp.any(
                ids_c[:, :, None] == ids_b[:, None, :], axis=2
            )
            return v.at[:, :cw].add(dup.astype(jnp.float32) * 1e-7)

        timed(scan_wrap(dedup_body, max(cw, ef)),
              f"pairwise dedup [{B},{cw}]x[{B},{ef}]")

    # scatter mark-expanded
    def scatter_body(v):
        sel = (v[:, :48] * 100).astype(jnp.int32) % 128
        e = v[:, :128]
        e = e.at[jnp.arange(B)[:, None], sel].add(1e-7, mode="drop")
        return v.at[:, :128].set(e)

    timed(scan_wrap(scatter_body, 256), "scatter mark 48 of 128")


if __name__ == "__main__":
    main()
