"""Sweep the manual-DMA slab kernel's ring depth on real TPU.

Measures effective HBM bandwidth of slab_dots_manual at the two
production shapes (msmarco-like 512q x 96 slabs x 128 x 384d bf16;
SIFT-like 256q x 96 slabs x 128 x 128d bf16) for ring depths
{8, 16, 32, 48, 64}. Honest timing: repeats folded into one compiled
scan, results materialised inside the clock.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vectordb_retrieval_tpu.ops import pallas_kernels as pk
from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache

REPEATS = 16


def run_shape(label, b, w, nb, length, d, dtype, depths):
    rng = np.random.default_rng(0)
    vecs = jnp.asarray(
        rng.standard_normal((nb, length, d)).astype(np.float32)
    ).astype(dtype)
    queries = jnp.asarray(
        rng.standard_normal((REPEATS, b, d)).astype(np.float32)
    )
    sels = jnp.asarray(
        rng.integers(0, nb, size=(REPEATS, b, w)).astype(np.int32)
    )
    slab_bytes = b * w * length * d * jnp.dtype(dtype).itemsize
    print(f"\n== {label}: B={b} W={w} L={length} d={d} {np.dtype(dtype).name} "
          f"({slab_bytes/1e6:.0f} MB/wave) ==")

    ref = None
    for depth in depths:
        def stream(qs, ss, v):
            def body(carry, args):
                qb, sb = args
                out = pk.slab_dots_manual(qb, v, sb, depth=depth)
                return carry + out.max() * 1e-30, ()

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), (qs, ss))
            return acc

        compiled = jax.jit(stream)
        r = np.asarray(compiled(queries, sels, vecs))  # warm
        t0 = time.perf_counter()
        r = np.asarray(compiled(queries, sels, vecs))
        dt = time.perf_counter() - t0
        gbps = slab_bytes * REPEATS / dt / 1e9
        ms = dt / REPEATS * 1e3
        print(f"depth={depth:3d}  {ms:7.2f} ms/wave  {gbps:7.1f} GB/s effective")
        # correctness spot-check vs depth-16 on one batch
        out = np.asarray(pk.slab_dots_manual(queries[0], vecs, sels[0], depth=depth))
        if ref is None:
            ref = out
        else:
            err = np.max(np.abs(out - ref) / (np.abs(ref) + 1e-6))
            if err > 1e-5:
                print(f"  !! mismatch vs first depth: maxrelerr={err:.3g}")


def main():
    enable_compilation_cache()
    print("devices:", jax.devices())
    depths = [8, 16, 32, 48, 64]
    run_shape("msmarco", 512, 96, 784, 128, 384, jnp.bfloat16, depths)
    run_shape("sift1m", 256, 96, 7816, 128, 128, jnp.bfloat16, depths)


if __name__ == "__main__":
    main()
