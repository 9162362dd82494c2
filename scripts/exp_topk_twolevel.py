"""Micro-bench: one-level vs two-level blockmin selection at the 1M shape.

RESULT (v5e, 2026-08-18): the two-level trick LOSES on TPU — one-level
approx_max_k over [256, 31250] -> 116 runs 6.72 ms/pass vs 6.93 (g=8),
9.57 (g=16), 14.89 (g=32), 24.50 (g=64): the TPU PartialReduce selection
is already sub-linear in width, and the survivor take_along_axis gather
plus second selection cost more than the width reduction saves. (On CPU
the same shapes win 3x.) Kept as the recorded negative result for
docs/roadmap.md #2; NOT wired into production paths.

The 1M exact search is selection-bound after the scale-aware width rule
(docs/roadmap.md #2): top-(k+slack) over the [B, N/w] blockmin matrix.
Containment composes: the true top-k elements occupy at most k
SUPER-blocks of g consecutive block minima, so selecting s super-blocks
by super-min, gathering their s*g block minima, and selecting s blocks
from those is exactly as safe as the one-level selection with the same
s (every block that could hold a top-k element survives level 1 by the
same k-distinct-elements argument). This trades one wide approx_max_k
for a min-reduce + two narrow ones.

Timings chain ITERS passes in one program (results perturb the next
input) so nothing is elided; arrays passed as arguments (CLAUDE.md).

Usage: python scripts/exp_topk_twolevel.py [--platform cpu] [--nb 31250]
         [--b 256] [--s 116] [--iters 8]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--nb", type=int, default=31_250)  # 1M / w=32
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--s", type=int, default=116)  # k=100 + slack 16
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from vectordb_retrieval_tpu.ops.distances import top_k_smallest
    from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    b, nb, s, iters = args.b, args.nb, args.s, args.iters
    bm0 = jnp.asarray(rng.standard_normal((b, nb)), jnp.float32)

    def timed(name, step):
        def run(x):
            def body(c, _):
                v, i = step(c)
                pert = (jnp.sum(v) * 1e-12).astype(c.dtype)
                return c + pert, jnp.sum(i)

            out, sums = jax.lax.scan(body, x, None, length=iters)
            return jnp.sum(out) + jnp.sum(sums).astype(jnp.float32)

        g = jax.jit(run)
        np.asarray(g(bm0))
        t0 = time.time()
        out = np.asarray(g(bm0))
        dt = (time.time() - t0) / iters
        print(f"{name:28s} {dt*1e3:8.2f} ms/pass  (checksum {out:.3f})")
        return dt

    def one_level(bm):
        return top_k_smallest(bm, s)

    def two_level(g):
        def f(bm):
            pad = (-nb) % g
            bp = (
                jnp.pad(bm, ((0, 0), (0, pad)), constant_values=jnp.inf)
                if pad
                else bm
            )
            nsb = (nb + pad) // g
            sm = jnp.min(bp.reshape(b, nsb, g), axis=2)  # super minima
            ssb = min(s, nsb)
            _, sb = top_k_smallest(sm, ssb)  # [B, ssb] super-block ids
            col = (
                sb[:, :, None] * g + jnp.arange(g)[None, None, :]
            ).reshape(b, ssb * g)
            sub = jnp.take_along_axis(bp, col, axis=1)
            v, p = top_k_smallest(sub, min(s, ssb * g))
            return v, jnp.take_along_axis(col, p, axis=1)

        return f

    # correctness: identical selected block sets (values compared — ties
    # may reorder ids)
    v1, i1 = jax.jit(one_level)(bm0)
    for g in (8, 16, 32):
        v2, i2 = jax.jit(two_level(g))(bm0)
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v2), rtol=0, atol=0
        )
    print(f"two-level == one-level (bit-exact values) at g in 8/16/32")

    timed("one-level top_k", one_level)
    for g in (8, 16, 32, 64):
        timed(f"two-level g={g}", two_level(g))


if __name__ == "__main__":
    main()
