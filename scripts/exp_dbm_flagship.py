"""dist_blockmin_pallas config sweep on the FLAGSHIP shape (100k x 384d,
B=256, f32): the kernel reaches ~300 GB/s at 1M x 128d but only ~77 GB/s
here — sweep blockmin width w and the VMEM tile budget to find what
binds. Arrays passed as jit args (CLAUDE.md closure rule).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vectordb_retrieval_tpu.ops import pallas_kernels as plk

N, D, B = 100_000, 384, 256
ITERS = 32


def timed(fn, *args):
    @jax.jit
    def run(q, *rest):
        def pass_(carry, _):
            out = fn(carry, *rest)
            bump = (out[:, :1] > jnp.inf).astype(jnp.float32)
            return carry + bump, out[0, 0]

        _, sink = jax.lax.scan(pass_, q, None, length=ITERS)
        return sink

    np.asarray(run(*args))
    t0 = time.perf_counter()
    np.asarray(run(*args))
    return (time.perf_counter() - t0) / ITERS * 1e3


def main() -> None:
    rng = np.random.default_rng(0)
    db = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    dbb = db.astype(jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    xn = jnp.sum(db * db, axis=-1)

    for w in (8, 16, 32):
        s = plk.dist_blockmin_pad_rows(N, w)
        dbp = jnp.pad(db, ((0, s - N), (0, 0)))
        dbpb = jnp.pad(dbb, ((0, s - N), (0, 0)))
        pen = jnp.pad(xn, (0, s - N), constant_values=jnp.inf).reshape(-1, w)
        for budget_mb in (15, 8, 4):
            plk._DBM_VMEM_BUDGET = budget_mb << 20
            t32 = timed(
                lambda qq, d_, p_: plk.dist_blockmin_pallas(qq, d_, p_, w=w),
                q, dbp, pen,
            )
            tb16 = timed(
                lambda qq, d_, p_: plk.dist_blockmin_pallas(qq, d_, p_, w=w),
                q, dbpb, pen,
            )
            gbs32 = N * D * 4 / t32 / 1e6
            gbs16 = N * D * 2 / tb16 / 1e6
            print(
                f"w={w:2d} vmem={budget_mb:2d}MiB  "
                f"f32 {t32:6.3f} ms ({gbs32:5.0f} GB/s)   "
                f"bf16 {tb16:6.3f} ms ({gbs16:5.0f} GB/s)",
                flush=True,
            )
    plk._DBM_VMEM_BUDGET = 15 << 20


if __name__ == "__main__":
    from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache
    enable_compilation_cache()
    main()
