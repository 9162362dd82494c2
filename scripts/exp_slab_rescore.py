"""Can the manual-DMA slab kernel beat the HLO block gather for the
fused-IVF rescore stage?

The rescore gathers [B, nb] blocks of [w=32, d] bf16 (~8 KB units) and
needs exact f32-grade L2 distances. HLO gather measured ~3-4.6 ms at
B=256, nb=116-124 (latency-bound at ~100 ns/unit). slab_dots_manual
(ops/pallas_kernels.py) rides a 32-deep DMA ring at 560-574 GB/s on the
graph family's 131 KB slabs — here we measure it on the IVF shape, plus
the full rescore arithmetic (qn + sqn - 2*dot) and tail selection, vs
the HLO-gather equivalent. Big arrays passed as jit args (CLAUDE.md).
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
from vectordb_retrieval_tpu.ops import pallas_kernels as plk

B, NB, W, D = 256, 116, 32, 128
G = 48_000
K = 100
ITERS = 16


def timed(fn, blk, *tables):
    @jax.jit
    def run(blk, *tables):
        def pass_(carry, _):
            out = fn(carry, *tables)
            bump = (out[:, None] > jnp.inf).astype(jnp.int32)
            return (carry + bump) % G, out[0]

        _, sink = jax.lax.scan(pass_, blk, None, length=ITERS)
        return sink

    np.asarray(run(blk, *tables))
    t0 = time.perf_counter()
    np.asarray(run(blk, *tables))
    return (time.perf_counter() - t0) / ITERS * 1e3


def main() -> None:
    rng = np.random.default_rng(0)
    payload = jnp.asarray(
        rng.normal(size=(G, W, D)).astype(np.float32)
    ).astype(jnp.bfloat16)
    sqn = jnp.sum(payload.astype(jnp.float32) ** 2, axis=-1)  # [G, W]
    slot_ids = jnp.asarray(
        rng.integers(0, G * W, size=(G, W)).astype(np.int32)
    )
    blk = jnp.asarray(rng.integers(0, G, size=(B, NB)).astype(np.int32))
    q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

    # -- numerical check: slab dots vs f64 ------------------------------
    dots = plk.slab_dots_manual(q, payload, blk)  # [B, NB, W]
    v64 = np.asarray(payload, np.float64)[np.asarray(blk)[:4]]
    ref = np.einsum("bnwd,bd->bnw", v64, np.asarray(q, np.float64)[:4])
    err = np.max(np.abs(np.asarray(dots, np.float64)[:4] - ref))
    print(f"slab dots max|err| = {err:.3e} (abs, |dot|~{np.abs(ref).max():.1f})",
          flush=True)

    def hlo_tail(b, pl_, s_ids, sq, qx):
        vecs = pl_[b]
        v32 = vecs.astype(jnp.float32)
        diff = v32 - qx[:, None, None, :]
        cd = jnp.sum(diff * diff, axis=-1).reshape(B, -1)
        cand = s_ids.reshape(-1, W)[b].reshape(B, -1)
        v, s = dops.top_k_smallest(cd, K)
        ids = jnp.take_along_axis(cand, s, axis=1)
        return v[:, 0] + ids[:, 0].astype(jnp.float32)

    t = timed(hlo_tail, blk, payload, slot_ids, sqn, q)
    print(f"HLO  gather rescore+tail  {t:7.3f} ms/pass", flush=True)

    def slab_tail(b, pl_, s_ids, sq, qx):
        dots = plk.slab_dots_manual(qx, pl_, b)  # [B, NB, W] f32
        qn = jnp.sum(qx * qx, axis=-1)
        cd = (
            qn[:, None, None] + sq[b] - 2.0 * dots
        ).reshape(B, -1)
        cand = s_ids.reshape(-1, W)[b].reshape(B, -1)
        v, s = dops.top_k_smallest(cd, K)
        ids = jnp.take_along_axis(cand, s, axis=1)
        return v[:, 0] + ids[:, 0].astype(jnp.float32)

    for depth in (32, 64):
        def slab_tail_d(b, pl_, s_ids, sq, qx, depth=depth):
            dots = plk.slab_dots_manual(qx, pl_, b, depth=depth)
            qn = jnp.sum(qx * qx, axis=-1)
            cd = (qn[:, None, None] + sq[b] - 2.0 * dots).reshape(B, -1)
            cand = s_ids.reshape(-1, W)[b].reshape(B, -1)
            v, s = dops.top_k_smallest(cd, K)
            ids = jnp.take_along_axis(cand, s, axis=1)
            return v[:, 0] + ids[:, 0].astype(jnp.float32)

        t = timed(slab_tail_d, blk, payload, slot_ids, sqn, q)
        print(f"SLAB gather rescore+tail  {t:7.3f} ms/pass (depth={depth})",
              flush=True)


if __name__ == "__main__":
    from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache
    enable_compilation_cache()
    main()
