"""A/B the fused-IVF stage-4 block rescore formulations on real TPU.

Stage profile (scripts/exp_ivf_fused_profile.py) shows block rescore
costs ~3 ms/pass at B=256, nb=124, w=32, d=128 — suspected cause is the
[B, nb, w, d] f32 diff intermediate. Candidates:
  a. diff-sum   : sum((v32 - q)^2)            (today's VPU path)
  b. mul-sum    : qn + sqn - 2*sum(v32 * q)   (VPU, no diff tensor)
  c. mxu-hilo   : qn + sqn - 2*(v.q_hi + v.q_lo) with the query split
                  into two bf16 limbs — exact f32-grade dots against the
                  bf16-stored vectors (MXU batched matvec)
All variants share the same block gather so the A/B isolates the
arithmetic. Timing = fused multi-pass program, np.asarray inside clock.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, NB, W, D = 256, 124, 32, 128
G = 48_000  # blocks in the payload (1.5M slots / 32)
ITERS = 16


def gather_blocks(blk, payload):
    return payload[blk]  # [B, NB, W, D]


def rescore_diff(q, vecs, sqn):
    v32 = vecs.astype(jnp.float32)
    diff = v32 - q[:, None, None, :]
    return jnp.sum(diff * diff, axis=-1)


def rescore_mul(q, vecs, sqn):
    v32 = vecs.astype(jnp.float32)
    qn = jnp.sum(q * q, axis=-1)
    dots = jnp.sum(v32 * q[:, None, None, :], axis=-1)
    return qn[:, None, None] + sqn - 2.0 * dots


def rescore_mxu(q, vecs, sqn):
    q_hi = q.astype(jnp.bfloat16)
    q_lo = (q - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    qn = jnp.sum(q * q, axis=-1)
    dots = jnp.einsum(
        "bnwd,bd->bnw", vecs, q_hi, preferred_element_type=jnp.float32
    ) + jnp.einsum(
        "bnwd,bd->bnw", vecs, q_lo, preferred_element_type=jnp.float32
    )
    return qn[:, None, None] + sqn - 2.0 * dots


def main() -> None:
    rng = np.random.default_rng(0)
    payload = jnp.asarray(
        rng.normal(size=(G, W, D)).astype(np.float32)
    ).astype(jnp.bfloat16)
    sqn = jnp.sum(payload.astype(jnp.float32) ** 2, axis=-1)  # [G, W]
    q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    blk0 = jnp.asarray(rng.integers(0, G, size=(B, NB)).astype(np.int32))

    variants = {
        "a.diff-sum": rescore_diff,
        "b.mul-sum": rescore_mul,
        "c.mxu-hilo": rescore_mxu,
    }

    # correctness vs f64 on a tiny slice
    v_np = np.asarray(payload, dtype=np.float64)[np.asarray(blk0)[:4, :4]]
    q_np = np.asarray(q, dtype=np.float64)[:4]
    ref = ((v_np - q_np[:, None, None, :]) ** 2).sum(-1)

    for name, fn in variants.items():

        @jax.jit
        def run(q, blk, payload, sqn, fn=fn):
            def pass_(carry, _):
                qc, blkc = carry
                vecs = gather_blocks(blkc, payload)
                cd = fn(qc, vecs, sqn[blkc])
                # data-dependency chaining: next pass's block ids depend on
                # this pass's result so XLA cannot elide repeats
                shift = (cd[:, :1, 0] > jnp.inf).astype(jnp.int32)
                return (qc, (blkc + shift) % G), cd[:, 0, 0]

            (_, _), sink = jax.lax.scan(pass_, (q, blk), None, length=ITERS)
            return sink

        out = run(q, blk0, payload, sqn)
        np.asarray(out)  # warm
        t0 = time.perf_counter()
        np.asarray(run(q, blk0, payload, sqn))
        dt = (time.perf_counter() - t0) / ITERS * 1e3

        cd4 = jax.jit(
            lambda q, blk, payload, sqn, fn=fn: fn(
                q[:4], gather_blocks(blk[:4, :4], payload), sqn[blk[:4, :4]]
            )
        )(q, blk0, payload, sqn)
        err = float(np.max(np.abs(np.asarray(cd4, np.float64) - ref)))
        rel = err / float(np.max(ref))
        print(f"{name:12s} {dt:7.3f} ms/pass   max|err|={rel:.2e} (rel)",
              flush=True)


if __name__ == "__main__":
    from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache
    enable_compilation_cache()
    main()
