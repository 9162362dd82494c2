"""Decompose the fused-IVF tail (stage 4->5 delta) on real TPU.

exp_ivf_fused_profile measured +2.4 ms from 'block rescore' to 'full
search'. Candidates for the cost: (a) the slot-id block gather
[G, w] i32 -> [B, nb, w], (b) top_k_smallest over [B, nb*w], (c) the
final take_along_axis id gather, (d) packing ids into the VECTOR gather
as two bf16 lanes (hi/lo base-256 limbs) so the separate slot gather
disappears. All timings: fused multi-pass scan, np.asarray in clock.
Big arrays are passed as jit ARGUMENTS (CLAUDE.md: closures embed them
as HLO constants -> 413 upload errors).
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

B, NB, W, D = 256, 124, 32, 128
G = 48_000
K = 100
ITERS = 16


def timed(fn, blk, *tables):
    """fn(blk, *tables) -> [B] f32 sink; blk chained across passes."""

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
    slot_ids = jnp.asarray(
        rng.integers(0, G * W, size=(G, W)).astype(np.int32)
    )
    blk = jnp.asarray(rng.integers(0, G, size=(B, NB)).astype(np.int32))
    cd = jnp.asarray(rng.normal(size=(B, NB * W)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

    # packed payload: vectors + id limbs (hi=id//256, lo=id%256 — both
    # exactly representable in bf16 for ids < 2**19)
    ids_f = slot_ids.astype(jnp.float32)
    hi = jnp.floor(ids_f / 256.0).astype(jnp.bfloat16)
    lo = jnp.mod(ids_f, 256.0).astype(jnp.bfloat16)
    packed = jnp.concatenate(
        [payload, hi[:, :, None], lo[:, :, None]], axis=-1
    )  # [G, W, D+2]

    t = timed(
        lambda b, s: s.reshape(-1, W)[b].reshape(B, -1)[:, 0].astype(
            jnp.float32
        ),
        blk, slot_ids,
    )
    print(f"a. slot block gather          {t:7.3f} ms/pass", flush=True)

    def topk(b, cdx):
        v, s = dops.top_k_smallest(cdx + b[:, :1].astype(jnp.float32) * 0, K)
        return v[:, 0] + s[:, 0].astype(jnp.float32)

    t = timed(topk, blk, cd)
    print(f"b. top-k [B,{NB*W}] k={K}      {t:7.3f} ms/pass", flush=True)

    def full_tail(b, s_ids, cdx):
        cand = s_ids.reshape(-1, W)[b].reshape(B, -1)
        v, s = dops.top_k_smallest(cdx + b[:, :1].astype(jnp.float32) * 0, K)
        ids = jnp.take_along_axis(cand, s, axis=1)
        return v[:, 0] + ids[:, 0].astype(jnp.float32)

    t = timed(full_tail, blk, slot_ids, cd)
    print(f"c. full tail (a+b+take)       {t:7.3f} ms/pass", flush=True)

    def gather_rescore(b, pl, qx):
        vecs = pl[b]
        v32 = vecs.astype(jnp.float32)
        diff = v32 - qx[:, None, None, :]
        cdx = jnp.sum(diff * diff, axis=-1)
        return cdx[:, 0, 0]

    t = timed(gather_rescore, blk, payload, q)
    print(f"d. vec gather+rescore         {t:7.3f} ms/pass", flush=True)

    def packed_tail(b, pk, qx):
        vecs = pk[b]  # [B, NB, W, D+2]
        v32 = vecs[..., :D].astype(jnp.float32)
        ids = (
            vecs[..., D].astype(jnp.float32) * 256.0
            + vecs[..., D + 1].astype(jnp.float32)
        ).astype(jnp.int32)
        diff = v32 - qx[:, None, None, :]
        cdx = jnp.sum(diff * diff, axis=-1).reshape(B, -1)
        v, s = dops.top_k_smallest(cdx, K)
        out = jnp.take_along_axis(ids.reshape(B, -1), s, axis=1)
        return v[:, 0] + out[:, 0].astype(jnp.float32)

    t = timed(packed_tail, blk, packed, q)
    print(f"e. PACKED gather+rescore+tail {t:7.3f} ms/pass", flush=True)

    def split_tail(b, pl, s_ids, qx):
        vecs = pl[b]
        v32 = vecs.astype(jnp.float32)
        diff = v32 - qx[:, None, None, :]
        cdy = jnp.sum(diff * diff, axis=-1).reshape(B, -1)
        cand = s_ids.reshape(-1, W)[b].reshape(B, -1)
        v, s = dops.top_k_smallest(cdy, K)
        ids = jnp.take_along_axis(cand, s, axis=1)
        return v[:, 0] + ids[:, 0].astype(jnp.float32)

    t = timed(split_tail, blk, payload, slot_ids, q)
    print(f"f. SPLIT  gather+rescore+tail {t:7.3f} ms/pass", flush=True)


if __name__ == "__main__":
    from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache
    enable_compilation_cache()
    main()
