"""Stage-profile the depth-synchronous cover-tree stream descent at 1M.

The SIFT1M covertree row runs at 738 QPS while the exact blockmin scan —
which streams the same bytes through the same MXU — reaches 8.8k. Both
walk [B, 131k] f32 chunks; the stream descent additionally pays, per
chunk: (a) a full-width top_k_smallest([B, kprime+131k]) candidate
merge, (b) a [B, Wc] alive-mask gather (take along axis 1 by parent
position), (c) band/prune elementwise work. This script times those
pieces in isolation at the production shape so the fix targets the
actual binder (docs/roadmap.md #4).

All variants stream the same synthetic depth-major slab and chain
iterations inside ONE jitted program (results feed the next iteration's
query offset) so nothing is elided and dispatch is amortised
(CLAUDE.md timing rules).

Usage: python scripts/exp_covertree_stream_profile.py [--platform cpu]
         [--m 1200000] [--d 128] [--b 256] [--k 100] [--iters 4]
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
    ap.add_argument("--m", type=int, default=1_200_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from vectordb_retrieval_tpu.ops.covertree import (
        DEFAULT_ERR_C,
        _STREAM_CHUNK,
        covertree_stream_search,
    )
    from vectordb_retrieval_tpu.ops.distances import top_k_smallest
    from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    m, d, b, k = args.m, args.d, args.b, args.k
    kp = max(2 * k, k + 256)

    # geometric depth profile like a real 1M tree: most nodes in the
    # last two depths. Depths aligned to 32 (the slab layout contract).
    sizes = []
    s = 32
    while sum(sizes) + s < m:
        sizes.append(s)
        s = min(s * 8, m - sum(sizes))
    tail = m - sum(sizes)
    m = sum(sizes) + (tail // 32) * 32
    sizes.append(m - sum(sizes))
    depth_sizes = tuple(int(x) for x in sizes if x > 0)

    slab = jnp.asarray(rng.standard_normal((m, d)), jnp.float32)
    point_ids = jnp.arange(m, dtype=jnp.int32)
    is_real = jnp.ones((m,), bool)
    radii = jnp.asarray(rng.random(m) * 0.05, jnp.float32)
    # parent positions: random valid index into the previous depth
    prel = np.zeros(m, np.int32)
    off = 0
    prev_w = 1
    for w in depth_sizes:
        prel[off : off + w] = rng.integers(0, prev_w, size=w)
        prev_w = w
        off += w
    parent_rel = jnp.asarray(prel)
    queries = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)

    iters = args.iters

    # arrays are passed as ARGUMENTS (never closed over — closures embed
    # them as GB-scale HLO constants on the tunnel, CLAUDE.md)
    arrs = (slab, point_ids, is_real, radii, parent_rel)

    def timed(name, fn):
        g = jax.jit(fn)
        out = g(queries, *arrs)
        np.asarray(out)  # warm: compile + execute
        t0 = time.time()
        out = np.asarray(g(queries, *arrs))
        dt = time.time() - t0
        per = dt / iters
        print(
            f"{name:32s} {dt*1e3:9.1f} ms total  {per*1e3:8.1f} ms/pass"
            f"  -> {b/per:8.0f} QPS  (checksum {out:.3f})"
        )
        return per

    # chain ITERS passes: each pass perturbs queries by a scalar derived
    # from the previous pass's result so XLA cannot elide or hoist
    def chain(step):
        def run(q0, slab, point_ids, is_real, radii, parent_rel):
            def body(c, _):
                q, acc = c
                r = step(q, slab, point_ids, is_real, radii, parent_rel)
                q = q + (r * 1e-12).astype(q.dtype)
                return (q, acc + jnp.float32(jnp.sum(r))), None

            (qf, acc), _ = jax.lax.scan(
                body, (q0, jnp.float32(0.0)), None, length=iters
            )
            return acc

        return run

    # ---- full current stream search -------------------------------------
    def full(q, slab, point_ids, is_real, radii, parent_rel):
        res = covertree_stream_search(
            q, slab, point_ids, is_real, radii, parent_rel,
            depth_sizes=depth_sizes, k=k, kprime=kp,
        )
        return jnp.sum(jnp.where(jnp.isfinite(res.dists), res.dists, 0.0))

    # ---- shared chunk-stream scaffolding ---------------------------------
    qn2_f = lambda q: jnp.sum(q * q, axis=-1)

    def stream(q, slab, point_ids, is_real, radii, parent_rel, with_alive, select):
        """One full slab walk; `select(best_h, best_i, cand, s0)` merges a
        chunk's candidates into the running (best_h, best_i)."""
        qn2 = qn2_f(q)
        qn = jnp.sqrt(qn2)
        best_h = jnp.full((b, kp), jnp.inf, jnp.float32)
        best_i = jnp.full((b, kp), -1, jnp.int32)
        kept_prev = jnp.ones((b, 1), bool)
        off = 0
        for w in depth_sizes:
            kept_parts = []
            for c0 in range(0, w, _STREAM_CHUNK):
                wc = min(_STREAM_CHUNK, w - c0)
                s0 = off + c0
                blk = jax.lax.slice_in_dim(slab, s0, s0 + wc)
                r_blk = jax.lax.slice_in_dim(radii, s0, s0 + wc)
                prel_blk = jax.lax.slice_in_dim(parent_rel, s0, s0 + wc)
                bn2 = jnp.sum(blk * blk, axis=-1)
                dot = q @ blk.T
                d2 = qn2[:, None] + bn2[None, :] - 2.0 * dot
                band2 = (2.0 * DEFAULT_ERR_C) * qn[:, None] * jnp.sqrt(bn2)[None, :]
                d2_lo = jnp.maximum(d2 - band2, 0.0)
                d2_hi = d2 + band2
                if with_alive:
                    alive = jnp.take(kept_prev, prel_blk, axis=1)
                else:
                    alive = jnp.ones((b, wc), bool)
                cand = jnp.where(alive, d2_hi, jnp.inf)
                best_h, best_i = select(best_h, best_i, cand, s0)
                kth_ub = jnp.sqrt(best_h[:, k - 1])
                kept_parts.append(
                    alive & (jnp.sqrt(d2_lo) - r_blk[None, :] <= kth_ub[:, None])
                )
            kept_prev = (
                kept_parts[0]
                if len(kept_parts) == 1
                else jnp.concatenate(kept_parts, axis=1)
            )
            off += w
        return jnp.sum(jnp.where(jnp.isfinite(best_h), best_h, 0.0))

    def sel_full(best_h, best_i, cand, s0):
        wc = cand.shape[1]
        pos = jax.lax.broadcasted_iota(jnp.int32, (b, wc), 1) + s0
        cat_d = jnp.concatenate([best_h, cand], axis=1)
        cat_i = jnp.concatenate([best_i, pos], axis=1)
        bh, p = top_k_smallest(cat_d, kp)
        return bh, jnp.take_along_axis(cat_i, p, axis=1)

    def make_sel_blockmin(wblk):
        def sel(best_h, best_i, cand, s0):
            wc = cand.shape[1]
            if wc <= 4 * kp:
                return sel_full(best_h, best_i, cand, s0)
            pad = (-wc) % wblk
            cp = (
                jnp.pad(cand, ((0, 0), (0, pad)), constant_values=jnp.inf)
                if pad
                else cand
            )
            nb = (wc + pad) // wblk
            bm = cp.reshape(b, nb, wblk).min(axis=2)
            sblk = min(kp, nb)
            _, bsel = top_k_smallest(bm, sblk)
            col = (bsel[:, :, None] * wblk + jnp.arange(wblk)[None, None, :]).reshape(
                b, sblk * wblk
            )
            sub = jnp.take_along_axis(cp, col, axis=1)
            cat_d = jnp.concatenate([best_h, sub], axis=1)
            cat_i = jnp.concatenate([best_i, col + s0], axis=1)
            bh, p = top_k_smallest(cat_d, kp)
            return bh, jnp.take_along_axis(cat_i, p, axis=1)

        return sel

    def sel_none(best_h, best_i, cand, s0):
        # running elementwise min only — the floor: no candidate set
        wc = cand.shape[1]
        pad = (-wc) % kp
        if pad:
            cand = jnp.pad(cand, ((0, 0), (0, pad)), constant_values=jnp.inf)
        folded = jnp.min(cand.reshape(b, -1, kp), axis=1)
        return jnp.minimum(best_h, folded), best_i

    print(
        f"shape: M={m} d={d} B={b} k={k} kprime={kp} "
        f"chunks={sum((w + _STREAM_CHUNK - 1)//_STREAM_CHUNK for w in depth_sizes)} "
        f"depths={len(depth_sizes)}"
    )
    def variant(with_alive, select):
        return chain(
            lambda q, *a: stream(q, *a, with_alive=with_alive, select=select)
        )

    timed("full covertree_stream_search", chain(full))
    timed("stream+fullwidth select", variant(True, sel_full))
    timed("stream+blockmin16 select", variant(True, make_sel_blockmin(16)))
    timed("stream+blockmin64 select", variant(True, make_sel_blockmin(64)))
    timed("stream+no select (floor)", variant(True, sel_none))
    timed("stream no-alive blockmin16", variant(False, make_sel_blockmin(16)))


if __name__ == "__main__":
    main()
