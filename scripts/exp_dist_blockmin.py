"""Fused Pallas dist+blockmin (stage 1) vs the XLA scan, on real TPU.

Measures, at the SIFT-1M exact-scan shape (and optionally others):
  1. XLA stage-1 (current _exact_search_blockmin scan, HIGH precision)
  2. Pallas f32 kernel (3-pass hi/lo split, HIGH-equivalent)
  3. Pallas bf16 kernel (IVF stream semantics)
  4. + selection: kernel -> transpose -> top-(k+slack)
  5. full path prototype: kernel + selection + block gather + exact rescore

Fused timing protocol: ITERS passes chained data-dependently inside one
compiled program, results materialised in the clock (CLAUDE.md).
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

from vectordb_retrieval_tpu.ops import distances as dops
from vectordb_retrieval_tpu.ops.pallas_kernels import dist_blockmin_pallas
from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--w", type=int, default=32)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    enable_compilation_cache()
    interp = jax.devices()[0].platform != "tpu"

    rng = np.random.default_rng(0)
    n, d, b, k, w, iters = args.n, args.d, args.b, args.k, args.w, args.iters
    # pad N to 8*w multiple
    s = -(-n // (8 * w)) * (8 * w)
    db = rng.standard_normal((n, d), dtype=np.float32)
    dbp = np.zeros((s, d), np.float32)
    dbp[:n] = db
    xn = np.full((s,), np.inf, np.float32)
    xn[:n] = (db * db).sum(1)
    q0 = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32))

    db_j = jnp.asarray(dbp)
    db16 = db_j.astype(jnp.bfloat16)
    pen = jnp.asarray(xn).reshape(s // w, w)
    nb = k + 16

    def time_fn(name, fn, q, *extra):
        # arrays MUST be jit arguments, not closures (CLAUDE.md: closed-over
        # index arrays lower as embedded HLO constants -> 413 upload errors)
        def chained(q, *extra):
            def body(i, carry):
                out = fn(carry, *extra)
                return carry + (out[:, None] * 0.0).astype(jnp.float32)

            return jax.lax.fori_loop(0, iters, body, q)

        f = jax.jit(chained)
        out = f(q, *extra)
        np.asarray(out)
        t0 = time.time()
        np.asarray(f(q, *extra))
        dt = (time.time() - t0) / iters
        print(f"{name:<34s} {dt*1e3:8.2f} ms/pass ({b/dt:10.1f} QPS)", flush=True)
        return dt

    # 1. XLA stage-1 (mirror of _exact_search_blockmin's scan)
    chunk = dops.clamp_chunk(min(262_144, max(4096, (1 << 26) // b)), n,
                             align=max(512, w))
    chunk = max(w, (chunk // w) * w)
    nc = -(-n // chunk)
    pad = nc * chunk - n
    dbx = jnp.pad(jnp.asarray(db), ((0, pad), (0, 0))).reshape(nc, chunk, d)
    penx = jnp.pad(jnp.asarray(xn[:n]), (0, pad),
                   constant_values=jnp.inf).reshape(nc, chunk)

    def xla_stage1(q, dbx, penx):
        def step(_, inp):
            xc, pc = inp
            dist = dops.pairwise_distances(q, xc, "l2", pc)
            return None, jnp.min(dist.reshape(b, chunk // w, w), axis=-1)

        _, bms = jax.lax.scan(step, None, (dbx, penx))
        return jnp.sum(jnp.moveaxis(bms, 0, 1).reshape(b, -1), axis=1)

    time_fn("xla stage1 (HIGH scan)", xla_stage1, q0, dbx, penx)

    # 2/3. Pallas kernels, reduce only (force the consume)
    def pl_f32(q, db_j, pen):
        bm = dist_blockmin_pallas(q, db_j, pen, w=w, interpret=interp)
        return jnp.sum(bm, axis=1)

    def pl_bf16(q, db16, pen):
        bm = dist_blockmin_pallas(
            q.astype(jnp.bfloat16), db16, pen, w=w, interpret=interp
        )
        return jnp.sum(bm, axis=1)

    time_fn("pallas f32 3-pass", pl_f32, q0, db_j, pen)
    time_fn("pallas bf16", pl_bf16, q0, db16, pen)

    # 4. + selection
    def pl_sel(q, db_j, pen):
        bm = dist_blockmin_pallas(q, db_j, pen, w=w, interpret=interp)
        v, blk = dops.top_k_smallest(bm, nb)
        return v[:, 0] + blk[:, 0].astype(jnp.float32)

    time_fn("pallas f32 + selection", pl_sel, q0, db_j, pen)

    # 5. full path prototype (kernel + selection + block gather + rescore)
    def pl_full_vi(q, db_j, pen):
        bm = dist_blockmin_pallas(q, db_j, pen, w=w, interpret=interp)
        _, blk = dops.top_k_smallest(bm, nb)
        bvecs = db_j.reshape(s // w, w, d)[blk]  # [B, nb, w, d]
        diff = bvecs - q[:, None, None, :]
        cd = jnp.sum(diff * diff, axis=-1).reshape(b, nb * w)
        cand = (
            blk[:, :, None] * w
            + jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
        ).reshape(b, nb * w)
        cd = jnp.where(cand < n, cd, jnp.inf)
        vals, sel = dops.top_k_smallest(cd, k)
        ids = jnp.take_along_axis(cand, sel, axis=1)
        return vals, ids

    def pl_full(q, db_j, pen):
        vals, ids = pl_full_vi(q, db_j, pen)
        return vals[:, 0] + ids[:, 0].astype(jnp.float32)

    dt = time_fn("pallas f32 FULL exact proto", pl_full, q0, db_j, pen)

    # 6. hierarchical selection: superblock-min (factor sf) -> top-nb
    #    superblocks -> gather their blockmins -> top-nb blocks -> rescore.
    #    Certificate holds at both levels (any (super)block containing a
    #    true top-k element has min <= d_k).
    sf = 4
    ng = s // w

    def pl_hier_vi(q, db_j, pen):
        bm = dist_blockmin_pallas(q, db_j, pen, w=w, interpret=interp)
        sb = jnp.min(bm.reshape(b, ng // sf, sf), axis=-1)  # [B, ng/sf]
        _, sblk = dops.top_k_smallest(sb, nb)  # [B, nb]
        # blockmins of the nb*sf member blocks
        mem = (
            sblk[:, :, None] * sf
            + jax.lax.broadcasted_iota(jnp.int32, (1, 1, sf), 2)
        ).reshape(b, nb * sf)
        mvals = jnp.take_along_axis(bm, mem, axis=1)  # [B, nb*sf]
        _, msel = dops.top_k_smallest(mvals, nb)
        blk = jnp.take_along_axis(mem, msel, axis=1)  # [B, nb]
        bvecs = db_j.reshape(s // w, w, d)[blk]
        diff = bvecs - q[:, None, None, :]
        cd = jnp.sum(diff * diff, axis=-1).reshape(b, nb * w)
        cand = (
            blk[:, :, None] * w
            + jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
        ).reshape(b, nb * w)
        cd = jnp.where(cand < n, cd, jnp.inf)
        vals, sel = dops.top_k_smallest(cd, k)
        ids = jnp.take_along_axis(cand, sel, axis=1)
        return vals, ids

    def pl_hier(q, db_j, pen):
        vals, ids = pl_hier_vi(q, db_j, pen)
        return vals[:, 0] + ids[:, 0].astype(jnp.float32)

    time_fn("pallas f32 FULL hier-sel", pl_hier, q0, db_j, pen)
    vh, ih = jax.jit(pl_hier_vi)(q0, db_j, pen)

    # 7. split-column selection: [B, G] -> [B*P, G/P], ONE batched top-nb
    #    call (selection cost is superlinear in row width), then merge the
    #    P*nb part-candidates arithmetically (concat + tiny top-nb).
    P = 4
    gp = -(-ng // P)

    def pl_split_vi(q, db_j, pen):
        bm = dist_blockmin_pallas(q, db_j, pen, w=w, interpret=interp)
        bmp = jnp.pad(bm, ((0, 0), (0, P * gp - ng)),
                      constant_values=jnp.inf).reshape(b * P, gp)
        pv, pi = dops.top_k_smallest(bmp, nb)  # [B*P, nb]
        pv = pv.reshape(b, P * nb)
        gblk = (
            pi.reshape(b, P, nb)
            + jnp.arange(P, dtype=jnp.int32)[None, :, None] * gp
        ).reshape(b, P * nb)
        _, msel = dops.top_k_smallest(pv, nb)
        blk = jnp.take_along_axis(gblk, msel, axis=1)
        bvecs = db_j.reshape(s // w, w, d)[blk]
        diff = bvecs - q[:, None, None, :]
        cd = jnp.sum(diff * diff, axis=-1).reshape(b, nb * w)
        cand = (
            blk[:, :, None] * w
            + jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
        ).reshape(b, nb * w)
        cd = jnp.where(cand < n, cd, jnp.inf)
        vals, sel = dops.top_k_smallest(cd, k)
        ids = jnp.take_along_axis(cand, sel, axis=1)
        return vals, ids

    def pl_split(q, db_j, pen):
        vals, ids = pl_split_vi(q, db_j, pen)
        return vals[:, 0] + ids[:, 0].astype(jnp.float32)

    time_fn("pallas f32 FULL split-sel", pl_split, q0, db_j, pen)
    vs_, is_ = jax.jit(pl_split_vi)(q0, db_j, pen)

    # 8. split-sel with SORT-merge: per-part batched top-nb (indices are
    #    arithmetic, no gather), then lax.sort co-sorts (val, blockid)
    #    pairs — no take_along_axis anywhere before the rescore.
    def pl_sort_vi(q, db_j, pen):
        bm = dist_blockmin_pallas(q, db_j, pen, w=w, interpret=interp)
        bmp = jnp.pad(bm, ((0, 0), (0, P * gp - ng)),
                      constant_values=jnp.inf).reshape(b * P, gp)
        pv, pi = dops.top_k_smallest(bmp, nb)  # [B*P, nb]
        pv = pv.reshape(b, P * nb)
        gblk = (
            pi.reshape(b, P, nb)
            + jnp.arange(P, dtype=jnp.int32)[None, :, None] * gp
        ).reshape(b, P * nb)
        sv, sblk = jax.lax.sort((pv, gblk), dimension=-1, num_keys=1)
        blk = sblk[:, :nb]
        bvecs = db_j.reshape(s // w, w, d)[blk]
        diff = bvecs - q[:, None, None, :]
        cd = jnp.sum(diff * diff, axis=-1).reshape(b, nb * w)
        cand = (
            blk[:, :, None] * w
            + jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
        ).reshape(b, nb * w)
        cd = jnp.where(cand < n, cd, jnp.inf)
        vals, sel = dops.top_k_smallest(cd, k)
        ids = jnp.take_along_axis(cand, sel, axis=1)
        return vals, ids

    def pl_sort(q, db_j, pen):
        vals, ids = pl_sort_vi(q, db_j, pen)
        return vals[:, 0] + ids[:, 0].astype(jnp.float32)

    time_fn("pallas f32 FULL sortmerge", pl_sort, q0, db_j, pen)
    vo_, io_ = jax.jit(pl_sort_vi)(q0, db_j, pen)

    # 9. hier with 4-wide member rows (gather [B, nb, sf] from the
    #    [B, ng/sf, sf] view instead of scalar gathers from [B, ng])
    def pl_hier4_vi(q, db_j, pen):
        bm = dist_blockmin_pallas(q, db_j, pen, w=w, interpret=interp)
        bm4 = bm.reshape(b, ng // sf, sf)
        sb = jnp.min(bm4, axis=-1)
        _, sblk = dops.top_k_smallest(sb, nb)  # [B, nb]
        mvals = jnp.take_along_axis(
            bm4, sblk[:, :, None], axis=1
        )  # [B, nb, sf]
        mv = mvals.reshape(b, nb * sf)
        mem = (
            sblk[:, :, None] * sf
            + jax.lax.broadcasted_iota(jnp.int32, (1, 1, sf), 2)
        ).reshape(b, nb * sf)
        sv, sblk2 = jax.lax.sort((mv, mem), dimension=-1, num_keys=1)
        blk = sblk2[:, :nb]
        bvecs = db_j.reshape(s // w, w, d)[blk]
        diff = bvecs - q[:, None, None, :]
        cd = jnp.sum(diff * diff, axis=-1).reshape(b, nb * w)
        cand = (
            blk[:, :, None] * w
            + jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
        ).reshape(b, nb * w)
        cd = jnp.where(cand < n, cd, jnp.inf)
        vals, sel = dops.top_k_smallest(cd, k)
        ids = jnp.take_along_axis(cand, sel, axis=1)
        return vals, ids

    def pl_hier4(q, db_j, pen):
        vals, ids = pl_hier4_vi(q, db_j, pen)
        return vals[:, 0] + ids[:, 0].astype(jnp.float32)

    time_fn("pallas f32 FULL hier4-sort", pl_hier4, q0, db_j, pen)
    v4_, i4_ = jax.jit(pl_hier4_vi)(q0, db_j, pen)

    # correctness vs existing exact path
    db_orig = jnp.asarray(db)
    v_ref, i_ref = jax.jit(
        lambda q, dbo: dops.exact_search(q, dbo, k, metric="l2")
    )(q0, db_orig)
    vals, ids = jax.jit(pl_full_vi)(q0, db_j, pen)
    agree = float(jnp.mean(jnp.abs(np.asarray(vals) - np.asarray(v_ref)) < 1e-3))
    print(f"distance agreement vs exact_search: {agree:.6f}")
    agree_h = float(
        jnp.mean(jnp.abs(np.asarray(vh) - np.asarray(v_ref)) < 1e-3)
    )
    print(f"hier-sel distance agreement:        {agree_h:.6f}")
    agree_s = float(
        jnp.mean(jnp.abs(np.asarray(vs_) - np.asarray(v_ref)) < 1e-3)
    )
    print(f"split-sel distance agreement:       {agree_s:.6f}")
    for nm, vv in (("sortmerge", vo_), ("hier4-sort", v4_)):
        ag = float(
            jnp.mean(jnp.abs(np.asarray(vv) - np.asarray(v_ref)) < 1e-3)
        )
        print(f"{nm} distance agreement:       {ag:.6f}")


if __name__ == "__main__":
    main()
