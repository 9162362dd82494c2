"""Cover-tree exact k-NN: depth-synchronous masked-stream descent.

TPU-native re-design of the reference's CoverTreeV2_2 search (reference:
src/algorithms/covertree_v2_2.py:374-523). The reference already moved from
per-node recursion to frontier-at-a-time batching (its V2.2); on TPU the
frontier-descent formulation is gather-bound (scattered node/vector gathers
run at ~68 GB/s against the MXU stream's 400+ GB/s), so the descent is
restructured around the WORK layout instead:

  * nodes are stored depth-major (every BFS depth contiguous and padded to
    a block-aligned width — models/covertree.depth_slab_layout), so each
    descent step is a STATIC slice of the slab: a dense [B, W] MXU distance
    matmul, zero gathers;
  * the alive/pruned state propagates parent -> child as a boolean mask
    (one shared-index take per depth);
  * pruning uses the cover invariant: a node v with exact subtree radius
    r(v) is dropped for query q when ``d_lo(q, v) - r(v) > kth_ub`` — the
    reference's dynamic bound (covertree_v2_2.py:419-500) with the MXU's
    bf16 numeric band folded in (d_lo lower-bounds the true distance,
    kth_ub upper-bounds the true current kth);
  * candidate selection follows the exact-search blockmin pattern
    (ops/distances._exact_search_blockmin): the walk only accumulates
    per-``w``-column BLOCK MINIMA of the d2 upper bounds (a fused VPU
    reduction — no [B, M] tensor, no per-chunk wide top-k), plus a cheap
    folded-min kth upper bound for pruning; ONE selection over the
    [B, M/w] blockmin matrix at the end picks the candidate blocks, whose
    rows are block-gathered and exactly rescored (cancellation-free f32
    diff form). This removed the per-chunk full-width top-k that was 92%
    of search time at 1M rows (scripts/exp_covertree_stream_profile.py:
    366 ms/pass full vs 27.6 ms selection-free floor);
  * exactness is certified per query: every alive point outside the
    selected blocks provably has true distance above a floor derived from
    the s-th block minimum and the global band; queries whose rescored kth
    exceeds that floor are flagged ``overflow`` so the caller falls back
    to the exact scan — exactness is never silently lost;
  * ``ndis`` counts alive (algorithmically required) distance evaluations
    per query, preserving the reference's operation-counting contract
    (covertree_v2_2.py:298-307). The MXU additionally computes masked
    lanes for pruned nodes — hardware padding, not counted, and on TPU
    not a cost either.

Soundness of the folded kth bound: the walk folds alive candidate d2
upper bounds into a fixed-width [B, F] elementwise minimum. The k
smallest slots of that fold are minima of DISJOINT column sets, hence
attained by k distinct scored points; so at least k scored points have
d2_hi <= kth(fold), and the true current kth distance (<= kth over any k
scored points) is <= sqrt(kth(fold)). Slot collisions only LOOSEN the
bound (less pruning), never break it.

Pruning soundness: prune node v for query q iff d_lo(q,v) - r(v) >
kth_ub, where kth_ub >= the true current kth distance (above) and
d_lo <= the true distance. The true kth only shrinks as deeper candidates
arrive, so a pruned subtree can never contain a true top-k point
(reference inequality covertree_v2_2.py:419-500 with the numeric band
folded in).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from vectordb_retrieval_tpu.ops.distances import blockmin_width, top_k_smallest


class CoverTreeSearchResult(NamedTuple):
    dists: jax.Array  # [B, k]
    ids: jax.Array  # [B, k]
    ndis: jax.Array  # [B] scored distance evaluations
    overflow: jax.Array  # [B] bool — certificate failed, result may be inexact
    iters: jax.Array  # [] depths walked (profiling/diagnostics)


# default certified bound on |dot_bf16(q,x) - dot_f32(q,x)| / (|q||x|):
# inputs are rounded to bf16 (rel err <= 2^-8 worst case for truncation),
# accumulation in f32 adds d*2^-24. 6e-3 gives ~1.5x headroom over the
# 2*2^-9 + d*2^-24 nearest-rounding bound; validated empirically in
# tests/models/test_covertree.py::test_stream_band_covers_mxu_error.
DEFAULT_ERR_C = 6e-3

# column-chunk width for streaming one depth: bounds the [B, chunk] f32
# transients (134 MB at B=256) so 1M-scale depths fit comfortably in HBM.
# Must stay a multiple of the largest blockmin width (32).
_STREAM_CHUNK = 131_072

# depth blocks in the slab are padded to this width so every chunk start
# is blockmin-aligned and candidate blocks are contiguous [w, d] slabs
# (whole-block gathers cost one row-latency per BLOCK, not per row —
# CLAUDE.md gather cost model). blockmin widths {8,16,32} all divide it.
SLAB_ALIGN = 32

# extra candidate blocks beyond k for the final selection (mirrors
# ops/distances._BLOCKMIN_SLACK; also buys certificate margin against the
# bf16 band — at w=8..32 this is 128-512 extra rescored rows, the same
# scale as the previous design's kprime=k+256 candidate overfetch)
_BLOCK_SLACK = 16


@functools.partial(
    jax.jit,
    static_argnames=("depth_sizes", "k", "kprime", "err_c", "block_w"),
)
def covertree_stream_search(
    queries: jax.Array,  # [B, d] f32
    slab: jax.Array,  # [M, d] f32 node points, depth-major aligned order
    point_ids: jax.Array,  # [M] int32 node -> db row
    is_real: jax.Array,  # [M] bool node contributes its point to top-k
    radii: jax.Array,  # [M] f32 exact subtree cover radii (<0 marks padding)
    parent_rel: jax.Array,  # [M] int32 parent position within its depth block
    depth_sizes: Tuple[int, ...],
    k: int,
    kprime: int,
    err_c: float = DEFAULT_ERR_C,
    block_w: int = 0,
) -> CoverTreeSearchResult:
    """Exact k-NN over a depth-major cover-tree slab (see module docstring).

    ``depth_sizes`` must be the PADDED per-depth widths (each a multiple of
    the blockmin width) produced by models/covertree.depth_slab_layout;
    padding rows carry ``radii < 0`` and ``is_real=False`` and are inert.
    ``kprime`` sets the fold width of the running kth upper bound (wider =
    tighter bound = more pruning; any width is sound).
    """
    b, _ = queries.shape
    m = slab.shape[0]
    w = block_w if block_w else blockmin_width(m)
    off = 0
    for wd in depth_sizes:
        if off % w or wd % w:
            raise ValueError(
                f"depth block at offset {off} (width {wd}) is not aligned "
                f"to blockmin width {w}; rebuild the slab with "
                f"depth_slab_layout (SLAB_ALIGN={SLAB_ALIGN})"
            )
        off += wd
    if off != m:
        raise ValueError(f"depth_sizes sum {off} != slab rows {m}")
    assert _STREAM_CHUNK % w == 0

    kp = max(int(kprime), k)  # fold width for the kth upper bound
    qn2 = jnp.sum(queries * queries, axis=-1)  # f32 VPU, exact norms
    qn = jnp.sqrt(qn2)

    best_f = jnp.full((b, kp), jnp.inf, jnp.float32)  # folded min of d2_hi
    ndis = jnp.zeros((b,), jnp.int32)
    kept_prev = jnp.ones((b, 1), jnp.bool_)  # virtual parent of the root
    max_xn = jnp.sqrt(jnp.max(jnp.sum(slab * slab, axis=-1)))

    bm_parts = []  # per-chunk [B, wc/w] block minima of d2_hi
    off = 0
    for wd in depth_sizes:
        # large depths stream in column chunks to bound the [B, W]
        # transients (the kth bound tightens chunk to chunk, which only
        # strengthens pruning — soundness is monotone in the bound)
        kept_parts = []
        for c0 in range(0, wd, _STREAM_CHUNK):
            wc = min(_STREAM_CHUNK, wd - c0)
            s0 = off + c0
            blk = jax.lax.slice_in_dim(slab, s0, s0 + wc)  # [Wc, d] static
            r_blk = jax.lax.slice_in_dim(radii, s0, s0 + wc)
            real_blk = jax.lax.slice_in_dim(is_real, s0, s0 + wc)
            prel_blk = jax.lax.slice_in_dim(parent_rel, s0, s0 + wc)

            bn2 = jnp.sum(blk * blk, axis=-1)  # f32 exact
            dot = queries @ blk.T  # MXU, bf16 inputs (DEFAULT precision)
            d2 = qn2[:, None] + bn2[None, :] - 2.0 * dot
            band2 = (2.0 * err_c) * qn[:, None] * jnp.sqrt(bn2)[None, :]
            d2_lo = jnp.maximum(d2 - band2, 0.0)
            d2_hi = d2 + band2

            alive = jnp.take(kept_prev, prel_blk, axis=1)  # [B, Wc]
            # padding rows (radius < 0, not real) are inert: never alive,
            # never counted, never candidates
            alive = alive & (real_blk | (r_blk >= 0.0))[None, :]
            ndis = ndis + jnp.sum(alive, axis=1, dtype=jnp.int32)

            cand = jnp.where(alive & real_blk[None, :], d2_hi, jnp.inf)

            # running kth upper bound: fold the chunk into [B, kp] slots
            # (elementwise min), kth of the fold upper-bounds the true kth
            # (disjoint-slot argument — module docstring)
            pad_f = (-wc) % kp
            cf = (
                jnp.pad(cand, ((0, 0), (0, pad_f)), constant_values=jnp.inf)
                if pad_f
                else cand
            )
            best_f = jnp.minimum(
                best_f, jnp.min(cf.reshape(b, -1, kp), axis=1)
            )
            kth_ub = jnp.sqrt(top_k_smallest(best_f, k)[0][:, k - 1])

            # per-block minima for the final blockmin selection
            bm_parts.append(jnp.min(cand.reshape(b, wc // w, w), axis=2))

            kept_parts.append(
                alive & (jnp.sqrt(d2_lo) - r_blk[None, :] <= kth_ub[:, None])
            )
        kept_prev = (
            kept_parts[0]
            if len(kept_parts) == 1
            else jnp.concatenate(kept_parts, axis=1)
        )
        off += wd

    # ---- final selection: ONE top-s over the [B, M/w] blockmin matrix ----
    bm = bm_parts[0] if len(bm_parts) == 1 else jnp.concatenate(bm_parts, 1)
    nb_total = bm.shape[1]
    s = min(k + _BLOCK_SLACK, nb_total)
    bm_sel, blk_idx = top_k_smallest(bm, s)  # ascending block minima

    # block-gather candidate rows: [B, s] block ids -> [B, s, w, d] slabs
    # (one row-latency per BLOCK — the slab layout is block-aligned)
    blocks = slab.reshape(nb_total, w, -1)
    bvecs = blocks[blk_idx]  # [B, s, w, d]
    breal = is_real.reshape(nb_total, w)[blk_idx]  # [B, s, w]
    bpid = point_ids.reshape(nb_total, w)[blk_idx]  # [B, s, w]

    # exact rescore (cancellation-free f32 diff form, VPU). Columns that
    # were pruned during the walk may appear here: pruning certifies they
    # are not top-k, so rescoring them exactly can never displace a true
    # result. Virtual/padding rows are masked (they would duplicate ids).
    diff = bvecs - queries[:, None, None, :]
    d_ex = jnp.sqrt(jnp.sum(diff * diff, axis=-1))  # [B, s, w] exact
    d_ex = jnp.where(breal, d_ex, jnp.inf).reshape(b, s * w)
    out_d, sel = top_k_smallest(d_ex, k)
    out_i = jnp.take_along_axis(bpid.reshape(b, s * w), sel, axis=1)
    out_i = jnp.where(jnp.isfinite(out_d), out_i, -1)

    # certificate: every alive&real point outside the selected blocks has
    # d2_hi >= its block minimum >= t (the s-th selected block minimum),
    # hence true d2 >= t - 2*band_max (d2_hi = d2 + band2). Exact iff the
    # rescored kth is within that floor; else flag overflow so the caller
    # falls back to the exact scan (exactness is never silently lost).
    # t = +inf means no candidate block was excluded — exact by
    # construction. Pruned subtrees are covered by the pruning certificate
    # independently of t.
    t = bm_sel[:, -1]
    floor2 = t - 4.0 * err_c * qn * max_xn
    kth_ex = out_d[:, k - 1]
    overflow = ~((kth_ex * kth_ex <= floor2) | ~jnp.isfinite(t))
    iters = jnp.int32(len(depth_sizes))
    return CoverTreeSearchResult(out_d, out_i, ndis, overflow, iters)


@functools.partial(
    jax.jit,
    static_argnames=("depth_sizes", "k", "kprime", "err_c", "block_w"),
)
def covertree_blockwalk_search(
    queries: jax.Array,  # [B, d] f32
    slab: jax.Array,  # [M, d] f32 node points, depth-major aligned order
    point_ids: jax.Array,  # [M] int32 node -> db row
    is_real: jax.Array,  # [M] bool node contributes its point to top-k
    radii: jax.Array,  # [M] f32 exact subtree cover radii (<0 marks padding)
    parent_rel: jax.Array,  # [M] int32 parent position within its depth block
    depth_sizes: Tuple[int, ...],
    k: int,
    kprime: int,
    err_c: float = DEFAULT_ERR_C,
    block_w: int = 0,
) -> CoverTreeSearchResult:
    """Exact k-NN: block-granular cover-tree descent over fused blockmins.

    TPU refactor of :func:`covertree_stream_search` (same contract, same
    reference semantics — covertree_v2_2.py:374-500): the per-NODE walk
    materialised several [B, W] f32 transients per depth (d2 / band /
    alive / cand / kept) and measured ~6x the exact scan at 1M even
    selection-free. Here the ENTIRE per-node distance work runs as two
    fused Pallas blockmin streams over the whole slab (the exact scan's
    stage-1 kernel, bf16 inputs whose rounding the err_c band certifies):

      * ``bm_all``  — per-block minima over all non-inert NODES
        (pen = +inf on padding): lower-bounds the closest node of each
        block for the prune test;
      * ``bm_real`` — per-block minima over REAL nodes only: upper-bound
        witnesses for the kth fold and the candidate selection.

    The descent then runs on 32x-smaller [B, M/w] BLOCK arrays:

      * aliveness propagates parent-block -> child-block (children of one
        parent are contiguous in the child depth, so each child block's
        parents span a [pfirst, plast] block range; an inclusive-OR over
        that range is two gathers of a cumulative sum);
      * prune drops block g when ``d_lo(q, g) - rmax(g) > kth_ub`` with
        d_lo from bm_all and rmax the block's max subtree radius — every
        node in g satisfies the reference prune inequality, so the whole
        block's subtrees are certified out (soundness per node: its
        distance >= the block min >= d_lo, its radius <= rmax);
      * the kth upper bound folds bm_real block minima into [B, kprime]
        slots — minima of DISJOINT blocks are attained by distinct real
        points, so the kth of the fold upper-bounds the true kth (the
        module-docstring disjoint-set argument at block granularity).

    Selection/rescore/overflow mirror the stream walk: one top-s over the
    alive-masked candidate blockmins, whole-block gathers from the f32
    slab, cancellation-free exact rescore, and the t-threshold overflow
    certificate (exactness is never silently lost).

    ``ndis`` counts the non-inert nodes of ALIVE blocks — the honest
    work measure of THIS algorithm (block-granular pruning scores whole
    blocks; per-node masking would not change what the MXU computes).
    """
    from vectordb_retrieval_tpu.ops import pallas_kernels as plk

    b, _ = queries.shape
    m, dim = slab.shape
    w = block_w if block_w else blockmin_width(m)
    off = 0
    for wd in depth_sizes:
        if off % w or wd % w:
            raise ValueError(
                f"depth block at offset {off} (width {wd}) is not aligned "
                f"to blockmin width {w}; rebuild the slab with "
                f"depth_slab_layout (SLAB_ALIGN={SLAB_ALIGN})"
            )
        off += wd
    if off != m:
        raise ValueError(f"depth_sizes sum {off} != slab rows {m}")

    kp = max(int(kprime), k)
    qn2 = jnp.sum(queries * queries, axis=-1)  # f32 VPU, exact norms
    qn = jnp.sqrt(qn2)

    xn = jnp.sum(slab * slab, axis=-1)  # [M] f32 exact
    noninert = is_real | (radii >= 0.0)
    pen_all = jnp.where(noninert, xn, jnp.inf)
    pen_real = jnp.where(is_real, xn, jnp.inf)

    # -- stage 1: two fused blockmin streams over the whole slab ---------
    s_pad = plk.dist_blockmin_pad_rows(m, w)
    slab_bf = jnp.pad(slab, ((0, s_pad - m), (0, 0))).astype(jnp.bfloat16)
    interp = not plk._on_tpu()
    bm_all = plk.dist_blockmin_pallas(
        queries,
        slab_bf,
        jnp.pad(pen_all, (0, s_pad - m), constant_values=jnp.inf).reshape(
            -1, w
        ),
        w=w,
        interpret=interp,
    )[:, : m // w]  # [B, G] min over non-inert nodes of (xn - 2*dot_bf16)
    bm_real = plk.dist_blockmin_pallas(
        queries,
        slab_bf,
        jnp.pad(pen_real, (0, s_pad - m), constant_values=jnp.inf).reshape(
            -1, w
        ),
        w=w,
        interpret=interp,
    )[:, : m // w]  # [B, G] min over real nodes

    # -- per-block metadata (static shapes, fused reductions) ------------
    g_total = m // w
    rmax_blk = jnp.max(
        jnp.where(noninert, radii, -jnp.inf).reshape(g_total, w), axis=1
    )
    xnmax_blk = jnp.max(
        jnp.where(noninert, xn, 0.0).reshape(g_total, w), axis=1
    )
    n_noninert_blk = jnp.sum(
        noninert.reshape(g_total, w), axis=1, dtype=jnp.int32
    )
    has_real_blk = jnp.any(is_real.reshape(g_total, w), axis=1)
    has_node_blk = n_noninert_blk > 0
    pblk = parent_rel // w  # parent's block index within the parent depth
    pblk_lo = jnp.min(
        jnp.where(noninert, pblk, jnp.iinfo(jnp.int32).max).reshape(
            g_total, w
        ),
        axis=1,
    )
    pblk_hi = jnp.max(
        jnp.where(noninert, pblk, -1).reshape(g_total, w), axis=1
    )

    # band: |d2_bf - d2| <= 2*err_c*|q|*|x| <= this per-block bound
    band_blk = (2.0 * err_c) * qn[:, None] * jnp.sqrt(xnmax_blk)[None, :]

    best_f = jnp.full((b, kp), jnp.inf, jnp.float32)
    ndis = jnp.zeros((b,), jnp.int32)
    kth_ub = jnp.full((b,), jnp.inf, jnp.float32)
    alive_prev = None  # [B, G_prev] of the previous depth
    cand_parts = []
    g0 = 0
    for di, wd in enumerate(depth_sizes):
        g1 = g0 + wd // w
        if di == 0:
            alive = jnp.broadcast_to(has_node_blk[g0:g1], (b, g1 - g0))
        else:
            # inclusive OR of alive_prev over [pfirst, plast]: two gathers
            # of an exclusive cumulative sum (columns shared across B)
            cs = jnp.cumsum(alive_prev.astype(jnp.int32), axis=1)
            cs = jnp.pad(cs, ((0, 0), (1, 0)))  # cs[j] = sum of [0, j)
            gp = alive_prev.shape[1]
            lo = jnp.clip(pblk_lo[g0:g1], 0, gp)
            hi = jnp.clip(pblk_hi[g0:g1] + 1, 0, gp)
            alive = (
                (jnp.take(cs, hi, axis=1) - jnp.take(cs, lo, axis=1)) > 0
            ) & has_node_blk[g0:g1][None, :]
        ndis = ndis + jnp.sum(
            jnp.where(alive, n_noninert_blk[g0:g1][None, :], 0),
            axis=1,
            dtype=jnp.int32,
        )

        cand_hi = jnp.where(
            alive & has_real_blk[g0:g1][None, :],
            qn2[:, None] + bm_real[:, g0:g1] + band_blk[:, g0:g1],
            jnp.inf,
        )
        cand_parts.append(cand_hi)

        # running kth upper bound from the block-minima fold
        nb_d = g1 - g0
        pad_f = (-nb_d) % kp
        cf = (
            jnp.pad(cand_hi, ((0, 0), (0, pad_f)), constant_values=jnp.inf)
            if pad_f
            else cand_hi
        )
        best_f = jnp.minimum(best_f, jnp.min(cf.reshape(b, -1, kp), axis=1))
        kth_ub = jnp.sqrt(
            jnp.maximum(top_k_smallest(best_f, k)[0][:, k - 1], 0.0)
        )

        d2_lo = jnp.maximum(
            qn2[:, None] + bm_all[:, g0:g1] - band_blk[:, g0:g1], 0.0
        )
        alive_prev = alive & (
            jnp.sqrt(d2_lo) - rmax_blk[g0:g1][None, :] <= kth_ub[:, None]
        )
        g0 = g1

    # ---- final selection over the alive-masked candidate blockmins -----
    cand = (
        cand_parts[0]
        if len(cand_parts) == 1
        else jnp.concatenate(cand_parts, axis=1)
    )  # [B, G] in slab block order
    s = min(k + _BLOCK_SLACK, g_total)
    bm_sel, blk_idx = top_k_smallest(cand, s)

    blocks = slab.reshape(g_total, w, dim)
    bvecs = blocks[blk_idx]  # [B, s, w, d]
    breal = is_real.reshape(g_total, w)[blk_idx]
    bpid = point_ids.reshape(g_total, w)[blk_idx]

    diff = bvecs - queries[:, None, None, :]
    d_ex = jnp.sqrt(jnp.sum(diff * diff, axis=-1))  # exact f32, VPU
    d_ex = jnp.where(breal, d_ex, jnp.inf).reshape(b, s * w)
    out_d, sel = top_k_smallest(d_ex, k)
    out_i = jnp.take_along_axis(bpid.reshape(b, s * w), sel, axis=1)
    out_i = jnp.where(jnp.isfinite(out_d), out_i, -1)

    # certificate (mirrors the stream walk): every alive&real block left
    # unselected has cand_hi >= t, so its closest REAL point has true
    # d2 >= t - 2*band_max; pruned blocks are covered by the per-node
    # prune certificate. Exact iff the rescored kth clears that floor.
    max_xn = jnp.sqrt(jnp.max(xnmax_blk))
    t = bm_sel[:, -1]
    floor2 = t - 4.0 * err_c * qn * max_xn
    kth_ex = out_d[:, k - 1]
    overflow = ~((kth_ex * kth_ex <= floor2) | ~jnp.isfinite(t))
    iters = jnp.int32(len(depth_sizes))
    return CoverTreeSearchResult(out_d, out_i, ndis, overflow, iters)
