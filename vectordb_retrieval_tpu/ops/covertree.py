"""Cover-tree exact k-NN: batched best-first descent with masked pruning.

TPU-native re-design of the reference's CoverTreeV2_2 search (reference:
src/algorithms/covertree_v2_2.py:374-523). The reference already moved from
per-node recursion to frontier-at-a-time batching (its V2.2); here the
frontier becomes a fixed-width device tensor per query and the descent a
``lax.while_loop``:

  * every iteration expands the E closest un-expanded frontier nodes for all
    queries at once: one children gather, one MXU distance batch, one
    running top-k update, one frontier re-compaction;
  * pruning uses the cover invariant: a node at level ``l`` covers its whole
    subtree within ``2^(l+1)``, so it is dropped when
    ``d(q, node) - 2^(l+1) > kth_best`` — the same dynamic bound as the
    reference (covertree_v2_2.py:419-500);
  * the search is **exact** as long as the frontier never overflows
    ``f_max``; overflow is returned per query so the caller can fall back to
    the exact scan for those rows (exactness is never silently lost);
  * ``ndis`` (scored distance evaluations) is accumulated on device and
    returned, preserving the reference's operation-counting contract
    (covertree_v2_2.py:298-307).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from vectordb_retrieval_tpu.ops.distances import top_k_smallest


class CoverTreeSearchResult(NamedTuple):
    dists: jax.Array  # [B, k]
    ids: jax.Array  # [B, k]
    ndis: jax.Array  # [B] scored distance evaluations
    overflow: jax.Array  # [B] bool — frontier overflowed, result may be inexact
    iters: jax.Array  # [] while-loop iterations (profiling/diagnostics)


def _score(queries, vectors, point_ids, node_ids):
    """True-L2 distances from each query to the points of per-query node id
    lists; -1 node ids -> +inf.

    Diff-form (``sum((q-x)^2)``) rather than the matmul norm expansion:
    cancellation-free, so the pruning bound and result distances are exact
    to f32 rounding — required for the exactness guarantee (SURVEY.md s7(c)).
    """
    safe_nodes = jnp.where(node_ids >= 0, node_ids, 0)
    rows = point_ids[safe_nodes]
    vecs = vectors[rows]
    diff = vecs - queries[:, None, :]
    # VPU sum, not einsum: MXU contractions drop inputs to bf16
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    return jnp.where(node_ids >= 0, d, jnp.inf)


@functools.partial(
    jax.jit, static_argnames=("k", "f_max", "expand", "max_iters")
)
def covertree_search(
    queries: jax.Array,  # [B, d]
    vectors: jax.Array,  # [N, d]  (db points)
    point_ids: jax.Array,  # [M] int32: node -> db row (virtual nodes reuse rows)
    is_real: jax.Array,  # [M] bool: node contributes its point to top-k
    radii: jax.Array,  # [M] float32 subtree cover radius
    children: jax.Array,  # [M, C] int32 node ids, -1 padded
    has_children: jax.Array,  # [M] bool
    root: int,
    k: int,
    f_max: int = 2048,
    expand: int = 16,
    max_iters: int = 4096,
) -> CoverTreeSearchResult:
    b, _ = queries.shape
    c = children.shape[1]
    inf = jnp.inf

    # score root, init best + frontier
    root_ids = jnp.full((b, 1), root, jnp.int32)
    root_d = _score(queries, vectors, point_ids, root_ids)
    best_d = jnp.full((b, k), inf, jnp.float32).at[:, 0].set(root_d[:, 0])
    best_i = jnp.full((b, k), -1, jnp.int32).at[:, 0].set(point_ids[root])

    fids = jnp.full((b, f_max), -1, jnp.int32)
    fd = jnp.full((b, f_max), inf, jnp.float32)
    root_active = has_children[root]
    fids = fids.at[:, 0].set(jnp.where(root_active, root, -1))
    fd = fd.at[:, 0].set(jnp.where(root_active, root_d[:, 0], inf))

    ndis = jnp.full((b,), 1, jnp.int32)
    overflow = jnp.zeros((b,), jnp.bool_)

    def cond(state):
        it, fids, fd, best_d, best_i, ndis, overflow = state
        return jnp.logical_and(it < max_iters, jnp.any(fids >= 0))

    def body(state):
        it, fids, fd, best_d, best_i, ndis, overflow = state
        kth = best_d[:, k - 1]

        # prune frontier vs current bound
        fr = radii[jnp.where(fids >= 0, fids, 0)]
        alive = (fids >= 0) & (fd - fr <= kth[:, None])
        fd = jnp.where(alive, fd, inf)
        fids = jnp.where(alive, fids, -1)

        # pick E closest frontier nodes to expand (top_k_smallest =
        # approx_max_k at recall 1.0, bit-exact; measured neutral here —
        # the descent is bound by its scattered node/vector gathers, not
        # selection — but keeps the selection idiom uniform repo-wide)
        _, sel = top_k_smallest(fd, expand)  # [B, E] positions
        sel_ids = jnp.take_along_axis(fids, sel, axis=1)
        # remove them from the frontier
        fids = fids.at[jnp.arange(b)[:, None], sel].set(
            jnp.where(sel_ids >= 0, -1, sel_ids)
        )
        fd = fd.at[jnp.arange(b)[:, None], sel].set(inf)

        # gather + score children
        kid_ids = children[jnp.where(sel_ids >= 0, sel_ids, 0)].reshape(
            b, expand * c
        )
        kid_ids = jnp.where(
            jnp.repeat(sel_ids >= 0, c, axis=1), kid_ids, -1
        )
        kd = _score(queries, vectors, point_ids, kid_ids)
        ndis = ndis + jnp.sum(kid_ids >= 0, axis=1, dtype=jnp.int32)

        # update running top-k with scored REAL children (virtual nodes reuse
        # an existing point and must not duplicate it in the result set)
        kid_real = is_real[jnp.where(kid_ids >= 0, kid_ids, 0)] & (kid_ids >= 0)
        score_d = jnp.where(kid_real, kd, inf)
        score_pts = jnp.where(kid_real, point_ids[jnp.where(kid_ids >= 0, kid_ids, 0)], -1)
        cat_d = jnp.concatenate([best_d, score_d], axis=1)
        cat_i = jnp.concatenate([best_i, score_pts], axis=1)
        best_d, pos = top_k_smallest(cat_d, k)
        best_i = jnp.take_along_axis(cat_i, pos, axis=1)
        kth = best_d[:, k - 1]

        # children with subtrees join the frontier (pruned ones dropped)
        kid_r = radii[jnp.where(kid_ids >= 0, kid_ids, 0)]
        kid_hc = has_children[jnp.where(kid_ids >= 0, kid_ids, 0)]
        keep = (
            (kid_ids >= 0)
            & kid_hc
            & (kd - kid_r <= kth[:, None])
        )
        kid_keep_d = jnp.where(keep, kd, inf)
        kid_keep_i = jnp.where(keep, kid_ids, -1)

        m_d = jnp.concatenate([fd, kid_keep_d], axis=1)
        m_i = jnp.concatenate([fids, kid_keep_i], axis=1)
        valid_count = jnp.sum(jnp.isfinite(m_d), axis=1)
        overflow = overflow | (valid_count > f_max)
        fd, pos = top_k_smallest(m_d, f_max)
        fids = jnp.take_along_axis(m_i, pos, axis=1)
        fids = jnp.where(jnp.isfinite(fd), fids, -1)

        return (it + 1, fids, fd, best_d, best_i, ndis, overflow)

    state = (jnp.int32(0), fids, fd, best_d, best_i, ndis, overflow)
    it, fids, fd, best_d, best_i, ndis, overflow = jax.lax.while_loop(
        cond, body, state
    )
    overflow = overflow | (it >= max_iters)
    return CoverTreeSearchResult(best_d, best_i, ndis, overflow, it)


# ---------------------------------------------------------------------------
# depth-synchronous masked-stream descent
# ---------------------------------------------------------------------------
#
# The best-first descent above is gather-bound: profiled on v5e at the
# msmarco shape (scripts/exp_covertree_iter_cost.py), its per-iteration
# scattered row/scalar gathers run at ~68 GB/s against the MXU stream's
# ~400+ GB/s, and the frontier top-k maintenance adds ~19 ms/iteration of
# fixed cost — 33-72 QPS end-to-end while ndis is already ~82% of the
# corpus on hard high-d data. The TPU-native reformulation below keeps the
# reference's pruning semantics but restructures the WORK layout:
#
#   * nodes are stored depth-major (every BFS depth contiguous), so each
#     descent step is a STATIC slice of the slab — a dense [B, W_depth]
#     MXU distance matmul, zero gathers;
#   * the alive/pruned state propagates parent -> child as a boolean mask
#     (one shared-index take per depth);
#   * MXU dots truncate inputs to bf16, so pruning uses a certified error
#     band: d2_lo/d2_hi = d2 -/+ 2*err_c*|q||x| bound the true f32
#     distance, the prune test uses d_lo vs a kth UPPER bound, and the
#     final top-k is exactly rescored (cancellation-free f32 diff form)
#     from the top-K' candidates with a blockmin-style certificate — the
#     same exactness pattern as ops/distances._exact_search_blockmin;
#   * ``ndis`` counts alive (algorithmically required) distance
#     evaluations per query, preserving the reference's operation-counting
#     contract (covertree_v2_2.py:298-307). The MXU additionally computes
#     masked lanes for pruned nodes — hardware padding, not counted, and
#     on TPU not a cost either.
#
# Pruning soundness: prune node v for query q iff d_lo(q,v) - r(v) >
# kth_ub, where kth_ub >= the true current kth distance (it is the kth of
# d_hi upper bounds) and d_lo <= the true distance. The true current kth
# only shrinks as deeper candidates arrive, so a pruned subtree can never
# contain a true top-k point (reference inequality covertree_v2_2.py:
# 419-500 with the numeric band folded in).

# default certified bound on |dot_bf16(q,x) - dot_f32(q,x)| / (|q||x|):
# inputs are rounded to bf16 (rel err <= 2^-8 worst case for truncation),
# accumulation in f32 adds d*2^-24. 6e-3 gives ~1.5x headroom over the
# 2*2^-9 + d*2^-24 nearest-rounding bound; validated empirically in
# tests/models/test_covertree.py::test_stream_band_covers_mxu_error.
DEFAULT_ERR_C = 6e-3

# column-chunk width for streaming one depth: bounds the [B, chunk] f32
# transients (134 MB at B=256) so 1M-scale depths fit comfortably in HBM
_STREAM_CHUNK = 131_072


@functools.partial(
    jax.jit, static_argnames=("depth_sizes", "k", "kprime", "err_c")
)
def covertree_stream_search(
    queries: jax.Array,  # [B, d] f32
    slab: jax.Array,  # [M, d] f32 node points, depth-major order
    point_ids: jax.Array,  # [M] int32 node -> db row
    is_real: jax.Array,  # [M] bool node contributes its point to top-k
    radii: jax.Array,  # [M] f32 exact subtree cover radii
    parent_rel: jax.Array,  # [M] int32 parent position within its depth block
    depth_sizes: Tuple[int, ...],
    k: int,
    kprime: int,
    err_c: float = DEFAULT_ERR_C,
) -> CoverTreeSearchResult:
    b, _ = queries.shape
    kp = kprime
    qn2 = jnp.sum(queries * queries, axis=-1)  # f32 VPU, exact norms
    qn = jnp.sqrt(qn2)

    best_h = jnp.full((b, kp), jnp.inf, jnp.float32)  # d2_hi of candidates
    best_i = jnp.full((b, kp), -1, jnp.int32)
    ndis = jnp.zeros((b,), jnp.int32)
    kept_prev = jnp.ones((b, 1), jnp.bool_)  # virtual parent of the root
    max_xn = jnp.sqrt(jnp.max(jnp.sum(slab * slab, axis=-1)))

    off = 0
    for w in depth_sizes:
        # large depths stream in column chunks to bound the [B, W]
        # transients (the kth bound tightens chunk to chunk, which only
        # strengthens pruning — soundness is monotone in the bound)
        kept_parts = []
        for c0 in range(0, w, _STREAM_CHUNK):
            wc = min(_STREAM_CHUNK, w - c0)
            s = off + c0
            blk = jax.lax.slice_in_dim(slab, s, s + wc)  # [Wc, d] static
            r_blk = jax.lax.slice_in_dim(radii, s, s + wc)
            real_blk = jax.lax.slice_in_dim(is_real, s, s + wc)
            prel_blk = jax.lax.slice_in_dim(parent_rel, s, s + wc)

            bn2 = jnp.sum(blk * blk, axis=-1)  # f32 exact
            dot = queries @ blk.T  # MXU, bf16 inputs (DEFAULT precision)
            d2 = qn2[:, None] + bn2[None, :] - 2.0 * dot
            band2 = (2.0 * err_c) * qn[:, None] * jnp.sqrt(bn2)[None, :]
            d2_lo = jnp.maximum(d2 - band2, 0.0)
            d2_hi = d2 + band2

            alive = jnp.take(kept_prev, prel_blk, axis=1)  # [B, Wc]
            ndis = ndis + jnp.sum(alive, axis=1, dtype=jnp.int32)

            cand = jnp.where(alive & real_blk[None, :], d2_hi, jnp.inf)
            slab_pos = jax.lax.broadcasted_iota(jnp.int32, (b, wc), 1) + s
            cat_d = jnp.concatenate([best_h, cand], axis=1)
            cat_i = jnp.concatenate([best_i, slab_pos], axis=1)
            best_h, pos = top_k_smallest(cat_d, kp)
            best_i = jnp.take_along_axis(cat_i, pos, axis=1)

            kth_ub = jnp.sqrt(best_h[:, k - 1])  # upper bnd on true kth
            kept_parts.append(
                alive & (jnp.sqrt(d2_lo) - r_blk[None, :] <= kth_ub[:, None])
            )
        kept_prev = (
            kept_parts[0]
            if len(kept_parts) == 1
            else jnp.concatenate(kept_parts, axis=1)
        )
        off += w

    # exact rescore of the K' candidates (cancellation-free f32 diff form);
    # best_i holds SLAB positions, unique per db row since only real nodes
    # (one per row) enter the candidate set
    valid = jnp.isfinite(best_h) & (best_i >= 0)
    safe_pos = jnp.where(valid, best_i, 0)
    cand_vecs = slab[safe_pos]  # [B, K', d] — K' row gathers per query
    diff = cand_vecs - queries[:, None, :]
    d_ex = jnp.sqrt(jnp.sum(diff * diff, axis=-1))  # VPU, exact
    d_ex = jnp.where(valid, d_ex, jnp.inf)
    out_d, sel = top_k_smallest(d_ex, k)
    out_pos = jnp.take_along_axis(safe_pos, sel, axis=1)
    out_valid = jnp.take_along_axis(valid, sel, axis=1)
    out_i = jnp.where(out_valid, point_ids[out_pos], -1)

    # certificate: every db point outside the candidate set has
    # d2_hi > t (the K'-th kept upper bound), hence true d2 > t - 2*band_max
    # (d2_hi = d2 + band2 and true d2 >= d2 - band2). Exact iff the
    # rescored kth is within that floor; else flag overflow so the caller
    # falls back to the exact scan (exactness is never silently lost).
    t = best_h[:, -1]
    floor2 = t - 4.0 * err_c * qn * max_xn
    kth_ex = out_d[:, k - 1]
    overflow = ~(
        (kth_ex * kth_ex <= floor2) | ~jnp.isfinite(t)
    )
    iters = jnp.int32(len(depth_sizes))
    return CoverTreeSearchResult(out_d, out_i, ndis, overflow, iters)

