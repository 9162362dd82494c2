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
    return CoverTreeSearchResult(best_d, best_i, ndis, overflow)
