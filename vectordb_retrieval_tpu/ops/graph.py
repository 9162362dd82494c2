"""Graph ANN: batched best-first beam search over a padded kNN graph.

TPU-native substitute for FAISS ``IndexHNSWFlat`` (reference:
src/algorithms/hnsw.py:6-141, modular.py:136-179). HNSW's sequential
pointer-chasing is hostile to the TPU execution model (SURVEY.md section 7
hard-part (b)), so the design is re-thought:

  * build: an exact R-NN graph computed **on device** with the MXU exact
    scan (batched over nodes) — affordable on TPU where the reference needed
    incremental graph insertion to avoid O(N^2) CPU work;
  * search: a *batched* beam search. Every iteration expands the W best
    unexpanded beam entries for all queries at once: one adjacency gather,
    one vector gather, one MXU distance batch, one top-k re-rank of the
    beam. The visited-set becomes beam-level dedup: entries are sorted by
    ``(id, expanded-first)`` so duplicates collapse onto the copy that
    already carries the expanded flag.

All shapes are static: beam width ``ef``, expansion width ``W``, degree
``R``, iteration count — so the whole search jit-compiles to one XLA
program with no host round-trips.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vectordb_retrieval_tpu.ops import distances as dops

# 1024 keeps the kNN-graph build's per-batch candidate rescore
# ((k+slack)*w rows per query) within a sane transient footprint
_BUILD_BATCH = 1024


@functools.partial(jax.jit, static_argnames=("degree",))
def _diversify_batch(
    cand_ids: jax.Array,  # [B, C] nearest-first candidates (self excluded)
    cand_d: jax.Array,  # [B, C] distances node->candidate
    cand_vecs: jax.Array,  # [B, C, d]
    degree: int,
) -> jax.Array:
    """HNSW/RNG edge pruning, batched over nodes.

    Candidate c_j (ranked by distance) is kept iff for every already-kept
    c_k: ``d(c_j, c_k) > d(node, c_j)`` — the relative-neighbourhood rule
    that gives graph ANN its long-range reachability (a plain kNN graph
    plateaus ~0.85 recall on 20k random vectors; diversified hits >0.93 at
    the same degree). Remaining slots are refilled with the closest pruned
    candidates, HNSW-style, so degree stays fixed.
    """
    b, c, d = cand_vecs.shape
    # batched matmul norm-expansion (a [B,C,C,d] diff tensor would be GBs)
    dots = jax.lax.dot_general(
        cand_vecs,
        cand_vecs,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    cn = jnp.sum(cand_vecs * cand_vecs, axis=-1)
    pair = cn[:, :, None] + cn[:, None, :] - 2.0 * dots  # [B, C, C] squared
    cd2 = cand_d * cand_d

    def body(j, keep):
        # conflict: some kept k with pair[j, k] <= d(node, j)^2
        conflict = jnp.any(
            keep & (pair[:, j, :] <= cd2[:, j, None]), axis=1
        )
        n_kept = jnp.sum(keep, axis=1)
        take = (~conflict) & (n_kept < degree)
        return keep.at[:, j].set(take)

    keep = jax.lax.fori_loop(
        0, c, body, jnp.zeros((b, c), dtype=jnp.bool_)
    )
    # refill: order kept-first (stable by rank), then pruned by rank
    rank = jax.lax.broadcasted_iota(jnp.int32, (b, c), 1)
    order_key = jnp.where(keep, rank, rank + c)
    order = jnp.argsort(order_key, axis=1)
    return jnp.take_along_axis(cand_ids, order, axis=1)[:, :degree]


def build_knn_graph(
    vectors: jax.Array,
    degree: int,
    batch: int = _BUILD_BATCH,
    diversify: bool = True,
    candidate_factor: int = 3,
) -> jax.Array:
    """Exact candidate kNN + RNG-pruned adjacency ``[N, R] int32``."""
    n = vectors.shape[0]
    degree = min(degree, n - 1)
    n_cand = min(max(degree, candidate_factor * degree), n - 1)
    sqn = dops.sq_norms(vectors)
    rows = []
    batch = min(batch, n)
    starts = list(range(0, n, batch))
    # keep every batch the same shape (one compiled program): shift the last
    # ragged batch back and drop the overlapping prefix after computing
    overlaps = [0] * len(starts)
    if starts and starts[-1] + batch > n:
        shifted = n - batch
        overlaps[-1] = starts[-1] - shifted
        starts[-1] = shifted
    for start, overlap in zip(starts, overlaps):
        end = start + batch
        q = vectors[start:end]
        # dense kernel directly: graph candidates don't need the exact
        # rescoring pass (adjacency is diversified/pruned anyway), and the
        # blockmin path's per-query candidate rescore is wasteful at the
        # build's large query batches
        if n <= 262_144:
            d, ids = dops._exact_search_dense(
                q, vectors, sqn, n_cand + 1, "l2", None
            )
        else:
            d, ids = dops.exact_search(
                q, vectors, n_cand + 1, metric="l2", db_sqnorms=sqn
            )
        ids = np.asarray(ids)
        d = np.asarray(d)
        # drop the self column (nearest hit; ties may hide it -> drop last)
        self_col = ids == np.arange(start, end)[:, None]
        keep = ~self_col
        overflow = keep.sum(1) > n_cand
        if overflow.any():
            for r in np.where(overflow)[0]:
                extra = np.where(keep[r])[0]
                keep[r, extra[n_cand:]] = False
        order = np.argsort(~keep, axis=1, kind="stable")
        ids = np.take_along_axis(ids, order, axis=1)[:, :n_cand]
        d = np.take_along_axis(d, order, axis=1)[:, :n_cand]
        if diversify and n_cand > degree:
            cand_ids = jnp.asarray(ids.astype(np.int32))
            cand_vecs = vectors[cand_ids]
            pruned = _diversify_batch(
                cand_ids,
                jnp.sqrt(jnp.maximum(jnp.asarray(d), 0.0)),
                cand_vecs,
                degree,
            )
            rows.append(np.asarray(pruned)[overlap:])
        else:
            rows.append(ids[overlap:, :degree].astype(np.int32))
    return jnp.asarray(np.concatenate(rows, axis=0).astype(np.int32))


def pick_entry_points(vectors: jax.Array, n_entry: int, seed: int = 0) -> jax.Array:
    """Coarse-quantizer entry points ``[E] int32``.

    HNSW's upper layers exist to route a query into the right region before
    the level-0 graph refines; on clustered data a flat kNN graph is
    *disconnected across clusters*, so random entries strand the beam in
    the wrong cluster (observed recall 0.12 on 100k clustered embeddings vs
    0.93 on unimodal data). The TPU-native substitute for the hierarchy: a
    cheap k-means over the data and one entry point per centroid (nearest
    real vector), scored for every query as the beam seed — one [B, E]
    matmul replaces the hierarchy descent.
    """
    from vectordb_retrieval_tpu.ops.kmeans import kmeans_fit, training_sample

    n = vectors.shape[0]
    n_entry = min(n_entry, n)
    if n_entry <= 1:
        mean = jnp.mean(vectors, axis=0, keepdims=True)
        _, medoid = dops.exact_search(mean, vectors, 1, metric="l2")
        return medoid[0].astype(jnp.int32)
    sample = training_sample(n, n_entry, seed)
    train = vectors if sample is None else vectors[sample]
    centers, _ = kmeans_fit(train, n_entry, seed=seed, iters=8)
    _, nearest = dops.exact_search(centers, vectors, 1, metric="l2")
    return jnp.unique(
        nearest[:, 0].astype(jnp.int32), size=n_entry, fill_value=-1
    )


def _batch_dists(
    queries: jax.Array,
    vectors: jax.Array,
    sqnorms: jax.Array,
    ids: jax.Array,
    metric: str,
) -> jax.Array:
    """Distances from each query to its own id list: ``[B, C]``.

    ``vectors`` may be bf16 (the beam's vector gathers are its bandwidth
    cost); routing decisions tolerate bf16 noise and the caller rescores
    the final candidates exactly. Row norms come precomputed in f32."""
    safe = jnp.where(ids >= 0, ids, 0)
    vecs = vectors[safe]  # [B, C, d]
    q_cast = queries.astype(vectors.dtype)
    dots = jnp.einsum(
        "bcd,bd->bc", vecs, q_cast, preferred_element_type=jnp.float32
    )
    if metric == "l2":
        qn = jnp.sum(queries * queries, axis=-1, dtype=jnp.float32)
        d = qn[:, None] + sqnorms[safe] - 2.0 * dots
    else:
        d = -dots
    return jnp.where(ids >= 0, d, jnp.inf)


@functools.partial(
    jax.jit, static_argnames=("k", "ef", "expand", "iters", "metric")
)
def graph_search(
    queries: jax.Array,
    vectors: jax.Array,  # possibly bf16 scoring copies
    adjacency: jax.Array,  # [N, R]
    entry_ids: jax.Array,  # [E]
    k: int,
    ef: int = 64,
    expand: int = 4,
    iters: int = 12,
    metric: str = "l2",
    sqnorms: jax.Array = None,  # f32 row norms (l2)
) -> Tuple[jax.Array, jax.Array]:
    """Batched beam search; returns ``(dists [B, k], ids [B, k])``."""
    b = queries.shape[0]
    r = adjacency.shape[1]
    e = entry_ids.shape[0]
    big = jnp.inf
    if sqnorms is None:
        v32 = vectors.astype(jnp.float32)
        sqnorms = jnp.sum(v32 * v32, axis=-1)

    # Seed beam with entry points (top-ef by distance when there are more
    # entries than beam slots — the coarse-quantizer routing step).
    seed_ids = jnp.broadcast_to(entry_ids[None, :], (b, e)).astype(jnp.int32)
    seed_d = _batch_dists(queries, vectors, sqnorms, seed_ids, metric)
    if e > ef:
        neg, sel = jax.lax.approx_max_k(-seed_d, ef, recall_target=1.0)
        seed_d = -neg
        seed_ids = jnp.take_along_axis(seed_ids, sel, axis=1)
        e = ef
    pad = ef - e
    beam_ids = jnp.pad(seed_ids, ((0, 0), (0, max(pad, 0))), constant_values=-1)[
        :, :ef
    ]
    beam_d = jnp.pad(seed_d, ((0, 0), (0, max(pad, 0))), constant_values=big)[
        :, :ef
    ]
    beam_exp = jnp.zeros((b, ef), dtype=jnp.bool_)

    def body(state, _):
        beam_ids, beam_d, beam_exp = state
        # pick W best unexpanded entries
        sel_d = jnp.where(beam_exp | (beam_ids < 0), big, beam_d)
        # approx_max_k(rt=1.0): bit-exact, faster than TopK on wide rows
        _, sel = jax.lax.approx_max_k(-sel_d, expand, recall_target=1.0)
        sel_ids = jnp.take_along_axis(beam_ids, sel, axis=1)
        sel_valid = jnp.isfinite(jnp.take_along_axis(sel_d, sel, axis=1))
        # mark them expanded
        beam_exp = beam_exp | jnp.zeros_like(beam_exp).at[
            jnp.arange(b)[:, None], sel
        ].set(True)
        # gather neighbours
        safe_sel = jnp.where(sel_ids >= 0, sel_ids, 0)
        neigh = adjacency[safe_sel].reshape(b, expand * r)  # [B, W*R]
        neigh = jnp.where(
            jnp.repeat(sel_valid, r, axis=1) & (neigh >= 0), neigh, -1
        )
        nd = _batch_dists(queries, vectors, sqnorms, neigh, metric)
        # merge + dedup (expanded-first so flags survive)
        cat_ids = jnp.concatenate([beam_ids, neigh], axis=1)
        cat_d = jnp.concatenate([beam_d, nd], axis=1)
        cat_exp = jnp.concatenate(
            [beam_exp, jnp.zeros_like(neigh, dtype=jnp.bool_)], axis=1
        )
        # int32-safe composite key (N < 2^30): invalid ids sort last,
        # duplicates sort expanded-copy first so the flag survives dedup.
        sort_key = jnp.where(
            cat_ids < 0,
            jnp.int32(2**31 - 1),
            cat_ids * 2 + (1 - cat_exp.astype(jnp.int32)),
        )
        order = jnp.argsort(sort_key, axis=1)
        s_ids = jnp.take_along_axis(cat_ids, order, axis=1)
        s_d = jnp.take_along_axis(cat_d, order, axis=1)
        s_exp = jnp.take_along_axis(cat_exp, order, axis=1)
        dup = jnp.concatenate(
            [
                jnp.zeros((b, 1), dtype=jnp.bool_),
                s_ids[:, 1:] == s_ids[:, :-1],
            ],
            axis=1,
        )
        s_d = jnp.where(dup | (s_ids < 0), big, s_d)
        new_d, pos = jax.lax.approx_max_k(-s_d, ef, recall_target=1.0)
        new_d = -new_d
        new_ids = jnp.take_along_axis(s_ids, pos, axis=1)
        new_exp = jnp.take_along_axis(s_exp, pos, axis=1)
        new_ids = jnp.where(jnp.isfinite(new_d), new_ids, -1)
        return (new_ids, new_d, new_exp), None

    (beam_ids, beam_d, beam_exp), _ = jax.lax.scan(
        body, (beam_ids, beam_d, beam_exp), None, length=iters
    )
    kk = min(k, ef)
    out_d, pos = jax.lax.approx_max_k(-beam_d, kk, recall_target=1.0)
    out_ids = jnp.take_along_axis(beam_ids, pos, axis=1)
    return -out_d, out_ids
