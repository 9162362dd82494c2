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

_BUILD_BATCH = 1024


def build_knn_graph(
    vectors: jax.Array, degree: int, batch: int = _BUILD_BATCH
) -> jax.Array:
    """Exact R-NN adjacency ``[N, R] int32`` (self-edge excluded)."""
    n = vectors.shape[0]
    degree = min(degree, n - 1)
    sqn = dops.sq_norms(vectors)
    rows = []
    for start in range(0, n, batch):
        end = min(start + batch, n)
        q = vectors[start:end]
        _, ids = dops.exact_search(
            q, vectors, degree + 1, metric="l2", db_sqnorms=sqn
        )
        ids = np.asarray(ids)
        # drop the self column (it is the nearest hit; if ties hid it, drop
        # the last column instead)
        self_col = ids == np.arange(start, end)[:, None]
        keep = ~self_col
        # ensure exactly `degree` kept per row
        overflow = keep.sum(1) > degree
        if overflow.any():
            idx = np.where(overflow)[0]
            for r in idx:
                extra = np.where(keep[r])[0]
                keep[r, extra[degree:]] = False
        rows.append(
            np.take_along_axis(
                ids, np.argsort(~keep, axis=1, kind="stable"), axis=1
            )[:, :degree]
        )
    return jnp.asarray(np.concatenate(rows, axis=0).astype(np.int32))


def pick_entry_points(vectors: jax.Array, n_entry: int, seed: int = 0) -> jax.Array:
    """Medoid-ish + random entry points ``[E] int32``."""
    n = vectors.shape[0]
    mean = jnp.mean(vectors, axis=0, keepdims=True)
    _, medoid = dops.exact_search(mean, vectors, 1, metric="l2")
    extra = jax.random.choice(
        jax.random.PRNGKey(seed),
        n,
        shape=(max(n_entry - 1, 0),),
        replace=False,
    )
    return jnp.concatenate([medoid[0].astype(jnp.int32), extra.astype(jnp.int32)])


def _batch_dists(
    queries: jax.Array, vectors: jax.Array, ids: jax.Array, metric: str
) -> jax.Array:
    """Distances from each query to its own id list: ``[B, C]``."""
    safe = jnp.where(ids >= 0, ids, 0)
    vecs = vectors[safe]  # [B, C, d]
    dots = jnp.einsum(
        "bcd,bd->bc", vecs, queries, preferred_element_type=jnp.float32
    )
    if metric == "l2":
        qn = jnp.sum(queries * queries, axis=-1, dtype=jnp.float32)
        vn = jnp.sum(vecs * vecs, axis=-1, dtype=jnp.float32)
        d = qn[:, None] + vn - 2.0 * dots
    else:
        d = -dots
    return jnp.where(ids >= 0, d, jnp.inf)


@functools.partial(
    jax.jit, static_argnames=("k", "ef", "expand", "iters", "metric")
)
def graph_search(
    queries: jax.Array,
    vectors: jax.Array,
    adjacency: jax.Array,  # [N, R]
    entry_ids: jax.Array,  # [E]
    k: int,
    ef: int = 64,
    expand: int = 4,
    iters: int = 12,
    metric: str = "l2",
) -> Tuple[jax.Array, jax.Array]:
    """Batched beam search; returns ``(dists [B, k], ids [B, k])``."""
    b = queries.shape[0]
    r = adjacency.shape[1]
    e = entry_ids.shape[0]
    big = jnp.inf

    # Seed beam with entry points.
    seed_ids = jnp.broadcast_to(entry_ids[None, :], (b, e)).astype(jnp.int32)
    seed_d = _batch_dists(queries, vectors, seed_ids, metric)
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
        _, sel = jax.lax.top_k(-sel_d, expand)  # [B, W] beam positions
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
        nd = _batch_dists(queries, vectors, neigh, metric)
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
        new_d, pos = jax.lax.top_k(-s_d, ef)
        new_d = -new_d
        new_ids = jnp.take_along_axis(s_ids, pos, axis=1)
        new_exp = jnp.take_along_axis(s_exp, pos, axis=1)
        new_ids = jnp.where(jnp.isfinite(new_d), new_ids, -1)
        return (new_ids, new_d, new_exp), None

    (beam_ids, beam_d, beam_exp), _ = jax.lax.scan(
        body, (beam_ids, beam_d, beam_exp), None, length=iters
    )
    kk = min(k, ef)
    out_d, pos = jax.lax.top_k(-beam_d, kk)
    out_ids = jnp.take_along_axis(beam_ids, pos, axis=1)
    return -out_d, out_ids
