"""Pairwise distance + top-k kernels — the load-bearing compute path.

TPU-native replacement for the reference's FAISS ``IndexFlat`` exact search
(reference: src/algorithms/exact_search.py:26-78) and its NumPy
``LinearSearcher`` (reference: src/algorithms/modular.py:312-390), and also
the brute-force ground-truth generator (reference:
src/benchmark/dataset.py:858-964).

Design: distances are computed as one large matmul on the MXU —
``||q - x||^2 = ||q||^2 + ||x||^2 - 2 q.x`` for L2, plain ``q @ x.T`` for
inner-product/cosine — followed by ``jax.lax.top_k``. For databases too large
to materialise a ``[B, N]`` distance matrix, :func:`exact_search` streams the
database through a ``lax.scan`` over fixed-size chunks while maintaining a
running top-k (a "streaming top-k merge"), which keeps peak memory at
``O(B * chunk + B * k)`` and maps onto the same sharded-merge pattern used
for multi-chip search (parallel/sharded.py).

Distance conventions (FAISS-compatible, reference modular.py:544-546):
  * ``l2``     -> squared Euclidean distance (ascending = better)
  * ``ip``     -> negated inner product      (ascending = better)
  * ``cosine`` -> negated cosine similarity; both sides are L2-normalised
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

METRICS = ("l2", "ip", "cosine")

# Below this many database rows the full [B, N] distance matrix is
# materialised in one shot; above it we stream chunks through lax.scan.
_DENSE_PATH_MAX_ROWS = 262_144
# Chunk of database rows per scan step: 64k rows x 128 lanes fits VMEM-sized
# working sets comfortably and keeps the MXU busy.
DEFAULT_CHUNK_ROWS = 65_536


def _check_metric(metric: str) -> None:
    if metric not in METRICS:
        raise ValueError(f"unknown metric {metric!r}; expected one of {METRICS}")


def clamp_chunk(chunk: int, n: int, align: int = 512) -> int:
    """Never let a streaming chunk exceed the (aligned) dataset size —
    otherwise small datasets pay for a full chunk of padding."""
    aligned_n = -(-max(n, 1) // align) * align
    return max(align, min(chunk, aligned_n))


def normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """L2-normalise rows (cosine preprocessing; reference dataset.py:915-916)."""
    norms = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(norms, eps)


def sq_norms(x: jax.Array) -> jax.Array:
    """Row-wise squared L2 norms ``[N]`` — precompute once per database."""
    return jnp.sum(x * x, axis=-1)


def pairwise_distances(
    queries: jax.Array,
    database: jax.Array,
    metric: str = "l2",
    db_sqnorms: Optional[jax.Array] = None,
) -> jax.Array:
    """Dense ``[B, N]`` distance matrix (ascending = closer) on the MXU.

    ``cosine`` assumes *both* sides are already unit-normalised (callers
    normalise the database once at build time and queries per batch).
    """
    _check_metric(metric)
    dots = jax.lax.dot_general(
        queries,
        database,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if metric == "l2":
        qn = jnp.sum(queries * queries, axis=-1, dtype=jnp.float32)
        xn = db_sqnorms if db_sqnorms is not None else sq_norms(database)
        d = qn[:, None] + xn[None, :].astype(jnp.float32) - 2.0 * dots
        return jnp.maximum(d, 0.0)
    return -dots


def top_k_smallest(distances: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Indices/values of the k smallest entries per row (ties by index order
    are NOT guaranteed to match NumPy argsort — compare distances in tests,
    SURVEY.md section 7 hard-part (c))."""
    neg_vals, idx = jax.lax.top_k(-distances, k)
    return -neg_vals, idx


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def _exact_search_dense(
    queries: jax.Array,
    database: jax.Array,
    db_sqnorms: Optional[jax.Array],
    k: int,
    metric: str,
) -> Tuple[jax.Array, jax.Array]:
    d = pairwise_distances(queries, database, metric, db_sqnorms)
    return top_k_smallest(d, k)


@functools.partial(jax.jit, static_argnames=("k", "metric", "chunk_rows"))
def _exact_search_streamed(
    queries: jax.Array,
    database: jax.Array,
    db_sqnorms: Optional[jax.Array],
    k: int,
    metric: str,
    chunk_rows: int,
) -> Tuple[jax.Array, jax.Array]:
    """Stream DB chunks through lax.scan with a running top-k merge."""
    n, dim = database.shape
    b = queries.shape[0]
    n_chunks = -(-n // chunk_rows)
    padded_n = n_chunks * chunk_rows

    pad = padded_n - n
    db = jnp.pad(database, ((0, pad), (0, 0)))
    if metric == "l2":
        xn = db_sqnorms if db_sqnorms is not None else sq_norms(database)
        xn = jnp.pad(xn, (0, pad))
        chunks = (
            db.reshape(n_chunks, chunk_rows, dim),
            xn.reshape(n_chunks, chunk_rows),
        )
    else:
        chunks = (db.reshape(n_chunks, chunk_rows, dim), None)

    init = (
        jnp.full((b, k), jnp.inf, dtype=jnp.float32),
        jnp.full((b, k), -1, dtype=jnp.int32),
    )
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, chunk_rows), 1)

    def step(carry, inputs):
        best_d, best_i = carry
        chunk_idx, chunk_vecs, chunk_sqn = inputs
        d = pairwise_distances(queries, chunk_vecs, metric, chunk_sqn)
        ids = row_ids + chunk_idx * chunk_rows
        # Mask padded rows out of the running top-k.
        valid = ids < n
        d = jnp.where(valid, d, jnp.inf)
        cat_d = jnp.concatenate([best_d, d], axis=1)
        cat_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(ids, (b, chunk_rows))], axis=1
        )
        new_d, sel = top_k_smallest(cat_d, k)
        new_i = jnp.take_along_axis(cat_i, sel, axis=1)
        return (new_d, new_i), None

    chunk_ids = jnp.arange(n_chunks, dtype=jnp.int32)
    if metric == "l2":
        xs = (chunk_ids, chunks[0], chunks[1])
    else:
        xs = (chunk_ids, chunks[0], jnp.zeros((n_chunks, 0), jnp.float32))

    def step_wrap(carry, inputs):
        if metric == "l2":
            return step(carry, inputs)
        ci, cv, _ = inputs
        return step(carry, (ci, cv, None))

    (best_d, best_i), _ = jax.lax.scan(step_wrap, init, xs)
    return best_d, best_i


def exact_search(
    queries: jax.Array,
    database: jax.Array,
    k: int,
    metric: str = "l2",
    db_sqnorms: Optional[jax.Array] = None,
    chunk_rows: int = DEFAULT_CHUNK_ROWS,
) -> Tuple[jax.Array, jax.Array]:
    """Exact k-NN: ``(dists[B, k], ids[B, k])``, ascending distance.

    Dense path for small databases, streamed scan for large ones. ``k`` is
    clamped to N by the caller (indices past N never appear).
    """
    _check_metric(metric)
    n = database.shape[0]
    if k > n:
        raise ValueError(f"k={k} exceeds database size {n}")
    if n <= _DENSE_PATH_MAX_ROWS:
        return _exact_search_dense(queries, database, db_sqnorms, k, metric)
    return _exact_search_streamed(
        queries, database, db_sqnorms, k, metric, clamp_chunk(chunk_rows, n)
    )
