"""Sharded exact search: per-shard top-k + all_gather merge over ICI.

The TPU-native scale-out plan from SURVEY.md sections 2.3 / 5: the database
matrix ``[N, d]`` is sharded row-wise over the mesh ``db`` axis with
``NamedSharding``; each device scans its shard with the same MXU kernel used
single-chip (ops/distances.py), produces a local ``(k, local_ids)`` top-k,
converts ids to global row space with its ``axis_index`` offset, and the
``P``-way candidate lists are merged with an ``all_gather`` + ``top_k`` —
k*P candidates per query cross ICI, never the distance matrix.

Queries can additionally be sharded over a ``q`` axis (data parallel): each
query block's merge happens inside its own ``db`` ring, and outputs stay
sharded over ``q``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vectordb_retrieval_tpu.ops import distances as dops


def shard_database(
    x: np.ndarray, mesh: Mesh, axis: str = "db"
) -> Tuple[jax.Array, int]:
    """Pad rows to a multiple of the axis size and place with NamedSharding.

    Returns ``(sharded_array, original_row_count)``; padded rows are zero and
    masked out at search time via the row-count.
    """
    n_shards = mesh.shape[axis]
    n = x.shape[0]
    padded_n = -(-n // n_shards) * n_shards
    if padded_n != n:
        x = np.concatenate(
            [x, np.zeros((padded_n - n, x.shape[1]), dtype=x.dtype)], axis=0
        )
    sharding = NamedSharding(mesh, P(axis, None))
    return jax.device_put(jnp.asarray(x), sharding), n


def _local_then_merge(q, xs, n_total, k, metric, axis):
    """Per-shard scan + cross-shard merge; runs inside shard_map."""
    shard_rows = xs.shape[0]
    my = jax.lax.axis_index(axis)
    offset = my * shard_rows
    d = dops.pairwise_distances(q, xs, metric)
    # mask global padding rows
    gids = offset + jax.lax.broadcasted_iota(jnp.int32, (1, shard_rows), 1)
    d = jnp.where(gids < n_total, d, jnp.inf)
    kk = min(k, shard_rows)
    ld, li = dops.top_k_smallest(d, kk)
    gi = jnp.take_along_axis(
        jnp.broadcast_to(gids, d.shape), li, axis=1
    )
    # gather the P candidate lists and merge
    all_d = jax.lax.all_gather(ld, axis)  # [P, B, kk]
    all_i = jax.lax.all_gather(gi, axis)
    p = all_d.shape[0]
    b = q.shape[0]
    cat_d = jnp.transpose(all_d, (1, 0, 2)).reshape(b, p * kk)
    cat_i = jnp.transpose(all_i, (1, 0, 2)).reshape(b, p * kk)
    out_k = min(k, p * kk)
    md, sel = dops.top_k_smallest(cat_d, out_k)
    mi = jnp.take_along_axis(cat_i, sel, axis=1)
    return md, mi


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "mesh", "db_axis", "q_axis")
)
def sharded_exact_search(
    queries: jax.Array,
    db_sharded: jax.Array,
    n_total: int,
    k: int,
    mesh: Mesh,
    metric: str = "l2",
    db_axis: str = "db",
    q_axis: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k over a row-sharded database.

    ``queries`` may be replicated (1-D mesh) or sharded over ``q_axis``.
    """
    if q_axis is None:
        in_specs = (P(), P(db_axis, None))
        out_specs = (P(), P())
    else:
        in_specs = (P(q_axis, None), P(db_axis, None))
        out_specs = (P(q_axis, None), P(q_axis, None))

    fn = jax.shard_map(
        functools.partial(
            _local_then_merge,
            n_total=n_total,
            k=k,
            metric=metric,
            axis=db_axis,
        ),
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )
    return fn(queries, db_sharded)
