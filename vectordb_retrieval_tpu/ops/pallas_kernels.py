"""Pallas TPU kernels for hot compute paths.

Current kernels:
  * :func:`assign_pallas` — fused pairwise-L2 + argmin for k-means
    assignment (the IVF/PQ build hot loop, reference index.train equivalent):
    each grid step loads a tile of points into VMEM, runs one MXU matmul
    against the (VMEM-resident) centroids, applies the norm expansion and
    reduces to (argmin, min) on the VPU — the ``[tile, K]`` distance block
    never leaves VMEM, where the XLA version materialises a ``[chunk, K]``
    HBM intermediate per scan step.

Kernels run compiled on TPU backends and in interpreter mode elsewhere
(tests exercise them on CPU via ``interpret=True``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_ROWS = 1024  # 1-D outputs need 1024-aligned tiling (XLA T(1024))


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def _assign_kernel(pts_ref, cents_ref, cn_ref, assign_ref, dist_ref):
    """One tile: dist = |p|^2 + |c|^2 - 2 p.c -> (argmin, min) over K."""
    pts = pts_ref[:]  # [T, d] VMEM
    cents = cents_ref[:]  # [K, d] VMEM
    dots = jax.lax.dot_general(
        pts,
        cents,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, K] — lives in VMEM only
    pn = jnp.sum(pts * pts, axis=1, dtype=jnp.float32)
    dist = pn[:, None] + cn_ref[:][None, :] - 2.0 * dots
    assign_ref[:] = jnp.argmin(dist, axis=1).astype(jnp.int32)
    dist_ref[:] = jnp.min(dist, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def assign_pallas(
    points: jax.Array,  # [N, d]
    centroids: jax.Array,  # [K, d]
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Nearest-centroid assignment: ``(assign [N] int32, min_dist [N])``."""
    n, d = points.shape
    k = centroids.shape[0]
    tile = min(_TILE_ROWS, max(8, n))
    n_tiles = -(-n // tile)
    pad = n_tiles * tile - n
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    cn = jnp.sum(centroids * centroids, axis=1, dtype=jnp.float32)

    assign, dist = pl.pallas_call(
        _assign_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles * tile,), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles * tile,), jnp.float32),
        ),
        interpret=interpret,
    )(pts, centroids, cn)
    return assign[:n], dist[:n]


def kmeans_assign_fused(points: jax.Array, centroids: jax.Array):
    """Dispatch: Pallas on TPU, interpreter elsewhere (tests)."""
    return assign_pallas(points, centroids, interpret=not _on_tpu())
