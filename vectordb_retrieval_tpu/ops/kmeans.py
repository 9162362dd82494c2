"""Jit-compiled Lloyd k-means on device: the trainer for IVF / PQ / SQ.

TPU-native replacement for FAISS's ``index.train`` clustering (reference:
src/algorithms/approximate_search.py:42-43, src/algorithms/modular.py:281-283).

Design: each Lloyd iteration streams the points through a ``lax.scan`` over
fixed-size chunks; assignment is an MXU distance matmul + argmin, and the
centroid update accumulates ``one_hot(assign).T @ points`` (another matmul)
plus counts — so the whole iteration is MXU work with O(chunk * k) transient
memory. Empty clusters keep their previous centroid. FAISS-style training
subsampling (max_points_per_centroid) is applied by the host-side caller.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

DEFAULT_ITERS = 20
MAX_POINTS_PER_CENTROID = 256
_CHUNK = 16_384


def _pad_chunks(x: jax.Array, chunk: int) -> Tuple[jax.Array, jax.Array, int]:
    n, d = x.shape
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    mask = (jnp.arange(n_chunks * chunk) < n).astype(jnp.float32)
    return (
        xp.reshape(n_chunks, chunk, d),
        mask.reshape(n_chunks, chunk),
        n_chunks,
    )


def _chunk_l2(xc: jax.Array, centroids: jax.Array) -> jax.Array:
    dots = jax.lax.dot_general(
        xc,
        centroids,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    cn = jnp.sum(centroids * centroids, axis=-1, dtype=jnp.float32)
    xn = jnp.sum(xc * xc, axis=-1, dtype=jnp.float32)
    return xn[:, None] + cn[None, :] - 2.0 * dots


@functools.partial(
    jax.jit, static_argnames=("k", "iters", "spherical", "chunk")
)
def kmeans_fit(
    x: jax.Array,
    k: int,
    seed: int = 0,
    iters: int = DEFAULT_ITERS,
    spherical: bool = False,
    chunk: int = _CHUNK,
) -> Tuple[jax.Array, jax.Array]:
    """Fit ``k`` centroids to ``x [N, d]``; returns ``(centroids, final_cost)``.

    Init = random sample of k distinct points. ``spherical=True`` renormalises
    centroids each iteration (cosine / inner-product training).
    """
    n, d = x.shape
    key = jax.random.PRNGKey(seed)
    perm = jax.random.permutation(key, n)[:k]
    init = x[perm]
    if spherical:
        init = init / jnp.maximum(
            jnp.linalg.norm(init, axis=1, keepdims=True), 1e-12
        )

    chunks, mask, n_chunks = _pad_chunks(x, min(chunk, max(n, 1)))

    def lloyd(carry, _):
        centroids, _ = carry

        def step(acc, inp):
            sums, counts, cost = acc
            xc, mc = inp
            dist = _chunk_l2(xc, centroids)
            assign = jnp.argmin(dist, axis=1)
            dmin = jnp.min(dist, axis=1)
            onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32) * mc[:, None]
            sums = sums + jax.lax.dot_general(
                onehot,
                xc,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            counts = counts + jnp.sum(onehot, axis=0)
            cost = cost + jnp.sum(dmin * mc)
            return (sums, counts, cost), None

        (sums, counts, cost), _ = jax.lax.scan(
            step,
            (
                jnp.zeros((k, d), jnp.float32),
                jnp.zeros((k,), jnp.float32),
                jnp.float32(0.0),
            ),
            (chunks, mask),
        )
        new_centroids = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centroids
        )
        if spherical:
            new_centroids = new_centroids / jnp.maximum(
                jnp.linalg.norm(new_centroids, axis=1, keepdims=True), 1e-12
            )
        return (new_centroids, cost), None

    (centroids, cost), _ = jax.lax.scan(
        lloyd, (init, jnp.float32(0.0)), None, length=iters
    )
    return centroids, cost


@functools.partial(jax.jit, static_argnames=("chunk",))
def kmeans_assign(
    x: jax.Array, centroids: jax.Array, chunk: int = _CHUNK
) -> jax.Array:
    """Nearest-centroid id per row of ``x`` (chunk-streamed)."""
    n = x.shape[0]
    chunks, mask, _ = _pad_chunks(x, min(chunk, max(n, 1)))

    def step(_, inp):
        xc, _mc = inp
        dist = _chunk_l2(xc, centroids)
        return None, jnp.argmin(dist, axis=1).astype(jnp.int32)

    _, assigns = jax.lax.scan(step, None, (chunks, mask))
    return assigns.reshape(-1)[:n]


@functools.partial(jax.jit, static_argnames=("chunk",))
def kmeans_assign2(
    x: jax.Array, centroids: jax.Array, chunk: int = _CHUNK
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Two nearest centroids per row: ``(a1 [n], a2 [n], margin [n])``.

    ``margin = d2 - d1`` (squared-L2 gap between the runner-up and the
    winner). Used by the block-graph's spilled assignment (ops/graph.
    build_block_graph ``spill``): rows with the smallest margin sit on a
    partition boundary and are the ones worth duplicating into their
    second-nearest block. Chunk-streamed like :func:`kmeans_assign`.
    """
    n = x.shape[0]
    chunks, mask, _ = _pad_chunks(x, min(chunk, max(n, 1)))

    def step(_, inp):
        xc, _mc = inp
        dist = _chunk_l2(xc, centroids)
        nd, ids = jax.lax.top_k(-dist, 2)
        return None, (
            ids[:, 0].astype(jnp.int32),
            ids[:, 1].astype(jnp.int32),
            (nd[:, 0] - nd[:, 1]).astype(jnp.float32),
        )

    _, (a1, a2, margin) = jax.lax.scan(step, None, (chunks, mask))
    return (
        a1.reshape(-1)[:n],
        a2.reshape(-1)[:n],
        margin.reshape(-1)[:n],
    )


def training_sample(
    n: int, k: int, seed: int, max_ppc: int = MAX_POINTS_PER_CENTROID
) -> Optional[jax.Array]:
    """FAISS-style train subsample indices, or None to use all points."""
    cap = k * max_ppc
    if n <= cap:
        return None
    key = jax.random.PRNGKey(seed ^ 0x5EED)
    return jax.random.permutation(key, n)[:cap]
