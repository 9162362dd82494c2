"""Scalar quantization (SQ8): per-dimension uint8 affine codes.

TPU-native replacement for the FAISS ``SQ8`` stage of ``IVF{n},SQ8``
(reference: src/algorithms/modular.py:224-289 factory grammar,
configs/benchmark_config.yaml:51-60).

Codes are decoded on the fly inside the scan (``vmin + code * step``) and
scored with the same MXU norm-expansion matmul as the exact path; HBM traffic
drops 4x vs float32 vectors. Reconstructed squared norms are precomputed at
build so the L2 expansion needs only the dot products.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from vectordb_retrieval_tpu.ops import distances as dops

_SCAN_CHUNK = 65_536


@jax.jit
def sq_train(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-dim (vmin, step): FAISS QT_8bit-style min/max range fit."""
    vmin = jnp.min(x, axis=0)
    vmax = jnp.max(x, axis=0)
    step = jnp.maximum(vmax - vmin, 1e-12) / 255.0
    return vmin, step


@jax.jit
def sq_encode(x: jax.Array, vmin: jax.Array, step: jax.Array) -> jax.Array:
    q = jnp.round((x - vmin[None, :]) / step[None, :])
    return jnp.clip(q, 0, 255).astype(jnp.uint8)


def sq_decode(codes: jax.Array, vmin: jax.Array, step: jax.Array) -> jax.Array:
    return vmin[None, :] + codes.astype(jnp.float32) * step[None, :]


def sq_search(
    queries,
    codes,
    vmin,
    step,
    code_sqnorms,
    k,
    chunk=_SCAN_CHUNK,
    metric="l2",
):
    """Chunk-clamped wrapper over the jitted SQ8 scan."""
    chunk = dops.clamp_chunk(chunk, codes.shape[0])
    return _sq_search_jit(
        queries, codes, vmin, step, code_sqnorms, k, chunk, metric
    )


@functools.partial(jax.jit, static_argnames=("k", "chunk", "metric"))
def _sq_search_jit(
    queries: jax.Array,
    codes: jax.Array,
    vmin: jax.Array,
    step: jax.Array,
    code_sqnorms: jax.Array,
    k: int,
    chunk: int = _SCAN_CHUNK,
    metric: str = "l2",
) -> Tuple[jax.Array, jax.Array]:
    """Top-k over SQ8 codes: decode chunk -> MXU matmul -> running top-k."""
    n, d = codes.shape
    b = queries.shape[0]
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    codes_p = jnp.pad(codes, ((0, pad), (0, 0))).reshape(n_chunks, chunk, d)
    sqn_p = jnp.pad(code_sqnorms, (0, pad)).reshape(n_chunks, chunk)
    qn = jnp.sum(queries * queries, axis=-1, dtype=jnp.float32)

    init = (
        jnp.full((b, k), jnp.inf, jnp.float32),
        jnp.full((b, k), -1, jnp.int32),
    )
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def stepf(carry, inp):
        best_d, best_i = carry
        chunk_idx, cc, csqn = inp
        x_hat = sq_decode(cc, vmin, step)
        dots = jax.lax.dot_general(
            queries,
            x_hat,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if metric == "l2":
            dist = qn[:, None] + csqn[None, :] - 2.0 * dots
        else:
            dist = -dots
        ids = row_ids + chunk_idx * chunk
        dist = jnp.where(ids < n, dist, jnp.inf)
        cat_d = jnp.concatenate([best_d, dist], axis=1)
        cat_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(ids, (b, chunk))], axis=1
        )
        new_d, sel = dops.top_k_smallest(cat_d, k)
        return (new_d, jnp.take_along_axis(cat_i, sel, axis=1)), None

    (best_d, best_i), _ = jax.lax.scan(
        stepf, init, (jnp.arange(n_chunks, dtype=jnp.int32), codes_p, sqn_p)
    )
    return best_d, best_i
