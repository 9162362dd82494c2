"""Product quantization: codebook training, encoding, ADC search.

TPU-native replacement for FAISS ``PQ{m}`` / the PQ stage of ``IVF{n},PQ{m}``
(reference: src/algorithms/modular.py:224-289 factory strings,
configs/benchmark_config.yaml:36-72).

ADC-by-reconstruction: instead of the CPU-style per-code LUT gather (hostile
to the VPU), the scan *reconstructs* code chunks through an embedding-style
codebook gather and computes ``||q||^2 + ||x_hat||^2 - 2 q.x_hat`` with one
MXU matmul. This is algebraically identical to classic ADC — for L2,
``||q - x_hat||^2 = sum_m ||q_m - c_{m,code}||^2`` — because
``||x_hat||^2`` is precomputed per code at build time. HBM traffic per query
batch is codes (m bytes/vector) instead of full vectors (4d bytes), and the
FLOPs stay equal to the exact scan, which the MXU eats.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from vectordb_retrieval_tpu.ops import distances as dops
from vectordb_retrieval_tpu.ops.kmeans import kmeans_fit

KSUB = 256  # 8-bit codes, FAISS default
_ENCODE_CHUNK = 32_768
_SCAN_CHUNK = 65_536


def split_dim(d: int, m: int) -> int:
    if d % m != 0:
        raise ValueError(f"dimension {d} not divisible by m={m} subquantizers")
    return d // m


@functools.partial(jax.jit, static_argnames=("m", "ksub", "iters"))
def pq_train(
    x: jax.Array, m: int, ksub: int = KSUB, seed: int = 0, iters: int = 20
) -> jax.Array:
    """Train per-subspace codebooks ``[m, ksub, dsub]`` (vmapped k-means)."""
    n, d = x.shape
    dsub = split_dim(d, m)
    sub = x.reshape(n, m, dsub).transpose(1, 0, 2)  # [m, n, dsub]

    def fit(xs):
        c, _ = kmeans_fit(xs, ksub, seed=seed, iters=iters)
        return c

    return jax.vmap(fit)(sub)


@functools.partial(jax.jit, static_argnames=("m", "ksub", "iters", "opq_iters"))
def opq_train(
    x: jax.Array,
    m: int,
    ksub: int = KSUB,
    seed: int = 0,
    iters: int = 12,
    opq_iters: int = 6,
) -> Tuple[jax.Array, jax.Array]:
    """OPQ: learn rotation R + codebooks minimising quantisation error.

    Alternating optimisation (Ge et al., OPQ): hold R, train/encode PQ on
    ``x @ R``; hold codes, solve the orthogonal Procrustes problem
    ``R = U V^T`` from ``svd(x^T x_hat)``. Everything stays on device —
    the SVD is on the small ``[d, d]`` covariance.

    Returns ``(R [d, d], codebooks [m, ksub, dsub])``.
    """
    n, d = x.shape
    r = jnp.eye(d, dtype=jnp.float32)

    def step(carry, _):
        r, _ = carry
        y = x @ r
        cb = pq_train(y, m, ksub=ksub, seed=seed, iters=iters)
        codes = pq_encode(y, cb)
        y_hat = pq_reconstruct(codes, cb)
        # Procrustes: argmin_R ||xR - y_hat||_F s.t. R orthogonal
        cov = jax.lax.dot_general(
            x, y_hat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        u, _, vt = jnp.linalg.svd(cov, full_matrices=False)
        new_r = u @ vt
        err = jnp.mean(jnp.sum((y - y_hat) ** 2, axis=1))
        return (new_r, err), err

    (r, _), errs = jax.lax.scan(step, (r, jnp.float32(0.0)), None, length=opq_iters)
    cb = pq_train(x @ r, m, ksub=ksub, seed=seed, iters=iters)
    return r, cb


@functools.partial(jax.jit, static_argnames=("chunk",))
def pq_encode(
    x: jax.Array, codebooks: jax.Array, chunk: int = _ENCODE_CHUNK
) -> jax.Array:
    """Encode ``x [N, d]`` -> ``codes [N, m] uint8`` (nearest sub-centroid)."""
    n, d = x.shape
    m, ksub, dsub = codebooks.shape
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    xp = jnp.pad(x, ((0, pad), (0, 0))).reshape(n_chunks, chunk, m, dsub)

    cb_sqn = jnp.sum(codebooks * codebooks, axis=-1)  # [m, ksub]

    def step(_, xc):  # xc: [chunk, m, dsub]
        dots = jnp.einsum(
            "cmd,mkd->cmk", xc, codebooks, preferred_element_type=jnp.float32
        )
        dist = cb_sqn[None] - 2.0 * dots  # [chunk, m, ksub]; ||x||^2 constant
        return None, jnp.argmin(dist, axis=-1).astype(jnp.uint8)

    _, codes = jax.lax.scan(step, None, xp)
    return codes.reshape(-1, m)[:n]


_RECON_CHUNK = 4096


def pq_reconstruct(codes: jax.Array, codebooks: jax.Array) -> jax.Array:
    """Decode ``codes [C, m]`` -> ``x_hat [C, m*dsub]`` via one-hot matmul.

    ``one_hot(codes) @ codebooks`` puts the codebook lookup on the MXU
    instead of issuing per-row gathers (which serialize badly on TPU — the
    gather variant measured ~10x slower inside the IVF-PQ probe loop). All
    subspaces decode in ONE batched contraction (``rmk,mkd->rmd``) rather
    than a sequential scan over m (64 dependent small matmuls cost ~5x in
    dispatch latency); a scan over row chunks bounds the one-hot transient
    to ``[chunk, m, ksub]``.
    """
    m, ksub, dsub = codebooks.shape
    c = codes.shape[0]
    chunk = min(_RECON_CHUNK, max(c, 1))
    n_chunks = -(-c // chunk)
    pad = n_chunks * chunk - c
    codes_p = jnp.pad(codes, ((0, pad), (0, 0))).reshape(
        n_chunks, chunk, m
    )

    def body(_, cc):
        onehot = jax.nn.one_hot(cc.astype(jnp.int32), ksub, dtype=jnp.float32)
        part = jnp.einsum(
            "rmk,mkd->rmd", onehot, codebooks,
            preferred_element_type=jnp.float32,
        )
        return None, part.reshape(chunk, m * dsub)

    if n_chunks == 1:
        onehot = jax.nn.one_hot(
            codes_p[0].astype(jnp.int32), ksub, dtype=jnp.float32
        )
        out = jnp.einsum(
            "rmk,mkd->rmd", onehot, codebooks,
            preferred_element_type=jnp.float32,
        ).reshape(chunk, m * dsub)
        return out[:c]
    _, parts = jax.lax.scan(body, None, codes_p)
    return parts.reshape(n_chunks * chunk, m * dsub)[:c]


def pq_reconstruct_gather(codes: jax.Array, codebooks: jax.Array) -> jax.Array:
    """Embedding-gather decode (oracle for tests; slow on TPU)."""

    def per_sub(cb_m, codes_m):  # [ksub, dsub], [C] -> [C, dsub]
        return jnp.take(cb_m, codes_m, axis=0)

    parts = jax.vmap(per_sub, in_axes=(0, 1), out_axes=1)(
        codebooks, codes.astype(jnp.int32)
    )  # [C, m, dsub]
    return parts.reshape(codes.shape[0], -1)


def pq_code_sqnorms(codes: jax.Array, codebooks: jax.Array) -> jax.Array:
    """``||x_hat||^2 [N]`` from codes — built once, stored with the index."""
    cb_sqn = jnp.sum(codebooks * codebooks, axis=-1)  # [m, ksub]

    def per_sub(cbn_m, codes_m):  # [ksub], [N] -> [N]
        return jnp.take(cbn_m, codes_m, axis=0)

    per = jax.vmap(per_sub, in_axes=(0, 1), out_axes=1)(
        cb_sqn, codes.astype(jnp.int32)
    )  # [N, m]
    return jnp.sum(per, axis=1)


def pq_search(
    queries,
    codes,
    codebooks,
    code_sqnorms,
    k,
    chunk=_SCAN_CHUNK,
    metric="l2",
):
    """Chunk-clamped wrapper over the jitted ADC scan."""
    chunk = dops.clamp_chunk(chunk, codes.shape[0])
    return _pq_search_jit(
        queries, codes, codebooks, code_sqnorms, k, chunk, metric
    )


@functools.partial(jax.jit, static_argnames=("k", "chunk", "metric"))
def _pq_search_jit(
    queries: jax.Array,
    codes: jax.Array,
    codebooks: jax.Array,
    code_sqnorms: jax.Array,
    k: int,
    chunk: int = _SCAN_CHUNK,
    metric: str = "l2",
) -> Tuple[jax.Array, jax.Array]:
    """ADC top-k over PQ codes, streamed over chunks.

    ``l2`` scores reconstructions via the norm expansion; ``ip`` (and cosine
    after normalisation) scores ``-q.x_hat``.
    """
    n, m = codes.shape
    b = queries.shape[0]
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    codes_p = jnp.pad(codes, ((0, pad), (0, 0))).reshape(n_chunks, chunk, m)
    sqn_p = jnp.pad(code_sqnorms, (0, pad)).reshape(n_chunks, chunk)
    qn = jnp.sum(queries * queries, axis=-1, dtype=jnp.float32)

    init = (
        jnp.full((b, k), jnp.inf, jnp.float32),
        jnp.full((b, k), -1, jnp.int32),
    )
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def step(carry, inp):
        best_d, best_i = carry
        chunk_idx, cc, csqn = inp
        x_hat = pq_reconstruct(cc, codebooks)  # [chunk, d]
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
        step, init, (jnp.arange(n_chunks, dtype=jnp.int32), codes_p, sqn_p)
    )
    return best_d, best_i
