"""LSH kernels: projection hashing, table-vote counting, Hamming scan.

TPU-native replacement for the reference's two LSH variants:
  * custom random-projection LSH — sign-hash for cosine, E2LSH floor-hash
    for L2, multi-table voting + exact rerank (reference src/algorithms/
    lsh.py:27-301);
  * binary-hyperplane LSH with Hamming candidate search + exact rerank
    (FAISS ``IndexLSH`` path, reference modular.py:182-221, 455-534).

Design: bucket hash-maps become **key arrays**. Each table's bucket key is a
single int32 per vector, computed with one matmul (sign-bitpack) or one
matmul + floor + polynomial mix (E2LSH). Candidate gathering by bucket
lookup becomes a chunked vote count ``votes[b, n] = #{t : key_q[b,t] ==
key_x[n,t]}`` on the VPU, followed by top-vote candidate selection and an
MXU exact rerank — no pointer-chasing, fully static shapes.

Hamming search uses ``jax.lax.population_count`` on XOR-ed packed uint32
words.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from vectordb_retrieval_tpu.ops import distances as dops

_VOTE_CHUNK = 65_536
_MIX_PRIME = jnp.uint32(2654435761)  # Knuth multiplicative mix


def make_projections(
    seed: int, num_tables: int, hash_size: int, dim: int
) -> jax.Array:
    """Gaussian projection tensor ``[T, d, H]``."""
    key = jax.random.PRNGKey(seed)
    return jax.random.normal(key, (num_tables, dim, hash_size), dtype=jnp.float32)


def make_offsets(seed: int, num_tables: int, hash_size: int, width: float) -> jax.Array:
    key = jax.random.PRNGKey(seed ^ 0xE2)
    return jax.random.uniform(
        key, (num_tables, hash_size), minval=0.0, maxval=width, dtype=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=())
def sign_keys(x: jax.Array, projections: jax.Array) -> jax.Array:
    """Cosine sign-hash keys ``[N, T]`` int32: bit-packed sign(x @ R_t)."""
    proj = jnp.einsum(
        "nd,tdh->nth", x, projections, preferred_element_type=jnp.float32
    )
    bits = (proj > 0).astype(jnp.int32)
    h = projections.shape[2]
    pow2 = (1 << jnp.arange(h, dtype=jnp.int32))[None, None, :]
    return jnp.sum(bits * pow2, axis=2).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=())
def e2lsh_keys(
    x: jax.Array, projections: jax.Array, offsets: jax.Array, width: float
) -> jax.Array:
    """E2LSH floor-hash keys ``[N, T]``: floor((x@R + b)/w) mixed to one int.

    The integer lattice coordinates are combined with a multiplicative hash
    (Knuth mix) — the standard E2LSH secondary hash — so each table key is a
    single comparable int32.
    """
    proj = jnp.einsum(
        "nd,tdh->nth", x, projections, preferred_element_type=jnp.float32
    )
    cells = jnp.floor((proj + offsets[None]) / width).astype(jnp.int32)
    mixed = cells.astype(jnp.uint32)
    acc = jnp.zeros(mixed.shape[:2], dtype=jnp.uint32)
    h = mixed.shape[2]
    for i in range(h):  # static unroll over hash dims (H is small, ~18)
        acc = (acc * _MIX_PRIME) ^ mixed[:, :, i]
    return acc.astype(jnp.int32)


def vote_candidates(query_keys, db_keys, n_candidates, chunk=_VOTE_CHUNK):
    """Chunk-clamped wrapper over the jitted vote scan."""
    chunk = dops.clamp_chunk(chunk, db_keys.shape[0])
    return _vote_candidates_jit(query_keys, db_keys, n_candidates, chunk)


@functools.partial(jax.jit, static_argnames=("n_candidates", "chunk"))
def _vote_candidates_jit(
    query_keys: jax.Array,  # [B, T]
    db_keys: jax.Array,  # [N, T]
    n_candidates: int,
    chunk: int = _VOTE_CHUNK,
) -> Tuple[jax.Array, jax.Array]:
    """Top candidates by table-collision votes.

    Returns ``(votes [B, C], cand_ids [B, C])`` sorted by descending votes;
    zero-vote entries mean "no collision" and must be masked by the caller
    (reference gathers bucket members then counts, lsh.py:219-240 — same
    ranking, computed densely).
    """
    n, t = db_keys.shape
    b = query_keys.shape[0]
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    keys_p = jnp.pad(db_keys, ((0, pad), (0, 0)), constant_values=0).reshape(
        n_chunks, chunk, t
    )
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    init = (
        jnp.full((b, n_candidates), -1, jnp.int32),  # votes (neg = empty)
        jnp.full((b, n_candidates), -1, jnp.int32),
    )

    def step(carry, inp):
        best_v, best_i = carry
        chunk_idx, kc = inp
        eq = query_keys[:, None, :] == kc[None, :, :]  # [B, C, T]
        votes = jnp.sum(eq, axis=2).astype(jnp.int32)
        ids = row_ids + chunk_idx * chunk
        votes = jnp.where(ids < n, votes, -1)
        cat_v = jnp.concatenate([best_v, votes], axis=1)
        cat_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(ids, (b, chunk))], axis=1
        )
        new_v, sel = jax.lax.top_k(cat_v, n_candidates)
        return (new_v, jnp.take_along_axis(cat_i, sel, axis=1)), None

    (votes, ids), _ = jax.lax.scan(
        step, init, (jnp.arange(n_chunks, dtype=jnp.int32), keys_p)
    )
    return votes, ids


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def rerank(
    queries: jax.Array,  # [B, d]
    database: jax.Array,  # [N, d]
    cand_ids: jax.Array,  # [B, C], -1 = invalid
    k: int,
    metric: str = "l2",
) -> Tuple[jax.Array, jax.Array]:
    """Exact rescoring of gathered candidates -> top-k (dists, ids).

    L2 uses the cancellation-free diff form (see dops.rescore_l2)."""
    safe = jnp.where(cand_ids >= 0, cand_ids, 0)
    vecs = database[safe]  # [B, C, d]
    if metric == "l2":
        diff = vecs - queries[:, None, :]
        # VPU sum, not einsum: MXU contractions drop inputs to bf16
        dist = jnp.sum(diff * diff, axis=-1)
    else:
        dist = -jnp.einsum(
            "bcd,bd->bc", vecs, queries, preferred_element_type=jnp.float32
        )
    dist = jnp.where(cand_ids >= 0, dist, jnp.inf)
    kk = min(k, cand_ids.shape[1])
    d, sel = dops.top_k_smallest(dist, kk)
    ids = jnp.take_along_axis(cand_ids, sel, axis=1)
    ids = jnp.where(jnp.isfinite(d), ids, -1)
    return d, ids


def pack_bits(bits: jax.Array) -> jax.Array:
    """Pack bool ``[N, nbits]`` into uint32 words ``[N, ceil(nbits/32)]``."""
    n, nbits = bits.shape
    pad = (-nbits) % 32
    b = jnp.pad(bits.astype(jnp.uint32), ((0, 0), (0, pad)))
    words = b.reshape(n, -1, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    return jnp.sum(words << shifts, axis=2, dtype=jnp.uint32)


def hamming_candidates(query_words, db_words, n_candidates, chunk=_VOTE_CHUNK):
    """Chunk-clamped wrapper over the jitted Hamming scan."""
    chunk = dops.clamp_chunk(chunk, db_words.shape[0])
    return _hamming_candidates_jit(query_words, db_words, n_candidates, chunk)


@functools.partial(jax.jit, static_argnames=("n_candidates", "chunk"))
def _hamming_candidates_jit(
    query_words: jax.Array,  # [B, W] uint32
    db_words: jax.Array,  # [N, W] uint32
    n_candidates: int,
    chunk: int = _VOTE_CHUNK,
) -> Tuple[jax.Array, jax.Array]:
    """Smallest-Hamming-distance candidates via XOR + popcount scan."""
    n, w = db_words.shape
    b = query_words.shape[0]
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    words_p = jnp.pad(db_words, ((0, pad), (0, 0))).reshape(n_chunks, chunk, w)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    big = jnp.int32(1 << 30)

    init = (
        jnp.full((b, n_candidates), big, jnp.int32),
        jnp.full((b, n_candidates), -1, jnp.int32),
    )

    def step(carry, inp):
        best_d, best_i = carry
        chunk_idx, wc = inp
        x = jnp.bitwise_xor(query_words[:, None, :], wc[None, :, :])
        ham = jnp.sum(
            jax.lax.population_count(x).astype(jnp.int32), axis=2
        )  # [B, C]
        ids = row_ids + chunk_idx * chunk
        ham = jnp.where(ids < n, ham, big)
        cat_d = jnp.concatenate([best_d, ham], axis=1)
        cat_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(ids, (b, chunk))], axis=1
        )
        neg, sel = jax.lax.top_k(-cat_d, n_candidates)
        return (-neg, jnp.take_along_axis(cat_i, sel, axis=1)), None

    (ham, ids), _ = jax.lax.scan(
        step, init, (jnp.arange(n_chunks, dtype=jnp.int32), words_p)
    )
    ids = jnp.where(ham < big, ids, -1)
    return ham, ids


def hamming_threshold_rerank(
    queries, query_words, database, db_words, kth, k,
    metric="l2", chunk=_VOTE_CHUNK,
):
    """Chunk-clamped wrapper over the jitted dense threshold rerank."""
    chunk = dops.clamp_chunk(chunk, db_words.shape[0])
    return _hamming_threshold_rerank_jit(
        queries, query_words, database, db_words, kth, k, metric, chunk
    )


@functools.partial(jax.jit, static_argnames=("k", "metric", "chunk"))
def _hamming_threshold_rerank_jit(
    queries: jax.Array,  # [B, d] f32
    query_words: jax.Array,  # [B, W] uint32
    database: jax.Array,  # [N, d] f32
    db_words: jax.Array,  # [N, W] uint32
    kth: jax.Array,  # [B, 1] int32 — per-query Hamming radius
    k: int,
    metric: str = "l2",
    chunk: int = _VOTE_CHUNK,
) -> Tuple[jax.Array, jax.Array]:
    """Gather-free exact rerank of every row within a Hamming radius.

    TPU replacement for ``rerank`` at recall-matched candidate counts:
    per-row gathers cost ~0.2 us/row regardless of dtype (CLAUDE.md), so
    gathering C candidates per query loses to a fused DENSE pass over
    the corpus (Hamming scan + MXU distance scan + mask + running top-k)
    as soon as B*C approaches N/50 — and the recall-matched binary-LSH
    operating points (C = 2.5k-10k of 20k rows) are far past that.

    Candidate set = ``{i : hamming(q, x_i) <= kth[q]}``. With ``kth``
    from :func:`hamming_candidates`'s n_cand-th value this is the gather
    path's candidate set plus any rows TIED at the radius — a superset
    of FAISS IndexLSH's argsort cut, so recall can only improve.

    Distances use HIGHEST-precision dot form (q.x on the MXU would drop
    to bf16 and misrank the rescore otherwise); l2 returns the squared
    distance with the ||q||^2 term included for parity with ``rerank``.
    """
    n, d = database.shape
    b = queries.shape[0]
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    db_p = jnp.pad(database, ((0, pad), (0, 0))).reshape(n_chunks, chunk, d)
    words_p = jnp.pad(db_words, ((0, pad), (0, 0))).reshape(
        n_chunks, chunk, -1
    )
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    q_sqn = jnp.sum(queries * queries, axis=1, keepdims=True)  # [B, 1]

    init = (
        jnp.full((b, k), jnp.inf, jnp.float32),
        jnp.full((b, k), -1, jnp.int32),
    )

    def step(carry, inp):
        best_d, best_i = carry
        chunk_idx, xc, wc = inp
        x = jnp.bitwise_xor(query_words[:, None, :], wc[None, :, :])
        ham = jnp.sum(
            jax.lax.population_count(x).astype(jnp.int32), axis=2
        )  # [B, C]
        ids = row_ids + chunk_idx * chunk
        keep = (ids < n) & (ham <= kth)
        dots = jax.lax.dot_general(
            queries, xc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [B, C]
        if metric == "l2":
            sqn = jnp.sum(xc * xc, axis=1)  # [C]
            dist = q_sqn + sqn[None, :] - 2.0 * dots
        else:
            dist = -dots
        dist = jnp.where(keep, dist, jnp.inf)
        cat_d = jnp.concatenate([best_d, dist], axis=1)
        cat_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(ids, (b, chunk))], axis=1
        )
        nd, sel = dops.top_k_smallest(cat_d, k)
        return (nd, jnp.take_along_axis(cat_i, sel, axis=1)), None

    (dist, ids), _ = jax.lax.scan(
        step, init, (jnp.arange(n_chunks, dtype=jnp.int32), db_p, words_p)
    )
    ids = jnp.where(jnp.isfinite(dist), ids, -1)
    return dist, ids
