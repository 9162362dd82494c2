"""IVF: coarse k-means partition + padded dense inverted lists + nprobe scan.

TPU-native replacement for FAISS ``IVF{n},Flat|PQ{m}|SQ8`` (reference:
src/algorithms/approximate_search.py:39-51, src/algorithms/modular.py:224-289).

Design (SURVEY.md section 7 step 4 + hard-part (a)): FAISS's ragged inverted
lists become **padded dense tensors** ``[nlist, max_len, ...]`` with ``-1``
id padding, so every probe step is a static-shape gather + MXU score +
running top-k merge inside a ``lax.scan`` over the ``nprobe`` probed lists.
K-means lists are near-balanced, so padding overhead is bounded (reported by
the builder as ``pad_ratio`` for honest memory accounting).

Payload variants share the probe loop:
  * flat : raw float32 vectors per slot
  * pq   : PQ codes of the **residual** (x - centroid), FAISS IVFPQ-style
  * sq8  : uint8 scalar-quantized vectors

Metric: build normalises for cosine and scores with ``-dot`` (``ip``); for
``l2`` the usual norm expansion. Coarse assignment always uses L2 (equivalent
to max-dot on normalised data).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vectordb_retrieval_tpu.ops import distances as dops
from vectordb_retrieval_tpu.ops import pq as pqops


def build_padded_lists(
    assignments: np.ndarray, nlist: int, pad_multiple: int = 8
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Host-side list layout: ``(slot_ids [nlist, max_len], counts, pad_ratio)``.

    ``slot_ids[l, j]`` is the database row id of slot j of list l, or -1.
    """
    counts = np.bincount(assignments, minlength=nlist)
    max_len = int(counts.max()) if counts.size else 1
    max_len = max(pad_multiple, -(-max_len // pad_multiple) * pad_multiple)
    order = np.argsort(assignments, kind="stable")
    slot_ids = np.full((nlist, max_len), -1, dtype=np.int32)
    offset = 0
    for l in range(nlist):
        c = int(counts[l])
        slot_ids[l, :c] = order[offset : offset + c]
        offset += c
    n = max(int(assignments.shape[0]), 1)
    pad_ratio = float(nlist * max_len) / float(n)
    return slot_ids, counts.astype(np.int32), pad_ratio


def _probe_scan(queries, centroids, probes, k, score_fn):
    """Shared nprobe loop: scan over probe ranks, merging a running top-k.

    ``score_fn(list_idx [B]) -> (dist [B, max_len], ids [B, max_len])``.
    """
    b = queries.shape[0]
    nprobe = probes.shape[1]
    init = (
        jnp.full((b, k), jnp.inf, jnp.float32),
        jnp.full((b, k), -1, jnp.int32),
    )

    def step(carry, p):
        best_d, best_i = carry
        lists = probes[:, p]  # [B]
        dist, ids = score_fn(lists)
        dist = jnp.where(ids >= 0, dist, jnp.inf)
        cat_d = jnp.concatenate([best_d, dist], axis=1)
        cat_i = jnp.concatenate([best_i, ids], axis=1)
        new_d, sel = dops.top_k_smallest(cat_d, k)
        return (new_d, jnp.take_along_axis(cat_i, sel, axis=1)), None

    (best_d, best_i), _ = jax.lax.scan(
        step, init, jnp.arange(nprobe, dtype=jnp.int32)
    )
    return best_d, best_i


def _coarse_probes(queries, centroids, nprobe):
    cd = dops.pairwise_distances(queries, centroids, "l2")
    _, probes = dops.top_k_smallest(cd, min(nprobe, centroids.shape[0]))
    return probes


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "metric"))
def ivf_flat_search(
    queries: jax.Array,
    centroids: jax.Array,
    slot_ids: jax.Array,
    list_vecs: jax.Array,  # may be bf16 (halves HBM gather traffic)
    list_sqnorms: jax.Array,
    k: int,
    nprobe: int,
    metric: str = "l2",
    full_vectors: jax.Array = None,  # f32 rows for the exact rescoring pass
) -> Tuple[jax.Array, jax.Array]:
    """IVF-Flat probe scan.

    When ``list_vecs`` is bf16 (build default), candidate scoring runs on the
    compressed copies — the per-probe list gather is the bandwidth cost of
    this search — and the final ``k+8`` candidates are rescored exactly
    against the f32 ``full_vectors``, so bf16 noise cannot perturb results.
    """
    probes = _coarse_probes(queries, centroids, nprobe)
    qn = jnp.sum(queries * queries, axis=-1, dtype=jnp.float32)
    compressed = list_vecs.dtype != jnp.float32 and full_vectors is not None
    fetch_k = min(k + 8, k * 2) if compressed else k
    q_cast = queries.astype(list_vecs.dtype)

    def score(lists):
        vecs = list_vecs[lists]  # [B, L, d]
        ids = slot_ids[lists]  # [B, L]
        dots = jnp.einsum(
            "bld,bd->bl", vecs, q_cast, preferred_element_type=jnp.float32
        )
        if metric == "l2":
            dist = qn[:, None] + list_sqnorms[lists] - 2.0 * dots
        else:
            dist = -dots
        return dist, ids

    dists, ids = _probe_scan(queries, centroids, probes, fetch_k, score)
    if compressed:
        cd = dops.rescore(queries, full_vectors, ids, metric)
        vals, sel = dops.top_k_smallest(cd, k)
        ids = jnp.take_along_axis(ids, sel, axis=1)
        ids = jnp.where(jnp.isfinite(vals), ids, -1)
        return vals, ids
    return dists, ids


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "metric"))
def ivf_pq_search(
    queries: jax.Array,
    centroids: jax.Array,
    slot_ids: jax.Array,
    list_codes: jax.Array,
    list_sqnorms: jax.Array,  # ||residual_hat||^2 per slot (kept for parity)
    codebooks: jax.Array,
    k: int,
    nprobe: int,
    metric: str = "l2",
) -> Tuple[jax.Array, jax.Array]:
    """IVF-PQ, decode-on-read: reconstruct every list ONCE per query batch
    (one chunked one-hot decode pass over the codes, query-independent),
    then probe like IVF-Flat over the reconstructions.

    Per-probe decoding (classic ADC layout) re-decodes each probed list for
    every query — with 128-query batches and nprobe 48 that is ~50x more
    decode work than the corpus contains. The reconstruction
    ``x_hat = c_l + r_hat`` is transient HBM (freed after the search);
    persisted index storage stays codes-only. Distances are identical to
    residual ADC: ``||q - (c_l + r_hat)||^2``.
    """
    nlist, L, m = list_codes.shape
    d = centroids.shape[1]

    chunk = max(1, min(nlist, -(-65_536 // max(L, 1))))
    n_chunks = -(-nlist // chunk)
    pad = n_chunks * chunk - nlist
    codes_p = jnp.pad(list_codes, ((0, pad), (0, 0), (0, 0))).reshape(
        n_chunks, chunk, L, m
    )
    cents_p = jnp.pad(centroids, ((0, pad), (0, 0))).reshape(
        n_chunks, chunk, d
    )

    def decode(_, inp):
        cc, cl = inp  # [chunk, L, m], [chunk, d]
        r_hat = pqops.pq_reconstruct(cc.reshape(chunk * L, m), codebooks)
        x_hat = r_hat.reshape(chunk, L, d) + cl[:, None, :]
        return None, (x_hat, jnp.sum(x_hat * x_hat, axis=-1))

    _, (recon, recon_sqn) = jax.lax.scan(decode, None, (codes_p, cents_p))
    recon = recon.reshape(n_chunks * chunk, L, d)[:nlist]
    recon_sqn = recon_sqn.reshape(n_chunks * chunk, L)[:nlist]

    probes = _coarse_probes(queries, centroids, nprobe)
    qn = jnp.sum(queries * queries, axis=-1, dtype=jnp.float32)

    def score(lists):
        vecs = recon[lists]
        ids = slot_ids[lists]
        dots = jnp.einsum(
            "bld,bd->bl", vecs, queries, preferred_element_type=jnp.float32
        )
        if metric == "l2":
            dist = qn[:, None] + recon_sqn[lists] - 2.0 * dots
        else:
            dist = -dots
        return dist, ids

    return _probe_scan(queries, centroids, probes, k, score)


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "metric"))
def ivf_sq_search(
    queries: jax.Array,
    centroids: jax.Array,
    slot_ids: jax.Array,
    list_codes: jax.Array,  # [nlist, L, d] uint8
    list_sqnorms: jax.Array,
    vmin: jax.Array,
    step: jax.Array,
    k: int,
    nprobe: int,
    metric: str = "l2",
) -> Tuple[jax.Array, jax.Array]:
    probes = _coarse_probes(queries, centroids, nprobe)
    qn = jnp.sum(queries * queries, axis=-1, dtype=jnp.float32)

    def score(lists):
        codes = list_codes[lists]  # [B, L, d]
        ids = slot_ids[lists]
        x_hat = vmin[None, None, :] + codes.astype(jnp.float32) * step[None, None, :]
        dots = jnp.einsum(
            "bld,bd->bl", x_hat, queries, preferred_element_type=jnp.float32
        )
        if metric == "l2":
            dist = qn[:, None] + list_sqnorms[lists] - 2.0 * dots
        else:
            dist = -dots
        return dist, ids

    return _probe_scan(queries, centroids, probes, k, score)
