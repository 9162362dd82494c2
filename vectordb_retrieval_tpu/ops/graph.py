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


def _use_slab_kernel(b: int, length: int, dim: int, itemsize: int = 4) -> bool:
    """Route the wave probe through the Pallas slab-scan kernel.

    Trace-time decision: TPU backend only (tests/CPU keep the XLA gather
    path — interpret-mode Pallas would be pure overhead there), the slab
    must tile cleanly (lanes: d % 128, sublanes: L % 8) so Mosaic DMAs it
    without relayout padding, and >=8 slabs must fit the kernel's VMEM
    budget (its 8-aligned w_per packing — pallas_kernels.slab_kernel_ok).
    """
    from vectordb_retrieval_tpu.ops.pallas_kernels import slab_kernel_ok

    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except RuntimeError:
        on_tpu = False
    return (
        on_tpu and dim % 128 == 0 and length % 8 == 0 and b >= 8
        and slab_kernel_ok(length, dim, itemsize)
    )


@functools.partial(jax.jit, static_argnames=("degree",))
def _diversify_batch(
    cand_ids: jax.Array,  # [B, C] nearest-first candidates (self excluded)
    cand_d2: jax.Array,  # [B, C] SQUARED distances node->candidate
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
    cd2 = cand_d2

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


_IVF_BUILD_THRESHOLD = 300_000


def _ivf_candidate_searcher(
    vectors: jax.Array, n_cand: int, nprobe: int, nlist: int, seed: int = 17
):
    """Corpus-vs-itself IVF searcher for large-N graph builds.

    The exact candidate scan is O(N^2 d) — 2.6e17 FLOPs at 1M x 128d,
    minutes of pure MXU time. Graph candidates only need the *local*
    neighbourhood, which is exactly what an IVF probe returns, so the
    build partitions the corpus once (sample-trained k-means + bucketed
    lists, the serving data structures from ops/ivf) and generates each
    node's candidates by probing its ``nprobe`` nearest lists:
    O(N * nprobe * (N/nlist) * d) — ~60x less work at 1M with
    nlist=1024/nprobe=64. Edge diversification then prunes as usual; the
    beam's entry-point routing is unaffected.
    """
    from vectordb_retrieval_tpu.ops import ivf as ivfops
    from vectordb_retrieval_tpu.ops.kmeans import (
        kmeans_assign,
        kmeans_fit,
        training_sample,
    )

    n = vectors.shape[0]
    nlist = min(nlist, n)
    sample = training_sample(n, nlist, seed)
    train = vectors if sample is None else vectors[sample]
    centroids, _ = kmeans_fit(train, nlist, seed=seed, iters=10)
    assign = np.asarray(kmeans_assign(vectors, centroids))
    slot_np, bucket_lists_np, _ = ivfops.build_bucketed_lists(
        assign, nlist, bucket_multiple=1
    )
    slots = jnp.asarray(slot_np)
    coarse = centroids[jnp.asarray(bucket_lists_np)]
    safe = jnp.asarray(np.where(slot_np >= 0, slot_np, 0))
    list_vecs = vectors[safe]
    list_sqn = jnp.sum(list_vecs * list_vecs, axis=-1)
    # probing nprobe LISTS means probing all their buckets; the budget is
    # the sum of the nprobe largest lists' bucket counts (guaranteed
    # coverage under skew — ops/ivf.probe_budget_cum), not the average
    # scaling that silently degraded candidate quality on clustered data
    n_buckets = slot_np.shape[0]
    cum = ivfops.probe_budget_cum(bucket_lists_np, nlist)
    eff_probe = int(min(cum[min(nprobe, len(cum)) - 1], n_buckets))

    def search(q):
        return ivfops.ivf_flat_search(
            q, coarse, slots, list_vecs, list_sqn, n_cand + 1, eff_probe,
            metric="l2",
        )

    return search, int(slot_np.shape[1])


def add_reverse_edges(
    adjacency: np.ndarray, vectors: jax.Array, rev: int
) -> np.ndarray:
    """Append the nearest ``rev`` INCOMING edges per node: ``[N, R+rev]``.

    RNG pruning keeps each node's best outgoing edges, but a boundary row
    that makes nobody's list has NO incoming edge and is unreachable by
    any beam walk — measured as a recall CEILING on diffuse corpora
    (glove-shaped 20k: node beam plateaus at 0.930 at any efSearch;
    +16 reverse slots lifts the plateau to 0.961). HNSW avoids the hole
    by inserting links bidirectionally (reference hnsw.py's underlying
    faiss index); this post-pass restores that property: for every edge
    i->j, j receives i ranked by edge distance, nearest ``rev`` kept.
    Duplicates of existing forward edges are left in place (the beam
    dedups); pad slots are -1 like the forward half.
    """
    n, r = adjacency.shape
    src = np.repeat(np.arange(n, dtype=np.int64), r)
    dst = adjacency.reshape(-1).astype(np.int64)
    keep = dst >= 0
    src, dst = src[keep], dst[keep]
    # chunk the edge-distance pass: a single gather of all N*R endpoints
    # materialises two [N*R, d] operands — 16 GB each at 1M x 128d x R=32,
    # past the ~8 GB usable HBM (CLAUDE.md). 256 MB chunks keep the
    # transient bounded at any scale.
    d = np.empty(src.shape[0], np.float32)
    step = max(1, (256 << 20) // max(int(vectors.shape[1]) * 8, 1))
    for s in range(0, src.shape[0], step):
        e = min(s + step, src.shape[0])
        d[s:e] = np.asarray(
            jnp.sum(
                (
                    vectors[jnp.asarray(src[s:e])]
                    - vectors[jnp.asarray(dst[s:e])]
                )
                ** 2,
                axis=1,
            )
        )
    order = np.lexsort((d, dst))  # group by dst, nearest first
    dst_s, src_s = dst[order], src[order]
    first = np.searchsorted(dst_s, np.arange(n))
    pos = np.arange(dst_s.shape[0]) - first[dst_s]  # rank within group
    sel = pos < rev
    extra = np.full((n, rev), -1, np.int32)
    extra[dst_s[sel], pos[sel]] = src_s[sel]
    return np.concatenate([adjacency, extra], axis=1)


def build_knn_graph(
    vectors: jax.Array,
    degree: int,
    batch: int = _BUILD_BATCH,
    diversify: bool = True,
    candidate_factor: int = 3,
    method: str = "auto",  # auto | exact | ivf
    build_nprobe: int = 64,
    build_nlist: int = 0,
    reverse_edges: int = 0,  # extra slots for nearest INCOMING edges
) -> jax.Array:
    """Candidate kNN + RNG-pruned adjacency ``[N, R(+rev)] int32``.

    Candidates come from the exact MXU scan, or (``method='ivf'``, auto
    above ``_IVF_BUILD_THRESHOLD`` rows) from the IVF-probe approximate
    scan that makes million-row builds take seconds instead of minutes.
    ``reverse_edges`` appends bidirectional links (add_reverse_edges) —
    the reachability property HNSW gets from insertion-time link-backs.
    """
    n = vectors.shape[0]
    degree = min(degree, n - 1)
    n_cand = min(max(degree, candidate_factor * degree), n - 1)
    use_ivf = method == "ivf" or (
        method == "auto" and n > _IVF_BUILD_THRESHOLD
    )
    ivf_search = None
    if use_ivf:
        nlist = build_nlist or max(64, int(np.sqrt(n)))
        ivf_search, bucket_len = _ivf_candidate_searcher(
            vectors, n_cand, build_nprobe, nlist
        )
        if batch == _BUILD_BATCH:
            # bigger node batches amortise the per-dispatch tunnel/launch
            # overhead of the ~N/batch probe scans (measured 696 s -> 467 s
            # at 1M x 128d going 1024 -> 2048), bounded so the per-probe
            # [batch, L, d] gather transient stays ~1 GB
            d_ = vectors.shape[1]
            budget = (1 << 30) // max(bucket_len * d_ * 4, 1)
            batch = int(min(4096, max(_BUILD_BATCH, budget)))
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
        if ivf_search is not None:
            d, ids = ivf_search(q)
        elif n <= 262_144:
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
                jnp.maximum(jnp.asarray(d), 0.0),  # squared distances
                cand_vecs,
                degree,
            )
            rows.append(np.asarray(pruned)[overlap:])
        else:
            rows.append(ids[overlap:, :degree].astype(np.int32))
    adj_np = np.concatenate(rows, axis=0).astype(np.int32)
    if reverse_edges > 0:
        adj_np = add_reverse_edges(adj_np, vectors, reverse_edges)
    return jnp.asarray(adj_np)


def build_neighbor_table(
    vectors: jax.Array,
    adjacency: jax.Array,
    dtype=jnp.bfloat16,
):
    """Contiguous neighbour-vector table
    ``([N, R, d] dtype, [N, R] f32 norms, vmin|None, step|None)``.

    Stores each node's neighbour vectors contiguously so the beam's
    per-iteration vector fetch is a [B, W]-row block gather instead of a
    [B, W*R] scattered-row gather (~4x faster beams at W*R=1536; see
    graph_search docstring). Costs R x index memory at the table dtype;
    norms are kept in f32 so L2 distances stay well-conditioned.

    ``dtype='int8'`` stores SQ8 codes instead (ops/sq ranges): half the
    bf16 bytes — both half the gather traffic and the enabler for
    double-degree tables inside the same HBM budget. Routing then scores
    with the affine-folded dot (``q.x_hat = q.vmin + (q*step).codes``,
    same trick as ivf_sq_search) and the final candidates are exactly
    rescored against the f32 corpus, so end recall is table-noise-free.
    Returned ``vmin/step`` are None for float tables.
    """
    from vectordb_retrieval_tpu.ops import sq as sqops

    safe = jnp.where(adjacency >= 0, adjacency, 0)
    if dtype in ("int8", "sq8", jnp.uint8, jnp.int8):
        vmin, step = sqops.sq_train(vectors)
        codes = sqops.sq_encode(vectors, vmin, step)
        x_hat = sqops.sq_decode(codes, vmin, step)
        sqn = jnp.sum(x_hat * x_hat, axis=-1)[safe]  # decoded-row norms
        return codes[safe], sqn, vmin, step
    table = vectors.astype(dtype)[safe]
    v32 = vectors.astype(jnp.float32)
    sqn = jnp.sum(v32 * v32, axis=-1)[safe]
    return table, sqn, None, None


def _encode_slabs(list_vecs: jax.Array, mask: jax.Array, slab_dtype: str):
    """Slab storage encoding: ``(stored, sqn [Nb, L], mu [Nb, d] | None)``.

    bf16 slabs halve the wave-DMA bytes (the block beam's binding cost),
    but naive bf16 rounding of raw vectors loses ~|x| * 2^-8 per distance
    — catastrophic when cluster offsets dwarf the neighbour margins
    (measured 1.0 -> 0.97 recall on a clustered 32d corpus). So bf16
    slabs store the PER-BLOCK-MEAN RESIDUAL: the f32 mean ``mu`` carries
    the offset exactly (its dot with the query is one [B, W] f32 term,
    amortised over the whole L-row slab) and bf16 rounding only touches
    the residual, whose magnitude is the intra-block scatter. Sqnorms are
    of the RECONSTRUCTED values ``mu + round(x - mu)`` so the l2
    expansion stays exact w.r.t. what the MXU actually scores.
    """
    if slab_dtype != "bf16":
        return list_vecs, jnp.sum(list_vecs * list_vecs, axis=-1), None
    cnt = jnp.maximum(jnp.sum(mask.astype(jnp.float32), axis=1), 1.0)
    mu = jnp.sum(list_vecs, axis=1) / cnt  # [Nb, d] f32
    resid = (list_vecs - mu[:, None, :]) * mask
    stored = resid.astype(jnp.bfloat16)
    xhat = (mu[:, None, :] + stored.astype(jnp.float32)) * mask
    return stored, jnp.sum(xhat * xhat, axis=-1), mu


def build_block_graph(
    vectors: jax.Array,
    n_blocks: int,
    degree: int,
    seed: int = 42,
    train_iters: int = 12,
    block_cap: int = 1024,
    spill: float = 0.0,
    slab_dtype: str = "f32",  # f32 | bf16 (bf16: half the wave-DMA bytes)
):
    """Memory-parity graph layout: bucketed corpus + block-level RNG graph.

    The node-level neighbour-vector table (build_neighbor_table) buys fast
    block gathers with R x index memory — 9.4x the corpus at 1M (the
    round-2 memory finding). This layout gets the same contiguous-gather
    property at ~1.05x corpus by re-ordering the corpus itself: rows are
    clustered into ~fixed-size blocks (k-means + the bucketed list layout
    from ops/ivf — the same machinery that made IVF memory-parity), and
    the graph lives at BLOCK granularity over block centroids. HNSW's
    hierarchy becomes the dense [B, n_blocks] centroid scan (cheap on the
    MXU at any corpus size that fits one chip) and HNSW's level-0 walk
    becomes a beam over blocks: expanding a block gathers its WHOLE
    ``[L, d]`` member slab — contiguous rows, the gather shape HBM likes —
    and its graph neighbours refine the probe set beyond the static
    top-nprobe ranking (boundary queries pull in blocks whose centroid
    ranked poorly). Substitutes reference ``IndexHNSWFlat``
    (src/algorithms/hnsw.py:76-81) per SURVEY.md section 7 hard-part (b).

    Returns ``(entries [Ne, d], entry_block [Ne], slot_ids [Nb, L],
    list_vecs [Nb, L, d], list_sqn [Nb, L], entry_adj [Ne, R])``.
    """
    from vectordb_retrieval_tpu.ops import ivf as ivfops
    from vectordb_retrieval_tpu.ops.kmeans import (
        kmeans_assign,
        kmeans_assign2,
        kmeans_fit,
        training_sample,
    )

    n, d = vectors.shape
    n_blocks = max(1, min(n_blocks, n))
    sample = training_sample(n, n_blocks, seed)
    train = vectors if sample is None else vectors[sample]
    centroids, _ = kmeans_fit(train, n_blocks, seed=seed, iters=train_iters)
    # whole-corpus assign in ONE dispatch (kmeans_assign chunk-scans
    # internally — a host loop of per-chunk calls would pay the ~30-60 ms
    # remote-dispatch floor per chunk, ~30 min at 1M); the chunk bounds
    # the [chunk, n_blocks] distance transient at ~512 MB
    chunk = max(256, min(16_384, (512 << 20) // max(n_blocks * 4, 1)))
    if spill > 0.0 and n_blocks >= 2:
        a1, a2, margin = kmeans_assign2(vectors, centroids, chunk=chunk)
        assign = np.asarray(a1)
        # SOAR-style spilled assignment: clone the `spill` fraction of
        # rows with the smallest (d2 - d1) margin into their runner-up
        # cluster. Boundary rows are exactly the ones whose true
        # neighbours live across the partition cut — the dominant recall
        # leak of any routed layout (probing the winner block misses the
        # neighbour sitting in the runner-up). Cost: `spill` x corpus
        # memory + id-level dedup at search (block_graph_search dedup).
        margin_np = np.asarray(margin)
        n_spill = int(spill * n)
        sel = np.argpartition(margin_np, n_spill - 1)[:n_spill]
        row_of = np.concatenate(
            [np.arange(n, dtype=np.int64), sel.astype(np.int64)]
        )
        assign = np.concatenate([assign, np.asarray(a2)[sel]])
    else:
        assign = np.asarray(kmeans_assign(vectors, centroids, chunk=chunk))
        row_of = np.arange(n, dtype=np.int64)
    n_ext = row_of.shape[0]
    # ZERO-padding layout: cluster-sort the corpus and chop into EXACT
    # fixed-size blocks (only the final block carries pad slots). The IVF
    # bucketed layout pads every list's last bucket — measured 1.55x
    # corpus on the skewed SIFT surrogate; routing a chopped block by its
    # raw mean loses the cluster tails that leak into mixed boundary
    # blocks (measured recall 0.996 -> 0.915). So routing is decoupled
    # from storage: one router ENTRY per (cluster, block) SEGMENT — the
    # mean of that cluster's rows inside that block — with an
    # entry->block map. A boundary block holding tails of two clusters
    # gets two entries, each sitting in its own cluster, so every row
    # stays reachable; probing any entry scores the whole block and the
    # beam dedups by block id.
    # block_len comes from the PRE-spill count so the slab shape (and the
    # Pallas tiling rule L % 8) is independent of the spill knob; spilled
    # clones only add blocks.
    block_len = max(1, -(-n // n_blocks))
    n_blocks = -(-n_ext // block_len)
    order = np.argsort(assign, kind="stable").astype(np.int64)
    pad = n_blocks * block_len - n_ext
    slot_np = np.concatenate(
        [row_of[order].astype(np.int32), np.full(pad, -1, np.int32)]
    ).reshape(n_blocks, block_len)
    safe = jnp.asarray(np.where(slot_np >= 0, slot_np, 0))
    mask = (jnp.asarray(slot_np) >= 0)[:, :, None]
    list_vecs = vectors[safe] * mask  # [Nb, L, d] f32 — IS the corpus copy
    # segments: maximal runs of one cluster within one block
    sorted_assign = assign[order]
    block_of = np.arange(n_ext) // block_len
    boundary = np.ones(n_ext, dtype=bool)
    boundary[1:] = (sorted_assign[1:] != sorted_assign[:-1]) | (
        block_of[1:] != block_of[:-1]
    )
    seg_ids = np.cumsum(boundary) - 1  # [n_ext]
    n_entries = int(seg_ids[-1]) + 1 if n_ext else 1
    entry_block = jnp.asarray(
        block_of[boundary].astype(np.int32)
    )  # [Ne]
    flat_sorted = list_vecs.reshape(n_blocks * block_len, d)[:n_ext]
    seg_dev = jnp.asarray(seg_ids.astype(np.int32))
    sums = jax.ops.segment_sum(flat_sorted, seg_dev, num_segments=n_entries)
    cnts = jax.ops.segment_sum(
        jnp.ones((n_ext,), jnp.float32), seg_dev, num_segments=n_entries
    )
    entries = sums / jnp.maximum(cnts, 1.0)[:, None]  # [Ne, d]
    # entry-level RNG graph — exact build is trivial at Ne ~ 1.5 N/L rows
    adj = build_knn_graph(entries, min(degree, entries.shape[0] - 1),
                          method="exact")
    list_vecs, list_sqn, list_mu = _encode_slabs(list_vecs, mask, slab_dtype)
    return (
        entries,
        entry_block,
        jnp.asarray(slot_np),
        list_vecs,
        list_sqn,
        adj,
        list_mu,
    )


def build_block_graph_stream(
    store,
    n_blocks: int,
    degree: int,
    seed: int = 42,
    train_iters: int = 12,
    normalize: bool = False,
    chunk_rows: int = 262_144,
    spill: float = 0.0,
    slab_dtype: str = "f32",
):
    """Out-of-core block-graph build (round-2 VERDICT missing #4).

    Same layout/semantics as ``build_block_graph`` assembled from a host
    source (memmap / BigStore) in two SEQUENTIAL passes — no random host
    reads, so the native prefetch reader keeps streaming:

      pass 1: evenly-spaced train sample -> k-means; per-chunk coarse
        assignment (one device dispatch per chunk);
      pass 2: each chunk's rows scatter straight into their
        (block, slot) home in a donated flat ``[Nb*L, d]`` device buffer
        — the destination of row i is its RANK in the cluster-sorted
        order, known host-side from the assignment — while the same
        chunk's rows accumulate into the router-entry segment sums.

    Host RSS stays O(chunk).  Device peak stays O(corpus) + O(chunk):
    the resident build's ``vectors[safe]`` gather holds corpus + block
    layout simultaneously (2x corpus HBM — the cap on buildable N per
    chip), which this path never materialises.
    """
    from vectordb_retrieval_tpu.data.storage import iter_chunks_any
    from vectordb_retrieval_tpu.ops.kmeans import (
        kmeans_assign,
        kmeans_assign2,
        kmeans_fit,
    )

    n, d = (int(s) for s in store.shape)
    n_blocks = max(1, min(n_blocks, n))

    def prep(host: np.ndarray) -> jax.Array:
        dev = jnp.asarray(np.ascontiguousarray(host, dtype=np.float32))
        return dops.normalize(dev) if normalize else dev

    # pass 0: evenly-spaced sample blocks for k-means training
    from vectordb_retrieval_tpu.data.storage import _read_chunk

    target = min(n, max(n_blocks * 32, 65_536))
    blk = 4096
    stride = max(1, n // max(1, -(-target // blk)))
    sample = np.concatenate(
        [_read_chunk(store, s, min(s + blk, n)) for s in range(0, n, stride)]
    )[:target]
    centroids, _ = kmeans_fit(
        prep(sample), n_blocks, seed=seed, iters=train_iters
    )
    del sample

    # pass 1: streamed coarse assignment (top-2 when spilling: the clone
    # selection needs every row's runner-up cluster and margin)
    use_spill = spill > 0.0 and n_blocks >= 2
    assign = np.empty(n, dtype=np.int32)
    assign_b = np.empty(n, dtype=np.int32) if use_spill else None
    margin = np.empty(n, dtype=np.float32) if use_spill else None
    for start, host in iter_chunks_any(store, chunk_rows):
        stop = start + host.shape[0]
        if use_spill:
            a1, a2, mg = kmeans_assign2(prep(host), centroids)
            assign[start:stop] = np.asarray(a1)
            assign_b[start:stop] = np.asarray(a2)
            margin[start:stop] = np.asarray(mg)
        else:
            assign[start:stop] = np.asarray(
                kmeans_assign(prep(host), centroids)
            )

    # spilled-clone selection (same rule as the resident build): the
    # lowest-margin rows are duplicated into their runner-up cluster
    if use_spill:
        n_spill = int(spill * n)
        sel = np.argpartition(margin, max(n_spill - 1, 0))[:n_spill]
        row_of = np.concatenate(
            [np.arange(n, dtype=np.int64), sel.astype(np.int64)]
        )
        assign_ext = np.concatenate([assign, assign_b[sel]])
    else:
        n_spill = 0
        sel = np.empty(0, dtype=np.int64)
        row_of = np.arange(n, dtype=np.int64)
        assign_ext = assign
    n_ext = row_of.shape[0]

    # layout (identical to the resident build): cluster-sort + exact chop;
    # block_len from the PRE-spill count so the slab shape is spill-stable
    block_len = max(1, -(-n // n_blocks))
    n_blocks = -(-n_ext // block_len)
    order = np.argsort(assign_ext, kind="stable").astype(np.int64)
    rank = np.empty(n_ext, dtype=np.int32)  # ext index -> sorted slot
    rank[order] = np.arange(n_ext, dtype=np.int32)
    pad = n_blocks * block_len - n_ext
    slot_np = np.concatenate(
        [row_of[order].astype(np.int32), np.full(pad, -1, np.int32)]
    ).reshape(n_blocks, block_len)
    sorted_assign = assign_ext[order]
    block_of = (np.arange(n_ext) // block_len).astype(np.int64)
    boundary = np.ones(n_ext, dtype=bool)
    boundary[1:] = (sorted_assign[1:] != sorted_assign[:-1]) | (
        block_of[1:] != block_of[:-1]
    )
    seg_ids = np.cumsum(boundary) - 1  # segment id per SORTED position
    n_entries = int(seg_ids[-1]) + 1 if n_ext else 1
    entry_block = jnp.asarray(block_of[boundary].astype(np.int32))
    seg_of_ext = np.empty(n_ext, dtype=np.int32)
    seg_of_ext[order] = seg_ids.astype(np.int32)
    # per ORIGINAL row: its clone's slot/segment (or sentinel when unspilled)
    n_slots = n_blocks * block_len
    clone_slot = np.full(n, n_slots, dtype=np.int32)  # trash slot
    clone_seg = np.full(n, n_entries, dtype=np.int32)  # trash segment
    if n_spill:
        clone_slot[sel] = rank[n + np.arange(n_spill)]
        clone_seg[sel] = seg_of_ext[n + np.arange(n_spill)]

    # pass 2: scatter rows to their sorted slots + accumulate entry sums.
    # The buffer carries one extra TRASH row (and segment_sum one extra
    # trash segment) so clone scatters keep a chunk-independent shape:
    # every row in every chunk scatters twice, non-clones to the trash.
    buf = jax.jit(lambda: jnp.zeros((n_slots + 1, d), jnp.float32))()
    sums = jnp.zeros((n_entries, d), jnp.float32)
    cnts = jnp.zeros((n_entries,), jnp.float32)

    scatter = jax.jit(
        lambda b, rows, idx: b.at[idx].set(rows), donate_argnums=(0,)
    )
    accum = jax.jit(
        lambda s, c, rows, seg: (
            s
            + jax.ops.segment_sum(rows, seg, num_segments=n_entries + 1)[
                :n_entries
            ],
            c
            + jax.ops.segment_sum(
                jnp.ones(rows.shape[:1], jnp.float32),
                seg,
                num_segments=n_entries + 1,
            )[:n_entries],
        ),
        donate_argnums=(0, 1),
        static_argnames=(),
    )
    i = 0
    for start, host in iter_chunks_any(store, chunk_rows):
        stop = start + host.shape[0]
        rows = prep(host)
        buf = scatter(buf, rows, jnp.asarray(rank[start:stop]))
        sums, cnts = accum(
            sums, cnts, rows,
            jnp.minimum(jnp.asarray(seg_of_ext[start:stop]), n_entries),
        )
        if use_spill:
            buf = scatter(buf, rows, jnp.asarray(clone_slot[start:stop]))
            sums, cnts = accum(
                sums, cnts, rows, jnp.asarray(clone_seg[start:stop])
            )
        i += 1
        if i % 4 == 0:  # cap in-flight staging chunks
            jax.block_until_ready(buf)

    list_vecs = buf[:n_slots].reshape(n_blocks, block_len, d)  # pad rows 0
    mask = (jnp.asarray(slot_np) >= 0)[:, :, None]
    list_vecs, list_sqn, list_mu = _encode_slabs(list_vecs, mask, slab_dtype)
    entries = sums / jnp.maximum(cnts, 1.0)[:, None]
    adj = build_knn_graph(entries, min(degree, entries.shape[0] - 1),
                          method="exact")
    return (
        entries,
        entry_block,
        jnp.asarray(slot_np),
        list_vecs,
        list_sqn,
        adj,
        list_mu,
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "efb", "expand", "iters", "metric", "dedup"),
)
def block_graph_search(
    queries: jax.Array,
    entries: jax.Array,  # [Ne, d] router entries (segment means)
    entry_block: jax.Array,  # [Ne] entry -> block map
    slot_ids: jax.Array,  # [Nb, L] member row ids (-1 pad)
    list_vecs: jax.Array,  # [Nb, L, d] f32 slabs | bf16 residual slabs
    list_sqn: jax.Array,  # [Nb, L]
    entry_adj: jax.Array,  # [Ne, R] entry graph
    list_mu: jax.Array | None = None,  # [Nb, d] f32 block means (bf16 slabs)
    k: int = 10,
    efb: int = 32,  # frontier width
    expand: int = 8,  # blocks probed per iteration
    iters: int = 8,  # probe budget = expand * iters
    metric: str = "l2",
    dedup: bool = False,  # spilled layouts: id-level dedup of the top-k
) -> Tuple[jax.Array, jax.Array]:
    """Beam over router entries; returns exact f32 ``(dists, ids) [B, k]``.

    Routing: the dense entry scan (HNSW's hierarchy, one MXU matmul)
    seeds a frontier of ``efb`` entries; each iteration pops the
    ``expand`` nearest unvisited entries, scores ALL member rows of their
    blocks (one contiguous ``[B, L, d]`` slab gather + HIGH-precision MXU
    dot per block — ranking-feeding, so bf16 truncation is not allowed),
    folds them into a running row top-k, and pushes the popped entries'
    graph neighbours (deduplicated by BLOCK id against the visited list
    and the frontier — several entries may route to one block) into the
    frontier ranked by their already-computed entry distance (a [B, Ne]
    take_along_axis, not a second scan). Visited blocks live in an
    append-only per-iteration slab, so no block is ever probed twice and
    the row top-k stays duplicate-free.
    """
    if list_mu is not None and getattr(list_mu, "ndim", 0) != 2:
        raise TypeError(
            "list_mu must be a [Nb, d] array or None (did a positional `k` "
            "land here? build_block_graph now returns a 7-tuple incl. mu)"
        )
    b, dim = queries.shape
    ne = entries.shape[0]
    efb = min(efb, ne)
    expand = min(expand, efb)
    big = jnp.inf
    rows = jnp.arange(b)[:, None]
    qn = jnp.sum(queries * queries, axis=-1, dtype=jnp.float32)

    cd = dops.pairwise_distances(queries, entries, metric)  # [B, Ne]
    seed_d, seed_ids = dops.top_k_smallest(cd, efb)
    beam_ids = seed_ids.astype(jnp.int32)  # entry ids
    beam_blk = entry_block[beam_ids]
    # seed block dedup: several seed entries can route to one block —
    # later copies would be popped in a later wave and re-probe the block
    # (duplicate rows in the final top-k)
    seq = beam_blk[:, :, None] == beam_blk[:, None, :]
    stri = jnp.tril(jnp.ones((efb, efb), dtype=jnp.bool_), k=-1)
    sdup = jnp.any(seq & stri[None], axis=2)
    beam_d = jnp.where(sdup, big, seed_d)
    # spilled layouts clone boundary rows into a second block, so a row id
    # can appear twice among the candidates; running the merge at 2k and
    # deduplicating at the end guarantees k unique ids (each id has at
    # most one clone, so any 2k slots hold >= k distinct ids)
    kk = min(2 * k if dedup else k, slot_ids.shape[0] * slot_ids.shape[1])
    rk_d = jnp.full((b, kk), big, jnp.float32)
    rk_i = jnp.full((b, kk), -1, jnp.int32)
    # visited blocks as an append-only per-iteration slab. (A [B, Nb]
    # bitmap with scatter/gather membership was tried and measured ~15%
    # SLOWER back-to-back at msmarco shape — TPU scatters through a scan
    # carry lose to the pairwise-compare masks at these widths.)
    visited = jnp.full((b, expand * iters), -1, jnp.int32)  # block ids
    prec = jax.lax.Precision.HIGH

    def wave(state, t, do_push):
        beam_ids, beam_blk, beam_d, rk_d, rk_i, visited = state
        # pop the `expand` nearest frontier entries
        _, sel = jax.lax.approx_max_k(-beam_d, expand, recall_target=1.0)
        sel_blocks = jnp.take_along_axis(beam_blk, sel, axis=1)  # [B, W]
        sel_valid = jnp.isfinite(jnp.take_along_axis(beam_d, sel, axis=1))
        sel_entries = jnp.take_along_axis(beam_ids, sel, axis=1)
        # intra-wave block dedup (two frontier entries can share a block)
        # + belt-and-braces visited check (any insertion-time dedup hole
        # would otherwise re-probe a block -> duplicate output rows)
        weq = sel_blocks[:, :, None] == sel_blocks[:, None, :]
        wtri = jnp.tril(jnp.ones((expand, expand), dtype=jnp.bool_), k=-1)
        wdup = jnp.any(weq & wtri[None], axis=2)
        wvis = jnp.any(
            sel_blocks[:, :, None] == visited[:, None, :], axis=2
        )
        sel_blocks = jnp.where(sel_valid & ~wdup & ~wvis, sel_blocks, -1)
        beam_d = beam_d.at[rows, sel].set(big)
        visited = jax.lax.dynamic_update_slice(
            visited, sel_blocks, (0, t * expand)
        )

        L = slot_ids.shape[1]
        dim_d = list_vecs.shape[2]
        if _use_slab_kernel(b, L, dim_d, jnp.dtype(list_vecs.dtype).itemsize):
            # Pallas scalar-prefetch slab scan (pallas_kernels.slab_dots):
            # each (query, popped-slot) grid cell DMAs its selected
            # block's contiguous [L, d] slab HBM->VMEM and the MXU
            # consumes it there — no [B, W, L, d] HBM gather transient,
            # no sub-wave serialisation, ONE top-k merge per wave
            # (measured 3.3 ms vs 4.9 ms per 512x8-slab wave at d=384,
            # and the XLA path additionally pays W sequential sub-waves
            # at this shape).
            from vectordb_retrieval_tpu.ops import pallas_kernels as pk

            safe_blk = jnp.where(sel_blocks >= 0, sel_blocks, 0)
            dots = pk.slab_dots(queries, list_vecs, safe_blk)  # [B, W, L]
            if list_mu is not None:
                # mean-centred slabs: add the exact f32 block-mean term,
                # one [B, W] dot amortised over the whole L-row slab
                mu_dot = jnp.einsum(
                    "bwd,bd->bw", list_mu[safe_blk], queries,
                    preferred_element_type=jnp.float32, precision=prec,
                )
                dots = dots + mu_dot[:, :, None]
            ids = jnp.where(
                (sel_blocks >= 0)[:, :, None], slot_ids[safe_blk], -1
            ).reshape(b, expand * L)
            if metric == "l2":
                dist = qn[:, None, None] + list_sqn[safe_blk] - 2.0 * dots
            else:
                dist = -dots
            dist = jnp.where(ids >= 0, dist.reshape(b, expand * L), big)
            cat_d = jnp.concatenate([rk_d, dist], axis=1)
            cat_i = jnp.concatenate([rk_i, ids], axis=1)
            nd, selr = dops.top_k_smallest(cat_d, kk)
            rk_d, rk_i = nd, jnp.take_along_axis(cat_i, selr, axis=1)
        else:
            # XLA fallback: probe in sub-waves — [B, wsub, L, d] slab
            # gathers + one batched HIGH-precision dot + one top-k merge
            # each. One-block-at-a-time serialised W gather latencies and
            # W merges per iteration (measured 9.0k -> 12.9k QPS at 1M
            # going wave-at-once), but an unbounded [B, W, L, d]
            # transient backfires once it outgrows a ~128 MB working set
            # (805 MB at B=512/d=384: measured 7.5k -> 6.0k), so the
            # sub-wave width is chosen at trace time to keep the gather
            # transient bounded.
            per_block = b * L * dim_d * 4
            wsub = int(
                max(1, min(expand, (128 << 20) // max(per_block, 1)))
            )
            n_sub = -(-expand // wsub)
            pad_w = n_sub * wsub - expand
            sel_p = jnp.pad(
                sel_blocks, ((0, 0), (0, pad_w)), constant_values=-1
            ).reshape(b, n_sub, wsub)

            def probe(carry, sw):
                rk_d, rk_i = carry
                blocks = sel_p[:, sw]  # [B, wsub]
                safe_blk = jnp.where(blocks >= 0, blocks, 0)
                vecs = list_vecs[safe_blk]  # [B, wsub, L, d] slabs
                ids = jnp.where(
                    (blocks >= 0)[:, :, None], slot_ids[safe_blk], -1
                ).reshape(b, wsub * L)
                dots = jnp.einsum(
                    "bwld,bd->bwl", vecs.astype(jnp.float32), queries,
                    preferred_element_type=jnp.float32, precision=prec,
                )
                if list_mu is not None:
                    mu_dot = jnp.einsum(
                        "bwd,bd->bw", list_mu[safe_blk], queries,
                        preferred_element_type=jnp.float32, precision=prec,
                    )
                    dots = dots + mu_dot[:, :, None]
                if metric == "l2":
                    dist = (
                        qn[:, None, None] + list_sqn[safe_blk] - 2.0 * dots
                    )
                else:
                    dist = -dots
                dist = jnp.where(ids >= 0, dist.reshape(b, wsub * L), big)
                cat_d = jnp.concatenate([rk_d, dist], axis=1)
                cat_i = jnp.concatenate([rk_i, ids], axis=1)
                nd, selr = dops.top_k_smallest(cat_d, kk)
                return (nd, jnp.take_along_axis(cat_i, selr, axis=1)), None

            if n_sub == 1:
                (rk_d, rk_i), _ = probe((rk_d, rk_i), 0)
            else:
                (rk_d, rk_i), _ = jax.lax.scan(
                    probe, (rk_d, rk_i), jnp.arange(n_sub, dtype=jnp.int32)
                )

        if not do_push:
            return (beam_ids, beam_blk, beam_d, rk_d, rk_i, visited)

        # push graph neighbours of the popped entries into the frontier
        safe_sel = jnp.where(sel_entries >= 0, sel_entries, 0)
        nbr = jnp.where(
            sel_valid[:, :, None], entry_adj[safe_sel], -1
        ).reshape(b, -1)  # [B, W*R] entry ids
        c = nbr.shape[1]
        nbr_blk = jnp.where(
            nbr >= 0, entry_block[jnp.where(nbr >= 0, nbr, 0)], -1
        )
        in_beam = jnp.any(
            nbr_blk[:, :, None] == beam_blk[:, None, :], axis=2
        )
        in_vis = jnp.any(
            nbr_blk[:, :, None] == visited[:, None, :], axis=2
        )
        ncd = jnp.take_along_axis(cd, jnp.where(nbr >= 0, nbr, 0), axis=1)
        ncd = jnp.where(
            (nbr >= 0) & ~in_beam & ~in_vis, ncd, big
        )
        # narrow the candidate set BEFORE the O(keep^2) block dedup: only
        # the best efb candidates can enter the efb-wide frontier, so
        # select efb + one wave of headroom for duplicate-block copies
        # (duplicates per push are bounded by entries-per-block, ~1.5 on
        # real layouts — a full 2*efb window measured only slower: 7.7k
        # -> 8.1k QPS at the 3-iteration msmarco geometry from shrinking
        # it, recall identical). amk output is value-sorted, so the dedup
        # keeps the BEST copy per block.
        keep = min(efb + 96, c)
        nk, kpos = jax.lax.approx_max_k(-ncd, keep, recall_target=1.0)
        kd = -nk
        kids = jnp.take_along_axis(nbr, kpos, axis=1)
        kblk = jnp.take_along_axis(nbr_blk, kpos, axis=1)
        eq = kblk[:, :, None] == kblk[:, None, :]
        tri = jnp.tril(jnp.ones((keep, keep), dtype=jnp.bool_), k=-1)
        dup = jnp.any(eq & tri[None], axis=2)
        kd = jnp.where(dup, big, kd)
        cat_ids = jnp.concatenate([beam_ids, kids], axis=1)
        cat_blk = jnp.concatenate([beam_blk, kblk], axis=1)
        cat_d = jnp.concatenate([beam_d, kd], axis=1)
        nd, pos = jax.lax.approx_max_k(-cat_d, efb, recall_target=1.0)
        beam_d = -nd
        beam_ids = jnp.take_along_axis(cat_ids, pos, axis=1)
        beam_blk = jnp.take_along_axis(cat_blk, pos, axis=1)
        return (beam_ids, beam_blk, beam_d, rk_d, rk_i, visited)

    state = (beam_ids, beam_blk, beam_d, rk_d, rk_i, visited)
    if iters > 1:
        state, _ = jax.lax.scan(
            lambda s, t: (wave(s, t, True), None),
            state,
            jnp.arange(iters - 1, dtype=jnp.int32),
        )
    # final wave: pushed neighbours would never be popped — skip the whole
    # push phase (its masks + merge are a full iteration's overhead share)
    (beam_ids, beam_blk, beam_d, rk_d, rk_i, visited) = wave(
        state, jnp.int32(iters - 1), False
    )
    if dedup:
        # clone copies of a row score identically (same stored values, same
        # exact dot), so every duplicate pair is present in full; keep the
        # first occurrence (distance-sorted order) and re-select k.
        ieq = rk_i[:, :, None] == rk_i[:, None, :]  # [B, kk, kk]
        ltri = jnp.tril(jnp.ones((kk, kk), dtype=jnp.bool_), k=-1)
        is_dup = jnp.any(ieq & ltri[None], axis=2) & (rk_i >= 0)
        rk_d = jnp.where(is_dup, big, rk_d)
        out_k = min(k, kk)
        nd, sel = dops.top_k_smallest(rk_d, out_k)
        return nd, jnp.take_along_axis(rk_i, sel, axis=1)
    return rk_d, rk_i


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
    jax.jit,
    static_argnames=(
        "k", "ef", "expand", "iters", "metric", "cand_keep", "rescore"
    ),
)
def graph_search(
    queries: jax.Array,
    vectors: jax.Array,  # f32 corpus (seed gather + optional final rescore)
    adjacency: jax.Array,  # [N, R]
    entry_ids: jax.Array,  # [E]
    k: int,
    ef: int = 64,
    expand: int = 4,
    iters: int = 12,
    metric: str = "l2",
    sqnorms: jax.Array = None,  # f32 row norms (l2)
    cand_keep: int = 0,  # per-iteration insert cap (0 = ef)
    nbr_vecs: jax.Array = None,  # [N, R, d] neighbour table (bf16 | u8 codes)
    nbr_sqn: jax.Array = None,  # [N, R] f32 norms of table rows
    rescore: bool = False,  # exact f32 rescore of the final candidates
    nbr_vmin: jax.Array = None,  # [d] SQ range (int8 tables only)
    nbr_step: jax.Array = None,  # [d] SQ step  (int8 tables only)
) -> Tuple[jax.Array, jax.Array]:
    """Batched beam search; returns ``(dists [B, k], ids [B, k])``.

    Sort-free beam maintenance. The original design deduped/merged via a
    composite-key ``argsort`` over the ``[B, ef + W*R]`` concat — profiled
    at ~22 ms/batch for the sort plus ~10 ms per wide ``take_along_axis``,
    i.e. ~85% of beam runtime, while ``approx_max_k`` costs ~0.2 ms at any
    width (scripts/exp_topk_cost.py). Every step is therefore expressed as
    ``approx_max_k`` + narrow gathers + pairwise-compare dedup:

      1. select the ``expand`` best unexpanded beam entries  (amk over ef)
      2. gather + score their neighbours                     ([B, W*R])
      3. mask candidates already in the beam                 (pairwise ==)
      4. keep the best ``cand_keep`` candidates              (amk over W*R)
      5. mask duplicate ids inside that small set            (pairwise ==)
      6. merge into the beam                                 (amk over ef+C)

    When ``nbr_vecs``/``nbr_sqn`` are given (built by
    :func:`build_neighbor_table`), step 2's per-row gather of ``B*W*R``
    scattered corpus rows (measured ~3.7 ms/iter at W*R=1536 — row-latency
    bound) becomes ONE contiguous-block gather of ``B*W`` table rows of
    ``R*d`` elements (~1 ms/iter): each node's neighbour vectors are stored
    contiguously, trading R x index memory (bf16 halves it) for the row
    count. Routing then runs on bf16 values; pass ``rescore=True`` to
    re-rank the final ``k+8`` candidates against the f32 corpus in-kernel.
    """
    b = queries.shape[0]
    r = adjacency.shape[1]
    e = entry_ids.shape[0]
    big = jnp.inf
    if sqnorms is None:
        v32 = vectors.astype(jnp.float32)
        sqnorms = jnp.sum(v32 * v32, axis=-1)
    keep = cand_keep or ef
    keep = min(keep, expand * r)
    rows = jnp.arange(b)[:, None]
    qn = jnp.sum(queries * queries, axis=-1, dtype=jnp.float32)

    # Seed beam with entry points (top-ef by distance when there are more
    # entries than beam slots — the coarse-quantizer routing step). Entry
    # rows are shared by every query: gather them ONCE ([E, d]) and score
    # with a single [B, E] matmul instead of per-query row gathers (the
    # broadcasted-gather seed cost ~8 ms at E=2048, B=256).
    seed_ids = jnp.broadcast_to(entry_ids[None, :], (b, e)).astype(jnp.int32)
    safe_entry = jnp.where(entry_ids >= 0, entry_ids, 0)
    entry_vecs = vectors[safe_entry]  # [E, d]
    seed_dots = jnp.dot(
        queries.astype(entry_vecs.dtype),
        entry_vecs.T,
        preferred_element_type=jnp.float32,
    )
    if metric == "l2":
        seed_d = qn[:, None] + sqnorms[safe_entry][None, :] - 2.0 * seed_dots
    else:
        seed_d = -seed_dots
    seed_d = jnp.where(entry_ids[None, :] >= 0, seed_d, big)
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
        # 1. pick W best unexpanded entries (amk(rt=1.0): bit-exact)
        sel_d = jnp.where(beam_exp | (beam_ids < 0), big, beam_d)
        _, sel = jax.lax.approx_max_k(-sel_d, expand, recall_target=1.0)
        sel_ids = jnp.take_along_axis(beam_ids, sel, axis=1)
        sel_valid = jnp.isfinite(jnp.take_along_axis(sel_d, sel, axis=1))
        beam_exp = beam_exp.at[rows, sel].set(True)
        # 2. gather + score neighbours
        safe_sel = jnp.where(sel_ids >= 0, sel_ids, 0)
        if nbr_vecs is not None:
            neigh3 = adjacency[safe_sel]  # [B, W, R]
            nvec = nbr_vecs[safe_sel]  # [B, W, R, d] ONE block gather
            nsqn = nbr_sqn[safe_sel]  # [B, W, R]
            if nvec.dtype == jnp.uint8:
                # SQ8 table: affine decode folded into the contraction
                # (q.x_hat = q.vmin + (q*step).codes) — codes feed the
                # MXU directly, nothing decoded to HBM
                q_scaled = (queries * nbr_step[None, :]).astype(
                    jnp.bfloat16
                )
                dots = jnp.einsum(
                    "bwrd,bd->bwr",
                    nvec.astype(jnp.bfloat16),
                    q_scaled,
                    preferred_element_type=jnp.float32,
                ) + (queries @ nbr_vmin)[:, None, None]
            else:
                dots = jnp.einsum(
                    "bwrd,bd->bwr",
                    nvec,
                    queries.astype(nvec.dtype),
                    preferred_element_type=jnp.float32,
                )
            if metric == "l2":
                nd3 = qn[:, None, None] + nsqn - 2.0 * dots
            else:
                nd3 = -dots
            neigh = jnp.where(
                sel_valid[:, :, None] & (neigh3 >= 0), neigh3, -1
            ).reshape(b, expand * r)
            nd = jnp.where(neigh >= 0, nd3.reshape(b, expand * r), big)
        else:
            neigh = adjacency[safe_sel].reshape(b, expand * r)  # [B, W*R]
            neigh = jnp.where(
                jnp.repeat(sel_valid, r, axis=1) & (neigh >= 0), neigh, -1
            )
            nd = _batch_dists(queries, vectors, sqnorms, neigh, metric)
        # 3. drop candidates already in the beam (their distance is known;
        # re-inserting would only burn slots / re-expand)
        in_beam = jnp.any(
            neigh[:, :, None] == beam_ids[:, None, :], axis=2
        )
        nd = jnp.where(in_beam | (neigh < 0), big, nd)
        # 4. best `keep` new candidates
        cnd, cpos = jax.lax.approx_max_k(-nd, keep, recall_target=1.0)
        cand_d = -cnd
        cand_ids = jnp.take_along_axis(neigh, cpos, axis=1)
        # 5. intra-set dedup: keep first occurrence (amk output is
        # value-sorted, so "first" is also the best-ranked copy)
        eq = cand_ids[:, :, None] == cand_ids[:, None, :]  # [B, C, C]
        tri = jnp.tril(jnp.ones((keep, keep), dtype=jnp.bool_), k=-1)
        dup = jnp.any(eq & tri[None], axis=2)
        cand_d = jnp.where(dup | (cand_ids < 0), big, cand_d)
        # 6. merge (width ef + C — narrow, so amk + takes stay cheap)
        cat_ids = jnp.concatenate([beam_ids, cand_ids], axis=1)
        cat_d = jnp.concatenate([beam_d, cand_d], axis=1)
        cat_exp = jnp.concatenate(
            [beam_exp, jnp.zeros((b, keep), dtype=jnp.bool_)], axis=1
        )
        new_d, pos = jax.lax.approx_max_k(-cat_d, ef, recall_target=1.0)
        new_d = -new_d
        new_ids = jnp.take_along_axis(cat_ids, pos, axis=1)
        new_exp = jnp.take_along_axis(cat_exp, pos, axis=1)
        new_ids = jnp.where(jnp.isfinite(new_d), new_ids, -1)
        return (new_ids, new_d, new_exp), None

    (beam_ids, beam_d, beam_exp), _ = jax.lax.scan(
        body, (beam_ids, beam_d, beam_exp), None, length=iters
    )
    if rescore:
        # exact f32 re-rank of the survivors (routing ran on bf16 table
        # values — final distances must come from the true corpus rows)
        kk = min(k + 8, ef)
        _, pos = jax.lax.approx_max_k(-beam_d, kk, recall_target=1.0)
        fids = jnp.take_along_axis(beam_ids, pos, axis=1)
        safe = jnp.where(fids >= 0, fids, 0)
        fvec = vectors[safe].astype(jnp.float32)  # [B, kk, d]
        if metric == "l2":
            diff = fvec - queries[:, None, :]
            fd = jnp.sum(diff * diff, axis=-1)
        else:
            # VPU sum, NOT einsum: the MXU contraction would truncate the
            # gathered f32 rows to bf16, defeating this exact re-rank
            fd = -jnp.sum(fvec * queries[:, None, :], axis=-1)
        fd = jnp.where(fids >= 0, fd, big)
        out_d, opos = jax.lax.approx_max_k(
            -fd, min(k, kk), recall_target=1.0
        )
        out_ids = jnp.take_along_axis(fids, opos, axis=1)
        out_ids = jnp.where(jnp.isfinite(-out_d), out_ids, -1)
        return -out_d, out_ids
    kk = min(k, ef)
    out_d, pos = jax.lax.approx_max_k(-beam_d, kk, recall_target=1.0)
    out_ids = jnp.take_along_axis(beam_ids, pos, axis=1)
    return -out_d, out_ids
