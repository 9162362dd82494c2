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

from vectordb_retrieval_tpu.ops import pallas_kernels as plk

METRICS = ("l2", "ip", "cosine")

# test hook: run the Pallas stage-1 of the blockmin path in interpreter
# mode on non-TPU hosts (targeted tests flip this; production gating is
# by backend)
FORCE_PALLAS_STAGE1_INTERPRET = False

# Below this many database rows the full [B, N] distance matrix is
# materialised in one shot; above it the blockmin-certificate streaming path
# wins (fused block reduction + candidate rescore — measured faster from
# ~50k rows up: 57k vs 45k QPS at 100k x 384d, 10k vs 2.2k QPS at 1M x 128d).
_DENSE_PATH_MAX_ROWS = 32_768
# Chunk of database rows per scan step for the streaming paths. Bigger
# chunks amortise per-step scan overhead (the [B, chunk] distance block is
# transient); 256k rows x 256 queries = 268 MB, comfortably inside HBM.
DEFAULT_CHUNK_ROWS = 262_144


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

    Precision note: TPU's *default* matmul precision truncates f32 inputs to
    bf16 (error ~2e-3 relative — enough to reorder dozens of ranks on
    concentrated data). HIGH runs the 3-pass bf16 decomposition (~1e-6
    relative), which keeps rank perturbation well inside the exact family's
    refine overfetch margin at half the cost of HIGHEST; ground truth and
    exact searchers additionally re-rank with the cancellation-free diff
    form (rescore_l2), so end results are exact to f32 rounding.
    """
    _check_metric(metric)
    dots = jax.lax.dot_general(
        queries,
        database,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGH,
    )
    if metric == "l2":
        qn = jnp.sum(queries * queries, axis=-1, dtype=jnp.float32)
        xn = db_sqnorms if db_sqnorms is not None else sq_norms(database)
        d = qn[:, None] + xn[None, :].astype(jnp.float32) - 2.0 * dots
        return jnp.maximum(d, 0.0)
    return -dots


def take_rows_onehot(
    database: jax.Array, ids_flat: jax.Array, chunk: int = 4096
) -> jax.Array:
    """Row gather as one-hot MXU matmuls (gather-free).

    Plain HLO gathers carry a large fixed per-program cost on some TPU
    runtimes (and are never MXU work); ``one_hot(ids) @ db_chunk`` streams
    the table through the MXU instead, with the one-hot transient bounded to
    ``[R, chunk]`` by a scan. Exact: each output row sums one table row.
    """
    n, d = database.shape
    chunk = clamp_chunk(chunk, n, align=256)
    nc = -(-n // chunk)
    dbp = jnp.pad(database, ((0, nc * chunk - n), (0, 0))).reshape(nc, chunk, d)

    def body(acc, inp):
        ci, dchunk = inp
        rel = ids_flat - ci * chunk
        inb = ((rel >= 0) & (rel < chunk)).astype(jnp.float32)[:, None]
        oh = jax.nn.one_hot(
            jnp.clip(rel, 0, chunk - 1), chunk, dtype=jnp.float32
        ) * inb
        # HIGHEST: default precision would round the gathered table values
        # to bf16, corrupting the exact rescoring pass
        part = jax.lax.dot_general(
            oh, dchunk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return acc + part, None

    acc, _ = jax.lax.scan(
        body,
        jnp.zeros((ids_flat.shape[0], d), jnp.float32),
        (jnp.arange(nc, dtype=jnp.int32), dbp),
    )
    return acc


# one-hot gather costs O(R * N * d) MXU flops vs a plain HLO gather's fixed
# ~ms dispatch overhead plus ~0.2 us/row: only profitable when BOTH the
# candidate set and the table are small
_ONEHOT_GATHER_MAX_ROWS = 8192
_ONEHOT_GATHER_MAX_TABLE = 32_768


def _use_onehot(n_rows: int, n_table: int) -> bool:
    return n_rows <= _ONEHOT_GATHER_MAX_ROWS and n_table <= _ONEHOT_GATHER_MAX_TABLE


def rescore(
    queries: jax.Array, database: jax.Array, ids: jax.Array, metric: str
) -> jax.Array:
    """Exact rescoring of candidate ids under any metric (VPU, f32)."""
    if metric == "l2":
        return rescore_l2(queries, database, ids)
    b, kk = ids.shape
    safe = jnp.where(ids >= 0, ids, 0)
    flat = safe.reshape(-1)
    if _use_onehot(flat.shape[0], database.shape[0]):
        vecs = take_rows_onehot(database, flat)
    else:
        vecs = jnp.take(database, flat, axis=0)
    vecs = vecs.reshape(b, kk, database.shape[1])
    d = -jnp.sum(vecs * queries[:, None, :], axis=-1)
    return jnp.where(ids >= 0, d, jnp.inf)


def rescore_l2(
    queries: jax.Array, database: jax.Array, ids: jax.Array
) -> jax.Array:
    """Cancellation-free squared-L2 rescoring of candidate ids.

    The matmul form ``||q||^2+||x||^2-2qx`` loses ~1e-3 relative precision to
    cancellation, enough to flip near-ties at the top-k boundary (SURVEY.md
    section 7 hard-part (c)). Gathering the k candidates and computing
    ``sum((q-x)^2)`` on the VPU (NOT einsum — MXU contractions drop to bf16
    inputs) is exact to f32 rounding — used to re-rank the final candidates
    of exact paths and of ground-truth generation so that ties resolve
    consistently framework-wide. Small candidate sets gather via one-hot
    matmul (fast path), large ones via plain HLO gather (O(R) work).
    """
    b, kk = ids.shape
    safe = jnp.where(ids >= 0, ids, 0)
    flat = safe.reshape(-1)
    if _use_onehot(flat.shape[0], database.shape[0]):
        vecs = take_rows_onehot(database, flat)
    else:
        vecs = jnp.take(database, flat, axis=0)
    vecs = vecs.reshape(b, kk, database.shape[1])
    diff = vecs - queries[:, None, :]
    d = jnp.sum(diff * diff, axis=-1)
    return jnp.where(ids >= 0, d, jnp.inf)


def refine_topk_l2(
    queries: jax.Array, database: jax.Array, ids: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Re-rank a top-k candidate list with accurate L2 distances."""
    d = rescore_l2(queries, database, ids)
    nd, sel = top_k_smallest(d, d.shape[1])
    return nd, jnp.take_along_axis(ids, sel, axis=1)


def top_k_smallest(distances: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Indices/values of the k smallest entries per row (ties by index order
    are NOT guaranteed to match NumPy argsort — compare distances in tests,
    SURVEY.md section 7 hard-part (c)).

    Uses ``lax.approx_max_k`` with ``recall_target=1.0``: on TPU this lowers
    to the two-stage PartialReduce selection, which is *bit-exact* at
    recall 1.0 (verified against ``lax.top_k``) and several times faster
    than the full-sort TopK on wide rows — the selection step, not the MXU
    matmul, dominates large exact scans.
    """
    if distances.dtype != jnp.float32:
        neg_vals, idx = jax.lax.top_k(-distances, k)
        return -neg_vals, idx
    neg_vals, idx = jax.lax.approx_max_k(-distances, k, recall_target=1.0)
    return -neg_vals, idx


@functools.partial(jax.jit, static_argnames=("k", "metric", "refine_to"))
def _exact_search_dense(
    queries: jax.Array,
    database: jax.Array,
    db_sqnorms: Optional[jax.Array],
    k: int,
    metric: str,
    refine_to: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    d = pairwise_distances(queries, database, metric, db_sqnorms)
    dists, ids = top_k_smallest(d, k)
    if refine_to is not None and metric == "l2":
        dists, ids = refine_topk_l2(queries, database, ids)
        dists, ids = dists[:, :refine_to], ids[:, :refine_to]
    return dists, ids


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "chunk_rows", "refine_to")
)
def _exact_search_streamed(
    queries: jax.Array,
    database: jax.Array,
    db_sqnorms: Optional[jax.Array],
    k: int,
    metric: str,
    chunk_rows: int,
    refine_to: Optional[int] = None,
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
    if refine_to is not None and metric == "l2":
        best_d, best_i = refine_topk_l2(queries, database, best_i)
        best_d, best_i = best_d[:, :refine_to], best_i[:, :refine_to]
    return best_d, best_i


REFINE_OVERFETCH = 16
_BLOCKMIN_WIDTH = 8
_BLOCKMIN_SLACK = 16
# Selection over the [B, N/w] blockmin matrix is the blockmin path's
# bottleneck at large N (stage-split: scan 10 ms vs full 28 ms at 1M —
# scripts/exp_blockmin_stages.py); the certificate holds at ANY width, so
# wider blocks trade (k+slack)*w rescore rows for an N/w-times-narrower
# selection. v5e sweep (scripts/exp_blockmin_width.py): 100k x 384d k=20
# optimum w=8 (4.10 ms), 1M x 128d k=100 optimum w=32 (17.7 ms vs 27.1 at
# w=8, bit-exact); w=64+ loses everywhere (rescore-bound). The rule below
# keeps the blockmin row width near 32k columns, the knee of the
# selection cost, clamped to the measured-good [8, 32] range.
_BLOCKMIN_WIDTH_CAP = 32


def blockmin_width(n: int) -> int:
    """Empirically-optimal blockmin width for an ``n``-row database."""
    w = _BLOCKMIN_WIDTH
    while w < _BLOCKMIN_WIDTH_CAP and n > 32_768 * w:
        w *= 2
    return w


# wide-row block selection: plain top-k over [B, G] costs superlinearly in
# G on TPU (measured: G=31250 ~5 ms, 15625 ~1.2 ms, 7812 ~0.43 ms at
# B=256), so wide selections go hierarchical — superblock-min (factor
# _SEL_SF, a cheap fused reshape-min), top-nb superblocks, then co-SORT
# the nb*_SEL_SF member (value, block-id) pairs with lax.sort: scalar
# take_along_axis gathers are latency-bound on this backend (~2-3 ms for
# [256, 464]); sort carries the ids for free. Certificate: any (super)
# block containing a true top-k element has min <= d_k at both levels.
_SEL_FLAT_MAX = 8192
_SEL_SF = 4


def _select_blocks(bmins: jax.Array, nb: int) -> jax.Array:
    """Top-``nb`` block ids per row of the blockmin matrix ``[B, G]``."""
    b, g = bmins.shape
    if g <= _SEL_FLAT_MAX or nb * _SEL_SF >= g:
        _, blk = top_k_smallest(bmins, nb)
        return blk
    sf = _SEL_SF
    gpad = -(-g // sf) * sf
    bmp = (
        jnp.pad(bmins, ((0, 0), (0, gpad - g)), constant_values=jnp.inf)
        if gpad != g
        else bmins
    )
    bm4 = bmp.reshape(b, gpad // sf, sf)
    sb = jnp.min(bm4, axis=-1)  # [B, G/sf] superblock minima
    _, sblk = top_k_smallest(sb, nb)
    mvals = jnp.take_along_axis(bm4, sblk[:, :, None], axis=1)  # [B,nb,sf]
    mem = (
        sblk[:, :, None] * sf
        + jax.lax.broadcasted_iota(jnp.int32, (1, 1, sf), 2)
    ).reshape(b, nb * sf)
    _, sblk2 = jax.lax.sort(
        (mvals.reshape(b, nb * sf), mem), dimension=-1, num_keys=1
    )
    return sblk2[:, :nb]


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "chunk_rows", "w", "slack")
)
def _exact_search_blockmin(
    queries: jax.Array,
    database: jax.Array,
    db_sqnorms: Optional[jax.Array],
    k: int,
    metric: str,
    chunk_rows: int,
    w: int = _BLOCKMIN_WIDTH,
    slack: int = _BLOCKMIN_SLACK,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k via the blockmin certificate (large-N fast path).

    Two stages: (1) stream the database computing per-``w``-column block
    minima of the distance matrix — the full ``[B, N]`` matrix is consumed
    by a fused reduction and never reaches HBM. On TPU this is the fused
    Pallas kernel (ops/pallas_kernels.dist_blockmin_pallas, 3-pass hi/lo
    split = Precision.HIGH-equivalent numerics, measured 2.1-2.6x the XLA
    scan at 1M x 128d); elsewhere the XLA scan. (2) the top ``k+slack``
    blocks per query provably contain every true top-k element (any block
    holding a top-k element has blockmin <= d_k, and at most k-1 blocks can
    rank strictly below it — `slack` absorbs exact blockmin ties), so only
    ``(k+slack)*w`` candidates per query are rescored exactly on the VPU.
    Replaces reference src/algorithms/exact_search.py:26-78 as the oracle.
    """
    n, dim = database.shape
    b = queries.shape[0]
    use_pallas = (
        (plk._on_tpu() or FORCE_PALLAS_STAGE1_INTERPRET)
        and database.dtype == jnp.float32
        and queries.dtype == jnp.float32
    )
    if use_pallas:
        s = plk.dist_blockmin_pad_rows(n, w)
        dbp_flat = jnp.pad(database, ((0, s - n), (0, 0)))
        if metric == "l2":
            xn = db_sqnorms if db_sqnorms is not None else sq_norms(database)
            pen = jnp.pad(
                xn.astype(jnp.float32), (0, s - n), constant_values=jnp.inf
            )
        else:
            # kernel scores pen - 2*dot: rank-equal to the -dot convention
            # (positive scale); exact values come from the rescore below
            pen = jnp.pad(
                jnp.zeros((n,), jnp.float32), (0, s - n),
                constant_values=jnp.inf,
            )
        bmins = plk.dist_blockmin_pallas(
            queries, dbp_flat, pen.reshape(-1, w), w=w,
            interpret=not plk._on_tpu(),
        )  # [B, S/w]
        blocks = dbp_flat.reshape(-1, w, dim)
    else:
        chunk = clamp_chunk(chunk_rows, n, align=max(512, w))
        chunk = max(w, (chunk // w) * w)
        n_chunks = -(-n // chunk)
        pad = n_chunks * chunk - n
        dbp = jnp.pad(database, ((0, pad), (0, 0))).reshape(
            n_chunks, chunk, dim
        )
        if metric == "l2":
            xn = db_sqnorms if db_sqnorms is not None else sq_norms(database)
            # +inf norms force padded rows out of every block minimum
            pen = jnp.pad(xn, (0, pad), constant_values=jnp.inf).reshape(
                n_chunks, chunk
            )
        else:
            pen = jnp.pad(
                jnp.zeros((n,), jnp.float32), (0, pad),
                constant_values=jnp.inf,
            ).reshape(n_chunks, chunk)

        def step(_, inp):
            xc, pc = inp
            if metric == "l2":
                dist = pairwise_distances(queries, xc, "l2", pc)
            else:
                dist = pairwise_distances(queries, xc, metric) + pc[None, :]
            bm = jnp.min(dist.reshape(b, chunk // w, w), axis=-1)
            return None, bm

        _, bms = jax.lax.scan(step, None, (dbp, pen))  # [nc, B, chunk/w]
        bmins = jnp.moveaxis(bms, 0, 1).reshape(b, -1)  # [B, N_pad/w]
        blocks = dbp.reshape(-1, w, dim)  # [N_pad/w, w, d] (padded view)
    nb = min(k + slack, bmins.shape[1])
    blk = _select_blocks(bmins, nb)
    # Rescore by gathering whole w-row BLOCKS, not w scattered rows:
    # HLO row-gather cost is per-ROW latency (~0.2 us) regardless of
    # width (CLAUDE.md gather cost model), so nb block rows of w*d
    # elements cost ~w x less gather latency than nb*w single rows.
    bvecs = blocks[blk]  # [B, nb, w, d]
    if metric == "l2":
        diff = bvecs - queries[:, None, None, :]
        cd = jnp.sum(diff * diff, axis=-1)  # VPU: exact to f32 rounding
    else:  # ip/cosine: negated dot, VPU sum (exact)
        cd = -jnp.sum(bvecs * queries[:, None, None, :], axis=-1)
    cand = (
        blk[:, :, None] * w
        + jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
    ).reshape(b, nb * w)
    cand = jnp.where(cand < n, cand, -1)
    cd = jnp.where(cand.reshape(b, nb, w) >= 0, cd, jnp.inf).reshape(
        b, nb * w
    )
    vals, sel = top_k_smallest(cd, k)
    ids = jnp.take_along_axis(cand, sel, axis=1)
    ids = jnp.where(jnp.isfinite(vals), ids, -1)
    return vals, ids


def exact_search(
    queries: jax.Array,
    database: jax.Array,
    k: int,
    metric: str = "l2",
    db_sqnorms: Optional[jax.Array] = None,
    chunk_rows: int = DEFAULT_CHUNK_ROWS,
    refine: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact k-NN: ``(dists[B, k], ids[B, k])``, ascending distance.

    Dense path for small databases, streamed scan for large ones. ``k`` is
    clamped to N by the caller (indices past N never appear).

    ``refine=True`` (l2 only) overfetches candidates and re-ranks them with
    the cancellation-free rescoring pass — all fused into the same compiled
    program — so near-ties at the k boundary resolve exactly.
    """
    _check_metric(metric)
    n = database.shape[0]
    if k > n:
        raise ValueError(f"k={k} exceeds database size {n}")
    refine_to: Optional[int] = None
    fetch_k = k
    if refine and metric == "l2":
        refine_to = k
        fetch_k = min(k + REFINE_OVERFETCH, n)
    if n <= _DENSE_PATH_MAX_ROWS:
        return _exact_search_dense(
            queries, database, db_sqnorms, fetch_k, metric, refine_to
        )
    # large N: blockmin certificate path (exact + rescored by construction).
    # Bound the transient [B, chunk] distance block to ~256 MB.
    b = queries.shape[0]
    budget = max(4096, (1 << 26) // max(b, 1))
    return _exact_search_blockmin(
        queries, database, db_sqnorms, k, metric, min(chunk_rows, budget),
        w=blockmin_width(n),
    )
