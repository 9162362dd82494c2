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
    """Dispatch: Pallas on TPU, interpreter elsewhere (tests).

    Head-to-head at production scale (1M x 128d vs 1024 centroids, real
    v5e, results materialised in the clock, round 2): agreement 1.000000
    with ops/kmeans.kmeans_assign; 103.9 ms vs XLA's 95.5 ms. XLA's
    chunked scan keeps the default build path on merit — it fuses the
    same matmul+argmin pipeline and its chunk scheduling edges out this
    kernel's fixed tiling. Kept as the Pallas reference implementation
    and the fallback shape for future Mosaic-only variants (e.g. int8
    inputs, which XLA does not fuse as cleanly)."""
    return assign_pallas(points, centroids, interpret=not _on_tpu())


# ---- fused distance + per-block-min scan (exact search stage 1) ----------
#
# Status: correct and VMEM-resident, but NOT wired into the default exact
# path — XLA already fuses the min-reduction into the distance matmul
# consumer (measured: XLA stage-1 inside _exact_search_blockmin ~= 8 ms at
# 1M x 128 with HIGH precision vs ~34 ms here), because Mosaic only lowers
# DEFAULT/HIGHEST dot precisions and HIGHEST costs ~2x HIGH. Revisit when
# Mosaic grows HIGH-precision dots or bf16 block minima prove certificate-
# safe. Kept (with tests) as the Pallas reference implementation.
# (Round 4: superseded by :func:`dist_blockmin_pallas` below, which sidesteps
# the precision limitation with an in-kernel 3-pass hi/lo split.)

_BM_TILE = 2048


# ---- transposed fused distance + consecutive-block-min (round 4) ----------
#
# Stage 1 of the blockmin certificate paths (exact scan AND the IVF masked
# stream) spends most of its time round-tripping the [B, chunk] distance
# matrix through HBM: XLA does not fuse the HIGH-precision 3-pass matmul
# with its min-reduction consumer (measured 12.7 ms at 1M x 128d x 256q =
# ~40 GB/s effective). This kernel keeps the distance block in VMEM and
# emits only the per-w-block minima.
#
# Two tricks make it Mosaic-legal AND semantics-preserving:
#   * distances are computed TRANSPOSED, dots[T, B] = db_tile @ q.T, so the
#     per-block min over w CONSECUTIVE database rows is a leading-axis
#     reshape [T, B] -> [T/w, w, B] (whole 8-aligned sublane tiles move as
#     units — layout-preserving), then a min over axis 1. Lane-axis block
#     segmentation (the old _blockmin_kernel) forced *interleaved* block
#     membership, which breaks the IVF bucket->block mapping; consecutive
#     blocks keep stage-2 slab gathers and probed-bucket arithmetic intact.
#   * per-query terms (||q||^2, sq8's q.vmin) are DROPPED: top-k block
#     selection per query is invariant to per-query constants, and the
#     selected candidates are exactly rescored afterwards. The kernel
#     computes min_w(pen - 2*dots) where pen[S/w, w] carries the per-slot
#     constants (||x||^2 for l2, 0 for ip) and +inf for dead/padding slots.
#
# Payload modes (selected by dtype):
#   * float32  — in-kernel 3-pass hi/lo split (a.b ~= ahi.bhi + ahi.blo +
#     alo.bhi, each a DEFAULT bf16 dot with f32 accumulation): numerically
#     equivalent to jax.lax.Precision.HIGH, which Mosaic cannot lower
#     directly. Used by the exact scan — certificate guarantees unchanged.
#   * bfloat16 — single DEFAULT dot against bf16 queries (exactly the IVF
#     stream's current scoring semantics; candidates rescored in f32).
#   * uint8    — codes converted to bf16 in VMEM (integers <= 255 are exact
#     in bf16), dot against the pre-scaled queries (sq8's affine decode
#     folded into the dot, ops/ivf.ivf_sq_search).


def _make_dist_blockmin_kernel(w: int, mode: str, transpose_out: bool):
    def kernel(*refs):
        if mode == "f32":
            qhi_ref, qlo_ref, db_ref, pen_ref, out_ref = refs
            db = db_ref[:]
            db_hi = db.astype(jnp.bfloat16)
            db_lo = (db - db_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            dots = sum(
                jax.lax.dot_general(
                    a,
                    b,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for a, b in (
                    (db_hi, qhi_ref[:]),
                    (db_hi, qlo_ref[:]),
                    (db_lo, qhi_ref[:]),
                )
            )  # [T, B] f32 — HIGH-equivalent, VMEM-resident
        else:
            q_ref, db_ref, pen_ref, out_ref = refs
            db = db_ref[:]
            if mode == "u8":
                # Mosaic has no direct u8->bf16 cast: widen to i32 first
                # (values <= 255 are exact in bf16 either way)
                db = db.astype(jnp.int32).astype(jnp.bfloat16)
            dots = jax.lax.dot_general(
                db,
                q_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        t, b = dots.shape
        s3 = (-2.0 * dots).reshape(t // w, w, b) + pen_ref[:][:, :, None]
        m = jnp.min(s3, axis=1)  # [T/w, B]
        # in-kernel transpose: the [S/w, B] -> [B, S/w] materialising XLA
        # transpose after the kernel measured ~3 ms at 1M x 256q (a third
        # of the whole stage); VPU shuffles inside the kernel overlap the
        # payload DMA instead
        out_ref[:] = m.T if transpose_out else m

    return kernel


# per-cell VMEM budget for the fused blockmin kernel: db tile (double-
# buffered) + bf16 splits + the [T, B] f32 dots block + output. 15 MiB —
# just under Mosaic's 16 MiB scoped-vmem stack limit (same ceiling the
# slab kernel runs at, VRT_SLAB_VMEM_BUDGET) so the tile can reach the
# 128*w rows the transposed output layout needs at w=32, d=128, B=256.
_DBM_VMEM_BUDGET = 15 << 20


def dist_blockmin_tile(b: int, d: int, itemsize: int, w: int) -> int:
    """Largest w-aligned db-tile row count fitting the VMEM budget."""
    # bytes per row: payload (x2 double buffer, + bf16 splits for f32
    # mode) + dots/min temporaries (~2 f32 lanes of B each)
    per_row = d * itemsize * 2 + (d * 4 if itemsize == 4 else 0) + b * 8 + 8
    t = max(w, _DBM_VMEM_BUDGET // max(per_row, 1))
    return max(w, (t // (8 * w)) * (8 * w) or w)


def dist_blockmin_pad_rows(n: int, w: int) -> int:
    """Rows the payload must be padded to (pad with +inf-pen rows)."""
    return -(-n // (8 * w)) * (8 * w)


@functools.partial(jax.jit, static_argnames=("w", "interpret"))
def dist_blockmin_pallas(
    queries: jax.Array,  # [B, d]: f32 (f32 mode) or bf16 (bf16/u8 payloads)
    payload: jax.Array,  # [S, d] f32 | bf16 | u8; S % (8*w) == 0
    pen: jax.Array,  # [S/w, w] f32 per-slot constant; +inf = dead slot
    w: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Shifted per-block minima ``[B, S/w]``:
    ``out[q, g] = min_{j<w}(pen[g, j] - 2 * dot(payload[g*w+j], q'))``.

    Per-query constants are omitted (see module comment) — callers add
    ``||q||^2`` afterwards if true distances are needed; top-k block
    selection does not need them. Output is transposed to query-major by
    one XLA transpose.
    """
    b, d = queries.shape
    s = payload.shape[0]
    mode = {
        jnp.dtype(jnp.float32): "f32",
        jnp.dtype(jnp.bfloat16): "bf16",
        jnp.dtype(jnp.uint8): "u8",
    }[jnp.dtype(payload.dtype)]
    if s % (8 * w):
        raise ValueError(f"S={s} must be a multiple of 8*w={8*w} "
                         "(pad with +inf-pen rows, dist_blockmin_pad_rows)")
    tile = min(dist_blockmin_tile(b, d, payload.dtype.itemsize, w), s)
    # transposed output blocks are [B, tile/w] and need tile/w % 128 == 0
    transpose_out = b % 8 == 0 and tile >= 128 * w
    align = (128 if transpose_out else 8) * w
    tile = (tile // align) * align
    # edge tiles may read out of bounds (undefined values) — harmless:
    # S % (8*w) == 0 means garbage rows only ever land in output columns
    # that the out_shape crops; valid blocks of w consecutive rows never
    # straddle a tile boundary (tile % w == 0)
    n_tiles = -(-s // tile)

    if mode == "f32":
        q_hi = queries.astype(jnp.bfloat16)
        q_lo = (queries - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        q_in = (q_hi, q_lo)
        q_specs = [
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
    else:
        q_in = (queries.astype(jnp.bfloat16),)
        q_specs = [
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
        ]

    if transpose_out:
        out_spec = pl.BlockSpec(
            (b, tile // w), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((b, s // w), jnp.float32)
    else:
        out_spec = pl.BlockSpec(
            (tile // w, b), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((s // w, b), jnp.float32)

    out = pl.pallas_call(
        _make_dist_blockmin_kernel(w, mode, transpose_out),
        grid=(n_tiles,),
        in_specs=q_specs
        + [
            pl.BlockSpec(
                (tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile // w, w), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*q_in, payload, pen)
    return out if transpose_out else out.T  # [B, S/w]


def _blockmin_kernel(q_ref, qn_ref, db_ref, bm_ref, *, w: int):
    """One db tile: dist = |q|^2 + |x|^2 - 2 q.x -> per-block minima.

    The [B, T] distance block lives only in VMEM; HBM sees just the
    [B, T/w] minima — the whole point of fusing stage 1 of the blockmin
    exact search. Mosaic cannot reshape a 2-D vector to 3-D, so blocks are
    *interleaved segments*: block j of a tile holds columns
    ``{j, j + T/w, ..., j + (w-1)*T/w}`` and the min is a fold of w static
    contiguous slices (pure VPU). Stage 2 reconstructs member row ids as
    ``tile_start + j + i*(T/w)``.

    Row norms are computed in-kernel; callers pad the database with
    large-constant rows so padding can never win a minimum.
    """
    q = q_ref[:]
    db = db_ref[:]
    # Mosaic supports only DEFAULT/HIGHEST dot precisions; HIGHEST keeps the
    # block minima accurate enough that the certificate (stage-2 rescore)
    # never misses a candidate block.
    dots = jax.lax.dot_general(
        q,
        db,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    xn = jnp.sum(db * db, axis=1, dtype=jnp.float32)
    dist = qn_ref[:] + xn[None, :] - 2.0 * dots
    t = dist.shape[1]
    seg = t // w
    bm = dist[:, 0:seg]
    for i in range(1, w):
        bm = jnp.minimum(bm, dist[:, i * seg : (i + 1) * seg])
    bm_ref[:] = bm


@functools.partial(jax.jit, static_argnames=("w", "interpret"))
def blockmin_pallas(
    queries: jax.Array,  # [B, d]
    database: jax.Array,  # [N, d] (N % _BM_TILE == 0; padding rows = 1e6)
    w: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Per-block distance minima ``[B, N/w]`` in one fused Pallas pass.

    Block membership is interleaved within each tile (see kernel docstring):
    ``rows(block g) = (g // seg)*TILE + (g % seg) + i*seg`` with
    ``seg = TILE/w``.
    """
    b, d = queries.shape
    n = database.shape[0]
    tile = min(_BM_TILE, n)
    n_tiles = n // tile
    qn = jnp.sum(queries * queries, axis=1, dtype=jnp.float32)[:, None]

    return pl.pallas_call(
        functools.partial(_blockmin_kernel, w=w),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (b, tile // w), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n // w), jnp.float32),
        interpret=interpret,
    )(queries, qn, database)


# ---- scalar-prefetched block-slab distance scan (block-graph beam) --------
#
# The block-graph wave probe (ops/graph.block_graph_search) scores every
# member row of the `W` blocks each query's beam pops per iteration. The
# XLA formulation is a data-dependent gather `list_vecs[sel]` that
# materialises a [B, W, L, d] HBM transient before the dot reads it back
# (3x the slab bytes through HBM), and the 128 MB transient cap forces the
# wave into sub-waves — at msmarco shape (B=512, d=384) wsub=1, i.e. W
# SEQUENTIAL gather+merge steps per wave (the round-2 graph-QPS gap, docs/
# roadmap.md #1). This kernel is the roadmap's beam-gather DMA kernel in
# block form: the grid walks (query, popped-slot) cells, a scalar-prefetch
# index map DMAs each selected block's contiguous [L, d] slab HBM->VMEM
# (Mosaic double-buffers across cells), and the MXU consumes it in VMEM.
# The slab bytes cross HBM exactly once and the whole wave emits one
# [B, W, L] dots tensor — one top-k merge per wave instead of W.


# VMEM budget for the in-flight slab set: w_per slabs double-buffered
# must fit comfortably under the ~16 MB core VMEM alongside the resident
# query matrix and the output block. Measured on v5e (512 queries x 8
# slabs x 384d): w_per=8 reaches 459 GB/s effective for 256-row f32
# slabs vs 230 GB/s one-slab-per-cell — per-cell DMA issue overhead,
# not bandwidth, is the binding constraint, so fewer/bigger cells win.
import os as _os

# Per-grid-cell VMEM copy budget for the slab kernel. Whole-wave packing
# (w_per=40 at msmarco shape) measured +23% wave throughput over the
# 6 MiB/w_per=8 packing at expand=32 (round 3). 15 MiB is the largest
# safe value: Mosaic's scoped-vmem stack limit is 16 MiB and the
# double-buffered copy allocation must fit under it (w_per=56 = 21 MiB
# fails AOT compile). Env-overridable for on-hardware tuning.
_SLAB_VMEM_BUDGET = int(_os.environ.get("VRT_SLAB_VMEM_BUDGET", 15 << 20))


def slab_cap(length: int, d: int, itemsize: int) -> int:
    """Slabs fitting the double-buffered VMEM budget per grid cell."""
    return max(1, _SLAB_VMEM_BUDGET // (2 * length * d * itemsize))


def slab_kernel_ok(length: int, d: int, itemsize: int) -> bool:
    """True when the slab kernel's 8-aligned w_per packing is usable."""
    return slab_cap(length, d, itemsize) >= 8


def _make_slab_kernel(w_per: int):
    def kernel(sel_ref, q_ref, *refs):
        del sel_ref  # consumed by the index maps
        vec_refs, out_ref = refs[:-1], refs[-1]
        i = pl.program_id(0)
        j = pl.program_id(1)
        q = q_ref[pl.ds(i, 1), :]  # [1, d] — queries stay VMEM-resident
        outs = []
        for r in vec_refs:
            if r.dtype == jnp.bfloat16:
                # split-query 2-pass: q = q_hi + q_lo in bf16; each pass is
                # an exact bf16 x bf16 dot with f32 accumulation, so the sum
                # recovers the f32-query x bf16-slab product to ~2^-16 —
                # query rounding never touches the ranking, and the MXU
                # (not the DMA, which bf16 already halved) absorbs the
                # second pass
                q_hi = q.astype(jnp.bfloat16)
                q_lo = (q - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                dot = sum(
                    jax.lax.dot_general(
                        part,
                        r[0],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT,
                    )
                    for part in (q_hi, q_lo)
                )
                outs.append(dot)
            else:
                outs.append(
                    jax.lax.dot_general(
                        q,
                        r[0],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                )  # [1, L]
        out_ref[0, pl.ds(j * w_per, w_per), :] = jnp.concatenate(outs, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def slab_dots_pallas(
    queries: jax.Array,  # [B, d] f32
    list_vecs: jax.Array,  # [Nb, L, d] f32 or bf16
    sel: jax.Array,  # [B, W] int32 block ids, pre-clamped to [0, Nb)
    interpret: bool = False,
) -> jax.Array:
    """``dots[b, w, :] = list_vecs[sel[b, w]] @ queries[b]`` — [B, W, L] f32.

    Each grid cell handles ``w_per`` slabs (separate scalar-prefetch
    block specs over the same HBM array) to amortise per-cell overhead.
    Ranking-feeding: f32 slabs use HIGHEST-precision dots (Mosaic has no
    HIGH); bf16 slabs accumulate in f32 (exact for bf16 storage).
    """
    b, d = queries.shape
    nb, length, _ = list_vecs.shape
    w = sel.shape[1]
    isz = jnp.dtype(list_vecs.dtype).itemsize
    # w_per MUST be a multiple of 8: the kernel stores its w_per j-rows at
    # sublane offset j * w_per, and Mosaic requires a provably 8-aligned
    # sublane index (w_per=12 at expand=12 failed to compile). Shapes
    # where fewer than 8 slabs fit the VMEM budget never route here
    # (slab_kernel_ok gates the caller).
    cap = slab_cap(length, d, isz)
    if cap < 8:
        raise ValueError(
            f"slab kernel needs >=8 slabs in VMEM (cap={cap} at "
            f"L={length} d={d} itemsize={isz}); gate with slab_kernel_ok"
        )
    # pick the smallest x8 w_per that still uses the fewest grid cells —
    # w=48 under cap 40 packs as 2 cells of 24, not 2 cells of 40 (which
    # would burn 32 padded slabs of DMA+dot per query)
    cap8 = (cap // 8) * 8
    n_cells = -(-w // cap8)
    per_cell = -(-w // n_cells)          # ceil(w / n_cells)
    w_per = int(min(cap8, -(-per_cell // 8) * 8))  # round up to x8
    w_pad = -(-w // w_per) * w_per
    if w_pad != w:
        sel = jnp.pad(sel, ((0, 0), (0, w_pad - w)))  # pad slabs -> block 0
    vec_specs = [
        pl.BlockSpec(
            (1, length, d),
            # bind u per spec (late-binding closure pitfall)
            (lambda u: lambda i, j, sel_ref: (
                sel_ref[i, j * w_per + u], 0, 0
            ))(u),
            memory_space=pltpu.VMEM,
        )
        for u in range(w_per)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, w_pad // w_per),
        in_specs=[
            # full query matrix resident in VMEM (rows read per cell via
            # dynamic sublane slice — a (1, d) block would violate the
            # sublane-divisibility rule)
            pl.BlockSpec(
                (b, d), lambda i, j, sel_ref: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ] + vec_specs,
        # one (1, W, L) block per query row, filled w_per j-rows per cell
        # as the minor grid dim sweeps (the block flushes when i advances)
        out_specs=pl.BlockSpec(
            (1, w_pad, length), lambda i, j, sel_ref: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        _make_slab_kernel(w_per),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, w_pad, length), jnp.float32),
        interpret=interpret,
    )(sel.astype(jnp.int32), queries, *([list_vecs] * w_per))
    return out[:, :w] if w_pad != w else out


def slab_dots(queries: jax.Array, list_vecs: jax.Array, sel: jax.Array):
    """Dispatch: manual-DMA kernel on TPU, interpreter elsewhere (tests).

    The manual ring (slab_dots_manual) measured 574 GB/s effective at the
    msmarco production shape (512 q x 96 slabs x 128 x 384 bf16) where
    the Mosaic per-spec pipeline was BISTABLE — ~500 GB/s in some
    processes, 51 GB/s in others at identical shapes/inputs — with
    bit-identical outputs. The Mosaic variant is kept for interpret-mode
    tests and as a reference implementation.
    """
    if _on_tpu():
        return slab_dots_manual(queries, list_vecs, sel)
    return slab_dots_pallas(queries, list_vecs, sel, interpret=True)


# -- manual-DMA slab scan (experimental alternative to slab_dots) ---------

_MANUAL_GROUP = 8  # slabs per compute group (8-aligned sublane stores)
# DMA ring slots (depth/group groups in flight). Env-overridable for
# on-hardware tuning; must be a multiple of _MANUAL_GROUP so a group's
# slots stay contiguous in the ring. Sweep on v5e (scripts/exp_slab_ring.py):
# msmarco shape (512q x 96 x 128 x 384 bf16) 8/16/32/64 slots ->
# 332/543/551/562 GB/s; SIFT shape (256q x 96 x 128 x 128 bf16) flat at
# ~230 GB/s from 16 up (per-copy issue overhead binds on 32 KB slabs).
# 32 takes the knee on both shapes for <=6 MiB of ring VMEM at the
# largest production slab (f32 128x384).
_MANUAL_DEPTH = int(_os.environ.get("VRT_SLAB_RING_DEPTH", 32))


def _make_manual_slab_kernel(
    w_pad: int, length: int, d: int, slab_bf16: bool, depth: int
):
    """Grid over queries; explicit per-slab HBM->VMEM copies on a
    ``depth``-slot ring, computed in _MANUAL_GROUP-slab batches (one MXU
    dot per group; group stores stay 8-aligned on the sublane axis)."""
    group = _MANUAL_GROUP
    n_groups = w_pad // group

    def kernel(sel_ref, q_ref, vecs_hbm, out_ref):
        i = pl.program_id(0)

        def body(buf, sem):
            def dma(w):
                return pltpu.make_async_copy(
                    vecs_hbm.at[sel_ref[i, w]],
                    buf.at[w % depth],
                    sem.at[w % depth],
                )

            for w in range(min(depth, w_pad)):  # prime the ring
                dma(w).start()

            q = q_ref[pl.ds(i, 1), :]  # [1, d]
            if slab_bf16:
                q_hi = q.astype(jnp.bfloat16)
                q_lo = (q - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)

            def per_group(g, _):
                base = g * group

                def wait_slab(j, _):
                    dma(base + j).wait()
                    return _

                jax.lax.fori_loop(0, group, wait_slab, None)
                # one dot over the whole group: slots are contiguous when
                # depth is a multiple of group (ring phase preserved)
                slot0 = (base % depth)
                rows = buf[pl.ds(slot0, group)].reshape(group * length, d)
                if slab_bf16:
                    dot = sum(
                        jax.lax.dot_general(
                            qq, rows,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        for qq in (q_hi, q_lo)
                    )
                else:
                    dot = jax.lax.dot_general(
                        q, rows,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                out_ref[0, pl.ds(base, group), :] = dot.reshape(group, length)

                # refill the freed slots ONLY AFTER the group's compute
                # has read them: slab w+depth lands in slot (w % depth) —
                # the very slot just consumed — so refilling before the
                # dot is a write-after-read race (caught as maxrelerr 32
                # at one shape; other shapes won the race by timing)
                def refill(j, _):
                    @pl.when(base + j + depth < w_pad)
                    def _():
                        dma(base + j + depth).start()
                    return _

                jax.lax.fori_loop(0, group, refill, None)
                return _

            jax.lax.fori_loop(0, n_groups, per_group, None)

        pl.run_scoped(
            body,
            buf=pltpu.VMEM(
                (depth, length, d),
                jnp.bfloat16 if slab_bf16 else jnp.float32,
            ),
            sem=pltpu.SemaphoreType.DMA((depth,)),
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "depth"))
def slab_dots_manual(
    queries: jax.Array,  # [B, d] f32
    list_vecs: jax.Array,  # [Nb, L, d] f32 or bf16
    sel: jax.Array,  # [B, W] int32, pre-clamped to [0, Nb)
    interpret: bool = False,
    depth: int | None = None,
) -> jax.Array:
    """Manual-DMA variant of :func:`slab_dots_pallas`: same contract,
    explicit ring-buffered copies instead of Mosaic's per-spec pipelining.
    """
    if depth is None:
        depth = _MANUAL_DEPTH
    if depth % _MANUAL_GROUP:
        raise ValueError(f"ring depth {depth} not a multiple of {_MANUAL_GROUP}")
    b, d = queries.shape
    _, length, _ = list_vecs.shape
    w = sel.shape[1]
    w_pad = -(-w // _MANUAL_GROUP) * _MANUAL_GROUP
    if w_pad != w:
        sel = jnp.pad(sel, ((0, 0), (0, w_pad - w)))
    slab_bf16 = list_vecs.dtype == jnp.bfloat16
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (b, d), lambda i, sel_ref: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),  # slabs stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, w_pad, length), lambda i, sel_ref: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        _make_manual_slab_kernel(w_pad, length, d, slab_bf16, depth),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, w_pad, length), jnp.float32),
        interpret=interpret,
    )(sel.astype(jnp.int32), queries, list_vecs)
    return out[:, :w] if w_pad != w else out
