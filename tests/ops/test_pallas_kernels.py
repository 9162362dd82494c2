"""Pallas kernels vs XLA reference (interpreter mode on CPU hosts)."""

import numpy as np

import jax.numpy as jnp

from vectordb_retrieval_tpu.ops.kmeans import kmeans_assign
from vectordb_retrieval_tpu.ops.pallas_kernels import kmeans_assign_fused


def test_pallas_assign_matches_xla(rng):
    x = jnp.asarray(rng.standard_normal((1000, 32)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    a_pallas, d_pallas = kmeans_assign_fused(x, c)
    a_xla = kmeans_assign(x, c)
    # identical up to exact distance ties
    agree = (np.asarray(a_pallas) == np.asarray(a_xla)).mean()
    assert agree > 0.999
    assert np.all(np.asarray(d_pallas) >= -1e-3)


def test_pallas_assign_ragged_rows(rng):
    x = jnp.asarray(rng.standard_normal((1030, 16)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((16, 16)).astype(np.float32))
    a, d = kmeans_assign_fused(x, c)
    assert a.shape == (1030,) and d.shape == (1030,)
    assert int(jnp.max(a)) < 16 and int(jnp.min(a)) >= 0


def test_pallas_blockmin_matches_oracle(rng):
    from vectordb_retrieval_tpu.ops.pallas_kernels import (
        _BM_TILE,
        blockmin_pallas,
    )

    n, d, w = 4096, 32, 8
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((8, d)).astype(np.float32))
    bm = np.asarray(blockmin_pallas(q, x, w=w, interpret=True))
    tile = min(_BM_TILE, n)
    seg = tile // w
    full = ((np.asarray(q)[:, None, :] - np.asarray(x)[None, :, :]) ** 2).sum(-1)
    for g in range(0, bm.shape[1], 97):  # spot-check blocks
        ti, j = g // seg, g % seg
        rows = [ti * tile + j + i * seg for i in range(w)]
        want = full[:, rows].min(-1)
        np.testing.assert_allclose(bm[:, g], want, rtol=1e-3, atol=1e-3)


def test_slab_dots_matches_gather_einsum(rng):
    from vectordb_retrieval_tpu.ops.pallas_kernels import slab_dots_pallas

    b, w, nb, length, d = 16, 4, 12, 8, 128
    q = rng.standard_normal((b, d)).astype(np.float32)
    lv = rng.standard_normal((nb, length, d)).astype(np.float32)
    sel = rng.integers(0, nb, (b, w)).astype(np.int32)
    out = np.asarray(
        slab_dots_pallas(
            jnp.asarray(q), jnp.asarray(lv), jnp.asarray(sel),
            interpret=True,
        )
    )
    ref = np.einsum(
        "bwld,bd->bwl", lv.astype(np.float64)[sel], q.astype(np.float64)
    )
    assert out.shape == (b, w, length)
    assert np.max(np.abs(out - ref)) < 1e-3


def test_slab_dots_bf16_storage(rng):
    from vectordb_retrieval_tpu.ops.pallas_kernels import slab_dots_pallas

    b, w, nb, length, d = 8, 4, 6, 8, 128
    q = rng.standard_normal((b, d)).astype(np.float32)
    lv = rng.standard_normal((nb, length, d)).astype(np.float32)
    sel = rng.integers(0, nb, (b, w)).astype(np.int32)
    out = np.asarray(
        slab_dots_pallas(
            jnp.asarray(q), jnp.asarray(lv, dtype=jnp.bfloat16),
            jnp.asarray(sel), interpret=True,
        )
    )
    # split-query 2-pass: the dot is the FULL f32 query against the
    # bf16-rounded slabs (query rounding never touches the ranking)
    ref = np.einsum(
        "bwld,bd->bwl",
        np.asarray(
            jnp.asarray(lv, dtype=jnp.bfloat16).astype(jnp.float32)
        )[sel].astype(np.float64),
        q.astype(np.float64),
    )
    assert out.dtype == np.float32
    # two exact bf16 passes with f32 accumulation: ~2^-16 relative error
    assert np.max(np.abs(out - ref) / (np.abs(ref) + 1.0)) < 1e-3


def test_slab_dots_w_padding(rng):
    # w=5 with w_per>1 exercises the pad-to-multiple path
    from vectordb_retrieval_tpu.ops.pallas_kernels import slab_dots_pallas

    b, w, nb, length, d = 8, 5, 7, 8, 128
    q = rng.standard_normal((b, d)).astype(np.float32)
    lv = rng.standard_normal((nb, length, d)).astype(np.float32)
    sel = rng.integers(0, nb, (b, w)).astype(np.int32)
    out = np.asarray(
        slab_dots_pallas(
            jnp.asarray(q), jnp.asarray(lv), jnp.asarray(sel),
            interpret=True,
        )
    )
    ref = np.einsum(
        "bwld,bd->bwl", lv.astype(np.float64)[sel], q.astype(np.float64)
    )
    assert out.shape == (b, w, length)
    assert np.max(np.abs(out - ref)) < 1e-3


def test_slab_cell_packing_rules():
    """w_per must be a multiple of 8 (Mosaic sublane-store alignment) and
    cells should pack without padding waste: 48 slabs under a 40-slab cap
    is 2 cells of 24, not 2 cells of 40 with 32 junk slabs."""
    from vectordb_retrieval_tpu.ops import pallas_kernels as pk

    def pack(w, cap):
        cap8 = (cap // 8) * 8
        n_cells = -(-w // cap8)
        per_cell = -(-w // n_cells)
        w_per = min(cap8, -(-per_cell // 8) * 8)
        return w_per, -(-w // w_per) * w_per

    for w in (8, 12, 16, 24, 40, 48, 96):
        for cap in (16, 40, 80):
            w_per, w_pad = pack(w, cap)
            assert w_per % 8 == 0
            assert w_pad >= w
            assert w_per <= max(8, (cap // 8) * 8)
    # the specific regression: 48 under cap 40 -> 24-slab cells, no waste
    assert pack(48, 40) == (24, 48)
    # gate: shapes with <8 slabs in VMEM never route to the kernel
    assert not pk.slab_kernel_ok(1024, 384, 4)
    assert pk.slab_kernel_ok(128, 384, 2)


def test_dist_blockmin_modes_match_oracle(rng):
    from vectordb_retrieval_tpu.ops.pallas_kernels import (
        dist_blockmin_pad_rows,
        dist_blockmin_pallas,
    )

    for n, d, b, w in [(4096, 128, 16, 8), (2000, 64, 8, 32), (8192, 96, 24, 16)]:
        s = dist_blockmin_pad_rows(n, w)
        db = rng.standard_normal((n, d)).astype(np.float32)
        dbp = np.zeros((s, d), np.float32)
        dbp[:n] = db
        pen = np.full((s,), np.inf, np.float32)
        pen[:n] = (db * db).sum(1)
        q = rng.standard_normal((b, d)).astype(np.float32)
        sc = pen[None, :] - 2.0 * (q @ dbp.T)
        ref = sc.reshape(b, s // w, w).min(-1)
        fin = np.isfinite(ref)

        out = np.asarray(
            dist_blockmin_pallas(
                jnp.asarray(q),
                jnp.asarray(dbp),
                jnp.asarray(pen).reshape(s // w, w),
                w=w,
                interpret=True,
            )
        )
        assert out.shape == (b, s // w)
        # f32 3-pass: HIGH-equivalent numerics
        assert np.abs(out - ref)[fin].max() < 2e-3

        out16 = np.asarray(
            dist_blockmin_pallas(
                jnp.asarray(q).astype(jnp.bfloat16),
                jnp.asarray(dbp).astype(jnp.bfloat16),
                jnp.asarray(pen).reshape(s // w, w),
                w=w,
                interpret=True,
            )
        )
        scale = np.abs(ref[fin]).max()
        assert np.abs(out16 - ref)[fin].max() / scale < 2e-2

        dbu = rng.integers(0, 256, (s, d)).astype(np.uint8)
        scu = pen[None, :] - 2.0 * (q @ dbu.astype(np.float32).T)
        refu = scu.reshape(b, s // w, w).min(-1)
        outu = np.asarray(
            dist_blockmin_pallas(
                jnp.asarray(q).astype(jnp.bfloat16),
                jnp.asarray(dbu),
                jnp.asarray(pen).reshape(s // w, w),
                w=w,
                interpret=True,
            )
        )
        finu = np.isfinite(refu)
        assert (
            np.abs(outu - refu)[finu].max() / (np.abs(refu[finu]).max() + 1e-9)
            < 2e-2
        )


def test_dist_blockmin_rejects_unaligned(rng):
    import pytest

    from vectordb_retrieval_tpu.ops.pallas_kernels import dist_blockmin_pallas

    q = jnp.zeros((4, 32), jnp.float32)
    db = jnp.zeros((100, 32), jnp.float32)  # 100 % (8*8) != 0
    pen = jnp.zeros((100 // 8 + 1, 8), jnp.float32)
    with pytest.raises(ValueError):
        dist_blockmin_pallas(q, db, pen, w=8, interpret=True)
