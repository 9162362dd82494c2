"""Exact-search kernel vs NumPy brute-force oracle.

Mirrors the reference's oracle pattern (tests/algorithms/test_covertree_v2_2.py:12-43)
with the tie-aware relaxation SURVEY.md section 7(c) calls for: distance
*values* are compared with tolerance, not raw index order.
"""

import numpy as np
import pytest

from vectordb_retrieval_tpu.ops import distances as dops

import jax.numpy as jnp


def _np_l2(q, x):
    return ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)


@pytest.mark.parametrize("metric", ["l2", "ip"])
@pytest.mark.parametrize("n,d,k", [(257, 17, 5), (1000, 64, 20)])
def test_exact_matches_numpy_oracle(rng, metric, n, d, k):
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((9, d)).astype(np.float32)
    dists, ids = dops.exact_search(jnp.asarray(q), jnp.asarray(x), k, metric=metric)
    dists, ids = np.asarray(dists), np.asarray(ids)

    full = _np_l2(q, x) if metric == "l2" else -(q @ x.T)
    oracle_d = np.sort(full, axis=1)[:, :k]
    np.testing.assert_allclose(np.sort(dists, 1), oracle_d, rtol=1e-2, atol=1e-3)
    # Retrieved distances must equal the distances of the retrieved ids.
    gathered = np.take_along_axis(full, ids, axis=1)
    np.testing.assert_allclose(dists, gathered, rtol=1e-2, atol=1e-3)


def test_streamed_equals_dense(rng):
    x = rng.standard_normal((1000, 32)).astype(np.float32)
    q = rng.standard_normal((8, 32)).astype(np.float32)
    for metric in ("l2", "ip"):
        dd, di = dops._exact_search_dense(
            jnp.asarray(q), jnp.asarray(x), None, 10, metric
        )
        sd, si = dops._exact_search_streamed(
            jnp.asarray(q), jnp.asarray(x), None, 10, metric, 128
        )
        np.testing.assert_allclose(np.asarray(dd), np.asarray(sd), rtol=1e-5)
        assert np.array_equal(np.asarray(di), np.asarray(si))


def test_streamed_handles_ragged_last_chunk(rng):
    x = rng.standard_normal((130, 16)).astype(np.float32)  # 130 = 128 + 2
    q = rng.standard_normal((4, 16)).astype(np.float32)
    d, i = dops._exact_search_streamed(
        jnp.asarray(q), jnp.asarray(x), None, 130, "l2", 128
    )
    i = np.asarray(i)
    assert np.all(i >= 0) and np.all(i < 130)
    assert np.all(np.isfinite(np.asarray(d)))
    # every db row retrieved exactly once when k == n
    for row in i:
        assert len(set(row.tolist())) == 130


def test_normalize_unit_rows(rng):
    x = rng.standard_normal((50, 8)).astype(np.float32)
    n = np.asarray(dops.normalize(jnp.asarray(x)))
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)


def test_k_larger_than_n_raises(rng):
    x = rng.standard_normal((5, 4)).astype(np.float32)
    q = rng.standard_normal((2, 4)).astype(np.float32)
    with pytest.raises(ValueError):
        dops.exact_search(jnp.asarray(q), jnp.asarray(x), 10)


def test_blockmin_path_matches_dense(rng):
    """Large-N blockmin certificate path: exact vs dense oracle."""
    x = rng.standard_normal((2000, 24)).astype(np.float32)
    q = rng.standard_normal((16, 24)).astype(np.float32)
    for metric in ("l2", "ip"):
        bd, bi = dops._exact_search_blockmin(
            jnp.asarray(q), jnp.asarray(x), None, 15, metric, 512
        )
        dd, di = dops._exact_search_dense(
            jnp.asarray(q), jnp.asarray(x), None, 15, metric
        )
        # compare result SETS via distances (tie-aware)
        full = (
            ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
            if metric == "l2" else -(q @ x.T)
        )
        got = np.take_along_axis(full, np.asarray(bi), 1)
        want = np.sort(full, axis=1)[:, :15]
        np.testing.assert_allclose(np.sort(got, 1), want, rtol=1e-3, atol=1e-4)


def test_blockmin_ragged_padding(rng):
    x = rng.standard_normal((1003, 8)).astype(np.float32)
    q = rng.standard_normal((4, 8)).astype(np.float32)
    d, i = dops._exact_search_blockmin(
        jnp.asarray(q), jnp.asarray(x), None, 20, "l2", 512
    )
    i = np.asarray(i)
    assert (i >= 0).all() and (i < 1003).all()
    assert np.all(np.isfinite(np.asarray(d)))


def test_blockmin_pathological_ties(rng):
    """Massive exact ties: returned distances must still be the true k
    smallest (id choice among equals is unspecified, as in the reference)."""
    base = rng.standard_normal((8, 16)).astype(np.float32)
    x = np.repeat(base, 200, axis=0)  # 1600 rows, only 8 distinct points
    q = rng.standard_normal((4, 16)).astype(np.float32)
    d, i = dops._exact_search_blockmin(
        jnp.asarray(q), jnp.asarray(x), None, 250, "l2", 512
    )
    d, i = np.asarray(d), np.asarray(i)
    full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    want = np.sort(full, axis=1)[:, :250]
    np.testing.assert_allclose(np.sort(d, 1), want, rtol=1e-3, atol=1e-3)
    # no duplicate ids per row
    for row in i:
        assert len(set(row.tolist())) == 250


def test_blockmin_wide_widths_match_dense(rng):
    """The certificate holds at any block width: w in {16, 32} (the
    large-N selection optimisation) must return the same result sets."""
    x = rng.standard_normal((3000, 24)).astype(np.float32)
    q = rng.standard_normal((8, 24)).astype(np.float32)
    full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    want = np.sort(full, axis=1)[:, :25]
    for w in (16, 32):
        bd, bi = dops._exact_search_blockmin(
            jnp.asarray(q), jnp.asarray(x), None, 25, "l2", 512, w=w
        )
        got = np.take_along_axis(full, np.asarray(bi), 1)
        np.testing.assert_allclose(np.sort(got, 1), want, rtol=1e-3, atol=1e-4)


def test_blockmin_width_rule():
    """Width ramps 8 -> 32 with N (v5e sweep, exp_blockmin_width.py)."""
    assert dops.blockmin_width(100_000) == 8
    assert dops.blockmin_width(262_144) == 8
    assert dops.blockmin_width(524_288) == 16
    assert dops.blockmin_width(600_000) == 32
    assert dops.blockmin_width(1_000_000) == 32
    assert dops.blockmin_width(100_000_000) == 32


def test_exact_paths_agree_randomized(rng):
    """Randomized shapes: dense / streamed / blockmin return the same
    result sets (distance-compared)."""
    for _ in range(3):
        n = int(rng.integers(600, 3000))
        d = int(rng.integers(8, 48))
        k = int(rng.integers(1, 24))
        x = rng.standard_normal((n, d)).astype(np.float32)
        q = rng.standard_normal((5, d)).astype(np.float32)
        xd, qd = jnp.asarray(x), jnp.asarray(q)
        full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
        want = np.sort(full, axis=1)[:, :k]
        for fn in (
            lambda: dops._exact_search_dense(qd, xd, None, k, "l2", None),
            lambda: dops._exact_search_streamed(qd, xd, None, k, "l2", 512),
            lambda: dops._exact_search_blockmin(qd, xd, None, k, "l2", 512),
        ):
            _, ids = fn()
            got = np.take_along_axis(full, np.asarray(ids), 1)
            np.testing.assert_allclose(
                np.sort(got, 1), want, rtol=1e-3, atol=1e-3
            )


def test_blockmin_pallas_stage1_matches_xla_scan(rng):
    """The Pallas stage-1 (3-pass HIGH-equivalent kernel) and the XLA scan
    must produce identical exact-search results — same certificate, same
    exact rescore (interpreter mode on CPU)."""
    from vectordb_retrieval_tpu.ops import distances as dops

    db = jnp.asarray(rng.standard_normal((30_000, 48)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((24, 48)).astype(np.float32))
    orig = dops.FORCE_PALLAS_STAGE1_INTERPRET
    try:
        for metric in ("l2", "ip"):
            dops.FORCE_PALLAS_STAGE1_INTERPRET = True
            v1, i1 = dops._exact_search_blockmin(
                q, db, None, 10, metric, 8192, w=8
            )
            dops.FORCE_PALLAS_STAGE1_INTERPRET = False
            v0, i0 = dops._exact_search_blockmin(
                q, db, None, 10, metric, 8192, w=8
            )
            np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
            np.testing.assert_allclose(
                np.asarray(v0), np.asarray(v1), rtol=0, atol=0
            )
    finally:
        dops.FORCE_PALLAS_STAGE1_INTERPRET = orig


def test_select_blocks_hierarchical_matches_flat(rng):
    """The hierarchical wide-row selection must return the same block set
    as a flat top-k (modulo exact-tie ordering)."""
    from vectordb_retrieval_tpu.ops.distances import (
        _SEL_FLAT_MAX,
        _select_blocks,
        top_k_smallest,
    )

    g = _SEL_FLAT_MAX * 2 + 36  # force the hierarchical branch + padding
    bm = jnp.asarray(rng.standard_normal((8, g)).astype(np.float32))
    blk = np.asarray(_select_blocks(bm, 64))
    _, ref = top_k_smallest(bm, 64)
    bm_np = np.asarray(bm)
    for r in range(8):
        got = np.sort(bm_np[r][blk[r]])
        want = np.sort(bm_np[r][np.asarray(ref)[r]])
        np.testing.assert_allclose(got, want, rtol=0, atol=0)
