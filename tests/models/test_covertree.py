"""CoverTree: exactness oracle, counters, persistence round-trip.

Mirrors reference tests/algorithms/test_covertree_v2_2.py with the tie-aware
relaxation (distances compared, not raw index order — SURVEY.md s7(c)).
"""

import os

import numpy as np
import pytest

from vectordb_retrieval_tpu.models import get_algorithm_instance


def _data(rng, n=500, d=16, nq=12):
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    return x, q


@pytest.mark.parametrize("k", [1, 5, 20])
def test_covertree_equals_bruteforce(rng, k):
    x, q = _data(rng)
    algo = get_algorithm_instance("CoverTreeV2_2", 16, metric="l2")
    algo.build_index(x)
    d, i = algo.batch_search(q, k)
    full = np.sqrt(((q[:, None, :] - x[None, :, :]) ** 2).sum(-1))
    oracle_d = np.sort(full, axis=1)[:, :k]
    # exactness: the retrieved distance values must match brute force
    np.testing.assert_allclose(np.sort(d, 1), oracle_d, rtol=1e-3, atol=1e-3)
    # and the retrieved ids must actually have those distances
    np.testing.assert_allclose(
        d, np.take_along_axis(full, i, 1), rtol=1e-3, atol=1e-3
    )


def test_covertree_batch_shapes(rng):
    x, q = _data(rng, n=200)
    algo = get_algorithm_instance("covertree", 16)
    algo.build_index(x)
    d, i = algo.batch_search(q, 7)
    assert d.shape == (12, 7) and i.shape == (12, 7)


def test_covertree_ndis_counter(rng):
    x, q = _data(rng, n=300)
    algo = get_algorithm_instance("covertree", 16)
    algo.build_index(x)
    algo.batch_search(q, 5)
    ops = algo.get_operations()
    assert ops["ndis"] > 0
    # pruning should beat brute force on average for small k
    assert ops["ndis"] < 12 * 300 * 2


def test_covertree_cosine_exact(rng):
    x, q = _data(rng)
    algo = get_algorithm_instance("covertree", 16, metric="cosine")
    algo.build_index(x)
    d, i = algo.batch_search(q, 10)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sim = qn @ xn.T
    oracle = np.sort(-sim, axis=1)[:, :10]
    np.testing.assert_allclose(np.sort(d, 1), oracle, rtol=1e-2, atol=1e-3)


def test_covertree_persistence_roundtrip(tmp_path, rng):
    x, q = _data(rng, n=200)
    algo = get_algorithm_instance("covertree", 16)
    algo.build_index(x)
    d0, i0 = algo.batch_search(q, 5)
    ctx = {"dataset_fingerprint": "fpX", "config_hash": "chX"}
    algo.save_index(str(tmp_path / "ct"), ctx)

    algo2 = get_algorithm_instance("covertree", 16)
    algo2.load_index(str(tmp_path / "ct"), ctx)
    d1, i1 = algo2.batch_search(q, 5)
    np.testing.assert_allclose(d0, d1, rtol=1e-5)
    assert np.array_equal(i0, i1)


def test_covertree_persistence_validation(tmp_path, rng):
    x, _ = _data(rng, n=100)
    algo = get_algorithm_instance("covertree", 16)
    algo.build_index(x)
    path = str(tmp_path / "ct")
    algo.save_index(path, {"dataset_fingerprint": "A"})

    with pytest.raises(ValueError, match="fingerprint"):
        get_algorithm_instance("covertree", 16).load_index(
            path, {"dataset_fingerprint": "B"}
        )
    with pytest.raises(ValueError, match="metric"):
        get_algorithm_instance("covertree", 16, metric="cosine").load_index(
            path, {"dataset_fingerprint": "A"}
        )
    os.remove(os.path.join(path, "WRITE_COMPLETE"))
    with pytest.raises(ValueError, match="incomplete"):
        get_algorithm_instance("covertree", 16).load_index(path, {})


def test_covertree_exact_radii_cover_subtrees(rng):
    """Stored radii must truly cover every node's subtree (the pruning
    soundness invariant) and be tighter than the analytic 2^(level+1)."""
    from vectordb_retrieval_tpu.models.covertree import (
        build_cover_tree,
        cap_fanout,
        exact_subtree_radii,
        node_depths,
    )

    x, _ = _data(rng, n=400)
    levels, child_lists, root = build_cover_tree(x)
    point_ids, analytic, is_real, kids = cap_fanout(x, levels, child_lists)
    radii = exact_subtree_radii(x, point_ids, kids, root)

    # every descendant of v lies within radii[v] of v's point (f64 check)
    pid = np.asarray(point_ids, np.int64)
    xs = x.astype(np.float64)
    desc = [list(c) for c in kids]
    depth = node_depths(kids, root)
    for v in np.argsort(-depth):  # deepest first: accumulate descendants
        for c in kids[v]:
            desc[v].extend(desc[c])
    for v in range(len(kids)):
        if not desc[v]:
            continue
        dd = np.linalg.norm(xs[pid[desc[v]]] - xs[pid[v]], axis=1)
        assert dd.max() <= radii[v] * (1 + 1e-6), (v, dd.max(), radii[v])
    # tighter on average than the analytic bound
    parents = np.asarray([v for v in range(len(kids)) if kids[v]])
    assert np.median(radii[parents] / analytic[parents]) < 1.0


def test_stream_band_covers_mxu_error(rng):
    """The certified band must cover the MXU's bf16-input dot error
    (emulated here with an explicit bf16 round-trip of the inputs, which
    upper-bounds the TPU DEFAULT-precision truncation)."""
    import jax.numpy as jnp

    from vectordb_retrieval_tpu.ops.covertree import DEFAULT_ERR_C

    q = rng.standard_normal((64, 384)).astype(np.float32) * 3.0
    x = rng.standard_normal((512, 384)).astype(np.float32)
    dot_bf = np.asarray(
        jnp.asarray(q).astype(jnp.bfloat16).astype(jnp.float32)
        @ jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32).T
    )
    dot_true = q.astype(np.float64) @ x.astype(np.float64).T
    bound = (
        DEFAULT_ERR_C
        * np.linalg.norm(q, axis=1)[:, None]
        * np.linalg.norm(x, axis=1)[None, :]
    )
    assert np.all(np.abs(dot_bf - dot_true) <= bound)


def test_stream_certificate_fallback_keeps_exactness(rng):
    """A deliberately huge error band makes the certificate fail for every
    query; batch_search must then fall back to the exact scan (flagged via
    the ndis counter jumping to ~N per query) and stay exact."""
    x, q = _data(rng, n=400)
    algo = get_algorithm_instance("covertree", 16, err_c=0.5, kprime=5)
    algo.build_index(x)
    d, i = algo.batch_search(q, 5)
    full = np.sqrt(((q[:, None, :] - x[None, :, :]) ** 2).sum(-1))
    oracle_d = np.sort(full, axis=1)[:, :5]
    np.testing.assert_allclose(np.sort(d, 1), oracle_d, rtol=1e-3, atol=1e-3)
    # the fallback's ndis accounting: n_fallback_queries * N on top
    assert algo.get_operations()["ndis"] >= 12 * 400


def test_covertree_device_kernel_matches_batch_search(rng):
    import jax
    import jax.numpy as jnp

    x, q = _data(rng, n=300)
    algo = get_algorithm_instance("covertree", 16, metric="l2")
    algo.build_index(x)
    d0, i0 = algo.batch_search(q, 5)
    assert algo.has_device_kernel
    d1, i1 = jax.jit(algo.device_kernel, static_argnums=1)(
        jnp.asarray(q), 5
    )
    np.testing.assert_allclose(d0, np.asarray(d1), rtol=1e-5, atol=1e-6)
    assert np.array_equal(i0, np.asarray(i1).astype(np.int64))


def test_covertree_duplicate_points(rng):
    x, _ = _data(rng, n=50)
    x = np.concatenate([x, x[:10]], axis=0)  # exact duplicates
    algo = get_algorithm_instance("covertree", 16)
    algo.build_index(x)
    d, i = algo.batch_search(x[:5], 1)
    np.testing.assert_allclose(d[:, 0], 0.0, atol=1e-3)


def test_stream_multichunk_and_alignment(rng, monkeypatch):
    """Exactness must survive chunked depth walks: shrink the stream chunk
    so deep depths split across several chunks (and partial tail chunks),
    exercising the block-aligned layout contract (every chunk start is a
    multiple of the blockmin width) and the cross-chunk kth-bound fold."""
    from vectordb_retrieval_tpu.ops import covertree as ctops

    monkeypatch.setattr(ctops, "_STREAM_CHUNK", 64)
    x, q = _data(rng, n=700, d=12, nq=9)
    algo = get_algorithm_instance("covertree", 12)
    algo.build_index(x)
    # layout contract: padded depth sizes, aligned offsets
    sizes = algo.artifact.metadata["depth_sizes"]
    assert all(s % ctops.SLAB_ALIGN == 0 for s in sizes)
    assert sum(sizes) == int(algo.artifact.data["slab"].shape[0])
    d, i = algo.batch_search(q, 8)
    full = np.sqrt(((q[:, None, :] - x[None, :, :]) ** 2).sum(-1))
    oracle_d = np.sort(full, axis=1)[:, :8]
    np.testing.assert_allclose(np.sort(d, 1), oracle_d, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        d, np.take_along_axis(full, i, 1), rtol=1e-3, atol=1e-3
    )
    # pad rows are inert: ndis never exceeds real scored work
    assert algo.get_operations()["ndis"] <= 9 * sum(sizes)


def test_stream_rejects_unaligned_layout(rng):
    """Direct ops-level callers must get a clear error for unaligned
    depth blocks rather than silently mis-mapped candidate blocks."""
    import jax.numpy as jnp

    from vectordb_retrieval_tpu.ops import covertree as ctops

    m, d = 72, 8
    x = jnp.asarray(rng.standard_normal((m, d)), jnp.float32)
    with pytest.raises(ValueError, match="not aligned"):
        ctops.covertree_stream_search(
            x[:4],
            x,
            jnp.arange(m, dtype=jnp.int32),
            jnp.ones((m,), bool),
            jnp.zeros((m,), jnp.float32),
            jnp.zeros((m,), jnp.int32),
            depth_sizes=(1, 71),
            k=3,
            kprime=8,
        )


# -- block-granular walk (ops/covertree.covertree_blockwalk_search) ------


def _blockwalk_tree(rng, n=800, d=16):
    x, q = _data(rng, n=n, d=d)
    algo = get_algorithm_instance(
        "covertree", d, metric="l2", descent="blockwalk"
    )
    algo.build_index(x)
    return x, q, algo


def test_blockwalk_equals_bruteforce(rng):
    # CPU: the Pallas stage-1 runs in interpreter mode automatically
    x, q, algo = _blockwalk_tree(rng)
    for k in (1, 5, 20):
        d, i = algo.batch_search(q, k)
        full = np.sqrt(((q[:, None, :] - x[None, :, :]) ** 2).sum(-1))
        oracle_d = np.sort(full, axis=1)[:, :k]
        np.testing.assert_allclose(
            np.sort(d, 1), oracle_d, rtol=1e-3, atol=1e-3
        )
        np.testing.assert_allclose(
            d, np.take_along_axis(full, i, 1), rtol=1e-3, atol=1e-3
        )


def test_blockwalk_matches_stream_walk(rng):
    x, q, algo = _blockwalk_tree(rng)
    d_b, i_b = algo.batch_search(q, 10)
    algo_s = get_algorithm_instance(
        "covertree", 16, metric="l2", descent="stream"
    )
    algo_s.build_index(x)
    d_s, _ = algo_s.batch_search(q, 10)
    # same tree, same exactness contract: identical distance multisets
    np.testing.assert_allclose(np.sort(d_b, 1), np.sort(d_s, 1),
                               rtol=1e-4, atol=1e-4)


def test_blockwalk_ndis_honest(rng):
    x, q, algo = _blockwalk_tree(rng)
    algo.batch_search(q, 5)
    ops = algo.get_operations()
    n_nodes = int(algo.artifact.metadata["n_nodes"])
    # alive blocks can never exceed the slab, and must cover >= k rows/query
    assert 5 * len(q) <= ops["ndis"] <= len(q) * n_nodes


def test_blockwalk_overflow_flags_when_band_absurd(rng):
    # an absurd error band makes the certificate unsatisfiable -> the
    # search must FLAG (and the model fall back), never silently miss
    from vectordb_retrieval_tpu.ops import covertree as ctops

    x, q, algo = _blockwalk_tree(rng, n=400)
    data = algo.artifact.data
    meta = algo.artifact.metadata
    import jax.numpy as jnp

    res = ctops.covertree_blockwalk_search(
        jnp.asarray(q),
        data["slab"], data["point_ids"], data["is_real"],
        data["radii"], data["parent_rel"],
        depth_sizes=tuple(meta["depth_sizes"]),
        k=5, kprime=64, err_c=10.0,
    )
    assert bool(np.asarray(res.overflow).any())
    # and the model-level search stays exact via the fallback
    d, i = algo.batch_search(q, 5)
    full = np.sqrt(((q[:, None, :] - x[None, :, :]) ** 2).sum(-1))
    np.testing.assert_allclose(
        np.sort(d, 1), np.sort(full, axis=1)[:, :5], rtol=1e-3, atol=1e-3
    )
