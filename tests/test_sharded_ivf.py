"""Sharded IVF on the virtual 8-device mesh: recall vs single-device IVF."""

import jax.numpy as jnp
import numpy as np

from vectordb_retrieval_tpu.bench.metrics import recall_at_k
from vectordb_retrieval_tpu.parallel import make_mesh
from vectordb_retrieval_tpu.parallel.sharded_ivf import (
    build_sharded_ivf_flat,
    sharded_ivf_flat_search,
)


def test_sharded_ivf_flat_recall(rng):
    x = rng.standard_normal((4000, 32)).astype(np.float32)
    q = rng.standard_normal((16, 32)).astype(np.float32)
    full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(full, axis=1)[:, :10]

    mesh = make_mesh(8)
    data, meta = build_sharded_ivf_flat(x, mesh, nlist=8, seed=3)
    assert meta["n_shards"] == 8
    nb = meta["n_buckets"]  # bucketed layout: probe counts are in buckets
    d, i = sharded_ivf_flat_search(jnp.asarray(q), data, 10, nb, mesh)
    i = np.asarray(i)
    # probing all buckets per shard == exact
    assert recall_at_k(gt, i, 10) == 1.0
    # partial probe (3 of 8 lists' worth of buckets) still decent
    d2, i2 = sharded_ivf_flat_search(
        jnp.asarray(q), data, 10, max(1, 3 * nb // 8), mesh
    )
    assert recall_at_k(gt, np.asarray(i2), 10) > 0.6


def test_sharded_ivf_global_ids(rng):
    x = rng.standard_normal((1000, 16)).astype(np.float32)
    mesh = make_mesh(8)
    data, meta = build_sharded_ivf_flat(x, mesh, nlist=4, seed=1)
    q = jnp.asarray(x[:8])
    d, i = sharded_ivf_flat_search(q, data, 1, meta["n_buckets"], mesh)
    # self-retrieval across shard boundaries proves global id mapping
    assert list(np.asarray(i)[:, 0]) == list(range(8))


def test_sharded_ivf_sq8_recall(rng):
    from vectordb_retrieval_tpu.parallel import (
        build_sharded_ivf_coded,
        sharded_ivf_coded_search,
    )

    x = rng.standard_normal((4000, 32)).astype(np.float32)
    q = rng.standard_normal((16, 32)).astype(np.float32)
    full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(full, axis=1)[:, :10]

    mesh = make_mesh(8)
    data, meta = build_sharded_ivf_coded(x, mesh, nlist=8, coding="sq8", seed=3)
    assert meta["coding"] == "sq8"
    nb = meta["n_buckets"]
    d, i = sharded_ivf_coded_search(
        jnp.asarray(q), data, 10, nb, mesh, coding="sq8"
    )
    # all-probe SQ8: near-exact (8-bit quantisation noise only)
    assert recall_at_k(gt, np.asarray(i), 10) > 0.95
    d2, i2 = sharded_ivf_coded_search(
        jnp.asarray(q), data, 10, max(1, 3 * nb // 8), mesh, coding="sq8"
    )
    assert recall_at_k(gt, np.asarray(i2), 10) > 0.6


def test_sharded_ivf_pq_recall(rng):
    from vectordb_retrieval_tpu.parallel import (
        build_sharded_ivf_coded,
        sharded_ivf_coded_search,
    )

    x = rng.standard_normal((4000, 32)).astype(np.float32)
    q = rng.standard_normal((16, 32)).astype(np.float32)
    full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(full, axis=1)[:, :10]

    mesh = make_mesh(8)
    data, meta = build_sharded_ivf_coded(
        x, mesh, nlist=8, coding="pq", m=16, seed=3
    )
    d, i = sharded_ivf_coded_search(
        jnp.asarray(q), data, 10, meta["n_buckets"], mesh, coding="pq"
    )
    # PQ16 on 32d residuals: lossy but well above chance
    assert recall_at_k(gt, np.asarray(i), 10) > 0.5


def test_sharded_coded_global_ids(rng):
    from vectordb_retrieval_tpu.parallel import (
        build_sharded_ivf_coded,
        sharded_ivf_coded_search,
    )

    x = rng.standard_normal((1000, 16)).astype(np.float32)
    mesh = make_mesh(8)
    data, meta = build_sharded_ivf_coded(x, mesh, nlist=4, coding="sq8", seed=1)
    q = jnp.asarray(x[:8])
    d, i = sharded_ivf_coded_search(
        q, data, 1, meta["n_buckets"], mesh, coding="sq8"
    )
    # self-retrieval across shard boundaries proves global id mapping
    assert list(np.asarray(i)[:, 0]) == list(range(8))


def test_sharded_exact_nprobe_semantics(rng):
    """Exact 'probe nprobe LISTS per shard' semantics vs a NumPy oracle
    on a skewed corpus (one cluster owns 60% of rows — the shape where
    the generous bucket budget and the reference semantics diverge)."""
    d_dim, npl, k = 24, 2, 10
    centers = (rng.standard_normal((6, d_dim)) * 8).astype(np.float32)
    sizes = [2400, 320, 320, 320, 320, 320]
    x = np.concatenate(
        [centers[j] + rng.standard_normal((s, d_dim)) for j, s in enumerate(sizes)]
    ).astype(np.float32)
    x = x[rng.permutation(len(x))]
    q = (
        centers[rng.integers(0, 6, 16)]
        + rng.standard_normal((16, d_dim))
    ).astype(np.float32)

    mesh = make_mesh(4)
    data, meta = build_sharded_ivf_flat(x, mesh, nlist=6, seed=3)
    budget = int(meta["probe_cum"][npl - 1])
    de, ie = sharded_ivf_flat_search(
        jnp.asarray(q), data, k, budget, mesh,
        nlist=int(meta["nlist"]), nprobe_lists=npl,
    )
    de, ie = np.asarray(de), np.asarray(ie)

    # oracle: per shard, rank LISTS by min bucket-centroid distance, keep
    # the npl nearest, score every member row of their buckets exactly
    cents = np.asarray(data["centroids"])  # [S, nb, d]
    bls = np.asarray(data["bucket_lists"])  # [S, nb]
    slots = np.asarray(data["slot_ids"])  # [S, nb, L]
    n_shards, nb, _ = cents.shape
    oracle = np.full((16, k), np.inf)
    for s in range(n_shards):
        cd = ((q[:, None, :] - cents[s][None]) ** 2).sum(-1)  # [16, nb]
        ld = np.full((16, meta["nlist"]), np.inf)
        for l in range(meta["nlist"]):
            m = bls[s] == l
            if m.any():
                ld[:, l] = cd[:, m].min(1)
        top_l = np.argsort(ld, axis=1)[:, :npl]
        for qi in range(16):
            allowed = np.isin(bls[s], top_l[qi])
            rows = slots[s][allowed].reshape(-1)
            rows = rows[rows >= 0]
            if rows.size == 0:
                continue
            dd = ((q[qi] - x[rows]) ** 2).sum(-1)
            merged = np.sort(np.concatenate([oracle[qi], dd]))[:k]
            oracle[qi] = merged
    np.testing.assert_allclose(np.sort(de, 1), oracle, rtol=2e-3, atol=2e-3)

    # the generous bucket budget is a recall superset: at the same budget
    # it may only add coverage, never lose it
    dg, ig = sharded_ivf_flat_search(jnp.asarray(q), data, k, budget, mesh)
    assert np.all(np.sort(np.asarray(dg), 1) <= np.sort(de, 1) + 1e-3)


def test_sharded_ivf_pq_rotations_recall(rng):
    """Per-shard per-list residual rotations (pq_rotations) must beat the
    plain per-shard PQ payload on per-list anisotropic data — the sharded
    analogue of tests/ops/test_pq_rotations.py's end-to-end check."""
    from vectordb_retrieval_tpu.bench.metrics import recall_at_k
    from vectordb_retrieval_tpu.parallel import (
        build_sharded_ivf_coded,
        sharded_ivf_coded_search,
    )

    d_dim, nlist = 32, 4
    scales = np.concatenate(
        [np.full(2, 3.0), np.full(d_dim - 2, 0.05)]
    ).astype(np.float32)
    centers = (rng.standard_normal((nlist, d_dim)) * 10).astype(np.float32)
    parts = []
    for l in range(nlist):
        qm, _ = np.linalg.qr(rng.standard_normal((d_dim, d_dim)))
        z = rng.standard_normal((1200, d_dim)).astype(np.float32) * scales
        parts.append(centers[l] + z @ qm.T.astype(np.float32))
    x = np.concatenate(parts).astype(np.float32)
    x = x[rng.permutation(len(x))]
    q = x[:16] + 0.01 * rng.standard_normal((16, d_dim)).astype(np.float32)
    full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(full, axis=1)[:, :10]

    mesh = make_mesh(8)
    rec = {}
    for bs in (0, 8):
        data, meta = build_sharded_ivf_coded(
            x, mesh, nlist=nlist, coding="pq", m=16, seed=3, pq_rotations=bs
        )
        assert ("list_rotations" in data) == bool(bs)
        _, i = sharded_ivf_coded_search(
            jnp.asarray(q), data, 10, meta["n_buckets"], mesh, coding="pq"
        )
        rec[bs] = recall_at_k(gt, np.asarray(i), 10)
    assert rec[8] > rec[0] + 0.02, rec
