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
