"""Sharded graph search on the virtual 8-device mesh."""

import jax.numpy as jnp
import numpy as np

from vectordb_retrieval_tpu.bench.metrics import recall_at_k
from vectordb_retrieval_tpu.parallel import (
    build_sharded_graph,
    make_mesh,
    sharded_graph_search,
)


def test_sharded_graph_recall(rng):
    x = rng.standard_normal((4000, 32)).astype(np.float32)
    q = rng.standard_normal((16, 32)).astype(np.float32)
    full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(full, axis=1)[:, :10]

    mesh = make_mesh(8)
    data, meta = build_sharded_graph(x, mesh, M=8, seed=3)
    assert meta["n_shards"] == 8
    d, i = sharded_graph_search(
        jnp.asarray(q), data, x.shape[0], 10, mesh, ef=128
    )
    i = np.asarray(i)
    assert ((i >= -1) & (i < x.shape[0])).all()
    # 8 independent 500-row graphs with wide beams: high recall
    assert recall_at_k(gt, i, 10) > 0.85


def test_sharded_graph_ragged_rows(rng):
    """N not divisible by n_shards: sentinel rows must never surface."""
    x = rng.standard_normal((1003, 16)).astype(np.float32)
    mesh = make_mesh(8)
    data, _ = build_sharded_graph(x, mesh, M=4, seed=1)
    q = jnp.asarray(x[-8:])  # includes rows in the ragged final shard
    d, i = sharded_graph_search(q, data, x.shape[0], 5, mesh, ef=64)
    i = np.asarray(i)
    d = np.asarray(d)
    assert (i < x.shape[0]).all()
    finite = np.isfinite(d)
    assert (i[finite] >= 0).all()
    # self-retrieval: each query's own row is its nearest neighbour
    assert list(i[:, 0]) == list(range(1003 - 8, 1003))


def test_sharded_graph_model_layer(rng):
    """ShardedGraphIndexer + ANNSearcher end-to-end via CompositeAlgorithm."""
    from vectordb_retrieval_tpu.models.composite import CompositeAlgorithm

    x = rng.standard_normal((2000, 24)).astype(np.float32)
    q = rng.standard_normal((8, 24)).astype(np.float32)
    full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(full, axis=1)[:, :5]

    algo = CompositeAlgorithm(
        dimension=24,
        indexer={"type": "ShardedGraphIndexer", "M": 8},
        searcher={"type": "ANNSearcher", "efSearch": 100},
        metric="l2",
    )
    algo.build_index(x)
    _, ids = algo.batch_search(q, 5)
    assert recall_at_k(gt, ids, 5) > 0.8


def test_sharded_ivf_model_layer(rng):
    """ShardedIVFIndexer end-to-end for each payload coding."""
    from vectordb_retrieval_tpu.models.composite import CompositeAlgorithm

    x = rng.standard_normal((2000, 24)).astype(np.float32)
    q = rng.standard_normal((8, 24)).astype(np.float32)
    full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(full, axis=1)[:, :5]

    for key, floor in (
        ("IVF8,Flat", 0.95),
        ("IVF8,SQ8", 0.9),
        ("IVF8,PQ12", 0.4),
    ):
        algo = CompositeAlgorithm(
            dimension=24,
            indexer={"type": "ShardedIVFIndexer", "index_key": key},
            searcher={"type": "ANNSearcher", "nprobe": 8},
            metric="l2",
        )
        algo.build_index(x)
        _, ids = algo.batch_search(q, 5)
        assert recall_at_k(gt, ids, 5) > floor, key


def test_sharded_ivf_persistence_reshards(tmp_path, rng):
    """Save -> load -> ANNSearcher.attach re-shards over current devices."""
    from vectordb_retrieval_tpu.models.composite import CompositeAlgorithm

    x = rng.standard_normal((800, 16)).astype(np.float32)
    q = rng.standard_normal((8, 16)).astype(np.float32)
    make = lambda: CompositeAlgorithm(
        dimension=16,
        indexer={"type": "ShardedIVFIndexer", "index_key": "IVF4,SQ8"},
        searcher={"type": "ANNSearcher", "nprobe": 4},
        metric="l2",
    )
    algo = make()
    algo.build_index(x)
    d0, i0 = algo.batch_search(q, 5)
    path = str(tmp_path / "idx")
    algo.save_index(path)
    algo2 = make()
    algo2.load_index(path)
    d1, i1 = algo2.batch_search(q, 5)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(d0, d1, rtol=1e-5, atol=1e-5)


def test_sharded_graph_persistence_reshards(tmp_path, rng):
    from vectordb_retrieval_tpu.models.composite import CompositeAlgorithm

    x = rng.standard_normal((640, 16)).astype(np.float32)
    q = rng.standard_normal((8, 16)).astype(np.float32)
    make = lambda: CompositeAlgorithm(
        dimension=16,
        indexer={"type": "ShardedGraphIndexer", "M": 4},
        searcher={"type": "ANNSearcher", "efSearch": 32},
        metric="l2",
    )
    algo = make()
    algo.build_index(x)
    d0, i0 = algo.batch_search(q, 5)
    path = str(tmp_path / "idx")
    algo.save_index(path)
    algo2 = make()
    algo2.load_index(path)
    d1, i1 = algo2.batch_search(q, 5)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(d0, d1, rtol=1e-5, atol=1e-5)


def test_q_axis_data_parallel(rng):
    """2-D (q, db) mesh: queries sharded over q, db ring per block."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vectordb_retrieval_tpu.parallel import (
        build_sharded_ivf_coded,
        sharded_ivf_coded_search,
        sharded_graph_search,
    )

    x = rng.standard_normal((1024, 16)).astype(np.float32)
    q = rng.standard_normal((16, 16)).astype(np.float32)
    full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(full, axis=1)[:, :5]

    mesh = make_mesh(8, axis_names=("q", "db"), shape=(2, 4))
    qd = jax.device_put(
        jnp.asarray(q), NamedSharding(mesh, P("q", None))
    )
    data, meta = build_sharded_ivf_coded(x, mesh, nlist=4, coding="sq8", seed=1)
    _, i = sharded_ivf_coded_search(
        qd, data, 5, meta["n_buckets"], mesh, coding="sq8", q_axis="q"
    )
    from vectordb_retrieval_tpu.bench.metrics import recall_at_k

    assert recall_at_k(gt, np.asarray(i), 5) > 0.95

    gdata, _ = build_sharded_graph(x, mesh, M=4, seed=1)
    _, gi = sharded_graph_search(
        qd, gdata, x.shape[0], 5, mesh, ef=64, q_axis="q"
    )
    assert recall_at_k(gt, np.asarray(gi), 5) > 0.8


def test_small_corpus_many_shards_regressions(rng):
    """Crash regressions from review: empty trailing shards, ragged PQ
    codebook sizes, and k > rows-per-shard merge truncation."""
    from vectordb_retrieval_tpu.parallel import (
        build_sharded_ivf_coded,
        build_sharded_ivf_flat,
        sharded_ivf_coded_search,
        sharded_ivf_flat_search,
    )

    mesh = make_mesh(8)
    q = rng.standard_normal((4, 16)).astype(np.float32)

    # 41 rows / 8 shards: two empty trailing shards must not crash kmeans
    x = rng.standard_normal((41, 16)).astype(np.float32)
    data, meta = build_sharded_ivf_flat(x, mesh, nlist=4, seed=1)
    _, i = sharded_ivf_flat_search(
        jnp.asarray(q), data, 3, meta["n_buckets"], mesh
    )
    assert (np.asarray(i) < 41).all()

    # 900 rows / 8 shards: per-shard rows < 256 forced ragged PQ codebooks
    x9 = rng.standard_normal((900, 16)).astype(np.float32)
    data, meta = build_sharded_ivf_coded(
        x9, mesh, nlist=4, coding="pq", m=4, seed=1
    )
    _, i = sharded_ivf_coded_search(
        jnp.asarray(q), data, 3, meta["n_buckets"], mesh, coding="pq"
    )
    assert (np.asarray(i) < 900).all()

    # 49 rows / 8 shards, k=30 > rows-per-shard: the merge must keep more
    # than one shard's candidate width (and the empty shard must not crash
    # the graph build)
    x49 = rng.standard_normal((49, 16)).astype(np.float32)
    gdata, _ = build_sharded_graph(x49, mesh, M=4, seed=1)
    _, gi = sharded_graph_search(
        jnp.asarray(q), gdata, 49, 30, mesh, ef=16
    )
    gi = np.asarray(gi)
    assert gi.shape[1] > 7
    assert ((gi >= -1) & (gi < 49)).all()


def test_sharded_block_graph_recall(rng):
    """Sharded BLOCK graph: clustered data, global ids, merged recall."""
    import jax.numpy as jnp

    from vectordb_retrieval_tpu.models.sharded import ShardedGraphIndexer
    from vectordb_retrieval_tpu.models.factory import ANNSearcher
    from vectordb_retrieval_tpu.ops import distances as dops

    centers = rng.standard_normal((120, 24)).astype(np.float32) * 4
    assign = rng.integers(0, 120, 24_000)
    x = (centers[assign]
         + rng.standard_normal((24_000, 24)).astype(np.float32) * 0.3)
    q = x[rng.choice(24_000, 32, replace=False)] + (
        rng.standard_normal((32, 24)).astype(np.float32) * 0.05
    )
    gt = np.asarray(dops.exact_search(jnp.asarray(q), jnp.asarray(x), 10)[1])

    idx = ShardedGraphIndexer(M=8, efSearch=128, mode="block", block_size=64)
    art = idx.build(x, 24)
    assert art.metadata["mode"] == "block"
    s = ANNSearcher(efSearch=128)
    s.attach(art)
    _, ids = s.batch_search(q, 10)
    hits = np.mean([
        len(set(gt[r].tolist()) & set(ids[r].tolist())) / 10
        for r in range(32)
    ])
    assert hits > 0.9, hits
    for r in range(32):  # global ids, no duplicates
        got = [i for i in ids[r].tolist() if i >= 0]
        assert len(got) == len(set(got))
        assert max(got) < 24_000
