"""Sharded flat index through the full algorithm/benchmark stack
(8 virtual CPU devices, conftest)."""

import numpy as np

from vectordb_retrieval_tpu.bench.metrics import recall_at_k
from vectordb_retrieval_tpu.models.composite import CompositeAlgorithm


def _oracle(q, x, k):
    full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    return np.argsort(full, axis=1)[:, :k]


def test_sharded_flat_algorithm(rng):
    x = rng.standard_normal((1000, 32)).astype(np.float32)
    q = rng.standard_normal((16, 32)).astype(np.float32)
    algo = CompositeAlgorithm(
        dimension=32,
        indexer={"type": "ShardedFlatIndexer"},
        searcher={"type": "LinearSearcher"},
        metric="l2",
    )
    algo.build_index(x)
    d, i = algo.batch_search(q, 10)
    gt = _oracle(q, x, 10)
    assert recall_at_k(gt, i, 10) == 1.0


def test_sharded_flat_cosine(rng):
    x = rng.standard_normal((640, 16)).astype(np.float32)
    q = rng.standard_normal((8, 16)).astype(np.float32)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    gt = np.argsort(-(qn @ xn.T), axis=1)[:, :5]
    algo = CompositeAlgorithm(
        dimension=16,
        indexer={"type": "ShardedFlatIndexer"},
        searcher={"type": "LinearSearcher"},
        metric="cosine",
    )
    algo.build_index(x)
    _, i = algo.batch_search(q, 5)
    assert recall_at_k(gt, i, 5) == 1.0


def test_sharded_flat_persistence_reshards(tmp_path, rng):
    x = rng.standard_normal((512, 8)).astype(np.float32)
    q = rng.standard_normal((4, 8)).astype(np.float32)
    algo = CompositeAlgorithm(
        dimension=8,
        indexer={"type": "ShardedFlatIndexer"},
        searcher={"type": "LinearSearcher"},
        metric="l2",
    )
    algo.build_index(x)
    d0, i0 = algo.batch_search(q, 5)
    algo.save_index(str(tmp_path / "a"), {})

    algo2 = CompositeAlgorithm(
        dimension=8,
        indexer={"type": "ShardedFlatIndexer"},
        searcher={"type": "LinearSearcher"},
        metric="l2",
    )
    algo2.load_index(str(tmp_path / "a"), {})
    d1, i1 = algo2.batch_search(q, 5)
    assert np.array_equal(i0, i1)


def test_sharded_flat_through_experiment_runner(tmp_path):
    """Fused timed-search path over a shard_map kernel (8 virtual devices)."""
    from vectordb_retrieval_tpu.bench.config import ExperimentConfig
    from vectordb_retrieval_tpu.bench.experiment import ExperimentRunner

    cfg = ExperimentConfig(
        dataset="random",
        data_dir=str(tmp_path / "d"),
        dataset_options={
            "dimensions": 16, "train_size": 256, "test_size": 16,
            "ground_truth_k": 10, "seed": 2, "use_cache": False,
        },
        n_queries=8,
        topk=5,
        repeat=2,
        algorithms={
            "sharded_exact": {
                "indexer": {"type": "ShardedFlatIndexer"},
                "searcher": {"type": "LinearSearcher"},
                "metric": "l2",
            }
        },
    )
    runner = ExperimentRunner(cfg, output_dir=str(tmp_path / "o"))
    runner.load_dataset()
    results = runner.run()
    m = results["sharded_exact"]
    assert "error" not in m, m
    assert m["recall"] == 1.0
    assert m["qps"] > 0
