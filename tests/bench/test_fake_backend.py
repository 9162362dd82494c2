"""Orchestration tested with a duck-typed fake algorithm — no device compute.

The reference's sole mock-backend pattern (tests/test_composite_algorithm.py:
169-226: DummyLSHIndex + module-symbol patching) proves the runner works
without the native backend; here a stub BaseAlgorithm exercises the
experiment loop, persistence hooks, counters and reporting without touching
JAX at search time.
"""

import numpy as np

from vectordb_retrieval_tpu.bench.config import ExperimentConfig
from vectordb_retrieval_tpu.bench.experiment import ExperimentRunner
from vectordb_retrieval_tpu.models.base import BaseAlgorithm


class WorstFirstFake(BaseAlgorithm):
    """Returns the worst possible neighbours (ids from the end) — orders the
    runner can't confuse with real results; records build/search calls."""

    def __init__(self, dimension, metric="l2", **params):
        super().__init__(dimension=dimension, metric=metric, **params)
        self.builds = 0
        self.searches = 0

    def build_index(self, vectors):
        self.n = vectors.shape[0]
        self.builds += 1
        self.is_built = True

    def batch_search(self, queries, k):
        self.searches += 1
        b = queries.shape[0]
        self.record_operation("ndis", b * self.n)
        ids = np.tile(np.arange(self.n - 1, self.n - 1 - k, -1), (b, 1))
        d = np.tile(np.arange(k, dtype=np.float64), (b, 1))
        return d, ids


def test_fake_algorithm_through_runner(tmp_path):
    cfg = ExperimentConfig(
        dataset="random",
        data_dir=str(tmp_path / "d"),
        dataset_options={
            "dimensions": 4, "train_size": 64, "test_size": 16,
            "ground_truth_k": 8, "seed": 1, "use_cache": False,
        },
        n_queries=8,
        topk=5,
        algorithms={},
    )
    runner = ExperimentRunner(cfg, output_dir=str(tmp_path / "o"))
    runner.load_dataset()
    fake = WorstFirstFake(dimension=4)
    runner.register_algorithm("fake", fake)
    results = runner.run()

    m = results["fake"]
    assert fake.builds == 1
    assert fake.searches >= 1
    assert m["recall"] < 0.5  # worst-first must score terribly
    assert m["qps"] > 0
    assert m["operations"]["ndis"] == 8 * 64
    assert m["operations_per_query"] == 64.0
    assert (tmp_path / "o" / "fake_results.json").exists()


def test_fake_single_query_fallback(tmp_path):
    class NoBatchFake(WorstFirstFake):
        def batch_search(self, queries, k):
            if queries.shape[0] > 1:
                raise NotImplementedError("single query only")
            return super().batch_search(queries, k)

        def search(self, query, k):
            d, i = super().batch_search(query.reshape(1, -1), k)
            return d[0], i[0]

    cfg = ExperimentConfig(
        dataset="random",
        data_dir=str(tmp_path / "d"),
        dataset_options={
            "dimensions": 4, "train_size": 32, "test_size": 8,
            "ground_truth_k": 5, "seed": 1, "use_cache": False,
        },
        n_queries=4,
        topk=3,
        algorithms={},
    )
    runner = ExperimentRunner(cfg, output_dir=str(tmp_path / "o"))
    runner.load_dataset()
    runner.register_algorithm("nb", NoBatchFake(dimension=4))
    results = runner.run()
    assert "error" not in results["nb"]
    assert results["nb"]["qps"] > 0
