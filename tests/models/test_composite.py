"""CompositeAlgorithm + flat family: oracle, self-retrieval, config errors,
persistence round-trip. Mirrors reference tests/test_composite_algorithm.py."""

import numpy as np
import pytest

from vectordb_retrieval_tpu.models import get_algorithm_instance
from vectordb_retrieval_tpu.models.composite import CompositeAlgorithm


def _oracle_ids(q, x, k):
    full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    return np.argsort(full, axis=1)[:, :k]


def test_bruteforce_linear_matches_oracle(rng):
    x = rng.standard_normal((300, 24)).astype(np.float32)
    q = rng.standard_normal((11, 24)).astype(np.float32)
    algo = CompositeAlgorithm(
        dimension=24,
        indexer={"type": "BruteForceIndexer"},
        searcher={"type": "LinearSearcher"},
        metric="l2",
    )
    algo.build_index(x)
    d, i = algo.batch_search(q, 7)
    oracle = _oracle_ids(q, x, 7)
    full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(
        np.take_along_axis(full, i, 1),
        np.take_along_axis(full, oracle, 1),
        rtol=1e-2,
        atol=1e-3,
    )


def test_self_retrieval_invariant(rng):
    """Querying with an indexed vector returns it at distance ~0
    (reference test_composite_algorithm.py:108-166)."""
    x = rng.standard_normal((100, 16)).astype(np.float32)
    for metric in ("l2", "cosine"):
        algo = get_algorithm_instance("exact", 16, metric=metric)
        algo.build_index(x)
        d, i = algo.batch_search(x[:5], 1)
        assert list(i[:, 0]) == [0, 1, 2, 3, 4]
        if metric == "l2":
            # matmul-form ||q||^2+||x||^2-2qx has f32 cancellation noise at
            # d~0 (FAISS IndexFlat behaves identically); ids are still exact.
            np.testing.assert_allclose(d[:, 0], 0.0, atol=0.1)
        else:
            np.testing.assert_allclose(d[:, 0], -1.0, atol=5e-3)


def test_config_validation_errors():
    with pytest.raises(ValueError):
        CompositeAlgorithm(dimension=8, indexer={"type": "Nope"}, searcher={"type": "LinearSearcher"})
    with pytest.raises(ValueError):
        CompositeAlgorithm(dimension=8, indexer={"no_type": 1}, searcher={"type": "LinearSearcher"})
    with pytest.raises(ValueError):
        CompositeAlgorithm(dimension=8)


def test_single_query_api(rng):
    x = rng.standard_normal((50, 8)).astype(np.float32)
    algo = get_algorithm_instance("exact", 8)
    algo.build_index(x)
    d, i = algo.search(x[3], 3)
    assert d.shape == (3,) and i.shape == (3,)
    assert i[0] == 3


def test_k_exceeding_n_pads(rng):
    x = rng.standard_normal((6, 4)).astype(np.float32)
    algo = get_algorithm_instance("exact", 4)
    algo.build_index(x)
    d, i = algo.batch_search(x[:2], 10)
    assert d.shape == (2, 10) and i.shape == (2, 10)
    assert np.all(i[:, 6:] == -1)
    assert np.all(np.isinf(d[:, 6:]))


def test_operation_counter_accumulates(rng):
    x = rng.standard_normal((40, 4)).astype(np.float32)
    algo = get_algorithm_instance("exact", 4)
    algo.build_index(x)
    algo.batch_search(x[:5], 2)
    algo.batch_search(x[:5], 2)
    ops = algo.get_operations()
    assert ops["ndis"] == 2 * 5 * 40
    ops["ndis"] = 0  # must be a copy
    assert algo.get_operations()["ndis"] == 2 * 5 * 40
    algo.reset_operations()
    assert algo.get_operations() == {}


def test_persistence_roundtrip(tmp_path, rng):
    x = rng.standard_normal((60, 12)).astype(np.float32)
    q = rng.standard_normal((4, 12)).astype(np.float32)
    algo = get_algorithm_instance("exact", 12)
    algo.build_index(x)
    d0, i0 = algo.batch_search(q, 5)
    ctx = {"dataset_fingerprint": "fp1", "config_hash": "ch1"}
    path = str(tmp_path / "artifact")
    algo.save_index(path, ctx)

    algo2 = get_algorithm_instance("exact", 12)
    algo2.load_index(path, ctx)
    d1, i1 = algo2.batch_search(q, 5)
    assert np.array_equal(i0, i1)
    np.testing.assert_allclose(d0, d1, rtol=1e-5)


def test_persistence_fingerprint_mismatch_rejected(tmp_path, rng):
    x = rng.standard_normal((30, 6)).astype(np.float32)
    algo = get_algorithm_instance("exact", 6)
    algo.build_index(x)
    path = str(tmp_path / "artifact")
    algo.save_index(path, {"dataset_fingerprint": "fpA"})
    algo2 = get_algorithm_instance("exact", 6)
    with pytest.raises(ValueError, match="fingerprint"):
        algo2.load_index(path, {"dataset_fingerprint": "fpB"})


def test_persistence_missing_sentinel_rejected(tmp_path, rng):
    import os

    x = rng.standard_normal((30, 6)).astype(np.float32)
    algo = get_algorithm_instance("exact", 6)
    algo.build_index(x)
    path = str(tmp_path / "artifact")
    algo.save_index(path, {})
    os.remove(os.path.join(path, "WRITE_COMPLETE"))
    algo2 = get_algorithm_instance("exact", 6)
    with pytest.raises(ValueError, match="incomplete"):
        algo2.load_index(path, {})
