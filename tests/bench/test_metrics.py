"""Metric semantics vs hand-computed values and a pure-Python set oracle."""

import numpy as np
import pytest

from vectordb_retrieval_tpu.bench import metrics as M


def _py_recall(gt, pred, k):
    k = min(k, pred.shape[1])
    out = []
    for i in range(gt.shape[0]):
        g = set(gt[i, :k]) if gt.shape[1] >= k else set(gt[i])
        p = set(pred[i, :k])
        out.append(len(g & p) / len(g) if g else 0.0)
    return float(np.mean(out))


def _py_precision(gt, pred, k):
    k = min(k, pred.shape[1])
    out = []
    for i in range(gt.shape[0]):
        out.append(len(set(gt[i]) & set(pred[i, :k])) / k)
    return float(np.mean(out))


def test_recall_matches_set_oracle(rng):
    gt = rng.integers(0, 50, size=(20, 10))
    pred = rng.integers(0, 50, size=(20, 10))
    for k in (1, 5, 10):
        assert M.recall_at_k(gt, pred, k) == pytest.approx(_py_recall(gt, pred, k))


def test_precision_matches_set_oracle(rng):
    gt = rng.integers(0, 50, size=(20, 10))
    pred = np.stack(
        [rng.permutation(50)[:10] for _ in range(20)]
    )  # unique preds per row
    for k in (1, 5, 10):
        assert M.precision_at_k(gt, pred, k) == pytest.approx(
            _py_precision(gt, pred, k)
        )


def test_perfect_prediction():
    gt = np.arange(30).reshape(3, 10)
    assert M.recall_at_k(gt, gt, 10) == 1.0
    assert M.precision_at_k(gt, gt, 10) == 1.0
    assert M.mean_average_precision(gt, gt) == 1.0
    assert M.ndcg_at_k(gt, gt, 10) == pytest.approx(1.0)
    assert M.hit_rate_at_k(gt, gt, 10) == 1.0
    assert M.mean_reciprocal_rank(gt, gt) == 1.0


def test_disjoint_prediction():
    gt = np.arange(30).reshape(3, 10)
    pred = gt + 100
    assert M.recall_at_k(gt, pred, 10) == 0.0
    assert M.mean_reciprocal_rank(gt, pred) == 0.0
    assert M.hit_rate_at_k(gt, pred, 10) == 0.0


def test_map_partial():
    gt = np.array([[0, 1, 2, 3]])
    pred = np.array([[0, 9, 1, 8]])
    # hits at ranks 1 and 3: AP = (1/1 + 2/3) / 4
    expected = (1.0 + 2.0 / 3.0) / 4.0
    assert M.mean_average_precision(gt, pred) == pytest.approx(expected)


def test_mrr_first_hit_rank():
    gt = np.array([[5, 6]])
    pred = np.array([[1, 2, 5, 6]])
    assert M.mean_reciprocal_rank(gt, pred) == pytest.approx(1.0 / 3.0)


def test_latency_stats():
    stats = M.compute_cost_latency([0.1, 0.2, 0.3])
    assert stats["mean"] == pytest.approx(0.2)
    assert stats["min"] == pytest.approx(0.1)
    assert stats["max"] == pytest.approx(0.3)


def test_vector_similarity_count():
    assert M.vector_similarity_count(1000, 10) == 10000
    assert M.vector_similarity_count(1024, 10, "approximate") == 100
    with pytest.raises(ValueError):
        M.vector_similarity_count(10, 10, "bogus")


def test_negative_ids_ignored_in_gt():
    gt = np.array([[3, -1, -1]])
    pred = np.array([[3, 7, 9]])
    assert M.recall_at_k(gt, pred, 3) == 1.0
