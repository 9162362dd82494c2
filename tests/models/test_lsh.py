"""LSH family: self-retrieval, recall floors, fallback, binary-Hamming rerank.

Mirrors reference LSH tests (tests/test_composite_algorithm.py:108-226):
self-retrieval invariant for both metrics, and the rerank path exercised
without any native backend.
"""

import numpy as np
import pytest

from vectordb_retrieval_tpu.bench.metrics import recall_at_k
from vectordb_retrieval_tpu.models import get_algorithm_instance
from vectordb_retrieval_tpu.models.composite import CompositeAlgorithm


def _data(rng, n=1000, d=32, nq=16):
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    return x, q


def test_lsh_self_retrieval_l2(rng):
    x, _ = _data(rng)
    algo = get_algorithm_instance("lsh", 32, metric="l2", seed=1)
    algo.build_index(x)
    d, i = algo.batch_search(x[:8], 1)
    assert list(i[:, 0]) == list(range(8))
    np.testing.assert_allclose(d[:, 0], 0.0, atol=0.1)


def test_lsh_self_retrieval_cosine(rng):
    x, _ = _data(rng)
    algo = get_algorithm_instance("lsh", 32, metric="cosine", seed=1)
    algo.build_index(x)
    d, i = algo.batch_search(x[:8], 1)
    assert list(i[:, 0]) == list(range(8))
    np.testing.assert_allclose(d[:, 0], -1.0, atol=5e-3)


def test_lsh_recall_with_fallback(rng):
    x, q = _data(rng)
    gt_full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(gt_full, axis=1)[:, :10]
    algo = get_algorithm_instance(
        "lsh", 32, metric="l2", num_tables=12, hash_size=8,
        bucket_width=8.0, candidate_multiplier=16.0,
    )
    algo.build_index(x)
    _, ids = algo.batch_search(q, 10)
    # with wide buckets + fallback this should be decent on 1k points
    assert recall_at_k(gt, ids, 10) > 0.5


def test_lsh_no_fallback_returns_padded(rng):
    x, q = _data(rng, n=200)
    algo = get_algorithm_instance(
        "lsh", 32, metric="l2", num_tables=2, hash_size=18,
        bucket_width=0.25, fallback_to_bruteforce=False,
    )
    algo.build_index(x)
    d, i = algo.batch_search(q, 5)
    assert d.shape == (16, 5)
    # narrow buckets => some queries must have missing candidates
    assert (i == -1).any()


def test_lsh_fallback_fills_all(rng):
    x, q = _data(rng, n=200)
    algo = get_algorithm_instance(
        "lsh", 32, metric="l2", num_tables=2, hash_size=18,
        bucket_width=0.25, fallback_to_bruteforce=True,
    )
    algo.build_index(x)
    d, i = algo.batch_search(q, 5)
    assert (i >= 0).all()


def test_binary_lsh_rerank_recall(rng):
    x, q = _data(rng)
    gt_full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(gt_full, axis=1)[:, :10]
    algo = CompositeAlgorithm(
        dimension=32,
        indexer={"type": "BinaryLSHIndexer", "num_bits": 128},
        searcher={"type": "ANNSearcher", "lsh_candidate_multiplier": 16.0},
        metric="l2",
    )
    algo.build_index(x)
    _, ids = algo.batch_search(q, 10)
    # binary LSH + wide rerank should be near-exact on 1k points
    # (reference faiss_lsh+rerank recall 0.9672 on random, BASELINE.md)
    assert recall_at_k(gt, ids, 10) > 0.85


def test_binary_lsh_reference_alias(rng):
    x, _ = _data(rng, n=100)
    algo = CompositeAlgorithm(
        dimension=32,
        indexer={"type": "FaissLSHIndexer", "num_bits": 64},
        searcher={"type": "FaissSearcher"},
        metric="l2",
    )
    algo.build_index(x)
    d, i = algo.batch_search(x[:4], 1)
    assert list(i[:, 0]) == [0, 1, 2, 3]


def test_lsh_hash_size_cap():
    with pytest.raises(ValueError):
        get_algorithm_instance("lsh", 8, hash_size=31)


def test_hamming_threshold_rerank_matches_radius_oracle(rng):
    """Dense gather-free rerank (ops/lsh.hamming_threshold_rerank) vs a
    NumPy radius-semantics oracle: candidates = {hamming <= kth}, exact
    scores within, top-k."""
    import jax.numpy as jnp

    from vectordb_retrieval_tpu.ops import lsh as lshops

    n, d, b, k, n_cand = 700, 24, 16, 5, 50
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    proj = rng.standard_normal((d, 96)).astype(np.float32)
    xw = np.asarray(lshops.pack_bits(jnp.asarray(x @ proj > 0)))
    qw = np.asarray(lshops.pack_bits(jnp.asarray(q @ proj > 0)))

    # oracle
    ham = np.zeros((b, n), np.int32)
    for w in range(xw.shape[1]):
        xor = qw[:, w, None] ^ xw[None, :, w]
        ham += np.vectorize(lambda v: bin(v).count("1"))(xor).astype(np.int32)
    kth = np.sort(ham, axis=1)[:, n_cand - 1 : n_cand]
    dist = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    masked = np.where(ham <= kth, dist, np.inf)
    want_ids = np.argsort(masked, axis=1)[:, :k]

    got_d, got_i = lshops.hamming_threshold_rerank(
        jnp.asarray(q), jnp.asarray(qw), jnp.asarray(x), jnp.asarray(xw),
        jnp.asarray(kth), k, metric="l2",
    )
    np.testing.assert_array_equal(np.asarray(got_i), want_ids)
    np.testing.assert_allclose(
        np.asarray(got_d),
        np.take_along_axis(masked, want_ids, axis=1),
        rtol=1e-4, atol=1e-4,
    )


def test_binary_lsh_dense_path_recall_superset(rng):
    """binary_lsh_search at a multiplier past the gather/dense crossover:
    recall must be >= the gather path's at the same candidate count (the
    radius set is a tie-superset of the argsort cut)."""
    import jax.numpy as jnp

    from vectordb_retrieval_tpu.models.lsh import (
        BinaryLSHIndexer, binary_lsh_search,
    )
    from vectordb_retrieval_tpu.ops import lsh as lshops

    n, d, b, k = 2000, 32, 16, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = x[rng.choice(n, b, replace=False)] + 0.05 * rng.standard_normal(
        (b, d)
    ).astype(np.float32)
    gt = np.argsort(((q[:, None] - x[None]) ** 2).sum(-1), axis=1)[:, :k]

    art = BinaryLSHIndexer(num_bits=128, metric="l2").build(x, d)
    mult = 64.0  # n_cand = 640 > _GATHER_RERANK_MAX_CANDS -> dense path
    _, ids_dense = binary_lsh_search(art, jnp.asarray(q), k, "l2", mult)

    n_cand = int(np.ceil(mult * k))
    _, cand = lshops.hamming_candidates(
        lshops.pack_bits(
            jnp.asarray(q @ np.asarray(art.data["projections"]) > 0)
        ),
        art.data["words"], n_cand,
    )
    _, ids_gather = lshops.rerank(
        jnp.asarray(q), art.data["vectors"], cand, k, metric="l2"
    )
    r_dense = recall_at_k(gt, np.asarray(ids_dense), k)
    r_gather = recall_at_k(gt, np.asarray(ids_gather), k)
    assert r_dense >= r_gather - 1e-9, (r_dense, r_gather)
    assert r_dense > 0.9
