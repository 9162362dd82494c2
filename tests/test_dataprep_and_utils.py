"""Dataprep pipeline (TSV -> sample -> synthetic embed -> dataset load),
metric_utils aggregation, and small host utils."""

import json
import os

import numpy as np
import pytest


def _write_tsv(path, n, prefix):
    with open(path, "w") as f:
        for i in range(n):
            f.write(f"{prefix}{i}\tsome text number {i}\n")


def test_dataprep_pipeline_synthetic(tmp_path):
    from vectordb_retrieval_tpu.data.dataprep import embed_msmarco, subsample_msmarco

    raw = tmp_path / "raw"
    raw.mkdir()
    _write_tsv(str(raw / "corpus_full.tsv"), 200, "d")
    _write_tsv(str(raw / "queries_full.tsv"), 50, "q")

    subset = str(tmp_path / "subset")
    nc = subsample_msmarco.sample_corpus(
        subset, corpus_sample=100, seed=1, corpus_tsv=str(raw / "corpus_full.tsv")
    )
    nq = subsample_msmarco.sample_queries(
        subset, query_sample=20, seed=1, queries_tsv=str(raw / "queries_full.tsv")
    )
    assert nc == 100 and nq == 20

    import sys

    emb_dir = str(tmp_path / "emb")
    argv = sys.argv
    sys.argv = [
        "x", "--input-dir", subset, "--output-dir", emb_dir, "--synthetic",
    ]
    try:
        embed_msmarco.main()
    finally:
        sys.argv = argv
    p = np.load(os.path.join(emb_dir, "passage_embeddings.npy"))
    q = np.load(os.path.join(emb_dir, "query_embeddings.npy"))
    assert p.shape == (100, 384) and q.shape == (20, 384)
    with open(os.path.join(emb_dir, "metadata.json")) as f:
        assert json.load(f)["n_passages"] == 100

    # the msmarco loader consumes this layout directly
    from vectordb_retrieval_tpu.data.datasets import Dataset

    ds = Dataset(
        "msmarco",
        data_dir=str(tmp_path / "data"),
        options={
            "embedded_dataset_dir": emb_dir,
            "base_limit": 80,
            "query_limit": 10,
            "ground_truth_k": 5,
            "use_cache": False,
        },
    ).load()
    assert ds.train_vectors.shape == (80, 384)
    assert ds.test_vectors.shape == (10, 384)
    assert ds.ground_truth.shape == (10, 5)
    assert ds.metric == "cosine"


def test_evaluate_all_metrics_and_plots(tmp_path, rng):
    from vectordb_retrieval_tpu.bench import metric_utils as MU

    gt = np.arange(200).reshape(20, 10)
    pred = gt.copy()
    res = MU.evaluate_all_metrics(gt, pred)
    assert res["recall@10"] == 1.0 and res["map"] == 1.0
    assert MU.plot_metrics_by_k(res, str(tmp_path / "m.png"))
    assert os.path.getsize(tmp_path / "m.png") > 0
    assert MU.compare_algorithms_plot(
        {"a": res, "b": res}, str(tmp_path / "c.png")
    )
    text = MU.metrics_text_summary({"a": res})
    assert "recall@10" in text and "a" in text


def test_vector_utils(rng):
    from vectordb_retrieval_tpu.utils import vector_utils as V

    x = V.random_unit_vectors(10, 8, seed=1)
    np.testing.assert_allclose(np.linalg.norm(x, axis=1), 1.0, atol=1e-5)
    a, b = x[0], x[1]
    assert V.compute_distance(a, a, "l2") == pytest.approx(0.0, abs=1e-6)
    assert V.compute_distance(a, a, "cosine") == pytest.approx(-1.0, abs=1e-5)
    with pytest.raises(ValueError):
        V.compute_distance(a, b, "bogus")


def test_dataset_cache_roundtrip(tmp_path):
    from vectordb_retrieval_tpu.data.datasets import Dataset

    opts = {
        "dimensions": 8, "train_size": 64, "test_size": 16,
        "ground_truth_k": 5, "seed": 3,
    }
    d1 = Dataset("random", data_dir=str(tmp_path), options=opts).load()
    # second load must hit the cache and be identical
    d2 = Dataset("random", data_dir=str(tmp_path), options=opts).load()
    np.testing.assert_array_equal(d1.train_vectors, d2.train_vectors)
    np.testing.assert_array_equal(d1.ground_truth, d2.ground_truth)
    assert d2.metadata.get("n_train") == 64
    # changed options -> different cache key -> different data
    opts2 = dict(opts, seed=4)
    d3 = Dataset("random", data_dir=str(tmp_path), options=opts2).load()
    assert not np.array_equal(d1.train_vectors, d3.train_vectors)


def test_fvecs_ivecs_roundtrip(tmp_path, rng):
    from vectordb_retrieval_tpu.data.datasets import read_fvecs, read_ivecs

    x = rng.standard_normal((20, 8)).astype(np.float32)
    rows = []
    for row in x:
        rows.append(np.array([8], dtype=np.int32).tobytes())
        rows.append(row.astype(np.float32).tobytes())
    path = tmp_path / "v.fvecs"
    path.write_bytes(b"".join(rows))
    got = read_fvecs(str(path))
    np.testing.assert_allclose(got, x)
    got2 = read_fvecs(str(path), limit=5)
    assert got2.shape == (5, 8)

    iv = rng.integers(0, 100, size=(10, 4)).astype(np.int32)
    rows = []
    for row in iv:
        rows.append(np.array([4], dtype=np.int32).tobytes())
        rows.append(row.tobytes())
    path2 = tmp_path / "v.ivecs"
    path2.write_bytes(b"".join(rows))
    np.testing.assert_array_equal(read_ivecs(str(path2)), iv)
