"""GloVe-50 loader against a locally synthesised glove-format txt."""

import numpy as np

from vectordb_retrieval_tpu.data.datasets import Dataset


def _write_glove(path, n=300, dim=50, seed=0):
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    with open(path, "w", encoding="utf-8") as f:
        for i, row in enumerate(mat):
            vals = " ".join(f"{v:.5f}" for v in row)
            f.write(f"word{i} {vals}\n")
    return mat


def test_glove50_loader(tmp_path):
    path = tmp_path / "glove.6B.50d.txt"
    _write_glove(str(path))
    ds = Dataset(
        "glove50",
        data_dir=str(tmp_path / "data"),
        options={
            "glove_path": str(path),
            "train_limit": 200,
            "test_size": 32,
            "ground_truth_k": 10,
            "seed": 4,
            "use_cache": False,
        },
    ).load()
    assert ds.train_vectors.shape == (200, 50)
    assert ds.test_vectors.shape == (32, 50)
    assert ds.ground_truth.shape == (32, 10)
    # GT sanity: first neighbour distance <= second
    q = ds.test_vectors[0]
    x = ds.train_vectors
    d0 = ((x[ds.ground_truth[0, 0]] - q) ** 2).sum()
    d1 = ((x[ds.ground_truth[0, 1]] - q) ** 2).sum()
    assert d0 <= d1 + 1e-5


def test_glove50_missing_file_raises(tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError):
        Dataset(
            "glove50",
            data_dir=str(tmp_path),
            options={
                "glove_path": str(tmp_path / "nope.txt"),
                "use_cache": False,
            },
        ).load()


def test_glove50_surrogate(tmp_path):
    """Surrogate loader: shapes, surrogate labelling, determinism."""
    opts = {
        "train_limit": 500,
        "test_size": 16,
        "ground_truth_k": 10,
        "use_cache": False,
    }
    ds = Dataset("glove50_surrogate", data_dir=str(tmp_path), options=opts)
    ds.load()
    assert ds.train_vectors.shape == (500, 50)
    assert ds.test_vectors.shape == (16, 50)
    assert ds.ground_truth.shape == (16, 10)
    # results on this dataset must be identifiable as surrogate
    assert ds.metadata["surrogate"] is True
    assert ds.metadata["surrogate_for"] == "glove50"
    # mean norm lands near the glove.6B.50d target (4.4)
    norms = np.linalg.norm(ds.train_vectors, axis=1)
    assert 3.5 < norms.mean() < 5.5
    ds2 = Dataset("glove50_surrogate", data_dir=str(tmp_path), options=opts)
    ds2.load()
    np.testing.assert_array_equal(ds.train_vectors, ds2.train_vectors)
    np.testing.assert_array_equal(ds.ground_truth, ds2.ground_truth)
