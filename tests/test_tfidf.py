"""Hashing TF-IDF vectorizer + the msmarco text-mode dataset path."""

import numpy as np

from vectordb_retrieval_tpu.data.tfidf import (
    HashingTfidfVectorizer,
    random_projection,
    texts_to_vectors,
)


DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "a fast auburn fox leaped above a sleepy canine",
    "stock markets rallied as tech shares surged today",
    "bond yields fell while equity markets were volatile",
    "the dog slept in the sun all afternoon",
]


def test_tfidf_similarity_structure():
    vec = HashingTfidfVectorizer(n_features=512, seed=1)
    x = vec.fit_transform(DOCS)
    np.testing.assert_allclose(np.linalg.norm(x, axis=1), 1.0, atol=1e-5)
    sims = x @ x.T
    # fox/dog docs are closer to each other than to finance docs
    assert sims[0, 4] > sims[0, 2]
    assert sims[2, 3] > sims[2, 0]


def test_transform_consistency():
    vec = HashingTfidfVectorizer(n_features=256, seed=0)
    vec.fit(DOCS)
    a = vec.transform([DOCS[0]])
    b = vec.transform([DOCS[0]])
    np.testing.assert_array_equal(a, b)


def test_random_projection_shape_and_norm():
    x = np.random.default_rng(0).standard_normal((10, 512)).astype(np.float32)
    y = random_projection(x, 64, seed=3)
    assert y.shape == (10, 64)
    np.testing.assert_allclose(np.linalg.norm(y, axis=1), 1.0, atol=1e-5)


def test_msmarco_tfidf_dataset(tmp_path):
    from vectordb_retrieval_tpu.data.datasets import Dataset

    corpus = tmp_path / "corpus.tsv"
    queries = tmp_path / "queries.tsv"
    with open(corpus, "w") as f:
        for i, d in enumerate(DOCS * 8):
            f.write(f"d{i}\t{d} extra token{i}\n")
    with open(queries, "w") as f:
        f.write("q0\tquick brown fox dog\n")
        f.write("q1\tstock markets tech\n")
    ds = Dataset(
        "msmarco",
        data_dir=str(tmp_path / "data"),
        options={
            "use_tfidf": True,
            "corpus_tsv": str(corpus),
            "queries_tsv": str(queries),
            "dimensions": 64,
            "ground_truth_k": 5,
            "use_cache": False,
        },
    ).load()
    assert ds.train_vectors.shape == (40, 64)
    assert ds.test_vectors.shape == (2, 64)
    assert ds.ground_truth.shape == (2, 5)
    assert ds.metric == "cosine"
    # the fox query's nearest docs should be fox/dog docs (indices % 5 in {0,1,4})
    top = ds.ground_truth[0, :3] % 5
    assert set(top.tolist()) <= {0, 1, 4}
