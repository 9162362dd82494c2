"""End-to-end BenchmarkRunner on a tiny seeded random dataset in tmp_path.

Mirrors reference tests/test_benchmark_runner_modular.py:9-65: ref resolution,
metric keys, and report artifacts are asserted.
"""

import json
import os

import yaml

from vectordb_retrieval_tpu.bench.runner import BenchmarkRunner


def _write_config(tmp_path):
    config = {
        "indexers": {
            "bf_l2": {"type": "BruteForceIndexer", "metric": "l2"},
        },
        "searchers": {
            "lin_l2": {"type": "LinearSearcher", "metric": "l2"},
        },
        "algorithms": {
            "exact_ref": {
                "indexer_ref": "bf_l2",
                "searcher_ref": "lin_l2",
                "metric": "l2",
            },
            "exact_typed": {"type": "ExactSearch", "metric": "l2"},
        },
        "datasets": [
            {
                "name": "random",
                "metric": "l2",
                "n_queries": 8,
                "topk": 5,
                "dataset_options": {
                    "dimensions": 16,
                    "train_size": 64,
                    "test_size": 16,
                    "ground_truth_k": 10,
                    "seed": 3,
                    "use_cache": False,
                },
            }
        ],
        "output_dir": str(tmp_path / "out"),
        "data_dir": str(tmp_path / "data"),
        "n_queries": 8,
        "topk": 5,
        "seed": 1,
    }
    path = tmp_path / "config.yaml"
    with open(path, "w") as f:
        yaml.dump(config, f)
    return str(path)


def test_benchmark_runner_end_to_end(tmp_path):
    runner = BenchmarkRunner(_write_config(tmp_path))
    results = runner.run()

    assert "random" in results
    ds = results["random"]
    for alg in ("exact_ref", "exact_typed"):
        assert alg in ds, ds.keys()
        m = ds[alg]
        assert "error" not in m, m
        assert m["recall"] == 1.0  # exact search must have perfect recall
        assert m["qps"] > 0
        assert m["index_memory_mb"] > 0
        assert "recall@5" in m and "precision@5" in m

    out = runner.output_dir
    assert os.path.exists(os.path.join(out, "all_results.json"))
    assert os.path.exists(os.path.join(out, "benchmark_summary.md"))
    assert os.path.exists(os.path.join(out, "one-page-summary.md"))
    assert os.path.exists(os.path.join(out, "qps_recall_random.svg"))
    assert os.path.exists(os.path.join(out, "random", "exact_ref_results.json"))
    with open(os.path.join(out, "all_results.json")) as f:
        assert json.load(f)["random"]["exact_ref"]["recall"] == 1.0


def test_unknown_ref_errors_isolated(tmp_path):
    config = {
        "algorithms": {"bad": {"indexer_ref": "nope", "searcher_ref": "nope"}},
        "datasets": ["random"],
        "dataset_options": {"dimensions": 8, "train_size": 32, "test_size": 8,
                            "use_cache": False},
        "output_dir": str(tmp_path / "out"),
        "data_dir": str(tmp_path / "data"),
        "n_queries": 4,
        "topk": 3,
    }
    path = tmp_path / "c.yaml"
    with open(path, "w") as f:
        yaml.dump(config, f)
    runner = BenchmarkRunner(str(path))
    results = runner.run()
    assert "error" in results["random"]
