"""Persistence modes: build_only job then retrieve_only job sharing an
artifact dir (reference tests/test_experiment_runner_persistence.py:40-114)."""

import numpy as np
import pytest

from vectordb_retrieval_tpu.bench.config import ExperimentConfig
from vectordb_retrieval_tpu.bench.experiment import ExperimentRunner


def _config(tmp_path, mode, artifact_dir):
    return ExperimentConfig(
        dataset="random",
        data_dir=str(tmp_path / "data"),
        dataset_options={
            "dimensions": 8,
            "train_size": 64,
            "test_size": 16,
            "ground_truth_k": 10,
            "seed": 5,
            "use_cache": False,
        },
        n_queries=8,
        topk=5,
        algorithms={
            "exact": {
                "type": "ExactSearch",
                "metric": "l2",
                "persistence": {
                    "enabled": True,
                    "mode": mode,
                    "artifact_dir": artifact_dir,
                },
            }
        },
    )


def test_build_only_then_retrieve_only(tmp_path):
    art = str(tmp_path / "artifacts")

    build_runner = ExperimentRunner(
        _config(tmp_path, "build_only", art), output_dir=str(tmp_path / "o1")
    )
    res1 = build_runner.run()
    assert res1["exact"]["status"] == "build_only"
    assert "qps" not in res1["exact"]

    retr_runner = ExperimentRunner(
        _config(tmp_path, "retrieve_only", art), output_dir=str(tmp_path / "o2")
    )
    res2 = retr_runner.run()
    assert res2["exact"]["index_source"] == "loaded"
    assert res2["exact"]["recall"] == 1.0
    assert res2["exact"]["build_time_s"] == 0.0


def test_retrieve_only_missing_artifact_fails(tmp_path):
    runner = ExperimentRunner(
        _config(tmp_path, "retrieve_only", str(tmp_path / "missing")),
        output_dir=str(tmp_path / "o"),
    )
    res = runner.run()
    assert "error" in res["exact"]
    assert "missing" in res["exact"]["error"]


def test_invalid_mode_rejected(tmp_path):
    cfg = _config(tmp_path, "build_and_retrieve", str(tmp_path / "a"))
    cfg.algorithms["exact"]["persistence"]["mode"] = "bogus"
    runner = ExperimentRunner(cfg, output_dir=str(tmp_path / "o"))
    res = runner.run()
    assert "error" in res["exact"]
