"""Parameter sweep, statistical comparison and plot tooling
(reference tests/test_operations_recall_plot.py analogue + script coverage)."""

import json
import os
import sys

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def test_parameter_sweep_runner(tmp_path):
    from parameter_sweep import ParameterSweepRunner

    config = {
        "dataset": "random",
        "dataset_options": {
            "dimensions": 8, "train_size": 128, "test_size": 16,
            "ground_truth_k": 10, "seed": 3, "use_cache": False,
        },
        "n_queries": 8,
        "topk": 5,
        "algorithm_name": "ivf",
        "algorithm": {"type": "ApproximateSearch", "metric": "l2"},
        "sweep": {"nprobe": [2, 4], "index_type": ["IVF4,Flat"]},
    }
    rows = ParameterSweepRunner(config, str(tmp_path)).run()
    assert len(rows) == 2
    assert all("recall" in r for r in rows)
    assert os.path.exists(tmp_path / "sweep_results.csv")
    with open(tmp_path / "sweep_results.json") as f:
        data = json.load(f)
    assert data["analysis"]["n_combinations"] == 2
    assert data["analysis"]["best_recall"]
    assert os.path.exists(tmp_path / "sweep_summary.md")


def test_algorithm_comparator(tmp_path):
    from compare_algorithms import AlgorithmComparator

    config = {
        "algorithms": {
            "exact": {"type": "ExactSearch", "metric": "l2"},
            "ivf": {"type": "ApproximateSearch", "index_type": "IVF4,Flat",
                    "metric": "l2", "nprobe": 4},
        },
        "datasets": [
            {
                "name": "random",
                "n_queries": 8,
                "topk": 5,
                "dataset_options": {
                    "dimensions": 8, "train_size": 128, "test_size": 16,
                    "ground_truth_k": 10, "seed": 3, "use_cache": False,
                },
            }
        ],
        "seed": 42,
    }
    report = AlgorithmComparator(config, n_runs=2, output_dir=str(tmp_path)).run()
    assert report["n_runs"] == 2
    assert report["statistics"]["exact"]["recall"]["mean"] == 1.0
    assert report["statistics"]["exact"]["recall"]["n"] == 2
    assert "exact_vs_ivf" in report["significance"] or "note" in report["significance"]
    assert os.path.exists(tmp_path / "comparison_summary.md")
    assert os.path.exists(tmp_path / "comparison_stats.json")


def test_evaluator_plots(tmp_path):
    from vectordb_retrieval_tpu.bench.evaluation import Evaluator

    gt = np.arange(50).reshape(5, 10)
    ev = Evaluator(gt, k_values=[5])
    ev.evaluate("algo_a", gt.copy(), np.full(5, 0.001))
    ev.evaluate("algo_b", (gt + 1) % 50, np.full(5, 0.01))
    out = tmp_path / "r.png"
    assert ev.plot_recall_vs_qps(str(out), k=5)
    assert os.path.getsize(out) > 0
    out2 = tmp_path / "ops.png"
    assert ev.plot_operations_vs_recall(str(out2), k=5)
    assert os.path.getsize(out2) > 0


def test_ops_metric_fallback_chain():
    from vectordb_retrieval_tpu.bench.evaluation import Evaluator

    ev = Evaluator(np.arange(10).reshape(1, 10))
    ev.results = {
        "a": {"recall@10": 1.0, "qps": 100.0, "operations_per_query": 5.0},
        "b": {"recall@10": 0.5, "qps": 10.0, "operations_per_query": 50.0},
    }
    key, values, label = ev._resolve_operations_metric(["a", "b"])
    assert key == "operations_per_query" and values == [5.0, 50.0]
    # remove op counters -> falls through to mean_query_time, then qps
    ev.results = {
        "a": {"recall@10": 1.0, "qps": 100.0},
        "b": {"recall@10": 0.5, "qps": 10.0},
    }
    key, values, label = ev._resolve_operations_metric(["a", "b"])
    assert key == "qps" and values == [10.0, 100.0]


def test_create_config_flag(tmp_path):
    import subprocess

    out = tmp_path / "cfg.yaml"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_full_benchmark.py"),
         "--create-config", str(out)],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr
    cfg = yaml.safe_load(out.read_text())
    assert "algorithms" in cfg and "indexers" in cfg and "datasets" in cfg
