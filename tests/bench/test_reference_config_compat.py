"""Drop-in config compatibility: the reference's YAML schema and component
type names (FaissIVFIndexer / FaissSearcher / HNSWIndexer / LSHIndexer ...)
must resolve and run through our runner unmodified."""

import os

import yaml
import pytest

from vectordb_retrieval_tpu.bench.runner import BenchmarkRunner

REFERENCE_SMOKE = "/root/reference/configs/benchmark_config_smoke.yaml"


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_SMOKE), reason="reference checkout not mounted"
)
def test_reference_smoke_config_runs(tmp_path):
    with open(REFERENCE_SMOKE) as f:
        cfg = yaml.safe_load(f)
    # shrink the dataset + point IO at tmp (environment paths in the
    # reference config refer to its cluster storage)
    cfg["output_dir"] = str(tmp_path / "out")
    cfg["data_dir"] = str(tmp_path / "data")
    cfg["n_queries"] = 8
    cfg["topk"] = 5
    for ds in cfg["datasets"]:
        if ds.get("name") == "random":
            ds["dataset_options"].update(
                {"train_size": 256, "test_size": 16, "ground_truth_k": 10,
                 "use_cache": False}
            )
            ds["n_queries"] = 8
            ds["topk"] = 5
    path = tmp_path / "ref_config.yaml"
    with open(path, "w") as f:
        yaml.dump(cfg, f)

    runner = BenchmarkRunner(str(path))
    results = runner.run()

    random_res = results["random"]
    for alg in ("exact", "hnsw", "ivf_flat", "lsh"):
        assert alg in random_res
        assert "error" not in random_res[alg], random_res[alg]
        assert random_res[alg]["qps"] > 0
    assert random_res["exact"]["recall"] == 1.0
    # msmarco points at the reference cluster's storage -> isolated error
    assert "error" in results["msmarco"]
