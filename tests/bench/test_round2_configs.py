"""Every shipped config must resolve and instantiate end-to-end.

Guards the registry/ref-resolution contract for the round-2 config corpus
(msm100k covertree-reuse pair, glove50 smoke, sharded family, msmarco
synth, sift1m) without running any search: each algorithm is materialised
through the same path the benchmark runner uses.
"""

import copy
import glob
import os

import pytest

from vectordb_retrieval_tpu.bench.experiment import algorithm_from_config
from vectordb_retrieval_tpu.bench.runner import BenchmarkRunner, deep_merge

REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs", "*.yaml")))
# dataprep / sweep configs use different schemas
SKIP = {"ms_marco_subset_embed.yaml", "sweep_example.yaml"}


@pytest.mark.parametrize(
    "config_path",
    [c for c in CONFIGS if os.path.basename(c) not in SKIP],
    ids=os.path.basename,
)
def test_config_resolves_and_instantiates(config_path, tmp_path):
    runner = BenchmarkRunner(config_path, output_dir=str(tmp_path))
    base = runner.config.get("algorithms", {})
    assert base, f"{config_path}: no algorithms"
    for entry in runner.config.get("datasets", []):
        ds = runner._normalize_dataset_entry(entry)
        merged = copy.deepcopy(base)
        for name, override in (ds.get("algorithms") or {}).items():
            merged[name] = deep_merge(merged.get(name, {}), override or {})
        resolved = runner._resolve_modular_components(merged)
        for name, cfg in resolved.items():
            cfg = {k: v for k, v in cfg.items() if k != "persistence"}
            algo = algorithm_from_config(name, cfg, dimension=16)
            assert algo is not None
