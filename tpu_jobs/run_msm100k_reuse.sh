#!/usr/bin/env bash
# All-datasets run with the msmarco covertree artifact reused (reference
# codex_all_datasets_msm100k_reuse_ct[_lsh_tuned].sbatch). LSH_TUNED=1
# switches to the tuned-LSH variant config.
set -euo pipefail
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"; cd "$REPO_ROOT"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/jax_comp}"
CONFIG=configs/benchmark_msm100k_covertree_reuse.yaml
[[ "${LSH_TUNED:-0}" == "1" ]] && CONFIG=configs/benchmark_msm100k_covertree_reuse_lsh_tuned.yaml
python scripts/run_full_benchmark.py --config "$CONFIG"
