#!/usr/bin/env bash
# Two-phase msmarco job (reference's build_only -> retrieve_only Slurm
# pattern for walltime-limited clusters, methodology/persist docs): phase 1
# builds + persists the indexes, phase 2 loads the artifacts and only
# searches. Mirrors tpu_jobs/covertree_build_then_retrieve.sh for the
# msmarco-shaped suite.
#
# Usage: bash tpu_jobs/msmarco_build_then_retrieve.sh
set -euo pipefail
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "$REPO_ROOT"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/jax_comp}"

python scripts/run_full_benchmark.py --config configs/msmarco_build.yaml
python scripts/run_full_benchmark.py --config configs/msmarco_retrieve.yaml
