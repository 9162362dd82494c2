#!/usr/bin/env bash
# Covertree-focused suite (reference codex_all_covertree_benchmark.sbatch):
# build + retrieve phases over the covertree configs.
set -euo pipefail
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"; cd "$REPO_ROOT"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/jax_comp}"
python scripts/run_full_benchmark.py --config configs/covertree_build.yaml
python scripts/run_full_benchmark.py --config configs/covertree_retrieve.yaml
