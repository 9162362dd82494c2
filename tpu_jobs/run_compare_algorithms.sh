#!/usr/bin/env bash
# Statistical algorithm comparison on a TPU VM (Welch t / Mann-Whitney
# over repeated runs) — analogue of the reference's comparison jobs.
#
# Usage:
#   bash tpu_jobs/run_compare_algorithms.sh [compare args...]
# e.g.
#   bash tpu_jobs/run_compare_algorithms.sh \
#     --config configs/benchmark_config_smoke.yaml --runs 5
set -euo pipefail

REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "$REPO_ROOT"

export JAX_PLATFORMS="${JAX_PLATFORMS:-tpu}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/jax_comp}"

python scripts/compare_algorithms.py "$@"
