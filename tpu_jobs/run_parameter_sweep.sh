#!/usr/bin/env bash
# Parameter sweep on a TPU VM — analogue of the reference's sweep sbatch
# launchers (reference slurm_jobs/ single-run templates driving
# parameter exploration).
#
# Usage:
#   bash tpu_jobs/run_parameter_sweep.sh [sweep_config] [extra args...]
set -euo pipefail

CONFIG="${1:-configs/sweep_example.yaml}"
shift || true
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "$REPO_ROOT"

export JAX_PLATFORMS="${JAX_PLATFORMS:-tpu}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/jax_comp}"

python scripts/parameter_sweep.py --config "$CONFIG" "$@"
