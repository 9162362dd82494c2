#!/usr/bin/env bash
# Full benchmark on a TPU VM (v5e-8) — the cluster-layer analogue of the
# reference's Slurm sbatch templates (reference slurm_jobs/*.sbatch).
#
# Usage (from a TPU VM or via gcloud):
#   bash tpu_jobs/run_benchmark_v5e.sh configs/benchmark_config.yaml
#
# For a pod slice, launch with:
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all \
#     --command="cd $REPO && bash tpu_jobs/run_benchmark_v5e.sh $CONFIG"
set -euo pipefail

CONFIG="${1:-configs/benchmark_config.yaml}"
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "$REPO_ROOT"

export JAX_PLATFORMS="${JAX_PLATFORMS:-tpu}"
# Avoid long first-compile stalls dominating short runs.
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/jax_comp}"

python scripts/run_full_benchmark.py --config "$CONFIG"
