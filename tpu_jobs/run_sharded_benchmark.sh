#!/usr/bin/env bash
# Multi-chip sharded-family benchmark. On a pod slice this exercises the
# real ICI collectives; on a CPU-only host it dry-runs the same program
# on 8 virtual devices (identical HLO modulo the collective backend).
#
# Usage:
#   bash tpu_jobs/run_sharded_benchmark.sh            # real TPU devices
#   DRYRUN=1 bash tpu_jobs/run_sharded_benchmark.sh   # 8-device CPU mesh
set -euo pipefail

CONFIG="${1:-configs/benchmark_sharded.yaml}"
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "$REPO_ROOT"

if [[ "${DRYRUN:-0}" == "1" ]]; then
  export JAX_PLATFORMS=cpu
  export XLA_FLAGS="${XLA_FLAGS:-} --xla_force_host_platform_device_count=8"
else
  export JAX_PLATFORMS="${JAX_PLATFORMS:-tpu}"
fi
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/jax_comp}"

python scripts/run_full_benchmark.py --config "$CONFIG"
