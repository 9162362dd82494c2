#!/usr/bin/env bash
# Smoke benchmark (reference singlerun_smoke.sbatch / covertree_smoke.sbatch):
# tiny random dataset through the full runner; CPU-safe.
set -euo pipefail
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"; cd "$REPO_ROOT"
python scripts/run_full_benchmark.py --config "${1:-configs/benchmark_config_smoke.yaml}"
