#!/usr/bin/env bash
# No-MSMARCO benchmark (reference singlerun_nomsma_benchmarking*.sbatch,
# codex_nomsma_covertree_v2_2.sbatch): random + glove suites only.
set -euo pipefail
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"; cd "$REPO_ROOT"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/jax_comp}"
python scripts/run_full_benchmark.py --config "${1:-configs/benchmark_nomsma.yaml}"
