#!/usr/bin/env bash
# Two-phase cover-tree job: build+persist, then retrieve from the artifact —
# the walltime-splitting workflow the reference ran as two Slurm jobs
# (reference slurm_jobs/ covertree build/retrieve pairs,
# methodology/persist_covertree_index.md).
set -euo pipefail

REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "$REPO_ROOT"

python scripts/run_full_benchmark.py --config configs/covertree_build.yaml
python scripts/run_full_benchmark.py --config configs/covertree_retrieve.yaml
