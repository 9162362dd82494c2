#!/usr/bin/env bash
# >RAM / >HBM streaming-path validation (reference's DB-size scaling
# analogue, SURVEY.md section 5). Builds out-of-core corpora in a BigStore,
# streams ground truth and the IVF-PQ/SQ8 builds, and asserts peak RSS
# stays under the corpus size. Run with --platform cpu for the RSS bound
# (the axon tunnel client leaks ~1x host RAM per transfer, so host-RSS
# bounds are only meaningful on the leak-free CPU backend — CLAUDE.md).
#
# Usage:
#   bash tpu_jobs/run_bigcorpus_validation.sh                 # 4M x 128d CPU
#   ROWS=12000000 NLIST=2048 bash tpu_jobs/run_bigcorpus_validation.sh
set -euo pipefail
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "$REPO_ROOT"
python scripts/validate_bigcorpus.py \
  --rows "${ROWS:-4000000}" --dim "${DIM:-128}" \
  --nlist "${NLIST:-1024}" --platform "${PLATFORM:-cpu}"
