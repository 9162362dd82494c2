#!/usr/bin/env bash
# MS MARCO dataprep (reference ms_marco_subsample_generate.slurm.sh +
# ms_marco_subsample_embed.sh / singlerun_embedmsmarco_pat.sbatch):
# subsample the passage corpus then embed it. On egress-blocked hosts pass
# SYNTHETIC=1 to produce the seeded synthetic embeddings instead of
# downloading ir_datasets + the MiniLM model.
set -euo pipefail
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"; cd "$REPO_ROOT"
OUT="${OUT:-data/msmarco_subset}"
EMB="${EMB:-data/msmarco_embeddings}"
if [[ "${SYNTHETIC:-0}" != "1" ]]; then
  python -m vectordb_retrieval_tpu.data.dataprep.subsample_msmarco \
    --output-dir "$OUT" --corpus-sample "${CORPUS_SIZE:-1000000}" \
    --query-sample "${QUERY_SIZE:-1000}"
  python -m vectordb_retrieval_tpu.data.dataprep.embed_msmarco \
    --input-dir "$OUT" --output-dir "$EMB"
else
  python -m vectordb_retrieval_tpu.data.dataprep.embed_msmarco \
    --input-dir "$OUT" --output-dir "$EMB" --synthetic
fi
