#!/usr/bin/env bash
# Multi-HOST (pod / multi-slice) launcher. On a real TPU pod, run this on
# EVERY host (e.g. via `gcloud compute tpus tpu-vm ssh --worker=all`);
# jax.distributed auto-detects the pod topology and
# parallel/mesh.make_multihost_mesh builds the hybrid (dcn, db) mesh —
# the database shards over both axes, candidate merges ride ICI inside a
# slice and cross DCN only as k-sized lists.
#
# Without pod hardware, DRYRUN=1 spoofs a 2-host x 4-device CPU topology
# in subprocesses (Gloo collectives) — the same program the driver's
# multi-chip gate validates, extended across processes.
#
# Usage:
#   bash tpu_jobs/run_multihost_pod.sh                       # on each pod host
#   DRYRUN=1 bash tpu_jobs/run_multihost_pod.sh              # spoofed 2-host
#   PROCS=4 LOCAL_DEVICES=2 DRYRUN=1 bash tpu_jobs/run_multihost_pod.sh
set -euo pipefail

REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "$REPO_ROOT"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/jax_comp}"

if [[ "${DRYRUN:-0}" == "1" ]]; then
  python scripts/dryrun_multihost.py \
    --procs "${PROCS:-2}" --local-devices "${LOCAL_DEVICES:-4}"
else
  # real pod: every host runs the same entry; jax.distributed.initialize()
  # with no args auto-detects coordinator + process ids from the TPU env
  python - <<'PY'
import jax
from vectordb_retrieval_tpu.parallel.mesh import (
    init_distributed, make_multihost_mesh,
)
init_distributed()
mesh = make_multihost_mesh()
if jax.process_index() == 0:
    print(f"pod mesh ready: {dict(mesh.shape)} over "
          f"{jax.process_count()} hosts / {jax.device_count()} chips")
PY
fi
