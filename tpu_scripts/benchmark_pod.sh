#!/usr/bin/env bash
# Run the perf sweep on worker 0 of a pod (reference benchmark/muse_perf.py
# ran on a local A100) and pull the CSV back.
#
# Usage:
#   ./tpu_scripts/benchmark_pod.sh [--dry-run] <tpu-name> <zone> [out-csv]

set -euo pipefail
source "$(dirname "$0")/common.sh"

TPU_NAME=${1:?} ZONE=${2:?}
OUT=${3:-benchmark/artifacts/all.csv}

tpu_ssh "${TPU_NAME}" "${ZONE}" 0 \
    "cd ~/muse-tpu && python benchmark/muse_perf.py --fresh"
run gcloud compute tpus tpu-vm scp \
    "${TPU_NAME}:~/muse-tpu/benchmark/artifacts/all.csv" "${OUT}" \
    --zone "${ZONE}" --worker=0
echo "benchmark sweep complete -> ${OUT}"
