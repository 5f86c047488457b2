#!/usr/bin/env bash
# Pod-wide offline pre-encoding (the reference's SLURM pre-encode array jobs,
# scripts/pre_encode.py:245-271; shard math handled per-host via
# --task-id/--num-tasks — embarrassingly parallel, no collectives).
#
# Usage:
#   ./tpu_scripts/pre_encode_pod.sh [--dry-run] <tpu-name> <zone> <shards-pattern> <out-dir> <vae-dir> <clip-dir>

set -euo pipefail
source "$(dirname "$0")/common.sh"

TPU_NAME=${1:?} ZONE=${2:?} SHARDS=${3:?} OUT=${4:?} VAE=${5:?} CLIP=${6:?}

N_HOSTS=$(tpu_host_count "${TPU_NAME}" "${ZONE}")

for ((i=0; i<N_HOSTS; i++)); do
  tpu_ssh "${TPU_NAME}" "${ZONE}" "${i}" \
      "cd ~/muse-tpu && nohup python scripts/pre_encode.py \
          --shards '${SHARDS}' --output-dir '${OUT}' \
          --vae-f16 '${VAE}' --text-encoder '${CLIP}' \
          --task-id ${i} --num-tasks ${N_HOSTS} > pre_encode_${i}.log 2>&1 &"
done
echo "launched pre-encode on ${N_HOSTS} hosts"
