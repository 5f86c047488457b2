#!/usr/bin/env bash
# Pod-wide offline pre-encoding (the reference's SLURM pre-encode array jobs,
# scripts/pre_encode.py:245-271 shard math is handled per-host inside the
# script via --task-id/--num-tasks).
#
# Usage: ./tpu_scripts/pre_encode_pod.sh <tpu-name> <zone> <shards-pattern> <out-dir> <vae-dir> <clip-dir>

set -euo pipefail
TPU_NAME=${1:?} ZONE=${2:?} SHARDS=${3:?} OUT=${4:?} VAE=${5:?} CLIP=${6:?}

N_HOSTS=$(gcloud compute tpus tpu-vm describe "${TPU_NAME}" --zone "${ZONE}" \
    --format='value(networkEndpoints.length())')

for ((i=0; i<N_HOSTS; i++)); do
  gcloud compute tpus tpu-vm ssh "${TPU_NAME}" --zone "${ZONE}" --worker="${i}" \
      --command "cd ~/muse-tpu && nohup python scripts/pre_encode.py \
          --shards '${SHARDS}' --output-dir '${OUT}' \
          --vae-f16 '${VAE}' --text-encoder '${CLIP}' \
          --task-id ${i} --num-tasks ${N_HOSTS} > pre_encode_${i}.log 2>&1 &" &
done
wait
echo "launched pre-encode on ${N_HOSTS} hosts"
