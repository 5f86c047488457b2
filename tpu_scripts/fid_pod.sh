#!/usr/bin/env bash
# FID evaluation across a pod: every host generates its slice of the 30k
# COCO-caption images (reference slurm_scripts FID array jobs +
# scripts/calculate_fid.py:74-142 SLURM shard math -> --task-id/--num-tasks),
# then worker 0 scores the pooled directory.
#
# Usage:
#   ./tpu_scripts/fid_pod.sh [--dry-run] <tpu-name> <zone> <model-dir> <captions-file> <out-dir> [real-dir]

set -euo pipefail
source "$(dirname "$0")/common.sh"

TPU_NAME=${1:?} ZONE=${2:?} MODEL=${3:?} CAPTIONS=${4:?} OUT=${5:?}
REAL_DIR=${6:-}

N_HOSTS=$(tpu_host_count "${TPU_NAME}" "${ZONE}")

echo ">> generating on ${N_HOSTS} hosts"
for ((i=0; i<N_HOSTS; i++)); do
  tpu_ssh "${TPU_NAME}" "${ZONE}" "${i}" \
      "cd ~/muse-tpu && nohup python scripts/calculate_fid.py \
          --model '${MODEL}' --captions '${CAPTIONS}' --output-dir '${OUT}' \
          --num-images 30000 --batch-size 16 --timesteps 12 \
          --task-id ${i} --num-tasks ${N_HOSTS} > fid_gen_${i}.log 2>&1 &"
done

if [[ -n "${REAL_DIR}" ]]; then
  echo ">> scoring on worker 0 once generation finishes"
  tpu_ssh "${TPU_NAME}" "${ZONE}" 0 \
      "cd ~/muse-tpu && python scripts/calculate_fid.py \
          --model '${MODEL}' --captions '${CAPTIONS}' --output-dir '${OUT}' \
          --real-dir '${REAL_DIR}' --num-images 0"
fi
echo "launched FID generation on ${N_HOSTS} hosts"
