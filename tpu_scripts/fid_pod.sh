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
# Max seconds to wait for any single host's generation before giving up
# (covers SSH drops / OOM kills / reboots that never write the .done file).
MAX_WAIT_SECS=${MUSE_FID_MAX_WAIT_SECS:-21600}

N_HOSTS=$(tpu_host_count "${TPU_NAME}" "${ZONE}")

echo ">> generating on ${N_HOSTS} hosts"
for ((i=0; i<N_HOSTS; i++)); do
  # each generation run drops fid_gen_<i>.done (containing its exit code)
  # when it finishes so the scoring pass can wait for ALL hosts
  tpu_ssh "${TPU_NAME}" "${ZONE}" "${i}" \
      "cd ~/muse-tpu && rm -f fid_gen_${i}.done && nohup sh -c \
          'python scripts/calculate_fid.py \
              --model '${MODEL}' --captions '${CAPTIONS}' --output-dir '${OUT}' \
              --num-images 30000 --batch-size 16 --timesteps 12 \
              --task-id ${i} --num-tasks ${N_HOSTS} > fid_gen_${i}.log 2>&1; \
           echo \$? > fid_gen_${i}.done' >/dev/null 2>&1 &"
done

if [[ -n "${REAL_DIR}" ]]; then
  echo ">> waiting for generation to finish on all hosts"
  for ((i=0; i<N_HOSTS; i++)); do
    if [[ "${DRY_RUN}" == "1" ]]; then
      tpu_ssh "${TPU_NAME}" "${ZONE}" "${i}" \
          "wait-for fid_gen_${i}.done == 0"  # prints the wait plan
      continue
    fi
    waited=0
    while rc=$(tpu_ssh "${TPU_NAME}" "${ZONE}" "${i}" \
        "cat ~/muse-tpu/fid_gen_${i}.done 2>/dev/null"); [[ -z "${rc}" ]]; do
      if (( waited >= MAX_WAIT_SECS )); then
        echo "!! host ${i} generation did not finish within ${MAX_WAIT_SECS}s" \
             "(no fid_gen_${i}.done); check fid_gen_${i}.log on that host" >&2
        exit 1
      fi
      # fail fast if the nohup'd process died without writing its .done file
      alive=$(tpu_ssh "${TPU_NAME}" "${ZONE}" "${i}" \
          "pgrep -f 'calculate_fid.py.*--task-id ${i} ' >/dev/null 2>&1 && echo y" || true)
      if [[ -z "${alive}" ]]; then
        # one grace re-check: the process may have exited between polls
        rc=$(tpu_ssh "${TPU_NAME}" "${ZONE}" "${i}" \
            "cat ~/muse-tpu/fid_gen_${i}.done 2>/dev/null" || true)
        [[ -n "${rc}" ]] && break
        echo "!! host ${i} generation process is gone without a .done file;" \
             "see fid_gen_${i}.log on that host" >&2
        exit 1
      fi
      sleep 60
      waited=$((waited + 60))
    done
    if [[ "${rc}" != "0" ]]; then
      echo "!! generation failed on host ${i} (exit ${rc}); see fid_gen_${i}.log" >&2
      exit 1
    fi
    echo "   host ${i} done"
  done
  echo ">> scoring on worker 0"
  tpu_ssh "${TPU_NAME}" "${ZONE}" 0 \
      "cd ~/muse-tpu && python scripts/calculate_fid.py \
          --model '${MODEL}' --captions '${CAPTIONS}' --output-dir '${OUT}' \
          --real-dir '${REAL_DIR}' --num-images 0"
fi
echo "FID generation complete on ${N_HOSTS} hosts"
