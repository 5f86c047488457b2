#!/usr/bin/env bash
# TPU-pod training launcher (the SLURM analog: reference slurm_scripts/*.slurm
# used sbatch + torch.distributed.run with c10d rendezvous + NCCL/EFA env
# tuning, research_run_512.slurm:43-72).  On TPU pods none of that exists:
# every host runs the same process and jax.distributed.initialize() discovers
# the pod topology from the TPU metadata — no rendezvous server, no comm env
# tuning.
#
# Usage:
#   ./tpu_scripts/launch_pod.sh [--dry-run] <tpu-name> <zone> configs/research_run_512.yaml [overrides...]
#
# MUSE_TRAIN_MODULE selects the trainer CLI (default
# open_muse_tpu.training.train_muse); e.g. pod distillation:
#   MUSE_TRAIN_MODULE=open_muse_tpu.training.distill \
#       ./tpu_scripts/launch_pod.sh my-pod us-central2-b configs/distill.yaml
#
# Requires: gcloud CLI authenticated, datasets reachable from the hosts
# (GCS via pipe: urls).

set -euo pipefail
source "$(dirname "$0")/common.sh"

TPU_NAME=${1:?tpu name}
ZONE=${2:?zone}
CONFIG=${3:?config path}
shift 3
OVERRIDES="$*"
MODULE=${MUSE_TRAIN_MODULE:-open_muse_tpu.training.train_muse}

REPO_DIR=$(cd "$(dirname "$0")/.." && pwd)

echo ">> syncing repo to all hosts of ${TPU_NAME}"
tpu_scp "${REPO_DIR}" "${TPU_NAME}:~/muse-tpu" "${ZONE}"

echo ">> building native IO library on all hosts"
tpu_ssh "${TPU_NAME}" "${ZONE}" all "make -C ~/muse-tpu/native -s"

echo ">> launching training on all hosts"
# MUSE_AUTO_DISTRIBUTED=1 makes the trainer call jax.distributed.initialize()
# (no-arg pod auto-detect) via parallel/mesh.py initialize_distributed();
# per-host shard splitting happens inside the data pipeline
# (open_muse_tpu/training/data.py ShardSource).
tpu_ssh "${TPU_NAME}" "${ZONE}" all \
    "cd ~/muse-tpu && MUSE_AUTO_DISTRIBUTED=1 nohup python -m \
        ${MODULE} \
        config=${CONFIG} ${OVERRIDES} > train_\$(hostname).log 2>&1 &"

echo ">> launched. tail logs with:"
echo "   gcloud compute tpus tpu-vm ssh ${TPU_NAME} --zone ${ZONE} --worker=0 --command 'tail -f ~/muse-tpu/train_*.log'"
