#!/usr/bin/env bash
# Shared helpers for the TPU-pod launchers (the reference's SLURM analog,
# slurm_scripts/).  Every launcher accepts --dry-run as its first argument:
# commands are printed instead of executed, so the full command plan is
# testable without gcloud or a pod.

DRY_RUN=0
if [[ "${1:-}" == "--dry-run" ]]; then
  DRY_RUN=1
  shift
fi

run() {
  if [[ "${DRY_RUN}" == "1" ]]; then
    echo "DRY-RUN: $*"
  else
    "$@"
  fi
}

tpu_ssh() {  # tpu_ssh <name> <zone> <worker> <command...>
  local name=$1 zone=$2 worker=$3
  shift 3
  run gcloud compute tpus tpu-vm ssh "${name}" --zone "${zone}" \
      --worker="${worker}" --command "$*"
}

tpu_scp() {  # tpu_scp <src> <dst> <zone>
  run gcloud compute tpus tpu-vm scp --recurse "$1" "$2" --zone "$3" --worker=all
}

tpu_host_count() {  # tpu_host_count <name> <zone>
  if [[ "${DRY_RUN}" == "1" ]]; then
    echo 2  # deterministic plan for tests
  else
    gcloud compute tpus tpu-vm describe "$1" --zone "$2" \
        --format='value(networkEndpoints.length())'
  fi
}
