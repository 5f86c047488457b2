#!/usr/bin/env bash
# Research-scale distillation demo on the real chip (backlog step 6).
#
# Stages the full-research-architecture reference checkpoint (603.5M
# MaskGiTUViT_v2 + CLIP-L text tower, exported through the reference's own
# save_pretrained — see scripts/stage_reference_checkpoint.py), then runs a
# short step+guidance self-distillation (12-step CFG teacher -> 6-step
# no-CFG student) on it, proving the fused teacher-trajectory+student-update
# program compiles and the distill loss decreases at research scale.
#
# Usage: ./benchmark/run_distill_demo.sh [STEPS] [BATCH]
#   STEPS  distill steps to run (default 40 — enough for a loss trend)
#   BATCH  per-step batch (default 8; bs64 is the production config but the
#          demo only needs to prove the program + trend on one chip)

set -euo pipefail
cd "$(dirname "$0")/.."

STEPS="${1:-40}"
BATCH="${2:-8}"
STAGE=runs/staged_full_ref
OUT=runs/distill-demo

echo ">> tunnel probe"
timeout 120 python -c "import jax; print(jax.devices())" || {
    echo "tunnel down — aborting"; exit 1; }

if [[ ! -d "$STAGE/transformer" ]]; then
  echo ">> staging full research-architecture checkpoint -> $STAGE"
  python scripts/stage_reference_checkpoint.py "$STAGE" --size full || exit 1
fi

echo ">> distilling: ${STEPS} steps @ bs${BATCH} (teacher 12-step CFG -> student 6-step no-CFG)"
python -m open_muse_tpu.training.distill config=configs/distill.yaml \
    distill.teacher_checkpoint="$STAGE/transformer" \
    model.text_encoder.pretrained="$STAGE/text_encoder" \
    training.batch_size="$BATCH" \
    training.max_train_steps="$STEPS" \
    experiment.output_dir="$OUT" \
    experiment.save_every="$STEPS" \
    experiment.log_every=5 \
    lr_scheduler.params.warmup_steps=10 || {
  echo "distill run failed"; exit 1; }

echo ">> demo done; loss curve in $OUT/metrics.jsonl"
