#!/usr/bin/env bash
# TPU measurement backlog — run on the real chip when the tunnel is up.
# Each step is resumable/idempotent (muse_perf skips already-measured rows;
# the persistent XLA compile cache makes retries cheap).  Written during the
# 2026-08-18 tunnel outage so any session can execute the queue verbatim.
#
# Usage: ./benchmark/run_tpu_backlog.sh [--quick]
#   --quick  skip the 20-step re-measure (only the distilled rows + bench)

set -uo pipefail
cd "$(dirname "$0")/.."

QUICK=0
[[ "${1:-}" == "--quick" ]] && QUICK=1

echo ">> 0. tunnel probe"
timeout 120 python -c "import jax; print(jax.devices())" || {
    echo "tunnel down — aborting"; exit 1; }

if [[ "$QUICK" == "0" ]]; then
  echo ">> 1. recover the lost 512/8/20-step all.csv row (resume, no --fresh)"
  python benchmark/muse_perf.py --resolutions 512 --batch-sizes 8 \
      --timesteps 20 || echo "WARN: 20-step re-measure failed (continue)"
fi

echo ">> 2. distilled serving config rows (6-step, no CFG batch-double)"
python benchmark/muse_perf.py --distilled || \
    echo "WARN: distilled sweep failed (continue)"

echo ">> 3. headline bench + all.csv cross-check"
python bench.py || echo "WARN: bench.py failed"

echo ">> 4. regenerate README table + chart from all.csv"
python benchmark/update_readme.py
python benchmark/muse_chart.py || true

if [[ "$QUICK" == "0" ]]; then
  echo ">> 5. (optional) retry the bs128 train-step point (crashed the AOT"
  echo ">>    helper in round 2; the GLU kernel shrank the program since)"
  python benchmark/bench_train_step.py --sweep --batch-sizes 128 || \
      echo "WARN: bs128 still fails (environment-bound; labeled row ok)"

  echo ">> 6. (optional) research-scale distillation demo: a few hundred"
  echo ">>    on-chip distill steps on the staged checkpoint + quality rows"
  echo ">>    (manual: stage_reference_checkpoint.py -> training.distill"
  echo ">>    config=configs/distill.yaml distill.teacher_checkpoint=<staged>"
  echo ">>    training.max_train_steps=300 -> measure_quality --pipeline)"
fi

echo ">> backlog done; review benchmark/artifacts/all.csv + README diff"
