#!/usr/bin/env bash
# Round-4 TPU measurement queue (verdict items 1 + 2), serial — one chip,
# one compile service.  Each step is resumable; safe to re-run.
set -uo pipefail
cd "$(dirname "$0")/.."

echo ">> 0. tunnel probe"
timeout 120 python -c "import jax; print(jax.devices())" || {
    echo "tunnel down — aborting"; exit 1; }

echo ">> 1. training-throughput sweep (verdict item 1)"
python benchmark/bench_train_step.py --sweep || \
    echo "WARN: sweep exited nonzero (rows are resumable)"

echo ">> 2. recover the lost 512/8/20-step all.csv row (resume, no --fresh)"
python benchmark/muse_perf.py --resolutions 512 --batch-sizes 8 \
    --timesteps 20 || echo "WARN: 20-step re-measure failed (continue)"

echo ">> 3. distilled serving rows incl. 512/8/6 (verdict item 2)"
python benchmark/muse_perf.py --distilled || \
    echo "WARN: distilled sweep failed (continue)"

echo ">> 4. headline bench + all.csv cross-check"
python bench.py || echo "WARN: bench.py failed"

echo ">> 5. regenerate README table + chart from all.csv"
python benchmark/update_readme.py
python benchmark/muse_chart.py || true

echo ">> round-4 queue done"
