#!/usr/bin/env bash
# Round-4 re-measure queue: the 20-step and distilled all.csv rows were
# measured before the fused attention-sublayer kernel landed (commit
# 5862eb4); re-measure them with the current default kernel set so every
# measured row in all.csv reflects the same program.  Serial — one chip,
# one compile service.  Rows land in /tmp CSVs and are merged into
# benchmark/artifacts/all.csv by scripts/merge_allcsv_rows.py.
set -uo pipefail
cd "$(dirname "$0")/.."

echo ">> tunnel probe"
timeout 120 python -c "import jax; print(jax.devices())" || {
    echo "tunnel down — aborting"; exit 1; }

echo ">> 1. 20-step rows (4 cases)"
python benchmark/muse_perf.py --timesteps 20 \
    --out /tmp/remeasure20_r4.csv --no-published || \
    echo "WARN: 20-step sweep exited nonzero (rows are resumable)"

echo ">> 2. distilled serving rows (4 cases)"
python benchmark/muse_perf.py --distilled \
    --out /tmp/remeasure_dist_r4.csv --no-published || \
    echo "WARN: distilled sweep exited nonzero (rows are resumable)"

echo ">> re-measure queue done"
