#!/usr/bin/env bash
# N-vs-4N scaling-efficiency protocol (BASELINE.md): same job, same input,
# local[8] then local[32]; writes BENCH/run_n8.json, BENCH/run_n32.json and
# regenerates the results table in BENCH/BASELINE.md.
set -euo pipefail
cd "$(dirname "$0")/.."

NCONV="${SCALING_NCONV:-320000}"
CORPUS="${SCALING_CORPUS:-/tmp/ivfadc_scaling_tx_${NCONV}.parquet}"
QUERIES="${SCALING_QUERIES:-100000}"
mkdir -p BENCH

python tools/make_dist.py >/dev/null

run() {
  local n="$1"
  # taskset pins the WHOLE process tree (JVM + python workers) to n cores:
  # without it, a local[8] driver's python workers spill onto the other 24
  # cores and the "8-core" leg silently uses ~16 — the honest cluster analog
  # is an 8-core box, so give it exactly 8.
  local last=$((n - 1))
  taskset -c "0-$last" spark-submit --master "local[$n]" --py-files dist/engine.zip \
    --conf spark.driver.memory=48g \
    jobs/bench_scaling.py --corpus "$CORPUS" --n-conv "$NCONV" \
    --queries "$QUERIES" --out "BENCH/run_n$n.json" 2>/dev/null | tail -1
}

echo "== local[8]" && run 8
echo "== local[32]" && run 32

python tools/report_scaling.py BENCH/run_n8.json BENCH/run_n32.json
