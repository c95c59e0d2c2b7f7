#!/usr/bin/env bash
# N-vs-4N scaling-efficiency protocol (BASELINE.md): the same spark-submit job
# on the SAME input at two pinned core counts (default 4 and 16), multiple
# interleaved trials per leg with per-metric best (the sandbox host has
# multi-minute noisy-neighbor episodes with 2-6x swings; minima estimate the
# quiet-host throughput both legs would see on dedicated hardware). taskset
# pins the WHOLE process tree (JVM + python workers): without it a local[N]
# driver's python workers spill onto the remaining cores and the "N-core"
# leg silently uses ~2N. Also records a raw-CPU control (busy loops at the
# same two core counts) = the hardware scaling ceiling of this host.
set -euo pipefail
cd "$(dirname "$0")/.."

N1="${SCALING_N1:-4}"
N2="${SCALING_N2:-16}"
TRIALS="${SCALING_TRIALS:-3}"
# 1.28M conversations (~16.6M turns): large enough that per-job driver
# latencies (a fixed cost a real cluster also pays once per job, not per
# byte) stay a small fraction of the upper leg's wall — scaling measured on
# a bigger corpus is MORE representative of the 10^12-turn target
NCONV="${SCALING_NCONV:-1280000}"
# stable many-worker Arrow allocator for the python workers (see
# ivfadc_spark/functions/arrow_pool.py); spark-submit's JVM is the worker
# parent, so the env must be set here, not in the driver script
export ARROW_DEFAULT_MEMORY_POOL="${ARROW_DEFAULT_MEMORY_POOL:-mimalloc}"
CORPUS="${SCALING_CORPUS:-/tmp/ivfadc_scaling_tx_${NCONV}.parquet}"
QUERIES="${SCALING_QUERIES:-50000}"
mkdir -p BENCH

python tools/make_dist.py >/dev/null
python tools/cpu_control.py --n1 "$N1" --n2 "$N2" --out BENCH/cpu_control.json

run() {
  local n="$1" t="$2"
  taskset -c "0-$((n - 1))" spark-submit --master "local[$n]" --py-files dist/engine.zip \
    --conf spark.driver.memory=48g \
    jobs/bench_scaling.py --corpus "$CORPUS" --n-conv "$NCONV" \
    --queries "$QUERIES" --out "BENCH/run_n${n}_t${t}.json" 2>/dev/null | tail -1
}

for t in $(seq 1 "$TRIALS"); do
  echo "== trial $t local[$N1]" && run "$N1" "$t"
  echo "== trial $t local[$N2]" && run "$N2" "$t"
done

python tools/report_scaling.py "$N1" "$N2" "$TRIALS"
