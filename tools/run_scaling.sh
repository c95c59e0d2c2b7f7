#!/usr/bin/env bash
# N-vs-4N scaling-efficiency protocol (BASELINE.md): the same spark-submit job
# on the SAME input at two parallelism levels, multiple interleaved trials per
# leg with per-metric best (the sandbox host has multi-minute noisy-neighbor
# episodes with 2-6x swings; minima estimate the quiet-host throughput both
# legs would see on dedicated hardware). taskset pins the WHOLE process tree
# (JVMs + python workers): without it a 4-core leg's python workers spill onto
# the remaining cores and it silently uses ~2N. Also records a raw-CPU control
# (busy loops at the same two core counts) = the hardware ceiling of this host.
#
# Default mode = EXECUTOR CLUSTER: local-cluster[n,c,mem] spawns n real
# executor JVMs (own heap, GC, shuffle server, python-worker pool) talking to
# the driver over RPC — the faithful sandbox substitute for "N vs 4N
# executors" (north_rule). Leg 1 = 1 executor x EXEC_CORES, leg 2 = 4
# executors x EXEC_CORES, same per-executor shape, 4x the count, exactly how
# a real cluster scales out. SCALING_MODE=threads falls back to the old
# single-JVM local[4]-vs-local[16] comparison (kept for continuity with the
# round-1 numbers; it under-reports scaling because one JVM's allocator,
# page-fault path and Arrow IPC feed are shared by all 16 threads — an
# artifact separate executor JVMs do not have).
set -euo pipefail
cd "$(dirname "$0")/.."

MODE="${SCALING_MODE:-cluster}"
EXEC_CORES="${SCALING_EXEC_CORES:-4}"
EXEC_MEM_MB="${SCALING_EXEC_MEM_MB:-16384}"
N1_EXECS="${SCALING_N1_EXECS:-1}"
N2_EXECS="${SCALING_N2_EXECS:-4}"
N1="${SCALING_N1:-$((N1_EXECS * EXEC_CORES))}"
N2="${SCALING_N2:-$((N2_EXECS * EXEC_CORES))}"
TRIALS="${SCALING_TRIALS:-3}"
# 1.28M conversations (~16.6M turns): large enough that per-job driver
# latencies (a fixed cost a real cluster also pays once per job, not per
# byte) stay a small fraction of the upper leg's wall — scaling measured on
# a bigger corpus is MORE representative of the 10^12-turn target
NCONV="${SCALING_NCONV:-1280000}"
# stable many-worker allocator env for the python workers (see
# ivfadc_spark/functions/arrow_pool.py): mimalloc Arrow pool + NO page
# purging — concurrent page-fault/zeroing in the kernel was the dominant
# measured scaling bottleneck (9x on the encode kernel at 16 workers).
# spark-submit's JVM is the worker parent, so the env must be set here, not
# in the driver script (session.py also injects spark.executorEnv.*).
export ARROW_DEFAULT_MEMORY_POOL="${ARROW_DEFAULT_MEMORY_POOL:-mimalloc}"
export MIMALLOC_PURGE_DELAY="${MIMALLOC_PURGE_DELAY:--1}"
export MALLOC_MMAP_THRESHOLD_="${MALLOC_MMAP_THRESHOLD_:-1073741824}"
export MALLOC_TRIM_THRESHOLD_="${MALLOC_TRIM_THRESHOLD_:-1073741824}"
CORPUS="${SCALING_CORPUS:-/tmp/ivfadc_scaling_tx_${NCONV}.parquet}"
QUERIES="${SCALING_QUERIES:-50000}"
mkdir -p BENCH

python tools/make_dist.py >/dev/null
# one control file PER WINDOW (keyed by the window's first trial): controls
# pair only with same-window trials; cpu_control.json stays as a back-compat
# copy of the LATEST window's control
CONTROL_OUT="BENCH/cpu_control_t${SCALING_TRIAL_START:-1}.json"
python tools/cpu_control.py --n1 "$N1" --n2 "$N2" --out "$CONTROL_OUT"
cp -f "$CONTROL_OUT" BENCH/cpu_control.json

run() {
  local execs="$1" t="$2"
  local ncores=$((execs * EXEC_CORES)) master
  if [ "$MODE" = cluster ]; then
    master="local-cluster[$execs,$EXEC_CORES,$EXEC_MEM_MB]"
  else
    master="local[$ncores]"
  fi
  # spark.executor.memory defaults to 1g even when the local-cluster worker
  # owns EXEC_MEM_MB — request (almost) the whole worker allocation or the
  # executors OOM and the app aborts at startup
  taskset -c "0-$((ncores - 1))" spark-submit --master "$master" --py-files dist/engine.zip \
    --conf spark.driver.memory="${SCALING_DRIVER_MEM:-8g}" \
    --conf spark.executor.memory="$((EXEC_MEM_MB - 1024))m" \
    jobs/bench_scaling.py --corpus "$CORPUS" --n-conv "$NCONV" \
    --queries "$QUERIES" --out "BENCH/run_n${ncores}_t${t}.json" 2>"/tmp/scaling_leg_n${ncores}_t${t}.err" | tail -1
}

# SCALING_TRIAL_START lets a later window append trials t5, t6, ... to an
# existing set without re-running (or overwriting) the earlier ones — the
# per-metric-best estimator only sharpens with more interleaved samples.
TRIAL_START="${SCALING_TRIAL_START:-1}"

for t in $(seq "$TRIAL_START" "$TRIALS"); do
  echo "== trial $t ${MODE} $N1 cores" && run "$N1_EXECS" "$t"
  echo "== trial $t ${MODE} $N2 cores" && run "$N2_EXECS" "$t"
done

python tools/report_scaling.py "$N1" "$N2" "$TRIALS" "$TRIAL_START" "$CONTROL_OUT"
