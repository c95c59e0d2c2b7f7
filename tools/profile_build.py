"""Profile the index build at one parallelism level with Spark event logs,
then aggregate per-stage executor Run/CPU/GC/shuffle time from the log.

    taskset -c 0-3  spark-submit --master 'local-cluster[1,4,16384]' \
        --conf spark.executor.memory=15g --py-files dist/engine.zip \
        tools/profile_build.py --corpus /tmp/ivfadc_scaling_tx_1280000.parquet
    python tools/profile_build.py --parse /tmp/ivfadc_events/<app-id>*

The run prints the event-log path; --parse prints one line per stage:
wall, task count, sum task run time, executor CPU time, GC, shuffle
write/fetch, python-worker compute. run >> cpu on a python stage means
workers blocked; cpu inflated vs a low-parallelism run means contention.
"""

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse(paths: list[str]) -> None:
    import subprocess

    stages: dict[tuple, dict] = {}
    for path in paths:
        if os.path.isdir(path):
            path = next(
                p
                for p in glob.glob(os.path.join(path, "*"))
                if "appstatus" not in p and not p.endswith(".inprogress")
            )
        raw = open(path, "rb").read()
        if path.endswith(".zstd") or raw[:4] == b"\x28\xb5\x2f\xfd":
            raw = subprocess.run(["zstd", "-dc", path], capture_output=True, check=True).stdout
        for line in raw.decode().splitlines():
            ev = json.loads(line)
            t = ev.get("Event")
            if t == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                key = (si["Stage ID"],)
                st = stages.setdefault(key, {"tasks": 0, "run": 0, "cpu": 0, "gc": 0,
                                             "sw": 0, "sr": 0, "py": 0})
                st["name"] = si["Stage Name"].split("\n")[0][:60]
                st["wall"] = (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1e3
            elif t == "SparkListenerTaskEnd":
                key = (ev["Stage ID"],)
                st = stages.setdefault(key, {"tasks": 0, "run": 0, "cpu": 0, "gc": 0,
                                             "sw": 0, "sr": 0, "py": 0})
                m = ev.get("Task Metrics") or {}
                st["tasks"] += 1
                st["run"] += m.get("Executor Run Time", 0) / 1e3
                st["cpu"] += m.get("Executor CPU Time", 0) / 1e9
                st["gc"] += m.get("JVM GC Time", 0) / 1e3
                st["sw"] += (m.get("Shuffle Write Metrics") or {}).get("Shuffle Write Time", 0) / 1e9
                st["sr"] += (m.get("Shuffle Read Metrics") or {}).get("Fetch Wait Time", 0) / 1e3
    print(f"{'stage':>5} {'wall':>7} {'tasks':>5} {'run_s':>8} {'cpu_s':>8} "
          f"{'gc_s':>6} {'shufW_s':>7} {'fetch_s':>7}  name")
    for key in sorted(stages):
        st = stages[key]
        if st.get("wall", 0) < 0.3 and st["run"] < 1:
            continue
        print(f"{key[0]:>5} {st.get('wall', 0):>7.1f} {st['tasks']:>5} {st['run']:>8.1f} "
              f"{st['cpu']:>8.1f} {st['gc']:>6.1f} {st['sw']:>7.1f} {st['sr']:>7.1f}  "
              f"{st.get('name', '?')}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/ivfadc_scaling_tx_1280000.parquet")
    ap.add_argument("--parse", nargs="+", default=None, help="event log files to aggregate")
    ap.add_argument("--events-dir", default="/tmp/ivfadc_events")
    args = ap.parse_args()

    if args.parse:
        parse(args.parse)
        return

    from ivfadc_spark.config import EngineConfig
    from ivfadc_spark.plans.build_index import build_index
    from ivfadc_spark.session import get_spark, wait_for_executors

    os.makedirs(args.events_dir, exist_ok=True)
    spark = get_spark(
        "profile-build",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": args.events_dir,
        },
    )
    cores = wait_for_executors(spark)
    tx = spark.read.parquet(args.corpus)
    cfg = EngineConfig(block_size=256, doc_shards=32)
    out = tempfile.mkdtemp(prefix="ivfadc_profile_idx_")
    t0 = time.time()
    seg = build_index(spark, tx, out, cfg=cfg)
    seg.blocks.count()
    wall = time.time() - t0
    app_id = spark.sparkContext.applicationId
    shutil.rmtree(out, ignore_errors=True)
    print(json.dumps({"cores": cores, "build_wall_s": round(wall, 2),
                      "event_log": os.path.join(args.events_dir, app_id)}))
    spark.stop()


if __name__ == "__main__":
    main()
