"""One-off A/B: partitionBy write with concurrent writers vs sort-based.

    taskset -c 0-15 spark-submit --master local-cluster[4,4,16384] \
        --py-files dist/engine.zip --conf spark.executor.memory=15360m \
        tools/ab_write_sort.py --corpus /tmp/ivfadc_scaling_tx_1280000.parquet

Interleaved builds flipping spark.sql.maxConcurrentOutputFileWriters at
runtime; prints per-build stage walls.
"""

import _bootstrap  # noqa: F401
import argparse
import json
import shutil
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

    from ivfadc_spark.config import EngineConfig
    from ivfadc_spark.plans.build_index import build_index
    from ivfadc_spark.session import get_spark, wait_for_executors

    spark = get_spark("ab-write-sort")
    wait_for_executors(spark)
    tx = spark.read.parquet(args.corpus)
    cfg = EngineConfig(block_size=256, doc_shards=32)

    # warm-up
    from ivfadc_spark.sources.transcripts import synth_transcripts_fast_pdf

    warm = spark.createDataFrame(
        synth_transcripts_fast_pdf(n_conversations=1500, seed=1),
        schema="conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    ).repartition(32)
    wdir = tempfile.mkdtemp(prefix="ab_warm_")
    build_index(spark, warm, wdir, cfg=cfg).blocks.count()
    shutil.rmtree(wdir, ignore_errors=True)

    results = []
    for r in range(args.rounds):
        for mode, val in (("writers", "128"), ("sort", "0")):
            spark.conf.set("spark.sql.maxConcurrentOutputFileWriters", val)
            out = tempfile.mkdtemp(prefix=f"ab_{mode}_")
            t0 = time.time()
            seg = build_index(spark, tx, out, cfg=cfg)
            seg.blocks.count()
            wall = time.time() - t0
            with open(f"{out}/_manifest.json") as f:
                stages = {k: v["wall_s"] for k, v in json.load(f)["stages"].items()}
            shutil.rmtree(out, ignore_errors=True)
            rec = {"round": r, "mode": mode, "wall": round(wall, 1), "stages": stages}
            results.append(rec)
            print(json.dumps(rec), flush=True)
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
