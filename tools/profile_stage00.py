"""Isolate stage 00 (doc_id assignment + fused doc_map/dl write) for
profiling: per-job walls for the range-partition+cache, the sizes collect,
and the write. Usage:

    python tools/profile_stage00.py --master local[8] [--no-dl] [--impl mono|window]
"""

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default="local[8]")
    ap.add_argument("--corpus", default="/tmp/ivfadc_scaling_tx_320000.parquet")
    ap.add_argument("--impl", default="mono", choices=["mono", "window"])
    ap.add_argument("--mem", default=None, help="driver memory, e.g. 48g")
    ap.add_argument("--disk-only", action="store_true", help="persist StorageLevel.DISK_ONLY")
    ap.add_argument("--no-dl", action="store_true", help="write without the tokenize dl column")
    ap.add_argument("--warmup", action="store_true", help="run the tiny warm-up build first (bench context)")
    ap.add_argument("--warmup-mode", default="full", choices=["full", "jvm", "python"], help="full build / JVM-only stages / python-worker jobs only")
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_MASTER"] = args.master
    from pyspark.sql import functions as F

    from ivfadc_spark.session import get_spark

    conf = {"spark.master": args.master}
    if args.mem:
        conf["spark.driver.memory"] = args.mem
    spark = get_spark("profile-stage00", extra_conf=conf)
    par = spark.sparkContext.defaultParallelism
    print(f"master={spark.sparkContext.master} par={par}")

    if args.warmup:
        from ivfadc_spark.config import EngineConfig
        from ivfadc_spark.plans.build_index import build_index
        from ivfadc_spark.sources.transcripts import synth_transcripts_fast_pdf
        import shutil as _sh
        warm_pdf = synth_transcripts_fast_pdf(n_conversations=1500, seed=1)
        warm_tx = spark.createDataFrame(
            warm_pdf,
            schema="conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
        ).repartition(par * 2)
        wd = tempfile.mkdtemp(prefix="prof_warm_")
        if args.warmup_mode == "full":
            build_index(spark, warm_tx, wd, cfg=EngineConfig(block_size=256, doc_shards=32)).blocks.count()
        elif args.warmup_mode == "jvm":
            from ivfadc_spark.sources.transcripts import assign_doc_ids, release_doc_ids
            wi = assign_doc_ids(warm_tx)
            wi.write.mode("overwrite").parquet(wd + "/docs")
            release_doc_ids(wi)
            spark.read.parquet(wd + "/docs").groupBy("conv_id").count().count()
        else:
            from ivfadc_spark.operators.stats import term_frequencies_mapside
            warm_tx2 = warm_tx.withColumn("doc_id", F.monotonically_increasing_id())
            term_frequencies_mapside(warm_tx2).count()
        _sh.rmtree(wd, ignore_errors=True)
        print("warm-up done:", args.warmup_mode)

    tx = spark.read.parquet(args.corpus)

    t0 = time.time()
    parted = (
        tx.repartitionByRange(par, "conv_id", "turn_idx")
        .sortWithinPartitions("conv_id", "turn_idx")
        .withColumn("_pid", F.spark_partition_id())
    )
    if args.disk_only:
        from pyspark import StorageLevel
        parted = parted.persist(StorageLevel.DISK_ONLY)
    else:
        parted = parted.persist()
    sizes = {
        r["_pid"]: r["cnt"]
        for r in parted.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    t_cache = time.time() - t0
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
    )

    if args.impl == "mono":
        out = (
            parted.withColumn("_mid", F.monotonically_increasing_id())
            .join(F.broadcast(off_df), "_pid")
            .withColumn(
                "doc_id",
                (F.col("_off") + F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1))).cast("long"),
            )
            .drop("_pid", "_off", "_mid")
        )
    else:
        from pyspark.sql.window import Window

        w = Window.partitionBy("_pid").orderBy("conv_id", "turn_idx")
        out = (
            parted.join(F.broadcast(off_df), "_pid")
            .withColumn("doc_id", (F.col("_off") + F.row_number().over(w) - 1).cast("long"))
            .drop("_pid", "_off")
        )

    from ivfadc_spark.functions.tokenize import tokens_col

    cols = ["doc_id", "conv_id", "turn_idx", "text"]
    sel = out.select(*cols) if args.no_dl else out.select(
        *cols, F.size(tokens_col("text")).cast("long").alias("dl")
    )
    dst = tempfile.mkdtemp(prefix="prof_stage00_")
    t0 = time.time()
    sel.write.mode("overwrite").parquet(dst)
    t_write = time.time() - t0
    print(f"impl={args.impl} no_dl={args.no_dl} cache_s={t_cache:.1f} write_s={t_write:.1f}")
    shutil.rmtree(dst, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
