"""Isolate stage 01 (map-side tf+dl) for profiling: old pandas impl vs the
mapInArrow impl, any master. Usage:

    python tools/profile_tf.py --master local[32] --impl arrow|pandas
"""

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pandas_impl(docs, text_col="text", id_col="doc_id"):
    import pandas as pd

    from ivfadc_spark.config import DEFAULT

    pattern = DEFAULT.token_pattern

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            toks = pdf[text_col].fillna("").str.lower().str.split(pattern, regex=True)
            flat = toks.explode()
            flat = flat[flat.notna() & (flat != "")]
            if len(flat) == 0:
                continue
            g = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].reindex(flat.index).to_numpy(),
                    "term": flat.to_numpy(),
                }
            )
            counts = g.groupby(["doc_id", "term"], sort=False).size().reset_index(name="tf")
            counts["dl"] = counts.groupby("doc_id", sort=False)["tf"].transform("sum")
            yield counts[["doc_id", "term", "tf", "dl"]]

    return docs.mapInPandas(gen, "doc_id long, term string, tf long, dl long")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default="local[32]")
    ap.add_argument("--corpus", default="/tmp/ivfadc_scaling_tx_320000.parquet")
    ap.add_argument("--impl", default="arrow", choices=["arrow", "pandas"])
    ap.add_argument("--dst-dir", default=None, help="write parquet under this dir (default tempfile)")
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_MASTER"] = args.master
    from pyspark.sql import functions as F

    from ivfadc_spark.operators.stats import term_frequencies_mapside
    from ivfadc_spark.session import get_spark

    spark = get_spark("profile-tf", extra_conf={"spark.master": args.master})
    par = spark.sparkContext.defaultParallelism
    docs = (
        spark.read.parquet(args.corpus)
        .select(F.monotonically_increasing_id().alias("doc_id"), "text")
        .repartition(par * 2)
    )
    # warm-up: spawn the python worker pool outside the window
    fn = term_frequencies_mapside if args.impl == "arrow" else pandas_impl
    fn(docs.limit(2000)).count()

    dst = tempfile.mkdtemp(prefix="prof_tf_", dir=args.dst_dir)
    t0 = time.time()
    fn(docs).write.mode("overwrite").parquet(dst)
    wall = time.time() - t0
    rows = spark.read.parquet(dst).count()
    print(f"master={args.master} impl={args.impl} wall_s={wall:.1f} rows={rows}")
    shutil.rmtree(dst, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
