"""Checkpointed, resumable index-build pipeline (mode-2 orchestration).

The reference's stages are file-granular and restartable by re-running a
mode (train -> index -> search, each reading the previous stage's files).
Ours checkpoints every stage as a parquet dataset plus a manifest entry with
lineage and metrics; ``resume=True`` re-enters a half-built index at the
first incomplete stage (north_rule requirement).

Stages::

    00_doc_map   doc_id assignment over (conv_id, turn_idx)    [nl analog]
    01_tf        (doc_id, term, tf) + (doc_id, dl)             [entry log analog]
    02_dict      term dictionary + corpus meta                 [codebook analog]
    03_segment   posting blocks + metrics                      [idx/voc_sz analog]

Each manifest entry records wall seconds, row counts, and the skew ratio of
the stage's output partitions (max/mean rows per partition) — the scaled-up
version of the reference's stage-boundary debug dumps (SURVEY.md §5.2).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ivfadc_spark.config import DEFAULT, EngineConfig
from ivfadc_spark.operators import stats as S
from ivfadc_spark.operators.postings import build_blocks, salted_tf
from ivfadc_spark.operators.segments import Segment, write_segment
from ivfadc_spark.sources.transcripts import assign_doc_ids, release_doc_ids


def _manifest_path(out: str) -> str:
    return os.path.join(out, "_manifest.json")


def _load_manifest(out: str) -> dict:
    p = _manifest_path(out)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"stages": {}}


def _save_manifest(out: str, m: dict) -> None:
    os.makedirs(out, exist_ok=True)
    with open(_manifest_path(out), "w") as f:
        json.dump(m, f, indent=2)


def _ensure_parallelism(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Checkpoint datasets are small at test scale, so parquet reads coalesce
    to ~1 input split (maxPartitionBytes) and starve the 32 cores. Re-spread
    when under-partitioned; at production scale the files exceed the split
    size and this is a no-op."""
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, par // 2):
        return df.repartition(par)
    return df


def _skew_ratio(df: DataFrame) -> float:
    """max/mean rows per partition of the final plan — straggler indicator."""
    sizes = (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .count()
        .agg(F.max("count").alias("mx"), F.avg("count").alias("mean"))
        .collect()[0]
    )
    return float(sizes["mx"] / sizes["mean"]) if sizes["mean"] else 1.0


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    out: str,
    cfg: EngineConfig = DEFAULT,
    resume: bool = False,
    lineage: dict | None = None,
    measure_skew: bool = False,
) -> Segment:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) -> segment at ``out``."""
    m = _load_manifest(out) if resume else {"stages": {}}
    done = m["stages"]

    def stage(name: str):
        return resume and done.get(name, {}).get("complete", False)

    def record(name: str, t0: float, **extra):
        done[name] = {"complete": True, "wall_s": round(time.time() - t0, 3), **extra}
        m["lineage"] = lineage or {}
        m["config"] = json.loads(cfg.to_json())
        _save_manifest(out, m)

    p_docs = os.path.join(out, "00_docs")
    p_tf = os.path.join(out, "01_tf")
    p_dict = os.path.join(out, "02_dict")
    p_seg = os.path.join(out, "segment")

    with_ids = None
    if not stage("00_doc_map"):
        t0 = time.time()
        with_ids = assign_doc_ids(transcripts)
        # the checkpoint holds ONLY the doc_map (no text, no token counts):
        # text never round-trips through parquet — stage 01 reads it straight
        # from assign_doc_ids' serialized cache, and dl/avgdl derive from the
        # tf fact table, so the corpus is tokenized exactly once
        (
            with_ids.select("doc_id", "conv_id", "turn_idx")
            .write.mode("overwrite")
            .parquet(p_docs)
        )
        record("00_doc_map", t0, rows=spark.read.parquet(p_docs).count())
    doc_map = spark.read.parquet(p_docs)

    if not stage("01_tf"):
        t0 = time.time()
        if with_ids is None:
            # resuming past a completed 00 in a fresh session: re-derive ids —
            # assign_doc_ids is deterministic (data-derived order), so the
            # recompute reproduces the checkpointed doc_map exactly
            with_ids = assign_doc_ids(transcripts)
        # map-side tf+dl: no shuffle (tf is doc-local), no explode exchange
        S.term_frequencies_mapside(
            with_ids.select("doc_id", "text")
        ).write.mode("overwrite").parquet(p_tf)
        extra = {"rows": spark.read.parquet(p_tf).count()}
        if measure_skew:
            extra["skew_ratio"] = _skew_ratio(spark.read.parquet(p_tf))
        record("01_tf", t0, **extra)
    if with_ids is not None:
        release_doc_ids(with_ids)
    tf = _ensure_parallelism(spark.read.parquet(p_tf), spark)

    if not stage("02_dict"):
        t0 = time.time()
        cs = S.corpus_stats_from_tf(tf)
        S.dictionary(tf, cs["n_docs"]).write.mode("overwrite").parquet(p_dict)
        record("02_dict", t0, **cs)
    cs = {k: done["02_dict"][k] for k in ("n_docs", "avgdl")}
    dictionary = spark.read.parquet(p_dict)

    if not stage("03_segment"):
        t0 = time.time()
        salted = salted_tf(tf, None, dictionary, cfg)
        blocks = build_blocks(salted, cs["avgdl"], cfg, dictionary=dictionary)
        write_segment(
            p_seg,
            blocks,
            doc_map,
            dictionary,
            None,
            cs["n_docs"],
            cs["avgdl"],
            lineage=lineage,
            cfg=cfg,
        )
        seg = Segment(spark, p_seg)
        met = seg.metrics.agg(
            F.sum("postings").alias("postings"),
            F.sum("bytes").alias("bytes"),
            F.max("postings").alias("max_term_postings"),
        ).collect()[0]
        record(
            "03_segment",
            t0,
            postings=int(met["postings"]),
            bytes=int(met["bytes"]),
            postings_per_sec=round(int(met["postings"]) / max(time.time() - t0, 1e-9), 1),
        )
    return Segment(spark, p_seg)
