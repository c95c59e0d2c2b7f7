"""Segment layout, discovery, and log-structured merge.

Reference: one segment = a directory of three files — ``idx`` (doc-ordered
entry log), ``nl`` (doc names), ``voc_sz`` (posting lengths)
(/root/reference/Index.cpp:9-11); the engine loads every segment and remaps
docIDs into one global space by positional offset
(/root/reference/SearchEngine.cpp:221-297, U1).

Ours: one segment = a parquet dataset directory::

    <path>/blocks/      posting blocks, partitioned by term_bucket
    <path>/doc_map/     (doc_id, conv_id, turn_idx)        [nl analog]
    <path>/dict/        (term, df, cf, idf)                 [voc_sz analog]
    <path>/metrics/     per-term build metrics
    <path>/meta.json    n_docs, avgdl, doc_base, lineage, config

docIDs are data-derived within a segment (dense rank over the segment's own
rows); cross-segment remap adds each segment's ``doc_base`` offset — the
same offset trick as the reference, but recorded in metadata instead of
depending on load order. Merge is log-structured: decode -> union (with
offset) -> re-encode blocks; the merged dictionary recomputes idf from the
summed df (idf is NOT additive), which is why blocks store idf-less
max_impact.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ivfadc_spark.config import DEFAULT, EngineConfig
from ivfadc_spark.operators.postings import build_blocks, decode_blocks


class Segment:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)

    @property
    def blocks(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "blocks"))

    @property
    def doc_map(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "doc_map"))

    @property
    def dictionary(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "dict"))

    @property
    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "metrics"))

    @property
    def dict_pdf(self):
        """Driver-cached pandas dictionary (term, df, cf, idf) — the resident
        coarse-codebook analog (/root/reference/Vocab.cpp:152-166: codebooks
        are always fully loaded). Used by the batch query broker to prep
        query terms without a Spark round-trip; vocabulary-sized."""
        if not hasattr(self, "_dict_pdf"):
            self._dict_pdf = self.dictionary.toPandas()
        return self._dict_pdf


def write_segment(
    path: str,
    blocks: DataFrame,
    doc_map: DataFrame,
    dictionary: DataFrame,
    metrics: DataFrame | None,
    n_docs: int,
    avgdl: float,
    doc_base: int = 0,
    lineage: dict | None = None,
    cfg: EngineConfig = DEFAULT,
) -> None:
    """Write a complete segment. term_bucket partitioning gives the query
    side partition pruning on probed terms (O1 inverted-file pruning: only
    buckets containing query terms are scanned)."""
    os.makedirs(path, exist_ok=True)
    (
        blocks.withColumn(
            "term_bucket", F.pmod(F.xxhash64("term"), F.lit(cfg.term_buckets)).cast("int")
        )
        .repartition("term_bucket")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(os.path.join(path, "blocks"))
    )
    doc_map.write.mode("overwrite").parquet(os.path.join(path, "doc_map"))
    dictionary.write.mode("overwrite").parquet(os.path.join(path, "dict"))
    if metrics is None:
        # compute from the just-written blocks, not the unmaterialized plan —
        # avoids running the whole encode stage a second time
        from ivfadc_spark.operators.postings import block_metrics

        metrics = block_metrics(
            blocks.sparkSession.read.parquet(os.path.join(path, "blocks"))
        )
    metrics.write.mode("overwrite").parquet(os.path.join(path, "metrics"))
    meta = {
        "n_docs": int(n_docs),
        "avgdl": float(avgdl),
        "doc_base": int(doc_base),
        "created_at": time.time(),
        "lineage": lineage or {},
        "config": json.loads(cfg.to_json()),
        "format_version": 1,
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)


def merge_segments(
    spark: SparkSession,
    paths: list[str],
    out_path: str,
    cfg: EngineConfig = DEFAULT,
) -> Segment:
    """Log-structured multi-way merge (U1 analog) with docID offset remap.

    Offsets are assigned cumulatively in the given order (like the
    reference's load loop, /root/reference/SearchEngine.cpp:94-102) but
    recorded in the merged meta so the mapping is reproducible.
    """
    segs = [Segment(spark, p) for p in paths]
    offsets, acc = [], 0
    for s in segs:
        offsets.append(acc)
        acc += s.meta["n_docs"]

    from ivfadc_spark.operators.postings import salted_tf

    tf_parts, dm_parts, tot_len = [], [], 0.0
    for s, off in zip(segs, offsets):
        dec = decode_blocks(s.blocks).withColumn(
            "doc_id", (F.col("doc_id") + F.lit(off)).cast("long")
        )
        tf_parts.append(dec)
        dm_parts.append(
            s.doc_map.withColumn("doc_id", (F.col("doc_id") + F.lit(off)).cast("long"))
        )
        tot_len += s.meta["avgdl"] * s.meta["n_docs"]

    tf_all = tf_parts[0]
    for p in tf_parts[1:]:
        tf_all = tf_all.unionByName(p)
    dm_all = dm_parts[0]
    for p in dm_parts[1:]:
        dm_all = dm_all.unionByName(p)

    n_docs = acc
    avgdl = tot_len / max(n_docs, 1)
    # idf is not additive: recompute from merged df
    merged_dict = tf_all.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    ).withColumn(
        "idf",
        F.log((F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
    )
    # decoded rows already carry dl — no per-doc join needed (salted_tf dl=None path)
    salted = salted_tf(tf_all, None, merged_dict, cfg)
    blocks = build_blocks(salted, avgdl, cfg, dictionary=merged_dict)
    write_segment(
        out_path,
        blocks,
        dm_all,
        merged_dict,
        None,
        n_docs,
        avgdl,
        doc_base=0,
        lineage={"merged_from": [{"path": p, "doc_base": o} for p, o in zip(paths, offsets)]},
        cfg=cfg,
    )
    return Segment(spark, out_path)
