"""Incremental (streaming) index ingest.

The reference has no streaming; its closest behavior is the log-structured
append model — segments built independently per collection (mode 2) and
unioned at query load (/root/reference/SearchEngine.cpp:94-102). We keep
that model and drive it with Structured Streaming: a file-source stream of
transcript parquet files, ``foreachBatch`` building one immutable segment
per micro-batch under ``out/seg_<epoch>``. Readers either query segments
individually (scores within a segment need only that segment's stats) or run
``merge_segments`` periodically — the compaction step of an LSM index.

Also provides the canonical windowed streaming aggregation over the events
table shape (tumbling event-time window + watermark) to cover the streaming
operator surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ivfadc_spark.config import DEFAULT, EngineConfig
from ivfadc_spark.sources.transcripts import TRANSCRIPTS_SCHEMA


def stream_build_segments(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    cfg: EngineConfig = DEFAULT,
    checkpoint_dir: str | None = None,
):
    """Start a stream that turns each micro-batch of transcript files into an
    immutable segment. Returns the StreamingQuery (caller stops it).

    Exactly-once per segment: foreachBatch + the batch epoch in the segment
    path; a replayed batch overwrites the same segment idempotently.
    """
    from ivfadc_spark.plans.build_index import build_index

    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        build_index(
            spark,
            batch_df,
            os.path.join(out_dir, f"seg_{epoch_id:06d}"),
            cfg=cfg,
            lineage={"stream_epoch": epoch_id, "input": input_dir},
        )

    return (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir or os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def list_stream_segments(out_dir: str) -> list[str]:
    """Segment paths produced by stream_build_segments, in epoch order."""
    if not os.path.isdir(out_dir):
        return []
    return [
        os.path.join(out_dir, d, "segment")
        for d in sorted(os.listdir(out_dir))
        if d.startswith("seg_")
        and os.path.exists(os.path.join(out_dir, d, "segment", "meta.json"))
    ]


def snapshots(out_dir: str) -> list[dict]:
    """Snapshot log of the LSM directory: one entry per immutable segment —
    ``{path, epoch, created_at}`` in epoch order. The analog of the
    snapshot list an Iceberg table keeps in its metadata tree: each
    micro-batch commit is an append-only snapshot, so "the table as of X"
    is exactly "the segments committed at-or-before X"."""
    import json

    out = []
    for p in list_stream_segments(out_dir):
        with open(os.path.join(p, "meta.json")) as f:
            meta = json.load(f)
        epoch_dir = os.path.basename(os.path.dirname(p))
        out.append(
            {
                "path": p,
                "epoch": int(epoch_dir.split("_")[1]),
                "created_at": float(meta.get("created_at", 0.0)),
            }
        )
    return sorted(out, key=lambda r: r["epoch"])


def open_as_of(
    spark: SparkSession,
    out_dir: str,
    as_of_epoch: int | None = None,
    as_of_ts: float | None = None,
):
    """Time-travel read over the LSM segment directory: a SegmentSet of the
    segments committed at-or-before the cutoff — later appends invisible,
    corpus statistics (n_docs, avgdl, idf) rescoped to the snapshot by the
    federation itself. Cutoff by ``as_of_epoch`` (micro-batch id) or
    ``as_of_ts`` (segment ``created_at`` wall clock); neither = latest.
    Segments are immutable, so a snapshot read needs no locks and is
    reproducible forever (until compaction garbage-collects members)."""
    from ivfadc_spark.operators.segments import SegmentSet

    snaps = snapshots(out_dir)
    if as_of_epoch is not None:
        snaps = [s for s in snaps if s["epoch"] <= as_of_epoch]
    elif as_of_ts is not None:
        snaps = [s for s in snaps if s["created_at"] <= as_of_ts]
    if not snaps:
        raise ValueError(
            f"no segment in {out_dir} at-or-before the requested snapshot"
        )
    return SegmentSet(spark, [s["path"] for s in snaps])


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling event-time window aggregation with late-data watermark."""
    ts = F.col("ts").cast("timestamp")
    return (
        events_stream.withColumn("ts", ts)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
    )
