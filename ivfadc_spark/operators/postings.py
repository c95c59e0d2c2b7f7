"""Posting-list construction — the mode-2 index build, Spark-first.

Reference pipeline (/root/reference/Index.cpp:5-155): quantize each doc to a
cell, append ``[cell, codes...]`` to a doc-ordered log behind a mutex, then
pivot to cell-ordered posting lists (``gen_idx_sz_file``). Ours:

    tokenize -> explode -> groupBy(doc_id, term) tf        (A6)
             -> salted repartition by (term, salt)          (X1/X2 shuffle)
             -> applyInPandas: docID-sort, chunk into blocks of B,
                delta+varint encode, per-block max-impact   (O2/O3)

Skew: the reference serializes hot-centroid file writes behind a spin lock
(/root/reference/IO.h:503-522) — the same Zipfian pathology that makes one
Spark task build the "the" posting list at 10^12 turns. A term with
``df > salt_df_threshold`` is split across ``n_salts`` sub-lists keyed by
``hash(doc_id) % n_salts``; each sub-list is independently docID-sorted and
block-encoded, and the query scan treats sub-lists as independent cursors
(scores are additive across disjoint doc sets, so correctness is unaffected).

Block-max metadata: per block we store ``max_impact`` = the largest
idf-less BM25 partial in the block (tf*(k1+1)/(tf+k1*(1-b+b*dl/avgdl))) plus
the block's docID range — the analog of the coarse-cell residual bound that
lets IVFADC prune (SURVEY.md §4 O3). ``idf`` multiplies at query time, so
block bounds survive segment merges that change df.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ivfadc_spark.config import DEFAULT, EngineConfig
from ivfadc_spark.functions.codecs import delta_encode, varint_encode

BLOCKS_SCHEMA = (
    "term string, salt int, block_id int, n int, first_doc long, last_doc long, "
    "doc_ids binary, tfs binary, dls binary, max_impact double, bytes long"
)


def salted_tf(
    tf: DataFrame,
    dl: DataFrame | None,
    dictionary: DataFrame,
    cfg: EngineConfig = DEFAULT,
) -> DataFrame:
    """Attach doc length + a df-driven salt to the tf fact table.

    n_salts(term) = min(max_salts, ceil(df / salt_df_threshold)) — 1 for the
    long tail (no extra shuffle fan-out), up to max_salts for head terms.

    If ``tf`` already carries a ``dl`` column (the map-side fast path,
    :func:`ivfadc_spark.operators.stats.term_frequencies_mapside`), pass
    ``dl=None`` and the per-doc shuffle join is skipped entirely — the only
    exchange left in the whole build is the repartition by (term, salt).
    """
    if cfg.doc_shards > 0:
        # uniform doc-hash sharding: every posting list splits doc_shards
        # ways. Subsumes df-driven head-term salting (a head term is split
        # maximally) and gives the batch query path complete per-shard
        # sub-indexes. No dictionary join needed.
        joined = tf
        if dl is not None and "dl" not in tf.columns:
            joined = joined.join(dl, "doc_id")
        return joined.withColumn(
            "salt", F.pmod(F.xxhash64("doc_id"), F.lit(cfg.doc_shards)).cast("int")
        ).select("term", "salt", "doc_id", "tf", "dl")
    n_salts = F.least(
        F.lit(cfg.max_salts),
        F.ceil(F.col("df") / F.lit(cfg.salt_df_threshold)).cast("int"),
    )
    d = dictionary.select("term", F.greatest(n_salts, F.lit(1)).alias("n_salts"))
    joined = tf.join(F.broadcast(d), "term")
    if dl is not None and "dl" not in tf.columns:
        joined = joined.join(dl, "doc_id")
    return (
        joined.withColumn("salt", F.pmod(F.xxhash64("doc_id"), F.col("n_salts")).cast("int"))
        .select("term", "salt", "doc_id", "tf", "dl")
    )


def build_blocks(
    salted: DataFrame,
    avgdl: float,
    cfg: EngineConfig = DEFAULT,
    num_partitions: int | None = None,
) -> DataFrame:
    """(term, salt) groups -> docID-sorted, delta+varint-encoded blocks.

    One hash repartition on (term, salt) then mapInPandas: each task encodes
    EVERY group in its partition inside one pandas pass. (groupBy +
    applyInPandas here pays per-group Arrow/invocation overhead — with
    doc-sharding the group count is ~vocab x shards, and that overhead
    dominates the encode itself.)
    """
    k1, b, bsz = float(cfg.k1), float(cfg.b), int(cfg.block_size)
    avgdl_f = float(avgdl)

    def encode_rows(term: str, salt: int, g: pd.DataFrame, rows: list) -> None:
        ids = g["doc_id"].to_numpy(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        tfs = g["tf"].to_numpy(np.int64)[order]
        dls = g["dl"].to_numpy(np.int64)[order]
        impact = (tfs * (k1 + 1.0)) / (tfs + k1 * (1.0 - b + b * dls / avgdl_f))
        for blk_id, s in enumerate(range(0, len(ids), bsz)):
            e = min(s + bsz, len(ids))
            did, dtf, ddl = delta_encode(ids[s:e]), varint_encode(tfs[s:e]), varint_encode(dls[s:e])
            rows.append(
                (
                    term, salt, blk_id, e - s, int(ids[s]), int(ids[e - 1]),
                    did, dtf, ddl, float(impact[s:e].max()),
                    len(did) + len(dtf) + len(ddl),
                )
            )

    cols = [
        "term", "salt", "block_id", "n", "first_doc", "last_doc",
        "doc_ids", "tfs", "dls", "max_impact", "bytes",
    ]

    def encode_partition(batches):
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        whole = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        rows: list = []
        for (term, salt), g in whole.groupby(["term", "salt"], sort=False):
            encode_rows(term, int(salt), g, rows)
        yield pd.DataFrame(rows, columns=cols)

    n = num_partitions or salted.sparkSession.sparkContext.defaultParallelism * 2
    return salted.repartition(n, "term", "salt").mapInPandas(encode_partition, BLOCKS_SCHEMA)


def decode_blocks(blocks: DataFrame) -> DataFrame:
    """Inverse of build_blocks: blocks -> (term, doc_id, tf, dl) rows.

    Used by the segment merge (decode -> union -> re-encode) and by
    round-trip tests. mapInPandas: per-batch numpy, no per-row Python.
    """
    from ivfadc_spark.functions.codecs import delta_decode, varint_decode

    def decode(batches):
        for pdf in batches:
            terms, ids, tfs, dls = [], [], [], []
            for t, n, bid, btf, bdl in zip(
                pdf["term"], pdf["n"], pdf["doc_ids"], pdf["tfs"], pdf["dls"]
            ):
                ids.append(delta_decode(bytes(bid), int(n)))
                tfs.append(varint_decode(bytes(btf), int(n)))
                dls.append(varint_decode(bytes(bdl), int(n)))
                terms.append(np.repeat(t, int(n)))
            if not terms:
                continue
            yield pd.DataFrame(
                {
                    "term": np.concatenate(terms),
                    "doc_id": np.concatenate(ids).astype(np.int64),
                    "tf": np.concatenate(tfs).astype(np.int64),
                    "dl": np.concatenate(dls).astype(np.int64),
                }
            )

    return blocks.mapInPandas(decode, "term string, doc_id long, tf long, dl long")


def block_metrics(blocks: DataFrame) -> DataFrame:
    """Per-term build metrics: postings, bytes, salts — the ``voc_sz`` analog
    (/root/reference/Index.cpp:144-148) plus compression accounting."""
    return blocks.groupBy("term").agg(
        F.sum("n").alias("postings"),
        F.sum("bytes").alias("bytes"),
        F.countDistinct("salt").alias("n_salts"),
        F.count("*").alias("n_blocks"),
        F.max("max_impact").alias("max_impact"),
    )
