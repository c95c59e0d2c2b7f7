"""Block-max top-k BM25 over compressed segments (mode-3 graft).

Reference query path (/root/reference/SearchEngine.cpp:112-212): probe the
``ma`` assigned cells' posting lists, reconstruct each posting's residual
from its PQ codes, score, full-sort, truncate. Ours replaces the full scan +
full sort with an **exact MaxScore/block-max scan + bounded candidate set**:

1. Query terms are processed in descending upper-bound order
   (ub_t = idf_t * max block impact — the block-max metadata, O3 analog of
   the coarse-cell residual bound).
2. While unrestricted, whole posting sub-lists are decoded and merged into a
   numpy accumulator (vectorized TAAT; the reference's ``entrymap`` hash-agg,
   /root/reference/SearchEngine.cpp:404-407, done with np.unique/np.add.at).
3. Once the remaining terms' summed upper bound R falls below the current
   k-th accumulated score θ, no unseen doc can reach the top-k: the scan
   *restricts* to the candidate set (docs with acc + R >= θ), and remaining
   terms only intersect candidates — skipping every block whose
   [first_doc, last_doc] range misses them (block-max skipping).
4. Bounded heap equivalent: candidates are pruned each round; the final
   top-k sorts (-score, doc_id) — ties by doc_id ASC, deterministic.

The result is **rank-identical** to the brute-force path (proved in tests):
restriction only ever drops docs whose maximum achievable score is strictly
below the final k-th score.

Scale notes: only blocks of probed terms are read (IN-filter on term +
partition pruning on term_bucket — O1 inverted-file pruning); the per-query
group carries a few posting sub-lists, never the corpus. Salted sub-lists of
one term are independent cursors (scores additive over disjoint doc sets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ivfadc_spark.config import DEFAULT, EngineConfig
from ivfadc_spark.functions.codecs import delta_decode, varint_decode
from ivfadc_spark.operators.query import query_terms
from ivfadc_spark.operators.segments import Segment

RESULT_SCHEMA = "query_id long, rank int, doc_id long, score double"


def _scan_one_query(
    pdf: pd.DataFrame, k: int, k1: float, b: float, avgdl: float
) -> pd.DataFrame:
    """Exact MaxScore scan over one query's candidate blocks (numpy)."""

    def _impact(tf: np.ndarray, dl: np.ndarray) -> np.ndarray:
        return (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))

    qid = int(pdf["query_id"].iloc[0])
    # per-term upper bound: idf * max block impact
    term_ub = (
        pdf.assign(ub=pdf["idf"] * pdf["max_impact"])
        .groupby("term", sort=False)["ub"]
        .max()
        .sort_values(ascending=False)
    )
    terms = list(term_ub.index)
    ubs = term_ub.to_numpy(np.float64)
    suffix = np.concatenate([np.cumsum(ubs[::-1])[::-1][1:], [0.0]])
    by_term = dict(iter(pdf.groupby("term", sort=False)))

    acc_ids = np.empty(0, dtype=np.int64)
    acc_sc = np.empty(0, dtype=np.float64)
    restricted = False
    for j, term in enumerate(terms):
        rows = by_term[term]
        idf = float(rows["idf"].iloc[0])
        R = float(suffix[j])
        if not restricted:
            ids_parts, sc_parts = [], []
            for _, r in rows.iterrows():
                n = int(r["n"])
                ids_parts.append(delta_decode(bytes(r["doc_ids"]), n))
                tf = varint_decode(bytes(r["tfs"]), n).astype(np.float64)
                dl = varint_decode(bytes(r["dls"]), n).astype(np.float64)
                sc_parts.append(idf * _impact(tf, dl))
            if ids_parts:
                all_ids = np.concatenate([acc_ids] + ids_parts)
                all_sc = np.concatenate([acc_sc] + sc_parts)
                acc_ids, inv = np.unique(all_ids, return_inverse=True)
                acc_sc = np.zeros(acc_ids.size, dtype=np.float64)
                np.add.at(acc_sc, inv, all_sc)
            if acc_ids.size >= k and R > 0.0:
                theta = np.partition(acc_sc, acc_sc.size - k)[acc_sc.size - k]
                if R < theta:
                    restricted = True
                    keep = acc_sc + R >= theta
                    acc_ids, acc_sc = acc_ids[keep], acc_sc[keep]
        else:
            if acc_ids.size == 0:
                break
            lo, hi = int(acc_ids[0]), int(acc_ids[-1])
            for _, r in rows.iterrows():
                if int(r["last_doc"]) < lo or int(r["first_doc"]) > hi:
                    continue  # block-max range skip
                n = int(r["n"])
                ids = delta_decode(bytes(r["doc_ids"]), n)
                pos = np.searchsorted(acc_ids, ids)
                pos_ok = pos < acc_ids.size
                hit = np.zeros(ids.size, dtype=bool)
                hit[pos_ok] = acc_ids[pos[pos_ok]] == ids[pos_ok]
                if not hit.any():
                    continue
                tf = varint_decode(bytes(r["tfs"]), n).astype(np.float64)[hit]
                dl = varint_decode(bytes(r["dls"]), n).astype(np.float64)[hit]
                acc_sc[pos[hit]] += idf * _impact(tf, dl)
            # re-tighten θ and prune candidates with the bound over the
            # still-unprocessed terms (j+1..end) = suffix[j]
            if acc_ids.size >= k:
                theta = np.partition(acc_sc, acc_sc.size - k)[acc_sc.size - k]
                keep = acc_sc + R >= theta
                acc_ids, acc_sc = acc_ids[keep], acc_sc[keep]

    if acc_ids.size == 0:
        return pd.DataFrame(columns=["query_id", "rank", "doc_id", "score"])
    order = np.lexsort((acc_ids, -acc_sc))[:k]
    return pd.DataFrame(
        {
            "query_id": qid,
            "rank": np.arange(1, order.size + 1, dtype=np.int32),
            "doc_id": acc_ids[order],
            "score": acc_sc[order],
        }
    )


def bm25_topk_indexed(
    queries: DataFrame,
    segment: Segment,
    k: int | None = None,
    cfg: EngineConfig = DEFAULT,
) -> DataFrame:
    """Top-k BM25 from a compressed segment, rank-identical to the
    DataFrame path. queries: (query_id, text)."""
    k = k or cfg.top_k
    k1, b = float(cfg.k1), float(cfg.b)
    avgdl = float(segment.meta["avgdl"])

    n_buckets = int(segment.meta["config"].get("term_buckets", cfg.term_buckets))
    qt = (
        query_terms(queries)
        .join(segment.dictionary.select("term", "idf"), "term")  # drops OOV
        .withColumn("term_bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
    )
    qt_rows = qt.collect()  # queries x terms: tiny by construction; ONE job
    if not qt_rows:
        return segment.spark.createDataFrame([], RESULT_SCHEMA)
    spark = segment.spark
    terms = sorted({r["term"] for r in qt_rows})
    buckets = sorted({r["term_bucket"] for r in qt_rows})
    qt_df = F.broadcast(
        spark.createDataFrame(qt_rows).select("term", "query_id", "idf")
    )
    blocks = segment.blocks.filter(
        F.col("term_bucket").isin(buckets)  # partition prune
        & F.col("term").isin(terms)  # row-group prune (min/max stats)
    )
    cand = blocks.join(qt_df, "term")

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        return _scan_one_query(pdf, k, k1, b, avgdl)

    return cand.groupBy("query_id").applyInPandas(scan, RESULT_SCHEMA)
