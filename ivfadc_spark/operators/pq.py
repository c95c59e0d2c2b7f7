"""Residual product quantization + ADC scoring — the reference's defining
compression trick, re-expressed Spark-first.

Reference shape: after the coarse quantizer assigns each vector to a cell,
the *residual* (vector minus its cell centroid) is cut into ``nsq``
subvectors and each subspace gets its own small k-means codebook trained
over the residuals (/root/reference/ivfpq_new.cpp:126-205). A vector is
then stored as ``nsq`` one-byte codes (32x+ compression at nsq=8/ks=256);
a query is answered by asymmetric distance computation: one small
(nsq x ks) table of exact query-residual-to-sub-centroid distances per
probed cell, then each candidate's distance is ``nsq`` table gathers
(/root/reference/SearchEngine.cpp:170-184).

Spark-first mapping:
- sub-codebook training reuses :func:`clustering.kmeans_train` per
  subspace over ``F.slice``-ed residuals — broadcast-assign + groupBy
  recompute, the vectors themselves never shuffle;
- codes are plain int columns (``code_0..code_{nsq-1}``) — columnar,
  ``nsq`` bytes/vector in parquet, the IVFADC storage layout;
- the ADC distance table is a *derived tiny DataFrame* (queries x nprobe
  x nsq x ks rows) broadcast against the candidate codes; the per-subspace
  distances are summed in a FIXED expression order (d_0 + d_1 + ...), so
  the result is bit-deterministic and oracle-mirrorable (no float
  aggregation-order dependence).

At 100 TB the candidate side stays fully distributed: codes live with the
vectors, every join against them broadcasts query-side metadata only, and
the scored stream reduces through one per-query top-k window.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ivfadc_spark.operators.clustering import kmeans_train


def l2sq(a: str = "a", b: str = "b"):
    """Sequential-fold squared L2 — the same left-to-right float order as
    DuckDB's list fold, so engine and oracle agree bit-for-bit."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def coarse_assign(vecs: DataFrame, centroids_pdf: pd.DataFrame) -> DataFrame:
    """(vec_id, v) -> (vec_id, v, cell, r): ALL cells ranked by L2 asc (tie
    cell asc). r == 1 is the storage assignment; r <= nprobe drives probes.
    Broadcast codebook + window argmin — the J2 theta-join shape."""
    spark = vecs.sparkSession
    cent = spark.createDataFrame(centroids_pdf, schema="cell int, b array<double>")
    w = Window.partitionBy("vec_id").orderBy(F.asc("_d"), F.asc("cell"))
    return (
        vecs.crossJoin(F.broadcast(cent))
        .withColumn("_d", l2sq("v", "b"))
        .withColumn("r", F.row_number().over(w))
        .select("vec_id", "v", "cell", "b", "r")
    )


def residuals(assigned: DataFrame) -> DataFrame:
    """(vec_id, v, cell, b) -> (vec_id, cell, rr): rr = v - centroid,
    the quantity PQ codebooks are trained on (ivfpq_new.cpp:137-146)."""
    return assigned.select(
        "vec_id", "cell", F.zip_with("v", "b", lambda x, y: x - y).alias("rr")
    )


def train_pq(
    res: DataFrame,
    dim: int,
    nsq: int,
    ks: int,
    iters: int,
    round_decimals: int = 6,
) -> list[pd.DataFrame]:
    """Train one k-means codebook per subspace over the residual slices
    (ivfpq_new.cpp:126-205). Returns ``nsq`` driver-side codebooks
    (cell int, b array<double>), each ks x (dim/nsq). Deterministic:
    first-k seeding + per-iteration rounding (see clustering.kmeans_train).
    """
    m = dim // nsq
    books = []
    for s in range(nsq):
        sub = res.select("vec_id", F.slice("rr", s * m + 1, m).alias("v"))
        book, _, _ = kmeans_train(
            sub, k=ks, max_iters=iters, tol=0.0, metric="l2",
            seeding="first", round_decimals=round_decimals,
        )
        book = book.copy()
        book["b"] = [list(map(float, x)) for x in book["b"]]
        books.append(book)
    return books


def encode_pq(res: DataFrame, books: list[pd.DataFrame], dim: int) -> DataFrame:
    """(vec_id, cell, rr) -> (vec_id, cell, code_0..code_{nsq-1}): nearest
    sub-centroid per subspace (L2 asc, code asc). The vector's stored form
    is cell + nsq small ints — the IVFADC compressed row."""
    spark = res.sparkSession
    nsq = len(books)
    m = dim // nsq
    out = res.select("vec_id", "cell", "rr")
    for s, book in enumerate(books):
        cent = spark.createDataFrame(book, schema="cell int, b array<double>")
        cent = cent.select(F.col("cell").alias("_j"), F.col("b").alias("_b"))
        w = Window.partitionBy("vec_id").orderBy(F.asc("_d"), F.asc("_j"))
        code = (
            out.select("vec_id", F.slice("rr", s * m + 1, m).alias("_rs"))
            .crossJoin(F.broadcast(cent))
            .withColumn("_d", l2sq("_rs", "_b"))
            .withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select("vec_id", F.col("_j").alias(f"code_{s}"))
        )
        out = out.join(code, "vec_id")
    return out.drop("rr")


def write_pq_index(
    path: str,
    codes: DataFrame,
    books: list[pd.DataFrame],
    coarse_pdf: pd.DataFrame,
) -> None:
    """Persist the IVFADC index: codes parquet PARTITIONED BY cell — the
    on-disk inverted file (a query probing nprobe cells reads only those
    partitions; the reference's per-cell entry files, Index.cpp:9-11) —
    plus the coarse codebook and sub-codebooks as one small json sidecar
    (codebooks are driver-resident at query time, Vocab.cpp:152-166)."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    codes.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(path, "codes")
    )
    meta = {
        "nsq": len(books),
        "coarse": coarse_pdf.to_dict(orient="list"),
        "books": [b.to_dict(orient="list") for b in books],
    }
    with open(os.path.join(path, "pq_meta.json"), "w") as f:
        json.dump(meta, f)


def load_pq_index(spark, path: str):
    """-> (codes DataFrame, books, coarse_pdf). Cell partition pruning is
    free on the codes frame (filter cell IN probed -> only those parquet
    partitions scanned)."""
    import json
    import os

    with open(os.path.join(path, "pq_meta.json")) as f:
        meta = json.load(f)
    codes = spark.read.parquet(os.path.join(path, "codes"))
    books = [pd.DataFrame(b) for b in meta["books"]]
    coarse = pd.DataFrame(meta["coarse"])
    return codes, books, coarse


def adc_topk(
    probes: DataFrame,
    codes: DataFrame,
    books: list[pd.DataFrame],
    dim: int,
    k: int,
    round_decimals: int = 6,
) -> DataFrame:
    """ADC scoring (SearchEngine.cpp:170-184): per (query, probed cell)
    build the (nsq x ks) exact distance table from the query residual, then
    every candidate in the cell costs ``nsq`` broadcast-joined gathers.

    probes: (query_id, cell, qrr) — one row per probed cell, qrr = query
    residual AGAINST THAT CELL's centroid. codes: output of encode_pq.
    Returns (query_id, rank, cand_id, adc): top-k by adc ASC, tie cand ASC.
    """
    nsq = len(books)
    m = dim // nsq
    spark = probes.sparkSession
    scored = probes.select("query_id", "cell", "qrr").join(
        codes.select(F.col("vec_id").alias("cand_id"), "cell",
                     *[f"code_{s}" for s in range(nsq)]),
        "cell",
    ).filter(F.col("query_id") != F.col("cand_id"))
    for s, book in enumerate(books):
        cent = spark.createDataFrame(book, schema="cell int, b array<double>")
        dt = (
            probes.select("query_id", "cell", F.slice("qrr", s * m + 1, m).alias("_qs"))
            .crossJoin(F.broadcast(cent.select(F.col("cell").alias(f"code_{s}"),
                                               F.col("b").alias("_b"))))
            .select("query_id", "cell", f"code_{s}",
                    l2sq("_qs", "_b").alias(f"_d{s}"))
        )
        scored = scored.join(F.broadcast(dt), ["query_id", "cell", f"code_{s}"])
    # FIXED-order sum: bit-deterministic, mirrored verbatim in the oracle
    adc = F.col("_d0")
    for s in range(1, nsq):
        adc = adc + F.col(f"_d{s}")
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("cand_id"))
    return (
        scored.withColumn("adc", F.round(adc, round_decimals))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"),
                "cand_id", "adc")
    )
