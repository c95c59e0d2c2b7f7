"""Hot-bucket guards for the dedup band joins (round-4 verdict item 7).

A document/vector duplicated 10,000 times is exactly the corpus shape
dedup targets; the naive band self-join would emit ~50M pairs for it.
These tests pin the guarded forms to LINEAR output on that shape.
"""

import pandas as pd
from pyspark.sql import functions as F


def test_band_pair_stars_linear_on_mass_duplicates(spark):
    # one band group of 10,001 identical signatures + 5 singletons
    n = 10_001
    sig = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("aa").alias("h0"), F.lit("bb").alias("h1"),
        F.lit("cc").alias("h2"), F.lit("dd").alias("h3"),
    ).union(
        spark.range(n, n + 5).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("u"), F.col("id")).alias("h0"),
            F.lit("x").alias("h1"), F.lit("x").alias("h2"), F.lit("x").alias("h3"),
        )
    )
    from ivfadc_spark.operators.dedup import band_pair_stars

    pairs = band_pair_stars(sig, ["h0", "h1", "h2", "h3"]).toPandas()
    # star form: m-1 rows for the hot group, none for singletons —
    # the all-pairs form would have produced m*(m-1)/2 = ~50M rows
    assert len(pairs) == n - 1
    assert (pairs["doc_a"] == 0).all()
    assert set(pairs["doc_b"]) == set(range(1, n))


def test_embedding_near_dup_collapses_exact_copies(spark):
    # 10,000 exact copies of one vector + 3 distinct vectors, two of which
    # are near-dups of the hot vector (same sign bucket, cosine >= 0.4)
    hot = [1.0, 0.5, 0.25, 0.125]
    rows = [(i, hot) for i in range(10_000)]
    rows.append((20_000, [1.0, 0.5, 0.25, 0.13]))   # near-dup of hot
    rows.append((20_001, [0.9, 0.6, 0.2, 0.1]))      # near-dup of hot
    rows.append((20_002, [-1.0, -0.5, -0.25, -0.125]))  # different bucket
    e = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "v"]),
        schema="vec_id long, v array<double>",
    )
    from ivfadc_spark.operators.dedup import embedding_near_dup_pairs

    pairs = (
        embedding_near_dup_pairs(e, bits=4, threshold=0.4)
        .orderBy("doc_a", "doc_b")
        .toPandas()
    )
    # the 10k copies collapse to rep vec_id=0: pairs are rep-level only —
    # (0, 20000), (0, 20001), (20000, 20001); never 10k x anything
    assert len(pairs) == 3
    assert list(pairs["doc_a"]) == [0, 0, 20_000]
    assert list(pairs["doc_b"]) == [20_000, 20_001, 20_001]
