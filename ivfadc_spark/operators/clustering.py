"""Iterative k-means training — mode-1 (codebook training) parity.

The reference trains its coarse quantizer with restarts of Lloyd iterations
over sampled vectors: seed, assign every vector to its nearest centroid,
recompute centroids as member means, break when the assignment stabilizes
(/root/reference/Clustering.h:88-220, driven by /root/reference/ivfpq_new.cpp:61-99).

Spark-first shape: the per-iteration heavy step is ONE broadcast-join
assignment + ONE groupBy recompute over the vector table — no shuffle of the
vectors themselves, the codebook (k x dim, tiny) round-trips through the
driver between iterations exactly like the reference keeps ``centroids[]``
resident. Iteration count is bounded; convergence breaks early on max
centroid shift < ``tol``.

Determinism: centroid means are rounded to ``round_decimals`` at every
iteration boundary, so the fixpoint does not depend on float summation order
(Spark partial aggregation vs any oracle's sequential sum) — the property
the driver-contract ``kmeans_train`` entry relies on. Seeding is
deterministic: ``first`` takes the k lowest vec_ids (the contract fixture);
``farthest`` is the deterministic k-center sweep standing in for the
reference's random kmeans++ restarts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _cosine(a: str = "a", b: str = "b"):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def _neg_l2sq(a: str = "a", b: str = "b"):
    return -F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_cells(vecs: DataFrame, centroids_pdf: pd.DataFrame, metric: str = "cosine") -> DataFrame:
    """(vec_id, v) x broadcast codebook -> (vec_id, v, cell): nearest-centroid
    assignment (J2 theta-join: broadcast + argmax, never a shuffled cross
    join; /root/reference/Clustering.h:154-170)."""
    spark = vecs.sparkSession
    cent = spark.createDataFrame(centroids_pdf, schema="cell int, b array<double>")
    scorer = _cosine("v", "b") if metric == "cosine" else _neg_l2sq("v", "b")
    w = Window.partitionBy("vec_id").orderBy(F.desc("_sim"), F.asc("cell"))
    return (
        vecs.crossJoin(F.broadcast(cent))
        .withColumn("_sim", scorer)
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("vec_id", "v", "cell")
    )


def recompute_centroids(
    assigned: DataFrame, round_decimals: int = 6
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Member means per (cell, dim) -> driver pandas codebook (tiny: k x dim).
    The A1 sum/count/divide update (/root/reference/Clustering.h:190-215)."""
    pdf = (
        assigned.select("cell", F.posexplode("v").alias("dim", "val"))
        .groupBy("cell", "dim")
        .agg(F.count("*").alias("n_members"), F.round(F.avg("val"), round_decimals).alias("m"))
        .toPandas()
        .sort_values(["cell", "dim"])
    )
    cents = (
        pdf.groupby("cell")["m"].agg(list).reset_index().rename(columns={"m": "b"})
    )
    return cents, pdf


def seed_first_k(vecs: DataFrame, k: int) -> pd.DataFrame:
    """Deterministic contract seeding: the k lowest vec_ids."""
    pdf = (
        vecs.orderBy("vec_id").limit(k)
        .select(F.col("vec_id").cast("int").alias("cell"), F.col("v").alias("b"))
        .toPandas()
    )
    pdf["cell"] = np.arange(len(pdf), dtype=np.int32)
    return pdf


def seed_farthest(vecs: DataFrame, k: int, metric: str = "cosine") -> pd.DataFrame:
    """Deterministic k-center sweep: start from the lowest vec_id, then
    repeatedly add the vector farthest from its nearest chosen seed (ties by
    vec_id). Deterministic stand-in for the reference's random kmeans++
    restarts (/root/reference/Clustering.h:96-120)."""
    seeds = seed_first_k(vecs, 1)
    spark = vecs.sparkSession
    for i in range(1, k):
        scorer = _cosine("v", "b") if metric == "cosine" else _neg_l2sq("v", "b")
        cent = spark.createDataFrame(seeds, schema="cell int, b array<double>")
        worst = (
            vecs.crossJoin(F.broadcast(cent))
            .withColumn("_sim", scorer)
            .groupBy("vec_id", "v")
            .agg(F.max("_sim").alias("best"))
            .orderBy(F.asc("best"), F.asc("vec_id"))
            .limit(1)
            .toPandas()
        )
        seeds = pd.concat(
            [seeds, pd.DataFrame({"cell": [i], "b": [list(worst["v"].iloc[0])]})],
            ignore_index=True,
        )
    return seeds


def kmeans_train(
    vecs: DataFrame,
    k: int,
    max_iters: int = 10,
    tol: float = 0.0,
    metric: str = "cosine",
    seeding: str = "first",
    round_decimals: int = 6,
):
    """Full Lloyd training loop. Returns (centroids_pdf, last_stats_pdf, iters_run).

    ``vecs``: (vec_id long, v array<double>). ``tol`` > 0 breaks when the max
    absolute per-dimension centroid shift falls below it (the reference's
    ``err`` convergence break, /root/reference/Clustering.h:176-188);
    ``tol == 0`` runs exactly ``max_iters`` iterations (the deterministic
    contract mode). Empty cells drop out (their members re-home next round),
    matching the natural SQL semantics on both engine and oracle sides.
    """
    if seeding == "farthest":
        cents = seed_farthest(vecs, k, metric=metric)
    else:
        cents = seed_first_k(vecs, k)
    stats = None
    iters_run = 0
    for _ in range(max_iters):
        assigned = assign_cells(vecs, cents, metric=metric)
        new_cents, stats = recompute_centroids(assigned, round_decimals)
        iters_run += 1
        if tol > 0.0:
            merged = cents.merge(new_cents, on="cell", suffixes=("_old", "_new"))
            if len(merged):
                shift = max(
                    float(np.max(np.abs(np.asarray(o, dtype=float) - np.asarray(n, dtype=float))))
                    for o, n in zip(merged["b_old"], merged["b_new"])
                )
                if shift < tol:
                    cents = new_cents
                    break
        cents = new_cents
    return cents, stats, iters_run
