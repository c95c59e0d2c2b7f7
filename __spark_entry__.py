"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (full engine: transcripts ->
checkpointed index build -> compressed segment -> block-max WAND top-k BM25)
on sf0.001. ``queries()``/``oracle_sql()`` expose one entry per implemented
operator family from SURVEY.md §2 (see ivfadc_spark/plans/driver_queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from ivfadc_spark.plans.driver_queries import q_bm25_wand

    return q_bm25_wand(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ivfadc_spark.plans.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from ivfadc_spark.plans.driver_queries import ORACLES

    return dict(ORACLES)
