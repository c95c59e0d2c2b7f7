"""Executed-plan shape guards (round-4 verdict item 4).

The kmeans/IVF contract entries were re-routed from the crossJoin+window
SQL form (which exchanges n*k scored rows through a per-vec_id window
sort) to the arrow kernels, where the k x d codebook rides the task
closure and each partition does one matrix argmax. These tests pin the
plan: NO Exchange may appear below the assignment kernel — n rows in,
n (or n*nprobe) rows out, zero shuffle. If someone reintroduces a join
or window into the assignment path, the plan string grows an Exchange
and these fail.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _executed_plan(df) -> str:
    df.count()  # AQE: final plan only materializes after an action
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def vecs(spark):
    pdf = pd.DataFrame(
        {
            "vec_id": range(40),
            "v": [[float(i % 7), float(i % 5), float(i % 3), 1.0] for i in range(40)],
            "label": [i % 2 for i in range(40)],
        }
    )
    return spark.createDataFrame(pdf, schema="vec_id long, v array<double>, label int")


@pytest.fixture(scope="module")
def cent_pdf():
    return pd.DataFrame(
        {"cell": [0, 1, 2], "b": [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 1.0]]}
    )


def test_assign_cells_zero_exchange(spark, vecs, cent_pdf):
    from ivfadc_spark.operators.clustering import assign_cells

    plan = _executed_plan(assign_cells(vecs.select("vec_id", "v"), cent_pdf, metric="cosine"))
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" in plan or "MapInArrow" in plan or "PythonMapInArrow" in plan


def test_coarse_assign_zero_exchange(spark, vecs, cent_pdf):
    from ivfadc_spark.operators import pq

    ranked = pq.coarse_assign(
        vecs, cent_pdf, nprobe=2, metric="cosine", passthrough=("label",)
    )
    plan = _executed_plan(ranked)
    assert "Exchange" not in plan, plan


def test_coarse_assign_cosine_matches_sql_form(spark, vecs, cent_pdf):
    """Arrow cosine ranking (normalized-dot argsort) must agree with the
    declarative crossJoin+window form on assignment AND probe ranks."""
    from ivfadc_spark.operators import pq

    a = (
        pq.coarse_assign(vecs, cent_pdf, nprobe=2, metric="cosine", passthrough=("label",))
        .select("vec_id", "cell", "r", "label")
        .toPandas()
        .sort_values(["vec_id", "r"])
        .reset_index(drop=True)
    )
    b = (
        pq.coarse_assign(vecs, cent_pdf, nprobe=2, metric="cosine", impl="sql",
                         passthrough=("label",))
        .select("vec_id", "cell", "r", "label")
        .toPandas()
        .sort_values(["vec_id", "r"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a.astype("int64"), b.astype("int64"))


def test_coarse_assign_l2_passthrough_roundtrip(spark, vecs, cent_pdf):
    """Passthrough columns replicate verbatim onto every ranked row."""
    from ivfadc_spark.operators import pq

    out = (
        pq.coarse_assign(vecs, cent_pdf, nprobe=3, metric="l2", passthrough=("label",))
        .groupBy("vec_id")
        .agg(F.countDistinct("label").alias("nl"), F.count("*").alias("n"))
        .toPandas()
    )
    assert (out["nl"] == 1).all()
    assert (out["n"] == 3).all()
