"""operators/ranks.py: the range-partitioned two-pass primitives must be
bit-identical to the single-partition window forms they replace, for any
partition count (including n_parts > n_rows and n_parts = 1)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from database_synchronize_tool_spark.operators.ranks import (
    global_row_numbers,
    global_running_sum,
    ntile_from_rn,
    topk_ranked,
)


def _frame(spark, n=137):
    # non-trivial order: values collide (v = i % 19) so the unique
    # tiebreak (i) is load-bearing, exactly like the declared queries
    return spark.range(n).select(
        F.col("id").alias("i"), (F.col("id") % 19).alias("v")
    )


@pytest.mark.parametrize("n_parts", [1, 4, 32, 200])
def test_global_row_numbers_matches_window(spark, n_parts):
    df = _frame(spark)
    got = global_row_numbers(
        df, [F.col("v"), F.col("i")], "rn", n_parts=n_parts
    )
    w = Window.orderBy("v", "i")
    want = df.withColumn("rn", F.row_number().over(w))
    assert sorted(got.collect()) == sorted(want.collect())


def test_global_row_numbers_desc_order(spark):
    df = _frame(spark)
    got = global_row_numbers(df, [F.col("v").desc(), F.col("i")], "rn")
    w = Window.orderBy(F.col("v").desc(), "i")
    want = df.withColumn("rn", F.row_number().over(w))
    assert sorted(got.collect()) == sorted(want.collect())


@pytest.mark.parametrize("n_parts", [1, 4, 32])
def test_global_running_sum_matches_window(spark, n_parts):
    df = _frame(spark)
    got = global_running_sum(
        df, [F.col("i")], "v", "cum", n_parts=n_parts
    )
    w = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("cum", F.sum("v").over(w))
    assert sorted(got.collect()) == sorted(want.collect())


@pytest.mark.parametrize("n,buckets", [(137, 10), (7, 4), (3, 10), (40, 4)])
def test_ntile_formula_matches_spark_ntile(spark, n, buckets):
    df = spark.range(n).select(F.col("id").alias("i"))
    w = Window.orderBy("i")
    want = df.select(
        "i", F.ntile(buckets).over(w).cast("int").alias("b")
    )
    got = df.select(
        "i",
        ntile_from_rn(
            F.row_number().over(w), F.lit(n), buckets
        ).alias("b"),
    )
    assert sorted(got.collect()) == sorted(want.collect())


def test_topk_ranked_matches_filtered_window(spark):
    df = _frame(spark)
    got = topk_ranked(df, 12, [F.col("v").desc(), F.col("i")])
    w = Window.orderBy(F.col("v").desc(), "i")
    want = (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 12)
    )
    assert sorted(got.collect()) == sorted(want.collect())
    # and the plan is a TakeOrderedAndProject, not a global sort
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
