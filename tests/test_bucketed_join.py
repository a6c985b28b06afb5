"""Bucketed co-located joins: SCALE.md's claim that pre-bucketing both
sides of a recurring join eliminates its shuffle must be true in the
executed plan, not just prose. At 100 TB the fact-fact join (orders x
lineitem) is re-run by every downstream workload; bucketing both tables
by the join key at write time trades one layout write for a
shuffle-free SortMergeJoin on every subsequent read."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from database_synchronize_tool_spark.catalog import load_table


@pytest.fixture()
def bucketed_tables(spark, sf_dir, tmp_path):
    # saveAsTable is required for bucket metadata; point the warehouse at
    # the test's tmp dir via table-level path options.
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    load_table(spark, sf_dir, "orders").write.bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").option(
        "path", str(tmp_path / "b_orders")
    ).saveAsTable("b_orders")
    load_table(spark, sf_dir, "lineitem").write.bucketBy(
        8, "l_orderkey"
    ).sortBy("l_orderkey").option(
        "path", str(tmp_path / "b_lineitem")
    ).saveAsTable("b_lineitem")
    yield
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree(tmp_path, ignore_errors=True)


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    # Disable the broadcast conversion for this test: at test scale AQE
    # broadcasts the small side, which hides the property under test —
    # that at FACT-x-FACT scale (where broadcast is impossible) the bucket
    # layout feeds SortMergeJoin with NO exchange on either side.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("b_orders")
            .join(
                spark.table("b_lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert joined.count() >= 1  # materialize -> final adaptive plan
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:800]
        # everything BELOW the join must be exchange-free: the only
        # allowed Exchange is the final groupBy's, which sits ABOVE the
        # join in the plan text
        join_part = plan.split("SortMergeJoin")[-1]
        assert "Exchange" not in join_part, join_part[:800]
        # bucketed scans advertise bucket pruning metadata
        assert "SelectedBucketsCount" in plan, plan[:800]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_unbucketed_result(spark, sf_dir, bucketed_tables):
    bucketed = (
        spark.table("b_orders")
        .join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plain = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )
