"""Physical-plan regression guards: the optimizations SURVEY §4 claims are
real must stay visible in the executed plan — filter pushdown into the
parquet scan, column pruning in ReadSchema, broadcast joins for dims, and
single-sort window evaluation. A refactor that silently loses one of these
passes value-checks but regresses at scale; these tests pin the plan."""

from __future__ import annotations

from database_synchronize_tool_spark.plans.registry import all_queries


def plan_of(spark, sf_dir, name: str) -> str:
    df = all_queries()[name].builder(spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_delta_scan_pushes_watermark_filter(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "s2_delta_scan_ts")
    assert "PushedFilters" in plan
    assert "GreaterThan(l_shipdate" in plan  # the watermark predicate reached the scan


def test_projection_prunes_read_schema(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "s1_full_scan_projection")
    # ReadSchema carries only the 4 projected columns — not all of customer
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "c_custkey" in read and "c_acctbal" in read
    assert "c_address" not in read and "c_phone" not in read


def test_q5_broadcasts_dimensions(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q5_revenue_by_nation")
    assert "BroadcastHashJoin" in plan  # dims broadcast, no dim-side shuffle


def test_q1_partial_aggregation(spark, sf_dir):
    # map-side combine: two HashAggregate nodes around one Exchange
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan


def test_sessionization_single_sort(spark, sf_dir):
    # both window functions must share one shuffle+sort (the t6 regression)
    plan = plan_of(spark, sf_dir, "t6_sessionization")
    n_sorts = sum(1 for l in plan.splitlines() if l.strip().startswith("(") and ") Sort" in l)
    assert n_sorts <= 1, f"expected a single Sort for both windows, got {n_sorts}"


def test_topk_is_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "o1_sort_limit_topk")
    assert "TakeOrderedAndProject" in plan  # not a full global sort


def test_multiprobe_join_is_broadcast_hash_not_cartesian(spark, sf_dir):
    # the probe explode must stay on the broadcast query side; the candidate
    # join must remain a bucket equi-join (hash), never a cartesian product
    plan = plan_of(spark, sf_dir, "ann_multiprobe_topk")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ivf_cell_join_is_broadcast_hash_not_cartesian(spark, sf_dir):
    # centroid assignment is a broadcast nested-loop over 16 rows (intended:
    # per-row argmax against the broadcast centroid list); the cell search
    # join itself must be a hash equi-join and nothing may be a cartesian
    plan = plan_of(spark, sf_dir, "ann_ivf_topk")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bucketed_target_merge_skips_big_side_shuffle(spark, sf_dir):
    # SCALE.md / merge.py claim: a target bucketed on the merge key is not
    # re-shuffled by the merge join — its bucketing already satisfies the
    # required distribution, so only the (small) source side pays an
    # Exchange. Pin that: the bucketed plan must carry strictly fewer
    # Exchanges than the identical merge over the unbucketed parquet.
    from database_synchronize_tool_spark.catalog import load_table
    from database_synchronize_tool_spark.operators.merge import merge_upsert

    orders = load_table(spark, sf_dir, "orders")
    delta = orders.limit(500)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        spark.sql("DROP TABLE IF EXISTS bucketed_orders_test")
        (
            orders.write.mode("overwrite")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable("bucketed_orders_test")
        )
        bucketed = spark.table("bucketed_orders_test")

        def exchanges(df) -> int:
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            return plan.count("Exchange")

        n_bucketed = exchanges(merge_upsert(bucketed, delta, ["o_orderkey"]))
        n_plain = exchanges(merge_upsert(orders, delta, ["o_orderkey"]))
        assert n_bucketed < n_plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bucketed_orders_test")
