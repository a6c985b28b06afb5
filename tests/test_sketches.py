"""Sketch accuracy: approx_count_distinct (HLL++) has no cross-engine oracle
(sketches are engine-specific), so its check is a bounded relative error
against the exact distinct count — the contract a 100 TB user relies on."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_synchronize_tool_spark.catalog import load_table


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    exact = {
        r["o_orderstatus"]: r["n"]
        for r in o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    approx = {
        r["o_orderstatus"]: r["n"]
        for r in o.groupBy("o_orderstatus")
        .agg(F.approx_count_distinct("o_custkey", rsd=0.02).alias("n"))
        .collect()
    }
    assert set(exact) == set(approx)
    for status, n_exact in exact.items():
        rel_err = abs(approx[status] - n_exact) / max(n_exact, 1)
        # rsd=0.02 is one standard deviation; 5x gives a comfortably
        # deterministic bound (HLL++ is deterministic for fixed input)
        assert rel_err <= 0.10, f"{status}: {approx[status]} vs {n_exact}"


def test_approx_percentile_within_rank_bound(spark, sf_dir):
    """approx_percentile(accuracy=100) guarantees rank error <= 1%: the
    sketch's p50 must land between the exact 0.49 and 0.51 quantiles (the
    raw guarantee, tighter than the declared query's 2x-cushioned band)."""
    o = load_table(spark, sf_dir, "orders")
    rows = o.groupBy("o_orderstatus").agg(
        F.expr("approx_percentile(o_totalprice, 0.5, 100)").alias("sketch"),
        F.expr("percentile(o_totalprice, 0.49)").alias("lo"),
        F.expr("percentile(o_totalprice, 0.51)").alias("hi"),
    ).collect()
    assert rows
    for r in rows:
        assert r["lo"] <= r["sketch"] <= r["hi"], (
            f"{r['o_orderstatus']}: {r['sketch']} outside [{r['lo']}, {r['hi']}]"
        )
