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


# --- Misra-Gries heavy hitters ------------------------------------------------


def test_misra_gries_recall_guarantee_across_partitions(spark):
    """Every item with global frequency >= 1/den survives candidate
    generation when capacity >= den — even with hostile partitioning."""
    from pyspark.sql import functions as F

    from database_synchronize_tool_spark.operators.sketches import (
        misra_gries_candidates,
    )

    # 'hot' is ~10% of the stream, drowned in 900 distinct cold keys,
    # spread over 8 partitions.
    rows = [("hot",)] * 100 + [(f"cold{i}",) for i in range(900)]
    df = spark.createDataFrame(rows, "term STRING").repartition(8)
    cands = {
        r["term"] for r in misra_gries_candidates(df, "term", 20).collect()
    }
    assert "hot" in cands  # freq 0.1 > 1/(20+1): guaranteed present


def test_heavy_hitters_exact_matches_plain_groupby(spark):
    from pyspark.sql import functions as F

    from database_synchronize_tool_spark.operators.sketches import (
        heavy_hitters_exact,
    )

    rows = (
        [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 15 + [("d",)] * 5
    )  # N=100
    df = spark.createDataFrame(rows, "term STRING").repartition(4)
    got = {
        (r["term"], r["cnt"], r["n_total"])
        for r in heavy_hitters_exact(df, "term", den=5).collect()
    }
    # threshold: cnt*5 >= 100  =>  cnt >= 20  =>  a and b only
    assert got == {("a", 50, 100), ("b", 30, 100)}


def test_heavy_hitters_capacity_below_den_raises(spark):
    import pytest as _pytest

    from database_synchronize_tool_spark.operators.sketches import (
        heavy_hitters_exact,
    )

    df = spark.createDataFrame([("x",)], "term STRING")
    with _pytest.raises(ValueError, match="recall guarantee"):
        heavy_hitters_exact(df, "term", den=10, capacity=5)


def test_misra_gries_nulls_ignored(spark):
    from database_synchronize_tool_spark.operators.sketches import (
        misra_gries_candidates,
    )

    df = spark.createDataFrame(
        [("a",), (None,), ("a",), (None,)], "term STRING"
    )
    cands = {r["term"] for r in misra_gries_candidates(df, "term", 4).collect()}
    assert cands == {"a"}
