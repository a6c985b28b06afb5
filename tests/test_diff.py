"""sync_diff audit operator: classification, null semantics, column scope."""

from __future__ import annotations

from database_synchronize_tool_spark.operators.diff import sync_diff


def rows(df):
    return sorted((r["k"], r["status"]) for r in df.collect())


def test_classifies_all_three_statuses(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, name string, v int"
    )
    source = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, "d", 40)], "k int, name string, v int"
    )
    assert rows(sync_diff(target, source, ["k"])) == [
        (2, "changed"),  # name differs
        (3, "missing_in_source"),
        (4, "missing_in_target"),
    ]  # key 1 equal -> not emitted


def test_null_values_compare_null_safe(spark):
    # NULL == NULL is NOT a diff (IS DISTINCT FROM semantics); NULL vs value is
    target = spark.createDataFrame([(1, None), (2, None)], "k int, v string")
    source = spark.createDataFrame([(1, None), (2, "x")], "k int, v string")
    assert rows(sync_diff(target, source, ["k"])) == [(2, "changed")]


def test_compare_cols_subset_ignores_other_drift(spark):
    target = spark.createDataFrame([(1, "a", 99)], "k int, name string, v int")
    source = spark.createDataFrame([(1, "a", 10)], "k int, name string, v int")
    # full compare sees the v drift; name-only compare does not
    assert rows(sync_diff(target, source, ["k"])) == [(1, "changed")]
    assert rows(sync_diff(target, source, ["k"], compare_cols=["name"])) == []


def test_identical_tables_empty_diff(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    assert sync_diff(df, df, ["k"]).count() == 0
