"""SCD Type-2 merge: version chains, idempotent no-ops, batch dup collapse."""

from __future__ import annotations

from pyspark.sql import functions as F

import datetime as dt

from database_synchronize_tool_spark.operators.scd import scd2_merge

TARGET_SCHEMA = (
    "id bigint, seg string, bal double, "
    "valid_from timestamp, valid_to timestamp, is_current boolean"
)
SOURCE_SCHEMA = "id bigint, seg string, bal double, change_ts timestamp"

T0 = dt.datetime(2020, 1, 1)
T1 = dt.datetime(2024, 1, 1)
T2 = dt.datetime(2024, 6, 1)


def _canon(df):
    return sorted((tuple(r) for r in df.collect()), key=repr)


def _target(spark, rows):
    return spark.createDataFrame(rows, TARGET_SCHEMA)


def _source(spark, rows):
    return spark.createDataFrame(rows, SOURCE_SCHEMA)


def test_scd2_new_changed_unchanged(spark):
    target = _target(
        spark,
        [
            (1, "A", 10.0, T0, None, True),
            (2, "B", 20.0, T0, None, True),
            (3, "C", 30.0, T0, None, True),
        ],
    )
    source = _source(
        spark,
        [
            (1, "A", 10.0, T1),  # unchanged -> no-op
            (2, "B", 25.0, T1),  # changed   -> close + new version
            (9, "Z", 90.0, T1),  # new key   -> insert
        ],
    )
    got = _canon(scd2_merge(target, source, keys=["id"], tracked=["seg", "bal"]))
    assert got == sorted([
            (1, "A", 10.0, T0, None, True),
            (2, "B", 20.0, T0, T1, False),
            (2, "B", 25.0, T1, None, True),
            (3, "C", 30.0, T0, None, True),
            (9, "Z", 90.0, T1, None, True),
        ], key=repr
    )


def test_scd2_three_version_chain_and_history_passthrough(spark):
    target = _target(spark, [(1, "A", 10.0, T0, None, True)])
    after1 = scd2_merge(
        target, _source(spark, [(1, "A", 11.0, T1)]), keys=["id"], tracked=["seg", "bal"]
    )
    after2 = scd2_merge(
        after1, _source(spark, [(1, "B", 11.0, T2)]), keys=["id"], tracked=["seg", "bal"]
    )
    assert _canon(after2) == sorted([
            (1, "A", 10.0, T0, T1, False),
            (1, "A", 11.0, T1, T2, False),
            (1, "B", 11.0, T2, None, True),
        ], key=repr
    )


def test_scd2_idempotent_redelivery(spark):
    """Replaying the same batch is a no-op — the re-delivered values equal
    the now-current version, so nothing closes and nothing inserts."""
    target = _target(spark, [(1, "A", 10.0, T0, None, True)])
    batch = [(1, "A", 99.0, T1)]
    once = scd2_merge(
        target, _source(spark, batch), keys=["id"], tracked=["seg", "bal"]
    )
    twice = scd2_merge(
        once, _source(spark, batch), keys=["id"], tracked=["seg", "bal"]
    )
    assert _canon(once) == _canon(twice)


def test_scd2_batch_dups_collapse_to_latest(spark):
    target = _target(spark, [(1, "A", 10.0, T0, None, True)])
    source = _source(spark, [(1, "A", 11.0, T1), (1, "A", 12.0, T2)])
    got = _canon(scd2_merge(target, source, keys=["id"], tracked=["seg", "bal"]))
    # one close-out at the winning row's change_ts, one new current version
    assert got == sorted([
            (1, "A", 10.0, T0, T2, False),
            (1, "A", 12.0, T2, None, True),
        ], key=repr
    )


def test_scd2_null_tracked_values_null_safe(spark):
    """NULL->value and value->NULL are real changes; NULL->NULL is not."""
    target = _target(
        spark,
        [
            (1, None, 10.0, T0, None, True),
            (2, "B", 20.0, T0, None, True),
            (3, None, 30.0, T0, None, True),
        ],
    )
    source = _source(
        spark,
        [
            (1, "A", 10.0, T1),  # NULL -> 'A': change
            (2, None, 20.0, T1),  # 'B' -> NULL: change
            (3, None, 30.0, T1),  # NULL -> NULL: no-op
        ],
    )
    got = _canon(scd2_merge(target, source, keys=["id"], tracked=["seg", "bal"]))
    assert got == sorted([
            (1, None, 10.0, T0, T1, False),
            (1, "A", 10.0, T1, None, True),
            (2, "B", 20.0, T0, T1, False),
            (2, None, 20.0, T1, None, True),
            (3, None, 30.0, T0, None, True),
        ], key=repr
    )


def test_scd2_null_is_current_lands_in_history_not_dropped(spark):
    # a nullable is_current left NULL by an upstream writer must survive the
    # merge (in the history slice) — `col` and `~col` are both not-true for
    # NULL, so without coalesce the row silently vanished (round-7 review)
    from database_synchronize_tool_spark.operators.scd import scd2_merge

    target = spark.createDataFrame(
        [
            (1, "a", 10, None, None),
            (2, "b", 10, None, True),
        ],
        "k int, attr string, valid_from int, valid_to int, is_current boolean",
    )
    source = spark.createDataFrame([(2, "b2", 20)], "k int, attr string, change_ts int")
    out = scd2_merge(target, source, keys=["k"], tracked=["attr"], change_ts="change_ts")
    rows = {(r["k"], r["attr"], bool(r["is_current"])) for r in out.collect()}
    assert (1, "a", False) in rows  # NULL-flag row preserved as history
    assert (2, "b2", True) in rows and (2, "b", False) in rows


def test_pit_join_picks_version_valid_at_fact_time(spark):
    from database_synchronize_tool_spark.operators.scd import pit_join

    dim = spark.createDataFrame(
        [
            (1, "v1", 10, 20),
            (1, "v2", 20, 30),
            (1, "v3", 30, None),
            (2, "w1", 15, None),
        ],
        "k int, val string, valid_from int, valid_to int",
    )
    facts = spark.createDataFrame(
        [(100, 1, 5), (101, 1, 10), (102, 1, 20), (103, 1, 29), (104, 1, 99),
         (105, 2, 15), (106, 3, 50)],
        "fid int, k int, ts int",
    )
    out = {r["fid"]: r["val"] for r in
           pit_join(facts, dim, keys=["k"], fact_ts="ts").collect()}
    assert out[100] is None          # before first version
    assert out[101] == "v1"          # valid_from inclusive
    assert out[102] == "v2"          # boundary: half-open, new version wins
    assert out[103] == "v2"
    assert out[104] == "v3"          # open-ended current version
    assert out[105] == "w1"
    assert out[106] is None          # unknown key survives (left join)
    # never fans out: one output row per fact
    assert pit_join(facts, dim, keys=["k"], fact_ts="ts").count() == facts.count()


def test_pit_join_inner_drops_unmatched(spark):
    from database_synchronize_tool_spark.operators.scd import pit_join

    dim = spark.createDataFrame([(1, "v1", 10, None)],
                                "k int, val string, valid_from int, valid_to int")
    facts = spark.createDataFrame([(1, 1, 5), (2, 1, 50)], "fid int, k int, ts int")
    got = pit_join(facts, dim, keys=["k"], fact_ts="ts", how="inner").collect()
    assert [(r["fid"], r["val"]) for r in got] == [(2, "v1")]


def test_time_travel_snapshot_exactly_one_version_per_user(spark, sf_dir):
    from database_synchronize_tool_spark.catalog import load_table
    from database_synchronize_tool_spark.plans.sync_ops import (
        j14_time_travel_snapshot,
    )

    out = j14_time_travel_snapshot(spark, sf_dir).toPandas()
    # half-open intervals admit exactly one version per user alive at T —
    # every user with any event before the midpoint appears exactly once
    assert out["user_id"].is_unique
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .toPandas()
    )
    us = ev["ts"].astype("int64") // 1000
    as_of = int(out["as_of_us"].iloc[0])
    lo, hi = us.min(), us.max()
    assert as_of == lo + (hi - lo) // 2
    expected_users = set(ev.loc[us <= as_of, "user_id"])
    assert set(out["user_id"]) == expected_users
    # the chosen version is the user's LAST event at or before the cut
    last = ev.assign(us=us)
    last = last[last["us"] <= as_of].sort_values(["us", "event_id"]).groupby("user_id").last()
    for _, r in out.iterrows():
        assert r["version_eid"] == last.loc[r["user_id"], "event_id"]
