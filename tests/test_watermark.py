"""Unit tests for high-watermark incremental extraction (SURVEY §2.9 T1-T3):
the id/timestamp NULL asymmetry, strict-> tie loss in parity mode, lateness
recovery, and full incremental_sync replay idempotence."""

from __future__ import annotations

import datetime as dt

from database_synchronize_tool_spark.operators.watermark import (
    delta_filter,
    incremental_sync,
    probe_watermark,
)

TS = dt.datetime(2024, 1, 1, 12, 0, 0)


def test_probe_id_null_coalesces_to_zero(spark):
    # T2: empty destination with an id watermark -> 0 (delta path "> 0"),
    # mirroring sync_utils.py:32-33
    empty = spark.createDataFrame([], "id bigint, v string")
    assert probe_watermark(empty, "id", "id") == 0


def test_probe_timestamp_null_stays_null(spark):
    # T2: empty destination with a timestamp watermark -> None (full-copy path)
    empty = spark.createDataFrame([], "ts timestamp, v string")
    assert probe_watermark(empty, "ts", "timestamp") is None


def test_probe_max(spark):
    df = spark.createDataFrame([(5,), (9,), (3,)], "id bigint")
    assert probe_watermark(df, "id", "id") == 9


def test_delta_parity_drops_ties(spark):
    # T3: strict > excludes rows tying the stored max (sync_utils.py:63)
    src = spark.createDataFrame(
        [(TS - dt.timedelta(hours=1), "old"), (TS, "tie"), (TS + dt.timedelta(hours=1), "new")],
        "ts timestamp, v string",
    )
    got = sorted(r["v"] for r in delta_filter(src, "ts", TS, parity=True).collect())
    assert got == ["new"]


def test_delta_corrected_recovers_ties(spark):
    src = spark.createDataFrame(
        [(TS - dt.timedelta(hours=1), "old"), (TS, "tie"), (TS + dt.timedelta(hours=1), "new")],
        "ts timestamp, v string",
    )
    got = sorted(
        r["v"] for r in delta_filter(src, "ts", TS, parity=False).collect()
    )
    assert got == ["new", "tie"]


def test_delta_lateness_window(spark):
    src = spark.createDataFrame(
        [(TS - dt.timedelta(minutes=30), "late"), (TS - dt.timedelta(hours=2), "old")],
        "ts timestamp, v string",
    )
    got = sorted(
        r["v"]
        for r in delta_filter(
            src, "ts", TS, parity=False, lateness=dt.timedelta(hours=1)
        ).collect()
    )
    assert got == ["late"]


def test_delta_none_watermark_full_copy(spark):
    src = spark.createDataFrame([(TS, "a"), (TS, "b")], "ts timestamp, v string")
    assert delta_filter(src, "ts", None).count() == 2


def test_incremental_sync_replay_is_noop(spark):
    """SURVEY §5.3: run sync twice -> second run changes nothing."""
    source = spark.createDataFrame(
        [(1, TS, "a"), (2, TS + dt.timedelta(hours=1), "b")],
        "id bigint, ts timestamp, v string",
    )
    empty_target = spark.createDataFrame([], "id bigint, ts timestamp, v string")
    once = incremental_sync(empty_target, source, ["id"], "ts")
    assert once.count() == 2
    twice = incremental_sync(once, source, ["id"], "ts")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_incremental_sync_only_above_watermark(spark):
    """Rows below/at/above the destination max: only above synced (parity)."""
    target = spark.createDataFrame([(1, TS, "seen")], "id bigint, ts timestamp, v string")
    source = spark.createDataFrame(
        [
            (1, TS, "seen"),
            (2, TS - dt.timedelta(hours=1), "below"),
            (3, TS, "tie"),
            (4, TS + dt.timedelta(hours=1), "above"),
        ],
        "id bigint, ts timestamp, v string",
    )
    out = incremental_sync(target, source, ["id"], "ts")
    assert sorted(r["v"] for r in out.collect()) == ["above", "seen"]


def test_incremental_sync_auto_evolves_added_column(spark):
    """r10 verdict #6: an added nullable source column must auto-evolve the
    target (pre-existing rows read NULL), not fail the sync."""
    target = spark.createDataFrame(
        [(1, TS, "old")], "id bigint, ts timestamp, v string"
    )
    source = spark.createDataFrame(
        [(2, TS + dt.timedelta(hours=1), "new", "extra")],
        "id bigint, ts timestamp, v string, note string",
    )
    out = incremental_sync(target, source, ["id"], "ts")
    assert set(out.columns) == {"id", "ts", "v", "note"}
    rows = {r["id"]: r["note"] for r in out.collect()}
    assert rows == {1: None, 2: "extra"}
    # replay over the evolved target: diff is now empty, result unchanged
    again = incremental_sync(out, source, ["id"], "ts")
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, out.collect()))


def test_incremental_sync_fails_fast_on_breaking_drift(spark):
    import pytest

    target = spark.createDataFrame(
        [(1, TS, "old")], "id bigint, ts timestamp, v string"
    )
    # type change: v string -> bigint
    retyped = spark.createDataFrame(
        [(2, TS, 9)], "id bigint, ts timestamp, v bigint"
    )
    with pytest.raises(ValueError, match="type_changed"):
        incremental_sync(target, retyped, ["id"], "ts")
    # removed column
    narrowed = spark.createDataFrame([(2, TS)], "id bigint, ts timestamp")
    with pytest.raises(ValueError, match="removed"):
        incremental_sync(target, narrowed, ["id"], "ts")
    # evolution disabled -> added column is an error too
    widened = spark.createDataFrame(
        [(2, TS, "x", "y")], "id bigint, ts timestamp, v string, note string"
    )
    with pytest.raises(ValueError, match="evolve_schema=False"):
        incremental_sync(target, widened, ["id"], "ts", evolve_schema=False)
