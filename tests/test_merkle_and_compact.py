"""Unit tests for round-8 batch 3: merkle bucket diff + streaming compaction.

The declared queries (j10_merkle_range_diff, t12_stream_changelog_compact,
stats_*, agg_argmax_showcase) are oracle-paired; these tests pin what the
oracle can't see — digest order-insensitivity, divergence classification,
and true cross-micro-batch state carry (the sf0.01 table streams as ONE
file = one batch, so the multi-batch path needs a split-file source).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import Row

from database_synchronize_tool_spark.operators.diff import merkle_bucket_diff


def _orders(spark, rows):
    return spark.createDataFrame(
        [Row(o_orderkey=k, price=p, status=s) for k, p, s in rows]
    )


def test_merkle_diff_empty_when_identical(spark):
    rows = [(i, f"{i}.00", "O") for i in range(1, 50)]
    a = _orders(spark, rows)
    b = _orders(spark, rows)
    d = merkle_bucket_diff(a, b, "o_orderkey", ["o_orderkey", "price", "status"], 16)
    assert d.count() == 0


def test_merkle_diff_flags_only_touched_buckets(spark):
    rows = [(i, f"{i}.00", "O") for i in range(1, 65)]
    target = _orders(spark, rows)
    # mutate key 3 (bucket 0), delete key 40 (bucket 2); buckets 1 & 3 clean
    mutated = [
        (k, ("9.99" if k == 3 else p), s) for k, p, s in rows if k != 40
    ]
    source = _orders(spark, mutated)
    d = merkle_bucket_diff(
        target, source, "o_orderkey", ["o_orderkey", "price", "status"], 16
    ).collect()
    assert sorted(r.bucket for r in d) == [0, 2]
    by_bucket = {r.bucket: r for r in d}
    # bucket 0: same count, different digest (changed row)
    assert by_bucket[0].target_rows == by_bucket[0].source_rows
    assert by_bucket[0].target_digest != by_bucket[0].source_digest
    # bucket 2: count mismatch (deleted row)
    assert by_bucket[2].target_rows == by_bucket[2].source_rows + 1


def test_merkle_digest_is_order_insensitive(spark):
    rows = [(i, f"{i}.50", "F") for i in range(1, 33)]
    fwd = _orders(spark, rows)
    rev = _orders(spark, list(reversed(rows))).repartition(7)
    d = merkle_bucket_diff(fwd, rev, "o_orderkey", ["o_orderkey", "price", "status"], 8)
    assert d.count() == 0  # same multiset => same digests despite order/partitioning


def _write_compact_file(path: str, rows, mtime: int) -> None:
    import datetime as dt

    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [dt.datetime.fromisoformat(r[1]) for r in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([float(r[0]) for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


def test_stateful_compaction_carries_state_across_batches(spark, tmp_path):
    from database_synchronize_tool_spark.streaming.stateful import (
        compact_latest_stateful,
    )

    src = tmp_path / "compact_src"
    src.mkdir()
    # batch 1: user 1 has its NEWEST event; batch 2 adds only older ones.
    # A state-less per-batch compactor would answer event 20 (batch 2's local
    # winner); correct cross-batch state answers event 10 with n_events=3.
    _write_compact_file(
        str(src / "f1.parquet"),
        [(10, "2024-01-01T12:00:00", 1, "purchase")],
        1_000,
    )
    _write_compact_file(
        str(src / "f2.parquet"),
        [
            (20, "2024-01-01T10:00:00", 1, "view"),
            (21, "2024-01-01T11:00:00", 1, "click"),
        ],
        2_000,
    )
    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = compact_latest_stateful(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("compact_carry_tbl")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.table("compact_carry_tbl").toPandas()
    # two batches touched user 1 => two emissions; final = max n_events
    final = emitted.sort_values("n_events").iloc[-1]
    assert int(final["n_events"]) == 3
    assert int(final["event_id"]) == 10  # batch-1 winner survived batch 2
    assert final["event_type"] == "purchase"
    first = emitted.sort_values("n_events").iloc[0]
    assert int(first["n_events"]) == 1 and int(first["event_id"]) == 10


def test_batch_and_stream_compaction_agree(spark, sf_dir):
    from database_synchronize_tool_spark.catalog import load_table
    from database_synchronize_tool_spark.operators.merge import changelog_compact
    from database_synchronize_tool_spark.plans.registry import all_queries

    got = (
        all_queries()["t12_stream_changelog_compact"]
        .builder(spark, sf_dir)
        .select("user_id", "event_id")
    )
    e = load_table(spark, sf_dir, "events")
    want = changelog_compact(e, ["user_id"], ["ts", "event_id"]).select(
        "user_id", "event_id"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_merkle_null_column_shift_is_detected(spark):
    # concat_ws alone would collide ('a', NULL, 'b') with ('a', 'b', NULL);
    # the chr(0) sentinel keeps the canonical strings distinct
    a = spark.createDataFrame([(1, "a", None, "b")], "k int, x string, y string, z string")
    b = spark.createDataFrame([(1, "a", "b", None)], "k int, x string, y string, z string")
    d = merkle_bucket_diff(a, b, "k", ["k", "x", "y", "z"], 16).collect()
    assert len(d) == 1 and d[0].target_digest != d[0].source_digest


def test_declared_t12_replay_is_truly_multibatch(spark, sf_dir):
    # the staged replay must produce MORE update-mode emissions than keys —
    # i.e., keys re-emitted across micro-batches; single-batch replay would
    # emit exactly one row per key and mask state loss
    from database_synchronize_tool_spark.plans.registry import all_queries

    all_queries()["t12_stream_changelog_compact"].builder(spark, sf_dir).collect()
    emitted = spark.table("t12_stream_compact_tbl")
    n_emissions = emitted.count()
    n_keys = emitted.select("user_id").distinct().count()
    assert n_emissions > n_keys


def test_stateful_compaction_null_ts_counts_but_never_wins(spark, tmp_path):
    """A NULL-ts changelog row must not crash the compactor or be chosen as
    the winner (pandas sort_values puts NaN LAST, so without the dropna
    guard it WOULD win and int(us) would raise); it still counts toward
    n_events, matching the batch compactor's NULLS-FIRST ordering."""
    import datetime as dt

    from database_synchronize_tool_spark.streaming.stateful import (
        compact_latest_stateful,
    )

    src = tmp_path / "compact_null_src"
    src.mkdir()
    tbl = pa.table(
        {
            "event_id": pa.array([10, 11], pa.int64()),
            "ts": pa.array(
                [dt.datetime(2024, 1, 1, 12), None], pa.timestamp("us")
            ),
            "user_id": pa.array([1, 1], pa.int64()),
            "event_type": pa.array(["purchase", "ghost"], pa.string()),
            "value": pa.array([1.0, None], pa.float64()),
        }
    )
    pq.write_table(tbl, str(src / "f1.parquet"))
    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )
        .parquet(str(src))
    )
    out = compact_latest_stateful(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("compact_null_tbl")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.table("compact_null_tbl").toPandas()
    final = emitted.sort_values("n_events").iloc[-1]
    assert int(final["n_events"]) == 2  # NULL-ts row counted
    assert int(final["event_id"]) == 10  # ...but the non-null row won
    assert final["event_type"] == "purchase"
