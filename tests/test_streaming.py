"""Streaming surface tests: batch/stream parity for tumbling windows and
sessions (the stream processed with availableNow must agree with the batch
plan over the same data), and the foreachBatch streaming merge."""

from __future__ import annotations

import pytest

from database_synchronize_tool_spark.catalog import load_table
from database_synchronize_tool_spark.streaming.events import (
    read_events_stream,
    run_to_memory,
    session_counts,
    stream_merge_into,
    tumbling_counts,
)


def canon(rows):
    return sorted(tuple(r) for r in rows)


def test_tumbling_stream_matches_batch(spark, sf_dir):
    batch = tumbling_counts(load_table(spark, sf_dir, "events"))
    stream = tumbling_counts(read_events_stream(spark, sf_dir))
    assert stream.isStreaming
    run_to_memory(stream, "tumbling_test", output_mode="complete")
    got = canon(spark.sql("SELECT * FROM tumbling_test").collect())
    want = canon(batch.collect())
    assert got == want


def test_session_stream_matches_batch(spark, sf_dir):
    batch = session_counts(load_table(spark, sf_dir, "events"))
    stream = session_counts(read_events_stream(spark, sf_dir))
    run_to_memory(stream, "session_test", output_mode="complete")
    got = canon(spark.sql("SELECT * FROM session_test").collect())
    want = canon(batch.collect())
    assert got == want


def test_session_stream_append_emits_watermark_closed_only(spark, sf_dir):
    """Append mode must emit exactly the sessions the watermark finalized:
    session_end (last event + gap) <= max event time - delay. This is the
    eviction rule the declared t10_stream_session_window oracle models."""
    import pyspark.sql.functions as F

    stream = session_counts(read_events_stream(spark, sf_dir))
    run_to_memory(stream, "session_append_test", output_mode="append")
    got = canon(spark.sql("SELECT * FROM session_append_test").collect())

    events = load_table(spark, sf_dir, "events")
    mx = events.agg(F.max(F.col("ts").cast("timestamp"))).first()[0]
    import datetime as dt

    cutoff = mx - dt.timedelta(hours=2)
    batch = session_counts(events).filter(
        F.col("session_end").cast("timestamp") <= F.lit(cutoff)
    )
    want = canon(batch.collect())
    assert got == want
    assert 0 < len(got) < session_counts(events).count()  # something held back


def test_stream_merge_foreachbatch(spark, sf_dir, tmp_path):
    """Micro-batches flow through the same merge_upsert as the batch engine;
    the final state equals a plain batch copy keyed on event_id."""
    from database_synchronize_tool_spark.operators.merge import merge_upsert

    out_dir = str(tmp_path / "target.parquet")
    ckpt = str(tmp_path / "ckpt")
    stream = read_events_stream(spark, sf_dir, max_files_per_trigger=1)

    def apply_batch(batch_df, batch_id):
        import os

        spark_ = batch_df.sparkSession
        if os.path.exists(out_dir):
            target = spark_.read.parquet(out_dir)
            merged = merge_upsert(target, batch_df, ["event_id"])
        else:
            merged = batch_df
        merged.write.mode("overwrite").parquet(out_dir + ".tmp")
        final = spark_.read.parquet(out_dir + ".tmp")
        final.write.mode("overwrite").parquet(out_dir)

    q = stream_merge_into(stream, ["event_id"], apply_batch, ckpt)
    q.awaitTermination()

    want = load_table(spark, sf_dir, "events").count()
    got = spark.read.parquet(out_dir).count()
    assert got == want


def test_stateful_sessionization_matches_batch_closed_sessions(spark, sf_dir):
    """applyInPandasWithState sessionization: the closed sessions it emits
    must equal the batch gaps-and-islands sessions minus each user's final
    (still-open) session."""
    from database_synchronize_tool_spark.plans.registry import all_queries
    from database_synchronize_tool_spark.streaming.stateful import sessionize_stateful

    stream = sessionize_stateful(read_events_stream(spark, sf_dir))
    run_to_memory(stream, "stateful_sessions", output_mode="append")
    got = {
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in spark.sql("SELECT * FROM stateful_sessions").collect()
    }

    batch = all_queries()["t6_sessionization"].builder(spark, sf_dir).collect()
    # drop each user's last session (still open in the state store)
    by_user = {}
    for r in batch:
        by_user.setdefault(r["user_id"], []).append(r)
    want = set()
    for user, rows in by_user.items():
        rows.sort(key=lambda r: r["session_start_us"])
        for r in rows[:-1]:
            want.add((user, r["session_start_us"], r["session_end_us"], r["n_events"]))
    assert got == want
    assert len(got) > 0
