"""Streaming surface tests: batch/stream parity for tumbling windows and
sessions (the stream processed with availableNow must agree with the batch
plan over the same data), and the foreachBatch streaming merge."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


# --- late-data / watermark-drop semantics (VERDICT r3 #8) -------------------
#
# A controlled multi-file stream: each parquet file is one micro-batch
# (maxFilesPerTrigger=1; the file source processes oldest-mtime first, and we
# pin distinct mtimes). File 1 drives the watermark forward; a later file
# carries an event whose time is BEHIND the watermark and must be dropped by
# the engine, deterministically — not merged into a finalized session.
#
# Timing subtlety (empirically pinned here): a batch's input-side late filter
# uses the watermark advanced by batches STRICTLY BEFORE the previous one —
# the watermark computed from batch N's max event time takes filtering effect
# in batch N+2, even though the progress log already reports it on batch N+1.
# Hence the on-time filler batch between the watermark driver and the late
# straggler: it guarantees the straggler's batch runs with the advanced
# watermark in force, making the drop deterministic.

_LATE_SCHEMA = "user_id bigint, event_id bigint, ts timestamp, value double"


def _write_event_file(path: str, rows, mtime: int) -> None:
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array(
                [dt.datetime.fromisoformat(r[2]) for r in rows], pa.timestamp("us")
            ),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


def _event_stream(spark, src_dir: str):
    return (
        spark.readStream.schema(_LATE_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )


def test_session_window_drops_late_event(spark, tmp_path):
    """Built-in session_window + watermark: an event older than the watermark
    is dropped, so the finalized session keeps its original count instead of
    absorbing the straggler."""
    src = tmp_path / "late_src"
    src.mkdir()
    # batch 1: user 1 sessions at 10:00/10:05; user 99 at 12:00 pushes the
    # watermark to 12:00 - 10 min = 11:50 for the NEXT batch
    _write_event_file(
        str(src / "f1.parquet"),
        [
            (1, 101, "2024-01-01T10:00:00"),
            (1, 102, "2024-01-01T10:05:00"),
            (99, 900, "2024-01-01T12:00:00"),
        ],
        mtime=1_700_000_000,
    )
    # batch 2: on-time filler (own open session, never emitted) — carries the
    # 11:50 watermark into force for the batch after it
    _write_event_file(
        str(src / "f2.parquet"),
        [(98, 800, "2024-01-01T12:01:00")],
        mtime=1_700_000_100,
    )
    # batch 3: a late event inside user 1's session span — behind the 11:50
    # watermark, must be dropped (were it admitted, n_events would read 3)
    _write_event_file(
        str(src / "f3.parquet"),
        [(1, 103, "2024-01-01T10:06:00")],
        mtime=1_700_000_200,
    )
    out = session_counts(
        _event_stream(spark, str(src)), gap="30 minutes", watermark_delay="10 minutes"
    )
    run_to_memory(out, "late_session_test", output_mode="append")
    got = [
        (str(r["session_start"]), str(r["session_end"]), r["user_id"], r["n_events"])
        for r in spark.sql("SELECT * FROM late_session_test").collect()
    ]
    # exactly the finalized user-1 session, with the late event excluded; the
    # user-99/98 sessions (ends past the watermark) are still held in state
    assert got == [("2024-01-01 10:00:00", "2024-01-01 10:35:00", 1, 2)]


def test_stateful_sessionization_drops_late_event(spark, tmp_path):
    """applyInPandasWithState + watermark: a late straggler is dropped by the
    operator's own watermark check (Spark auto-filters late input only for
    windowed aggregations, not arbitrary stateful ops), so it can neither
    rewind last_us nor inflate the open session's count."""
    from database_synchronize_tool_spark.streaming.stateful import sessionize_stateful

    src = tmp_path / "late_stateful_src"
    src.mkdir()
    # batch 1: two-event session, then 12:00 closes it (emitted n=2) and
    # opens a fresh session; watermark for the next batch = 11:50
    _write_event_file(
        str(src / "f1.parquet"),
        [
            (1, 101, "2024-01-01T10:00:00"),
            (1, 102, "2024-01-01T10:05:00"),
            (1, 103, "2024-01-01T12:00:00"),
        ],
        mtime=1_700_000_000,
    )
    # batch 2: on-time filler on another user (session stays open, never
    # emitted) — brings the 11:50 watermark into filtering force
    _write_event_file(
        str(src / "f2.parquet"),
        [(7, 700, "2024-01-01T12:01:00")],
        mtime=1_700_000_100,
    )
    # batch 3: late event at 10:06 — dropped; without the watermark it would
    # rewind the open session's last_us and bump n_events to 2
    _write_event_file(
        str(src / "f3.parquet"),
        [(1, 104, "2024-01-01T10:06:00")],
        mtime=1_700_000_200,
    )
    # batch 4: 13:00 closes the 12:00 session — count must still be 1
    _write_event_file(
        str(src / "f4.parquet"),
        [(1, 105, "2024-01-01T13:00:00")],
        mtime=1_700_000_300,
    )
    out = sessionize_stateful(
        _event_stream(spark, str(src)), gap_ms=30 * 60 * 1000,
        watermark_delay="10 minutes",
    )
    run_to_memory(out, "late_stateful_test", output_mode="append")
    import datetime as dt

    def us(s):
        return int(dt.datetime.fromisoformat(s).timestamp() * 1_000_000)

    got = canon(
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in spark.sql("SELECT * FROM late_stateful_test").collect()
    )
    assert got == [
        (1, us("2024-01-01T10:00:00"), us("2024-01-01T10:05:00"), 2),
        (1, us("2024-01-01T12:00:00"), us("2024-01-01T12:00:00"), 1),
    ]


def test_stream_stream_join_equals_batch_self_join(spark, sf_dir):
    # inner stream-stream interval joins emit every match exactly once, so
    # the availableNow replay must literally equal the batch self-join
    from database_synchronize_tool_spark.catalog import load_table
    from database_synchronize_tool_spark.plans.windows import (
        t11_stream_stream_join,
    )
    from pyspark.sql import functions as F

    streamed = sorted(
        tuple(r) for r in t11_stream_stream_join(spark, sf_dir).collect()
    )
    e = load_table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = sorted(
        tuple(r)
        for r in v.join(
            p,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("view_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")
            ),
        )
        .select("user_id", "view_id", "purchase_id", "view_ts", "purchase_ts")
        .collect()
    )
    assert streamed == batch
    assert streamed  # non-empty: the corpus has view->purchase conversions


class _FakeState:
    """Minimal GroupState stand-in for driving _close_sessions directly."""

    def __init__(self, value=None):
        self._value = value
        self.updated = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self.updated = v
        self._value = v


def _run_close(chunks, state, gap_us=60_000_000, wm=0):
    import pandas as pd

    from database_synchronize_tool_spark.streaming.stateful import (
        _close_sessions,
    )

    frames = [
        pd.DataFrame({"us": [u for u, _ in c], "event_id": [e for _, e in c]})
        for c in chunks
    ]
    out = list(_close_sessions((7,), iter(frames), state, gap_us, wm))
    return pd.concat(out) if out else None


def test_stateful_cross_chunk_disorder_sorts_globally():
    # events split across arrow chunks arrive out of order; a per-chunk
    # sort would rewind last_us and split the session (round-7 review) —
    # the global sort must yield ONE open session with correct bounds
    state = _FakeState()
    t0 = 1_700_000_000_000_000
    _run_close(
        [[(t0 + 50_000_000, 2)], [(t0, 1), (t0 + 20_000_000, 3)]], state
    )
    assert state.updated == (t0, t0 + 50_000_000, 3)


def test_stateful_in_watermark_disorder_cannot_rewind_session_end():
    # an admitted event BEHIND last_us (cross-batch disorder above the
    # watermark) joins the session without rewinding its end
    t0 = 1_700_000_000_000_000
    state = _FakeState((t0, t0 + 50_000_000, 2))
    out = _run_close([[(t0 + 10_000_000, 9)]], state)
    assert state.updated == (t0, t0 + 50_000_000, 3)
    assert out is None or len(out) == 0
    # and a following event 31min after the TRUE end still closes at the
    # true end (no bogus early split)
    out2 = _run_close([[(t0 + 50_000_000 + 61_000_000, 10)]], state)
    assert list(out2.iloc[0][["session_start_us", "session_end_us", "n_events"]]) == [
        t0, t0 + 50_000_000, 3
    ]


def test_stateful_all_late_rows_leave_no_dead_state():
    state = _FakeState()
    t0 = 1_700_000_000_000_000
    out = _run_close([[(t0, 1)]], state, wm=t0 + 1)  # everything late
    assert state.updated is None  # no (None, None, 0) leak
    assert out is None or len(out) == 0


def test_stateful_pre_session_straggler_becomes_singleton():
    # older than the current session by more than the gap: immutable
    # emitted history cannot reopen, so the straggler closes immediately
    t0 = 1_700_000_000_000_000
    state = _FakeState((t0, t0 + 10_000_000, 2))
    out = _run_close([[(t0 - 120_000_000, 9)]], state)
    assert list(out.iloc[0]) == [7, t0 - 120_000_000, t0 - 120_000_000, 1]
    assert state.updated == (t0, t0 + 10_000_000, 2)


def test_stream_scd2_versions_form_a_chain(spark, sf_dir):
    from database_synchronize_tool_spark.catalog import load_table
    from database_synchronize_tool_spark.plans.windows import t16_stream_scd2

    out = t16_stream_scd2(spark, sf_dir).toPandas()
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .count()
    )
    # every event lands in exactly one version
    assert int(out["n_events"].sum()) == ev
    for uid, grp in out.groupby("user_id"):
        g = grp.sort_values(["vfrom_us", "vfrom_eid"]).reset_index(drop=True)
        # exactly one open version per user, and it is the LAST one
        assert int(g["is_current"].sum()) == 1
        assert bool(g["is_current"].iloc[-1])
        # half-open chain: each version closes exactly where the next opens
        for i in range(len(g) - 1):
            assert g["vto_us"].iloc[i] == g["vfrom_us"].iloc[i + 1]
            assert g["vto_eid"].iloc[i] == g["vfrom_eid"].iloc[i + 1]
            # consecutive versions differ in type (else they'd be one run)
            assert g["event_type"].iloc[i] != g["event_type"].iloc[i + 1]
        assert g["vto_us"].isna().iloc[-1]


def test_scd2_stateful_closed_versions_emitted_exactly_once(spark, sf_dir):
    # drive the full multi-batch replay, then inspect the RAW emissions:
    # closed rows (is_current=false) must be unique per version key
    from database_synchronize_tool_spark.plans.windows import t16_stream_scd2

    t16_stream_scd2(spark, sf_dir)  # populates the memory sink table
    emitted = spark.table("t16_stream_scd2_tbl").toPandas()
    closed = emitted[~emitted["is_current"]]
    dup = closed.groupby(["user_id", "vfrom_us", "vfrom_eid"]).size()
    assert (dup == 1).all()


def test_stream_twa_bit_identical_to_batch(spark, sf_dir):
    # the integer milli-unit accumulators make stream == batch EXACT,
    # not approximately equal — compare full rows against the batch twin
    from database_synchronize_tool_spark.plans.approx import (
        ts_time_weighted_avg,
    )
    from database_synchronize_tool_spark.plans.windows import (
        t17_stream_time_weighted_avg,
    )

    streamed = {
        r["user_id"]: (r["n_intervals"], r["total_us"], r["swdt_mu"], r["twa"])
        for r in t17_stream_time_weighted_avg(spark, sf_dir).collect()
    }
    batch = {
        r["user_id"]: (r["n_intervals"], r["total_us"], r["swdt_mu"], r["twa"])
        for r in ts_time_weighted_avg(spark, sf_dir).collect()
    }
    assert streamed == batch


def test_multibatch_replay_keeps_null_ts_rows(spark, tmp_path):
    """The replay reader must deliver NULL-ts rows (chunk 0 takes them
    explicitly): every range predicate is NULL for a NULL timestamp, so
    without the explicit isNull branch the row would vanish from ALL
    chunks and the replay would silently diverge from the batch reader
    (r9 advice, streaming/events.py)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from database_synchronize_tool_spark.streaming.events import (
        read_events_stream_multibatch,
    )

    sf = tmp_path / "nullts_sf"
    sf.mkdir()
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "ts": pa.array(
                [
                    dt.datetime(2024, 1, 1, 1),
                    dt.datetime(2024, 1, 2, 2),
                    None,  # the row a naive range split drops
                    dt.datetime(2024, 1, 3, 3),
                    dt.datetime(2024, 1, 4, 4),
                ],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1, 1, 2, 2, 3], pa.int64()),
            "event_type": pa.array(
                ["view", "click", "ghost", "view", "purchase"], pa.string()
            ),
            "value": pa.array([1.0, 2.0, None, 3.0, 4.0], pa.float64()),
        }
    )
    pq.write_table(tbl, str(sf / "events.parquet"))
    stream = read_events_stream_multibatch(spark, str(sf), n_chunks=3)
    run_to_memory(stream, "nullts_replay_tbl", output_mode="append")
    replayed = spark.sql(
        "SELECT event_id FROM nullts_replay_tbl ORDER BY event_id"
    ).collect()
    assert [r["event_id"] for r in replayed] == [1, 2, 3, 4, 5]


def test_changelog_compact_kill_and_resume_from_checkpoint(
    spark, sf_dir, tmp_path
):
    """r10 verdict #8 — streaming fault-tolerance attestation: kill the
    t12 stateful compaction MID-STREAM (a foreachBatch crash after two
    committed micro-batches), restart from the SAME checkpoint, and
    assert the merged emissions still equal the batch oracle per key:
    winner by (us, event_id) AND n_events == COUNT(*) — the state-
    integrity witness that cannot survive lost or double-counted state."""
    from database_synchronize_tool_spark.streaming.events import (
        read_events_stream_multibatch,
    )
    from database_synchronize_tool_spark.streaming.stateful import (
        compact_latest_stateful,
    )

    ckpt = str(tmp_path / "ckpt")
    captured: list = []

    class Boom(Exception):
        pass

    def crashing(df, batch_id):
        if batch_id >= 2:
            raise Boom("simulated crash before commit of batch 2")
        captured.extend(df.collect())

    def capture(df, batch_id):
        captured.extend(df.collect())

    def start(fn):
        stream = compact_latest_stateful(
            read_events_stream_multibatch(spark, sf_dir, n_chunks=4)
        )
        return (
            stream.writeStream.foreachBatch(fn)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q1 = start(crashing)
    with pytest.raises(Exception):
        q1.awaitTermination()
    assert captured, "no batch committed before the simulated crash"
    n_before = len(captured)

    # restart from the checkpoint: batches 2..3 resume with carried state
    q2 = start(capture)
    q2.awaitTermination()
    assert len(captured) > n_before, "restart processed no further batches"

    # per key, the last emission wins (n_events strictly increases)
    best: dict = {}
    for r in captured:
        k = r["user_id"]
        if k not in best or r["n_events"] > best[k]["n_events"]:
            best[k] = r

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("us").desc(), F.col("event_id").desc()
    )
    want = {
        r["user_id"]: (r["event_id"], r["n"])
        for r in ev.withColumn("n", F.count(F.lit(1)).over(
            Window.partitionBy("user_id")
        ))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(F.col("us").isNotNull())
        .collect()
    }
    got = {k: (r["event_id"], r["n_events"]) for k, r in best.items()}
    for k, (eid, n) in want.items():
        assert got.get(k) == (eid, n), (k, got.get(k), (eid, n))


def test_stream_ann_append_kill_and_resume_no_double_append(
    spark, sf_dir, tmp_path
):
    """t19 fault-tolerance attestation: crash the index-append foreachBatch
    between committed micro-batches, restart from the SAME checkpoint, and
    assert (1) no vector is appended twice (row-count witness: codes table
    cardinality equals the corpus), (2) the post-resume search is
    bit-identical to a one-shot batch rebuild over the union with the same
    frozen quantizers — the t19 invariant surviving a mid-stream kill."""
    from database_synchronize_tool_spark.catalog import load_table
    from database_synchronize_tool_spark.operators.vector_index import (
        append_ivfpq_index,
        build_ivfpq_index,
        load_ivfpq_index,
        search_ivfpq_index,
    )
    from database_synchronize_tool_spark.streaming.events import (
        read_embeddings_stream_multibatch,
    )

    e = load_table(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id") % 3 < 2)
    index_dir = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    build_ivfpq_index(base, index_dir, n_cells=16)

    class Boom(Exception):
        pass

    state = {"batches": 0}

    def crashing(df, batch_id):
        # crash AFTER the batch-1 append committed its data AND manifest —
        # the checkpoint never records batch 1, so restart RE-DELIVERS it;
        # only the manifest batch_token makes the redelivery a no-op
        if not df.isEmpty():
            append_ivfpq_index(
                load_ivfpq_index(spark, index_dir),
                df,
                batch_token=f"b{batch_id}",
            )
            state["batches"] += 1
        if batch_id >= 1:
            raise Boom("simulated crash after append, before ckpt commit")

    def appending(df, batch_id):
        if not df.isEmpty():
            append_ivfpq_index(
                load_ivfpq_index(spark, index_dir),
                df,
                batch_token=f"b{batch_id}",
            )
            state["batches"] += 1

    def start(fn):
        return (
            read_embeddings_stream_multibatch(spark, sf_dir, n_chunks=3)
            .writeStream.foreachBatch(fn)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q1 = start(crashing)
    with pytest.raises(Exception):
        q1.awaitTermination()
    assert state["batches"] == 2, "batches 0+1 appended before the crash"

    # restart: batch 1 is RE-DELIVERED (its append ran but its checkpoint
    # commit did not) — the manifest token turns it into a no-op — then
    # batch 2 appends normally
    q2 = start(appending)
    q2.awaitTermination()
    assert state["batches"] == 4, state

    idx = load_ivfpq_index(spark, index_dir)
    n_corpus = e.count()
    assert idx.codes.count() == n_corpus  # no double-append
    assert idx.meta["n_vectors"] == n_corpus

    # bit-identical to the one-shot batch rebuild with the same quantizers
    rebuild_dir = str(tmp_path / "rebuild")
    full = build_ivfpq_index(
        e,
        rebuild_dir,
        n_cells=16,
        centroids=idx.centroids,
        codebooks=idx.codebooks,
    )
    queries = e.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 110))
    got = sorted(
        (r["query_id"], r["rank"], r["cand_id"], r["adist"])
        for r in search_ivfpq_index(idx, queries, k=5, n_probe=2).collect()
    )
    want = sorted(
        (r["query_id"], r["rank"], r["cand_id"], r["adist"])
        for r in search_ivfpq_index(full, queries, k=5, n_probe=2).collect()
    )
    assert got == want
