"""End-to-end sync-engine tests (SURVEY §5.3/5.4): YAML config parsing,
ignored-column pruning, the full incremental pipeline against parquet
source/sink, replay idempotence, and the DB-API upsert sink against sqlite
(the same foreachPartition path a Postgres target takes)."""

from __future__ import annotations

import os
import sqlite3
import textwrap

import pytest

from database_synchronize_tool_spark.runner import run_all_syncs, sync_table
from database_synchronize_tool_spark.sources.config import SyncConfig, load_table_config
from database_synchronize_tool_spark.sources.readers import ParquetSource, JdbcSource, prune_ignored
from database_synchronize_tool_spark.sources.sinks import (
    DbApiUpsertSink,
    ParquetMergeSink,
    upsert_statement,
)


# ---------- config ----------


def test_load_reference_yaml(tmp_path):
    p = tmp_path / "netflix.yaml"
    p.write_text(
        textwrap.dedent(
            """
            tables:
              netflix_shows:
                sync_config:
                  check_column: date_added
                  check_type: timestamp
                  ignore_columns:
                    - nullable_column
            """
        )
    )
    cfgs = load_table_config(str(p))
    c = cfgs["netflix_shows"]
    assert c.check_column == "date_added"
    assert c.check_type == "timestamp"
    assert c.ignore_columns == ("nullable_column",)
    assert c.service is None  # single file: local variant, no service tag


def test_load_multi_file_tags_service(tmp_path):
    for stem, table in [("inventory", "inv_t"), ("order", "ord_t")]:
        (tmp_path / f"{stem}.yaml").write_text(
            f"tables:\n  {table}:\n    sync_config:\n"
            f"      check_column: id\n      check_type: id\n"
        )
    cfgs = load_table_config(
        str(tmp_path / "inventory.yaml"), str(tmp_path / "order.yaml")
    )
    assert cfgs["inv_t"].service == "inventory"
    assert cfgs["ord_t"].service == "order"


def test_bad_check_type_rejected():
    with pytest.raises(ValueError):
        SyncConfig(table="t", check_column="c", check_type="bogus")


# ---------- pruning (P2) ----------


def test_prune_ignored_only_nullable(spark):
    df = spark.createDataFrame([(1, "a", "b")], "id int, keep string, drop_me string")
    # all createDataFrame columns are nullable -> drop applies
    cfg = SyncConfig("t", "id", "id", ignore_columns=("drop_me",))
    assert prune_ignored(df, cfg).columns == ["id", "keep"]
    # non-nullable ignore is kept (reference rule, sync_utils.py:210-217)
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            StructField("id", LongType(), False),
            StructField("keep", LongType(), True),
        ]
    )
    df2 = spark.createDataFrame([(1, 2)], schema)
    cfg2 = SyncConfig("t", "id", "id", ignore_columns=("id",))
    assert prune_ignored(df2, cfg2).columns == ["id", "keep"]


# ---------- jdbc option building ----------


def test_jdbc_partitioned_options():
    src = JdbcSource(url="jdbc:postgresql://h/db", user="u", num_partitions=16)
    opts = src.options("t", partition_column="id", lower=0, upper=1000)
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "16"
    assert opts["lowerBound"] == "0" and opts["upperBound"] == "1000"
    # without bounds: single-scan options only
    assert "partitionColumn" not in src.options("t")


# ---------- upsert statement generation (S5/S6) ----------


def test_upsert_statement_shapes():
    s = upsert_statement("t", ["k", "a", "b"], ["k"], "?")
    assert s == (
        "INSERT INTO t (k, a, b) VALUES (?, ?, ?) "
        "ON CONFLICT (k) DO UPDATE SET a = excluded.a, b = excluded.b"
    )
    assert upsert_statement("t", ["a"], []) == "INSERT INTO t (a) VALUES (%s)"
    assert "DO NOTHING" in upsert_statement("t", ["k"], ["k"])


# ---------- end-to-end parquet sync ----------


def _events_cfg(**kw):
    return SyncConfig(
        table="events",
        check_column="event_id",
        check_type="id",
        merge_keys=("event_id",),
        **kw,
    )


def test_sync_table_full_then_incremental(spark, sf_dir, tmp_path):
    source = ParquetSource(sf_dir)
    sink = ParquetMergeSink(str(tmp_path))
    cfg = _events_cfg()

    # T2 parity quirk, reproduced on purpose: an empty destination with an
    # id-type watermark takes the delta path `WHERE id > 0`, so a row with
    # id=0 is never synced (reference sync_utils.py:32-33 + :63). The
    # testdata's event_id starts at 0, making this observable.
    n_above_zero = source.read(spark, "events").filter("event_id > 0").count()
    r1 = sync_table(spark, cfg, source, sink)
    assert r1.ok and r1.rows_synced == n_above_zero
    assert spark.read.parquet(sink.path("events")).count() == n_above_zero

    # replay: destination watermark now equals source max -> empty delta
    r2 = sync_table(spark, cfg, source, sink)
    assert r2.ok and r2.rows_synced == 0
    assert spark.read.parquet(sink.path("events")).count() == n_above_zero


def test_sync_table_single_pass_no_count_action(spark, sf_dir, tmp_path, monkeypatch):
    """rows_synced comes from the observe() piggyback on the sink's own
    write job — sync_table must never run a count() action over the delta
    (a second full pass that doubles the read at 100 TB). The empty-delta
    guard is a take(1) probe, which is allowed."""
    from pyspark.sql import DataFrame

    source = ParquetSource(sf_dir)
    sink = ParquetMergeSink(str(tmp_path))
    cfg = _events_cfg()
    expected = source.read(spark, "events").filter("event_id > 0").count()

    def banned_count(self):
        raise AssertionError("sync_table ran a full-pass count() action")

    monkeypatch.setattr(DataFrame, "count", banned_count)
    r1 = sync_table(spark, cfg, source, sink)
    r2 = sync_table(spark, cfg, source, sink)  # replay: empty-delta path
    monkeypatch.undo()

    assert r1.ok and r1.rows_synced == expected
    assert r2.ok and r2.rows_synced == 0
    assert spark.read.parquet(sink.path("events")).count() == expected


def test_copy_path_gates_on_empty_target(spark, sf_dir, tmp_path):
    """r11 advice: the COPY bulk-load fast path fires iff the TARGET IS
    EMPTY — not ``wm is None``. id-type probes return 0 (never None), so an
    id-watermarked empty table must still take COPY; and a NON-empty
    ts-type target whose check column is all NULL yields wm=None but must
    upsert (COPY into a populated keyed table would trip the PK)."""
    calls = []

    class CopyCapableSink(ParquetMergeSink):
        def write_copy(self, df, table, keys=()):
            calls.append("copy")
            return ParquetMergeSink.write(self, df, table, keys)

        def write(self, df, table, keys):
            calls.append("upsert")
            return ParquetMergeSink.write(self, df, table, keys)

    # id-type + empty target -> COPY (the old `wm is None` gate missed
    # this: probe_watermark returns 0 for id tables, never None)
    sink = CopyCapableSink(str(tmp_path / "a"))
    r1 = sync_table(spark, _events_cfg(), ParquetSource(sf_dir), sink)
    assert r1.ok and calls == ["copy"]

    # ts-type + NON-empty target + all-NULL check column -> wm is None,
    # but a populated keyed table must take the upsert path, never COPY
    calls.clear()
    sink2 = CopyCapableSink(str(tmp_path / "b"))
    spark.createDataFrame(
        [(999999999, None, None, None, None, None)],
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(sink2.path("events"))
    cfg = SyncConfig(
        table="events", check_column="ts", check_type="timestamp",
        merge_keys=("event_id",),
    )
    r2 = sync_table(spark, cfg, ParquetSource(sf_dir), sink2)
    assert r2.ok and calls == ["upsert"]
    # the pre-seeded row survives the merge (proof COPY didn't clobber it)
    assert (
        spark.read.parquet(sink2.path("events"))
        .filter("event_id = 999999999").count() == 1
    )


def test_run_all_syncs_isolates_failures(spark, sf_dir, tmp_path):
    source = ParquetSource(sf_dir)
    sink = ParquetMergeSink(str(tmp_path))
    configs = {
        "events": _events_cfg(),
        "missing": SyncConfig(
            table="missing", check_column="id", check_type="id"
        ),
    }
    results = {r.table: r for r in run_all_syncs(spark, configs, source, sink)}
    assert results["events"].ok
    assert not results["missing"].ok and results["missing"].error
    # C1: one failure doesn't abort the run; overall status is derivable
    assert not all(r.ok for r in results.values())


# ---------- DB-API upsert sink against sqlite ----------


def test_parquet_merge_sink_crash_between_renames_recoverable(spark, tmp_path, monkeypatch):
    # simulate a crash after the current table was renamed aside but before
    # the new copy went live: BOTH full copies must exist on disk (nothing
    # is ever deleted before the new data is live)
    import os as _os

    sink = ParquetMergeSink(str(tmp_path))
    df1 = spark.createDataFrame([(1, "a")], "k int, v string")
    sink.write(df1, "t", ["k"])
    p = sink.path("t")

    real_rename = _os.rename
    calls = {"n": 0}

    def crashing_rename(src, dst):
        calls["n"] += 1
        if calls["n"] == 1:
            real_rename(src, dst)  # current table moves aside...
            raise OSError("simulated crash before new copy went live")
        real_rename(src, dst)

    monkeypatch.setattr(_os, "rename", crashing_rename)
    df2 = spark.createDataFrame([(2, "b")], "k int, v string")
    try:
        sink.write(df2, "t", ["k"])
    except OSError:
        pass
    monkeypatch.setattr(_os, "rename", real_rename)

    # crash window: live path missing, but old AND new copies both on disk
    assert not _os.path.exists(p)
    old_rows = spark.read.parquet(p + ".__old__").collect()
    new_rows = spark.read.parquet(p + ".__tmp__").collect()
    assert [(r["k"], r["v"]) for r in old_rows] == [(1, "a")]
    assert sorted((r["k"], r["v"]) for r in new_rows) == [(1, "a"), (2, "b")]

    # recovery is automatic: the next write detects the missing live path,
    # renames the old copy back into place, clears the stale tmp, and the
    # idempotent merge converges to the same rows
    sink.write(df2, "t", ["k"])
    assert sorted(
        (r["k"], r["v"]) for r in spark.read.parquet(p).collect()
    ) == [(1, "a"), (2, "b")]
    assert not _os.path.exists(p + ".__tmp__")
    assert not _os.path.exists(p + ".__old__")


def test_parquet_merge_sink_partitioned_layout_prunes(spark, tmp_path):
    # hive-partitioned sink layout: reads filtered on the partition column
    # must prune directories (PartitionFilters), not scan the whole table
    import os as _os

    sink = ParquetMergeSink(str(tmp_path), partition_by=["etype"])
    df = spark.createDataFrame(
        [(1, "click", 1.0), (2, "view", 2.0), (3, "click", 3.0)],
        "id int, etype string, v double",
    )
    sink.write(df, "ev", ["id"])
    p = sink.path("ev")
    assert sorted(
        d for d in _os.listdir(p) if d.startswith("etype=")
    ) == ["etype=click", "etype=view"]

    scan = spark.read.parquet(p).filter("etype = 'click'")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "etype" in plan
    assert sorted(r["id"] for r in scan.collect()) == [1, 3]

    # merge of a delta keeps the layout and stays idempotent
    delta = spark.createDataFrame([(3, "click", 9.0), (4, "view", 4.0)],
                                  "id int, etype string, v double")
    sink.write(delta, "ev", ["id"])
    got = {r["id"]: r["v"] for r in spark.read.parquet(p).collect()}
    assert got == {1: 1.0, 2: 2.0, 3: 9.0, 4: 4.0}


def test_parquet_merge_sink_clears_stale_leftovers(spark, tmp_path):
    import os as _os

    sink = ParquetMergeSink(str(tmp_path))
    p = sink.path("t")
    # fabricate leftovers from a crashed previous run NEXT TO a live target:
    # only then are tmp/old stale (a missing live target means .__old__ is
    # the sole surviving copy and must be recovered, not deleted)
    sink.write(spark.createDataFrame([(1, "a")], "k int, v string"), "t", ["k"])
    _os.makedirs(p + ".__tmp__")
    _os.makedirs(p + ".__old__")
    sink.write(spark.createDataFrame([(2, "b")], "k int, v string"), "t", ["k"])
    assert _os.path.isdir(p)
    assert not _os.path.exists(p + ".__tmp__")
    assert not _os.path.exists(p + ".__old__")
    assert sorted(
        (r["k"], r["v"]) for r in spark.read.parquet(p).collect()
    ) == [(1, "a"), (2, "b")]


def test_dbapi_upsert_sink_sqlite(spark, tmp_path):
    db = str(tmp_path / "t.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE tgt (k INTEGER PRIMARY KEY, name TEXT, v INTEGER)")
    con.execute("INSERT INTO tgt VALUES (1, 'old', 10)")
    con.commit()
    con.close()

    import functools

    sink = DbApiUpsertSink(
        connect=functools.partial(sqlite3.connect, db, timeout=30),
        placeholder="?",
        batch_size=2,
        coalesce_to=1,  # sqlite: single writer
    )
    df = spark.createDataFrame(
        [(1, "updated", 99), (2, "new", 20), (3, "also", 30)],
        "k int, name string, v int",
    )
    sink.write(df, "tgt", ["k"])

    con = sqlite3.connect(db)
    got = sorted(con.execute("SELECT * FROM tgt").fetchall())
    con.close()
    assert got == [(1, "updated", 99), (2, "new", 20), (3, "also", 30)]


def test_observe_quality_metrics_piggyback(spark, sf_dir):
    """df.observe(): data-quality counters (rows, nulls, max watermark)
    collected DURING the sync scan — no second pass over 100 TB. The
    observation arrives with the action that executed the plan."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from database_synchronize_tool_spark.catalog import load_table

    obs = Observation("sync_quality")
    ev = load_table(spark, sf_dir, "events")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("rows_scanned"),
        F.sum(F.col("props").isNull().cast("long")).alias("null_props"),
        F.max("event_id").alias("max_watermark"),
    )
    n = observed.count()  # one action drives both the query and the metrics
    got = obs.get
    assert got["rows_scanned"] == n
    assert got["max_watermark"] == ev.agg(F.max("event_id")).first()[0]
    assert got["null_props"] >= 0


def test_write_curated_corpus_layout(spark, sf_dir, tmp_path):
    # partitioned layout, bounded files, in-file sort order, round-trip
    import os

    from database_synchronize_tool_spark.catalog import load_table
    from database_synchronize_tool_spark.sources.sinks import (
        write_curated_corpus,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "corpus")
    write_curated_corpus(
        docs, out, partition_by=("lang",), sort_within=("doc_id",),
        max_records_per_file=50,
    )
    # hive partition dirs exist per language
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    dirs = {d.split("=")[1] for d in os.listdir(out) if d.startswith("lang=")}
    assert dirs == langs
    # every data file respects the record bound
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    per_file = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert per_file <= 50
    # rows inside each file are sorted by doc_id (resumable-read contract)
    rows = (
        back.withColumn("f", F.input_file_name())
        .select("f", "doc_id")
        .collect()
    )
    by_file: dict[str, list[int]] = {}
    for r in rows:
        by_file.setdefault(r["f"], []).append(r["doc_id"])
    # collect() preserves within-file row order per parquet split
    for ids in by_file.values():
        assert ids == sorted(ids)


def test_write_curated_corpus_salted_hot_partition(spark, sf_dir, tmp_path):
    # target_files_per_partition spreads one partition's rows over several
    # writer tasks/files (the hot-partition path)
    import os

    from database_synchronize_tool_spark.catalog import load_table
    from database_synchronize_tool_spark.sources.sinks import (
        write_curated_corpus,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "salted")
    write_curated_corpus(
        docs, out, partition_by=("lang",), sort_within=("doc_id",),
        target_files_per_partition=3,
    )
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # the biggest partition actually fans out over >1 file
    biggest = (
        docs.groupBy("lang").count().orderBy("count", ascending=False).first()
    )["lang"]
    files = [
        f
        for f in os.listdir(os.path.join(out, f"lang={biggest}"))
        if f.endswith(".parquet")
    ]
    assert len(files) > 1


def test_dbapi_sink_returns_row_count_and_runner_uses_it(spark, tmp_path):
    # Observation metrics never arrive for foreachPartition (an RDD
    # action) — verified hang in round-7 review — so the DB-API sink
    # reports its own count and sync_table prefers it
    import sqlite3
    from functools import partial

    from database_synchronize_tool_spark.runner import sync_table
    from database_synchronize_tool_spark.sources.config import SyncConfig
    from database_synchronize_tool_spark.sources.sinks import DbApiUpsertSink

    db = str(tmp_path / "t.db")
    with sqlite3.connect(db) as conn:
        conn.execute("CREATE TABLE items (k INTEGER PRIMARY KEY, v TEXT, ts INTEGER)")

    class _Src:
        def read(self, spark, table):
            return spark.createDataFrame(
                [(1, "a", 10), (2, "b", 20)], "k long, v string, ts long"
            )

    class _Sink(DbApiUpsertSink):
        def read_target(self, spark, table, schema):
            with sqlite3.connect(db) as conn:
                rows = conn.execute("SELECT k, v, ts FROM items").fetchall()
            return spark.createDataFrame(rows, schema)

    sink = _Sink(connect=partial(sqlite3.connect, db), placeholder="?", coalesce_to=1)
    cfg = SyncConfig(
        table="items", check_column="ts", check_type="id", merge_keys=("k",)
    )
    res = sync_table(spark, cfg, _Src(), sink)
    assert res.ok and res.rows_synced == 2
    with sqlite3.connect(db) as conn:
        assert conn.execute("SELECT COUNT(*) FROM items").fetchone()[0] == 2


def test_plan_secret_syncs_rejects_colliding_instances():
    import pytest as _pytest

    from database_synchronize_tool_spark.runner import plan_secret_syncs

    secret = """
svc:
  db:
    prod:
      instance-connection-name: proj:r:prod-inst
      database-name: app
      username: u
      password: p
    stage:
      instance-connection-name: proj:r:stage-inst
      database-name: app
      username: u
      password: p
"""
    env = {"DB_SECRET_INFO": secret}
    with _pytest.raises(ValueError, match="same .*endpoint|endpoint"):
        plan_secret_syncs(env)
    # distinct endpoints resolve fine
    plans = plan_secret_syncs(
        env,
        endpoints={
            "svc_prod": ("127.0.0.1", 5001),
            "svc_stage": ("127.0.0.1", 5002),
        },
    )
    assert plans[0].prod.url != plans[0].stage.url


def test_source_freshness_report_invariants(spark, sf_dir):
    from database_synchronize_tool_spark.plans.sync_ops import (
        source_freshness_report,
    )

    rows = source_freshness_report(spark, sf_dir).collect()
    assert len(rows) == 5  # one per event type
    lags = [r["lag_us"] for r in rows]
    # the freshest source defines the corpus watermark: lag exactly 0
    assert min(lags) == 0
    for r in rows:
        assert r["lag_us"] >= 0
        assert r["n_rows"] > 0
        assert r["is_stale"] == (r["lag_us"] > 86_400_000_000)


def test_sync_table_auto_evolves_added_source_column(spark, sf_dir, tmp_path):
    """r10 verdict #6 E2E: after a full sync, prod adds a nullable column —
    the next incremental sync must widen the staging parquet (NULL backfill
    for pre-existing rows) instead of failing the merge."""
    import pyspark.sql.functions as F

    source = ParquetSource(sf_dir)
    sink = ParquetMergeSink(str(tmp_path))
    cfg = _events_cfg()
    sync_table(spark, cfg, source, sink)
    before = spark.read.parquet(sink.path("events"))
    max_id = before.agg(F.max("event_id")).first()[0]

    # drifted prod: same events plus new rows, with an ADDED column
    drift_dir = str(tmp_path / "drifted_src")
    drifted = (
        source.read(spark, "events")
        .unionByName(
            source.read(spark, "events")
            .limit(5)
            .withColumn("event_id", F.col("event_id") + F.lit(max_id) + 1)
        )
        .withColumn("origin_dc", F.concat(F.lit("dc-"), (F.col("event_id") % 3).cast("string")))
    )
    drifted.write.parquet(f"{drift_dir}/events.parquet")

    r = sync_table(spark, cfg, ParquetSource(drift_dir), sink)
    assert r.ok and r.rows_synced == 5
    after = spark.read.parquet(sink.path("events"))
    assert "origin_dc" in after.columns
    assert after.filter(F.col("event_id") > max_id).filter(
        F.col("origin_dc").isNull()
    ).count() == 0  # new rows carry the column
    assert after.filter(
        (F.col("event_id") <= max_id) & F.col("origin_dc").isNotNull()
    ).count() == 0  # pre-existing rows NULL-backfilled

    # breaking drift fails fast with the diff in the error
    bad_dir = str(tmp_path / "bad_src")
    source.read(spark, "events").drop("event_type").write.parquet(
        f"{bad_dir}/events.parquet"
    )
    import pytest

    with pytest.raises(Exception, match="removed"):
        sync_table(spark, cfg, ParquetSource(bad_dir), sink)
