"""End-to-end reproduction of the reference's own scenario (SURVEY §5.4):
load the netflix pg_dump fixture, run the full-copy-then-delta sync with the
reference's netflix.yaml semantics (timestamp-type watermark on date_added,
ignore nullable column), and check the incremental behavior row-for-row."""

from __future__ import annotations

import os

import pytest

from database_synchronize_tool_spark.operators.watermark import (
    delta_filter,
    probe_watermark,
)
from database_synchronize_tool_spark.operators.merge import merge_upsert
from database_synchronize_tool_spark.sources.pgdump import (
    NETFLIX_DDL,
    load_copy_fixture,
)

FIXTURE = "/root/reference/data/netflix.sql"

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="reference fixture not present"
)


@pytest.fixture(scope="module")
def netflix(spark):
    df = load_copy_fixture(spark, FIXTURE, "netflix_shows", NETFLIX_DDL)
    df.persist().count()
    yield df
    df.unpersist()


def test_fixture_loads_all_rows(netflix):
    # pg_dump COPY block carries the full table (8,807 shows)
    assert netflix.count() == 8807
    assert netflix.schema["date_added"].dataType.simpleString() == "date"
    # \N handling: director is nullable and genuinely null somewhere
    assert netflix.filter("director IS NULL").count() > 0


def test_full_copy_then_delta(spark, netflix):
    """First sync = full copy (NULL timestamp watermark); second sync after
    'new' rows appear = delta only; ties at the stored max are dropped
    (reference parity, sync_utils.py:63)."""
    cutoff = "2021-01-01"
    initial = netflix.filter(f"date_added < DATE'{cutoff}'")

    # destination empty -> full copy path
    assert probe_watermark(initial.limit(0), "date_added", "timestamp") is None
    dest = merge_upsert(initial.limit(0), initial, ["show_id"])
    n0 = dest.count()
    assert n0 == initial.count()

    # delta: rows strictly above the destination max date
    wm = probe_watermark(dest, "date_added", "timestamp")
    delta = delta_filter(netflix, "date_added", wm, parity=True)
    assert delta.count() == netflix.filter(f"date_added > DATE'{wm}'").count()

    dest2 = merge_upsert(dest, delta, ["show_id"])
    # everything except NULL-date rows and the tie rows at the old max
    expected = netflix.filter(f"date_added > DATE'{wm}'").count() + n0
    assert dest2.count() == expected

    # replay is a no-op
    wm2 = probe_watermark(dest2, "date_added", "timestamp")
    assert delta_filter(netflix, "date_added", wm2, parity=True).count() == 0


def test_ignore_column_rule_on_fixture(spark, netflix):
    """netflix.yaml ignores a nullable column; the P2 rule drops it only if
    nullable (description is nullable here)."""
    from database_synchronize_tool_spark.sources.config import SyncConfig
    from database_synchronize_tool_spark.sources.readers import prune_ignored

    cfg = SyncConfig(
        table="netflix_shows",
        check_column="date_added",
        check_type="timestamp",
        ignore_columns=("description",),
    )
    assert "description" not in prune_ignored(netflix, cfg).columns


def test_scd2_and_agg_maintenance_two_cycles(spark, netflix):
    """VERDICT r6 #8: the two newest stateful operators driven end-to-end on
    the reference's own fixture — two full sync cycles chaining watermark
    probe -> delta scan -> SCD2 merge -> incremental aggregate maintenance,
    with changed-row re-emissions in cycle 2 (so version closing actually
    fires) and a third replay cycle asserting idempotence of BOTH the
    history table and the aggregate state."""
    from pyspark.sql import functions as F

    from database_synchronize_tool_spark.operators.scd import scd2_merge
    from database_synchronize_tool_spark.operators.watermark import (
        merge_agg_partials,
    )

    keys, tracked = ["show_id"], ["rating", "release_year"]
    base = netflix.filter("date_added IS NOT NULL").select(
        "show_id",
        "rating",
        "release_year",
        F.col("date_added").cast("timestamp").alias("change_ts"),
    )

    # --- cycle 1: empty destination -> full copy into an empty history ---
    batch1 = base.filter("change_ts < TIMESTAMP'2021-01-01'")
    empty_hist = batch1.select(
        *keys,
        *tracked,
        F.col("change_ts").alias("valid_from"),
        F.col("change_ts").alias("valid_to"),
        F.lit(True).alias("is_current"),
    ).limit(0)
    hist1 = scd2_merge(empty_hist, batch1, keys, tracked).localCheckpoint()
    n1 = batch1.count()
    assert hist1.count() == n1
    assert hist1.filter("NOT is_current").count() == 0

    def partials(df):
        return df.groupBy("rating").agg(F.count(F.lit(1)).alias("n"))

    state1 = partials(batch1).localCheckpoint()

    # --- cycle 2: watermark probe on the PERSISTED state, natural delta
    # plus 50 re-emitted changed rows stamped after the watermark ---
    wm = probe_watermark(
        hist1.select(F.col("valid_from").alias("change_ts")), "change_ts"
    )
    delta_nat = delta_filter(base, "change_ts", wm, parity=True)
    n_delta = delta_nat.count()
    assert n_delta == base.filter(F.col("change_ts") > F.lit(wm)).count()
    changed = (
        batch1.orderBy("show_id")
        .limit(50)
        .withColumn("rating", F.lit("__CHANGED__"))
        .withColumn("change_ts", F.expr("TIMESTAMP'2022-06-15'"))
    )
    batch2 = delta_nat.unionByName(changed)
    hist2 = scd2_merge(hist1, batch2, keys, tracked).localCheckpoint()

    # the 50 changed keys closed their old version and opened a new one;
    # natural-delta keys are all new (show_id is unique in the fixture)
    assert hist2.filter("NOT is_current").count() == 50
    assert hist2.filter("is_current").count() == n1 + n_delta
    closed = hist2.filter("NOT is_current")
    assert closed.filter(
        F.col("valid_to") != F.expr("TIMESTAMP'2022-06-15'")
    ).count() == 0

    # SCD2 current slice must equal the plain keyed upsert of the same
    # two batches (the Type-1 destination is the Type-2 current view)
    dest = merge_upsert(
        merge_upsert(batch1.limit(0), batch1, keys), batch2, keys
    ).select(*keys, *tracked)
    cur = hist2.filter("is_current").select(*keys, *tracked)
    assert cur.exceptAll(dest).count() == 0
    assert dest.exceptAll(cur).count() == 0

    # aggregate state folded with the delta's partials == full recompute
    state2 = merge_agg_partials(state1, partials(batch2), keys=["rating"])
    recomputed = partials(batch1.unionByName(batch2))
    assert {tuple(r) for r in state2.collect()} == {
        tuple(r) for r in recomputed.collect()
    }

    # --- cycle 3: replay. The new watermark sits above every source row,
    # so the delta is empty and BOTH states are fixpoints ---
    wm2 = probe_watermark(
        hist2.filter("is_current").select(
            F.col("valid_from").alias("change_ts")
        ),
        "change_ts",
    )
    replay = delta_filter(base, "change_ts", wm2, parity=True)
    assert replay.count() == 0
    hist3 = scd2_merge(hist2, replay, keys, tracked)
    assert hist3.exceptAll(hist2).count() == 0
    assert hist2.exceptAll(hist3).count() == 0
    state3 = merge_agg_partials(state2, partials(replay), keys=["rating"])
    assert {tuple(r) for r in state3.collect()} == {
        tuple(r) for r in state2.collect()
    }


def test_copy_block_empty_line_is_a_row_for_single_column_tables():
    # an empty COPY body line is a real row (empty string) when the table
    # has ONE column — NULL would be \N (round-7 review)
    from database_synchronize_tool_spark.sources.pgdump import parse_copy_block

    sql = "COPY public.notes (body) FROM stdin;\nfirst\n\n\\N\nlast\n\\.\n"
    cols, rows = parse_copy_block(sql, "notes")
    assert cols == ["body"]
    assert rows == [["first"], [""], [None], ["last"]]


def test_copy_block_blank_lines_skipped_for_multi_column_tables():
    from database_synchronize_tool_spark.sources.pgdump import parse_copy_block

    sql = "COPY t (a, b) FROM stdin;\n1\tx\n\n2\ty\n\\.\n"
    cols, rows = parse_copy_block(sql, "t")
    assert rows == [["1", "x"], ["2", "y"]]


def test_merkle_audit_after_sync_cycle(spark, netflix):
    """Sync-then-audit on the reference's own data: after a full upsert
    cycle the merkle range summaries agree bucket-for-bucket; a single
    mutated row (the drift the high-watermark model can't see) flags
    exactly one bucket, which localizes the row-level re-diff."""
    from pyspark.sql import functions as F

    from database_synchronize_tool_spark.operators.diff import merkle_bucket_diff

    src = netflix.select("show_id", "title", "release_year").withColumn(
        "k", F.expr("cast(substring(show_id, 2) as bigint)")
    )
    target = merge_upsert(
        src.limit(0), src, ["k"], order_col=None, collapse=False
    )
    fp = ["k", "title", "release_year"]
    assert merkle_bucket_diff(target, src, "k", fp, 512).count() == 0

    drifted = src.withColumn(
        "title",
        F.when(F.col("k") == 42, F.lit("DRIFTED")).otherwise(F.col("title")),
    )
    flagged = merkle_bucket_diff(target, drifted, "k", fp, 512).collect()
    assert len(flagged) == 1
    assert flagged[0].bucket == 42 // 512
