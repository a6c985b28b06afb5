"""Small-file compaction: dry-run plan accuracy, per-partition rewrite,
row/content preservation, and pruning-layout survival."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from database_synchronize_tool_spark.catalog import load_table
from database_synchronize_tool_spark.sources.maintenance import (
    compact_parquet_dir,
    plan_compaction,
)


def _fragmented_table(spark, sf_dir, path: str):
    (
        load_table(spark, sf_dir, "orders")
        .withColumn("bucket", (F.col("o_orderkey") % 2).cast("int"))
        .repartition(20)
        .write.partitionBy("bucket")
        .parquet(path)
    )


def test_plan_reports_fragmentation_without_touching_files(spark, sf_dir, tmp_path):
    path = str(tmp_path / "frag")
    _fragmented_table(spark, sf_dir, path)
    before = {
        d: sorted(os.listdir(os.path.join(path, d)))
        for d in ("bucket=0", "bucket=1")
    }
    plan = plan_compaction(path, target_bytes=1 << 30)
    assert set(plan.dirs) == {"bucket=0", "bucket=1"}
    for _d, (n_files, total, ideal) in plan.dirs.items():
        assert n_files == 20 and total > 0 and ideal == 1
    assert set(plan.fragmented) == {"bucket=0", "bucket=1"}
    after = {
        d: sorted(os.listdir(os.path.join(path, d)))
        for d in ("bucket=0", "bucket=1")
    }
    assert after == before  # dry run is metadata-only


def test_compact_preserves_rows_and_pruning_layout(spark, sf_dir, tmp_path):
    path = str(tmp_path / "frag")
    _fragmented_table(spark, sf_dir, path)
    want = sorted(map(tuple, spark.read.parquet(path).collect()))
    done = compact_parquet_dir(spark, path, target_bytes=1 << 30)
    assert set(done) == {"bucket=0", "bucket=1"}
    for _d, (before_n, after_n) in done.items():
        assert before_n == 20 and after_n == 1
    got_df = spark.read.parquet(path)
    assert sorted(map(tuple, got_df.collect())) == want
    # partition layout survives -> pruning still works
    plan = (
        got_df.filter(F.col("bucket") == 0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan


def test_compact_is_idempotent(spark, sf_dir, tmp_path):
    path = str(tmp_path / "frag")
    _fragmented_table(spark, sf_dir, path)
    compact_parquet_dir(spark, path, target_bytes=1 << 30)
    again = compact_parquet_dir(spark, path, target_bytes=1 << 30)
    assert again == {}  # nothing fragmented on the second pass


def test_vacuum_plan_and_execute(tmp_path):
    import os
    import time

    from database_synchronize_tool_spark.sources.maintenance import (
        plan_vacuum,
        vacuum_dir,
    )

    root = str(tmp_path)
    # live data dir — must never be a candidate
    os.makedirs(os.path.join(root, "lang=en"))
    with open(os.path.join(root, "lang=en", "part-0.parquet"), "wb") as f:
        f.write(b"x" * 100)
    # crash artifacts: old compaction swap + spark staging
    for d in ("lang=fr__old_deadbeef", "data__compact_12345678", "_temporary"):
        os.makedirs(os.path.join(root, d))
        with open(os.path.join(root, d, "junk"), "wb") as f:
            f.write(b"y" * 50)
    # near-miss data dirs that merely CONTAIN the patterns (r9 advice):
    # no 8-hex uuid suffix at end of name — must never be candidates
    for d in ("cell=x__old_v2", "data__compact_notes", "lang__old_deadbee"):
        os.makedirs(os.path.join(root, d))
        with open(os.path.join(root, d, "keep.parquet"), "wb") as f:
            f.write(b"z" * 10)
    now = time.time() + 48 * 3600  # pretend two days passed
    plan = plan_vacuum(root, min_age_s=24 * 3600.0, _now=now)
    assert len(plan.targets) == 3
    assert plan.reclaimable_bytes == 150
    assert all("lang=en" not in p for p in plan.targets)
    assert all("__old_v2" not in p for p in plan.targets)
    assert all("notes" not in p for p in plan.targets)
    # retention gate: with _now = now the artifacts are "old"; with real
    # now they are fresh and must survive (a live writer's temp dir)
    fresh = plan_vacuum(root, min_age_s=24 * 3600.0)
    assert fresh.targets == {}
    done = vacuum_dir(root, min_age_s=24 * 3600.0, _now=now)
    assert len(done) == 3
    assert os.path.exists(os.path.join(root, "lang=en", "part-0.parquet"))
    assert not os.path.exists(os.path.join(root, "_temporary"))
