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
