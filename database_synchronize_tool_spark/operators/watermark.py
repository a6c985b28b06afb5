"""High-watermark incremental extraction.

The reference derives sync state from the *destination*: ``SELECT
MAX(check_col)`` on staging (``/root/reference/db-sync-local/sync_utils.py:17-39``),
then extracts ``WHERE check_col > :watermark`` from prod
(``sync_utils.py:57-77``). Two asymmetries it encodes (SURVEY §2.9):

- T2: an ``id``-type watermark coalesces NULL→0 (empty destination still takes
  the delta path ``> 0``); a ``timestamp``-type watermark keeps NULL and
  triggers a full copy instead.
- T3: the strict ``>`` silently drops rows *tying* the stored max — late
  arrivals sharing the max timestamp are lost. ``parity=True`` reproduces
  that; the corrected mode re-reads ``>= watermark - lateness`` and relies on
  an idempotent merge downstream.

All of this is a filter Catalyst pushes into the scan (parquet row-group
pruning / JDBC WHERE pushdown), so the delta never materializes outside the
source — the opposite of the reference's full-delta-in-driver-RAM model.
"""

from __future__ import annotations

import datetime as dt
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def probe_watermark(dest: DataFrame, check_column: str, check_type: str = "timestamp") -> Any:
    """MAX(check_col) over the destination; scalar result.

    ``check_type='id'`` coerces NULL→0 (T2). Runs as a single aggregate —
    map-side partial max, one-row shuffle.
    """
    row = dest.agg(F.max(check_column).alias("wm")).first()
    wm = row["wm"] if row else None
    if check_type == "id":
        return int(wm) if wm is not None else 0
    return wm


def delta_filter(
    source: DataFrame,
    check_column: str,
    watermark: Any,
    parity: bool = True,
    lateness: dt.timedelta | int | None = None,
) -> DataFrame:
    """Incremental extract above the watermark.

    parity=True  -> strict ``>`` (reference semantics, drops ties — T3)
    parity=False -> ``>= watermark - lateness`` (late/tied rows recovered;
                    pair with an idempotent merge so overlap is harmless)
    """
    if watermark is None:
        return source  # first run: full copy (reference branch sync_utils.py:256-265)
    col = F.col(check_column)
    if parity:
        return source.filter(col > F.lit(watermark))
    low = watermark - lateness if lateness is not None else watermark
    return source.filter(col >= F.lit(low))


def merge_agg_partials(state: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Incremental aggregate maintenance: fold a delta's partial aggregates
    into a persisted per-key aggregate state without re-reading history.

    Both inputs carry the same schema: ``keys`` plus *additive* partial
    columns (COUNT partials, SUM partials — AVG is derived downstream as
    sum/count, never stored). The merge is ``unionByName`` + one hash
    re-aggregate over ``keys``, i.e. the same combine step Spark's own
    partial/final HashAggregate pairs perform, lifted across sync runs.

    Scale shape: the state side is one pre-aggregated row per key (bounded by
    key cardinality, not history size) and the delta side is one watermark
    delta's worth of partials — at 100 TB this replaces a full-history rescan
    per refresh with a scan of only the new data. Exactness: callers store
    DECIMAL sum partials (registry determinism rule) so re-aggregation order
    cannot perturb the result vs. a from-scratch recompute.

    Reference analog: none — the reference recomputes ``MAX(check_col)`` from
    the destination each run (``sync_utils.py:17-39``); this generalizes that
    "state lives in the destination" stance from scalar MAX to arbitrary
    additive aggregates.
    """
    partial_cols = [c for c in state.columns if c not in keys]
    merged = state.unionByName(delta.select(*state.columns))
    return merged.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in partial_cols]
    )


def incremental_sync(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    check_column: str,
    check_type: str = "timestamp",
    parity: bool = True,
    lateness: dt.timedelta | int | None = None,
    materialize_delta: bool = False,
    evolve_schema: bool = True,
) -> DataFrame:
    """One full sync step: probe destination watermark, extract the delta,
    merge it in (upsert). Returns the new destination state.

    ``materialize_delta=True`` checkpoints the extracted delta so the
    merge's two references to it (anti-join probe + union) read it once —
    pass it whenever the source is a remote extraction (JDBC), where the
    default lazy plan would run the remote query twice per sync.

    Schema drift (r10 verdict item #6 — ``catalog.schema_diff`` reported
    drift but nothing consumed it): ``catalog.evolve_target`` auto-widens
    the target for source-ADDED columns (NULL for pre-existing rows) and
    fails fast with the full diff on removed/retyped columns."""
    from database_synchronize_tool_spark.catalog import evolve_target
    from database_synchronize_tool_spark.operators.merge import merge_upsert

    target = evolve_target(target, source, evolve_schema=evolve_schema)
    wm = probe_watermark(target, check_column, check_type)
    if check_type == "id" and wm == 0:
        delta = source  # empty destination: delta path with wm=0 still scans all
        delta = delta.filter(F.col(check_column) > F.lit(0)) if parity else delta
    else:
        delta = delta_filter(source, check_column, wm, parity=parity, lateness=lateness)
    return merge_upsert(target, delta, keys, materialize_source=materialize_delta)
