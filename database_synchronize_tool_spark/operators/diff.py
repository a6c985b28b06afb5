"""Sync audit: keyed symmetric diff of two tables.

The reference has no verification step after a sync — it trusts the upsert
(``/root/reference/db-sync-local/sync_utils.py:239-287`` ends at execution).
An engine that merges 100 TB needs the audit primitive the reference lacks:
given target and source keyed tables, classify every divergent key as

- ``missing_in_target`` — key only in the source (sync not caught up / lost)
- ``missing_in_source`` — key only in the target (source-side delete the
  watermark model can't see — the known blind spot of high-watermark sync)
- ``changed``          — key on both sides but some compared column differs
  (late update below the watermark, manual edit, corruption)

Equal rows are not emitted — at scale the diff output is the (small)
divergence set, never a copy of the table. One full-outer shuffle on the
keys, null-safe column compares (NULL == NULL), no driver-side state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sync_diff(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Keyed symmetric diff: one row per divergent key, with ``status`` in
    {missing_in_target, missing_in_source, changed}.

    ``compare_cols`` defaults to all shared non-key columns. Comparison is
    null-safe (``eqNullSafe``), so NULLs diff like Postgres's
    ``IS DISTINCT FROM``.
    """
    if compare_cols is None:
        shared = [c for c in target.columns if c in set(source.columns)]
        compare_cols = [c for c in shared if c not in keys]
    t = target.withColumn("__t", F.lit(True)).alias("t")
    s = source.withColumn("__s", F.lit(True)).alias("s")
    cond: Column | None = None
    for k in keys:
        c = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        cond = c if cond is None else (cond & c)
    joined = t.join(s, on=cond, how="full_outer")
    in_t = F.col("t.__t").isNotNull()
    in_s = F.col("s.__s").isNotNull()
    changed: Column = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"t.{c}").eqNullSafe(F.col(f"s.{c}"))
    status = (
        F.when(~in_t, F.lit("missing_in_target"))
        .when(~in_s, F.lit("missing_in_source"))
        .when(changed, F.lit("changed"))
    )
    key_cols = [
        F.coalesce(F.col(f"s.{k}"), F.col(f"t.{k}")).alias(k) for k in keys
    ]
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*key_cols, "status")
    )
