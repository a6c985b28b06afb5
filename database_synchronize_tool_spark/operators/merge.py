"""Keyed merge (upsert) as a relational operator.

The reference performs upsert server-side via generated
``INSERT ... ON CONFLICT (pk) DO UPDATE SET col = EXCLUDED.col``
(``/root/reference/db-sync-local/sync_utils.py:174-193``; executor
``utils.py:38-75``). Semantics: equi-join source batch against target on the
primary-key columns; matched rows take the source's non-key values
(last-writer-wins), unmatched source rows are inserted, unmatched target rows
are kept. With no primary key, the conflict key degenerates to *all* columns,
i.e. full-row dedup (``sync_utils.py:156-169``).

Spark-first forms (no MERGE sink needed for the relational semantics):

- ``merge_upsert``: anti-join + union — target rows whose key does NOT appear
  in the source survive, then all source rows are appended. One shuffle on the
  key (or none if the source delta is small enough to broadcast — pass
  ``broadcast_source=True``). This is the same plan Delta's MERGE lowers to
  for insert/update-all merges, minus the transactional file swap.
- ``merge_full_outer``: the coalesce form — useful when both sides must be
  projected through (SQL-oracle-friendly, used by the declared query).
- ``dedup_merge``: the no-PK degenerate case — union + dropDuplicates over all
  columns.

Scale notes (100 TB): the join shuffles on the merge key; for a small delta
against a huge target, broadcast the delta so the target is never shuffled.
If the target is bucketed/partitioned by the key, Catalyst avoids re-shuffling
the big side entirely. Duplicate keys *within* the source batch are collapsed
first (keep-last via an explicit ordering column, else arbitrary-but-single),
mirroring Postgres's one-conflict-per-statement-row behavior.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def collapse_source_dups(
    source: DataFrame, keys: Sequence[str], order_col: str | None = None
) -> DataFrame:
    """Collapse duplicate keys inside one source batch (last-writer-wins).

    With ``order_col``, keeps the row with the greatest value per key
    (deterministic); otherwise ``dropDuplicates`` keeps an arbitrary single row
    (the reference would raise ``CardinalityViolation`` — we collapse instead,
    documented divergence, SURVEY §7.4).
    """
    if order_col is None:
        return source.dropDuplicates(list(keys))
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (
        source.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    broadcast_source: bool = False,
    order_col: str | None = None,
    collapse: bool = True,
    null_safe_keys: bool = True,
    materialize_source: bool = False,
) -> DataFrame:
    """Anti-join + union upsert: source wins on key collisions.

    Equivalent to ``INSERT ... ON CONFLICT DO UPDATE`` over full rows.
    Duplicate keys *within* the source batch are collapsed first (keep-max
    on ``order_col`` when given, else arbitrary-but-single) so the merged
    output has one row per key — where the reference's single-statement
    upsert would raise ``CardinalityViolation`` (``sync_utils.py:174-188``),
    we collapse; documented divergence, SURVEY §7.4. Pass ``collapse=False``
    only when the source is already key-unique and the extra aggregate is
    provably wasted (the collapse shares the merge's key partitioning, so
    its cost is one map-side-combined aggregate, not a second full shuffle).
    """
    src = collapse_source_dups(source, keys, order_col) if collapse else source
    if materialize_source:
        # the collapsed source subtree is referenced TWICE in the merged
        # plan (anti-join probe + union side) with different projections,
        # so exchange reuse cannot merge them and the source extraction
        # runs twice — for a JDBC-backed delta that is two remote reads
        # per sync (round-7 review). A lazy localCheckpoint computes the
        # delta once on first use and serves both branches from the
        # checkpointed blocks.
        src = src.localCheckpoint(eager=False)
    if not null_safe_keys:
        # name-list (null-UNSAFE) anti-join: semantically identical for
        # constraint-non-null keys (every real primary key), and the raw
        # key expressions let a target bucketed on the key skip its
        # Exchange entirely (plan-pinned) — null-safe keys get wrapped in
        # coalesce/isnull pairs that no longer match the bucketing
        probe = F.broadcast(src) if broadcast_source else src
        kept = target.join(probe.select(*keys), on=list(keys), how="left_anti")
        return kept.unionByName(src)
    # eqNullSafe anti-join (default): a name-list join is null-UNSAFE, so a
    # NULL-key target row would never match a NULL-key source row and both
    # would survive — diverging from merge_full_outer's pinned
    # NULLS-NOT-DISTINCT single-row semantics (round-7 review). Pass
    # ``null_safe_keys=False`` for constraint-non-null keys to keep the
    # bucketed-scan exchange elimination.
    probe = src.select(*keys).alias("__p")
    if broadcast_source:
        probe = F.broadcast(probe)
    t = target.alias("__t")
    cond: Column | None = None
    for k in keys:
        c = F.col(f"__t.{k}").eqNullSafe(F.col(f"__p.{k}"))
        cond = c if cond is None else (cond & c)
    kept = t.join(probe, on=cond, how="left_anti")
    return kept.unionByName(src)


def merge_full_outer(
    target: DataFrame, source: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Full-outer + coalesce form of the same merge.

    Produces one row per key present on either side; non-key columns prefer
    the source (EXCLUDED) value, falling back to the target's.
    """
    t = target.alias("t")
    # Explicit presence marker: key-nullability can't signal "source side
    # matched" because eqNullSafe deliberately matches NULL keys (NULLS NOT
    # DISTINCT semantics), so a NULL key is a valid matched source row.
    s = source.withColumn("__src", F.lit(True)).alias("s")
    # Alias-qualified string refs, not df[col] accessors: when target and
    # source derive from the same DataFrame (a self-join by lineage), the
    # accessor form is ambiguous; "t.x"/"s.x" always resolve.
    cond: Column | None = None
    for k in keys:
        c = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        cond = c if cond is None else (cond & c)
    joined = t.join(s, on=cond, how="full_outer")
    src_present = F.col("s.__src").isNotNull()
    cols = [
        F.coalesce(F.col(f"s.{k}"), F.col(f"t.{k}")).alias(k) for k in keys
    ] + [
        F.when(src_present, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in target.columns
        if c not in keys
    ]
    return joined.select(*cols)


def dedup_merge(target: DataFrame, source: DataFrame) -> DataFrame:
    """No-PK degenerate merge: conflict key = all columns => full-row dedup
    over the union (reference fallback, ``sync_utils.py:156-169``)."""
    return target.unionByName(source).dropDuplicates()


def changelog_compact(
    changelog: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    op_col: str | None = None,
    delete_ops: Sequence[str] = ("D",),
) -> DataFrame:
    """Compact a CDC changelog to the latest live state per key.

    The batch form of what the reference's repeated upsert cycles converge to
    (``sync_utils.py:174-193`` applies each batch in arrival order; replaying
    the full history through it yields exactly max-version-wins): take, per
    key, the row with the greatest ``order_by`` tuple, and drop it entirely
    when that newest row is a delete (``op_col`` in ``delete_ops``) — a
    tombstone erases the key instead of surviving as a row.

    ``order_by`` must be a deterministic total order within each key
    (e.g. ``("ts", "seq_id")``); ties on a bare timestamp would make the
    winner nondeterministic at scale.

    Scale (100 TB changelog): one shuffle on the key for the per-key window;
    no join at all — compaction is a pure window + filter, so it pipelines
    with whatever reads the compacted state. If the changelog is already
    bucketed by key (the natural layout for a CDC landing zone), even that
    exchange disappears.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    latest = (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if op_col is not None:
        latest = latest.filter(~F.col(op_col).isin(list(delete_ops)))
    return latest
