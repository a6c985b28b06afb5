"""Slowly-changing-dimension Type-2 merge as a relational operator.

The reference's upsert (``/root/reference/db-sync-local/sync_utils.py:174-193``)
is Type-1: a changed row OVERWRITES the target and the old value is gone. A
sync pipeline that feeds analytics usually needs the Type-2 form instead —
keep every version, stamp its validity interval, and mark the live one:

    (key..., tracked..., valid_from, valid_to, is_current)

Semantics per source row (one batch, one ``change_ts`` per row):

- key absent from target        -> insert new current version
- key present, tracked changed  -> close the current version
                                   (valid_to = change_ts, is_current=false)
                                   AND insert the new current version
- key present, tracked equal    -> no-op (idempotent re-deliveries are free)

Closed history rows are never touched.

Spark-first shape: ONE full-outer equi-join of the *current* slice against
the (key-collapsed) source, then each joined row explodes into 0-2 output
rows via an array-of-structs — entirely built-in expressions, whole-stage
codegen, a single shuffle on the key. History rows bypass the join through a
union: at 100 TB the closed history — the bulk of the table — is never
shuffled, and with the table partitioned on ``is_current`` the current slice
is one partition-pruned scan.

``broadcast_source=True`` is the small-delta-vs-huge-target path. Spark's
BroadcastHashJoin does not support full-outer builds (the hint would be
silently dropped with a HintErrorLogger warning), so the full outer is
decomposed into an equivalent zero-shuffle plan: (1) current LEFT OUTER
broadcast(source) covers keeps/closes/updates, (2) a broadcast LEFT SEMI
projects the ≤|source| matched keys, (3) source LEFT ANTI broadcast(matched
keys) yields brand-new keys. Three broadcast joins, the huge current slice
is scanned (twice) but never shuffled — strictly cheaper than one shuffle of
the target at scale. All three claims (history bypass, is_current partition
pruning, broadcast-only plan) are pinned in tests/test_plan_shapes.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from database_synchronize_tool_spark.operators.merge import collapse_source_dups

SCD2_COLS = ("valid_from", "valid_to", "is_current")


def scd2_merge(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
    change_ts: str = "change_ts",
    broadcast_source: bool = False,
    collapse: bool = True,
) -> DataFrame:
    """Type-2 merge of a change batch into an SCD2 history table.

    ``target`` carries ``keys + tracked + (valid_from, valid_to,
    is_current)``; ``source`` carries ``keys + tracked + change_ts``.
    Duplicate keys within the batch collapse to the latest ``change_ts``
    first (last-writer-wins, same contract as ``merge_upsert``).
    """
    src = (
        collapse_source_dups(source, keys, order_col=change_ts)
        if collapse
        else source
    )
    if broadcast_source:
        # The broadcast path consumes src three times (outer-join build,
        # matched semi-probe, inserts anti-join); src is small by the
        # broadcast contract, and without a persist each consumer re-runs
        # its whole derivation (j8's 3-branch union re-scanned the base
        # table per consumer — 19 scan subtrees in the r15 before-plan).
        from database_synchronize_tool_spark.caching import scoped_persist

        src = scoped_persist(src)
    valid_to_type = dict(target.dtypes)["valid_to"]

    # coalesce(is_current, false): a NULL flag (a nullable boolean an
    # upstream writer left unset) must land in the history slice, not
    # vanish — `col` and `~col` are BOTH not-true for NULL, so without the
    # coalesce such rows were silently dropped from the merge output on
    # every run (round-7 review)
    is_cur = F.coalesce(F.col("is_current"), F.lit(False))
    cur = target.filter(is_cur)
    hist = target.filter(~is_cur)

    t = cur.alias("t")
    s = src.withColumn("__src", F.lit(True)).alias("s")

    def key_cond(left: str, right: str) -> Column:
        cond: Column | None = None
        for k in keys:
            c = F.col(f"{left}.{k}").eqNullSafe(F.col(f"{right}.{k}"))
            cond = c if cond is None else (cond & c)
        assert cond is not None
        return cond

    t_present = F.col("t.is_current").isNotNull()
    s_present = F.col("s.__src").isNotNull()
    changed: Column = F.lit(False)
    for c in tracked:
        changed = changed | ~F.col(f"t.{c}").eqNullSafe(F.col(f"s.{c}"))

    def version(side: str, valid_from: Column, valid_to: Column, live: bool) -> Column:
        return F.struct(
            *[F.col(f"{side}.{k}").alias(k) for k in keys],
            *[F.col(f"{side}.{c}").alias(c) for c in tracked],
            valid_from.alias("valid_from"),
            valid_to.alias("valid_to"),
            F.lit(live).alias("is_current"),
        )

    keep_t = version("t", F.col("t.valid_from"), F.col("t.valid_to"), True)
    close_t = version("t", F.col("t.valid_from"), F.col(f"s.{change_ts}"), False)
    new_s = version(
        "s", F.col(f"s.{change_ts}"), F.lit(None).cast(valid_to_type), True
    )

    if broadcast_source:
        # BroadcastHashJoin has no full-outer build: decompose into three
        # broadcast joins so the huge current slice never shuffles.
        joined = t.join(F.broadcast(s), on=key_cond("t", "s"), how="left_outer")
        rows = (
            F.when(~s_present, F.array(keep_t))
            .when(changed, F.array(close_t, new_s))
            .otherwise(F.array(keep_t))
        )
        outer = joined.select(F.explode(rows).alias("__v")).select("__v.*")
        # matched keys project to ≤ |source| rows, so the anti join for
        # brand-new keys broadcasts them instead of shuffling the source
        matched = (
            cur.alias("t")
            .join(F.broadcast(src.alias("s")), on=key_cond("t", "s"), how="left_semi")
            .select(*keys)
        )
        inserts = (
            src.alias("s")
            .join(F.broadcast(matched.alias("t")), on=key_cond("s", "t"), how="left_anti")
            .select(
                *[F.col(k) for k in keys],
                *[F.col(c) for c in tracked],
                F.col(change_ts).alias("valid_from"),
                F.lit(None).cast(valid_to_type).alias("valid_to"),
                F.lit(True).alias("is_current"),
            )
        )
        merged = outer.unionByName(inserts)
    else:
        joined = t.join(s, on=key_cond("t", "s"), how="full_outer")
        rows = (
            F.when(~s_present, F.array(keep_t))
            .when(~t_present, F.array(new_s))
            .when(changed, F.array(close_t, new_s))
            .otherwise(F.array(keep_t))
        )
        merged = joined.select(F.explode(rows).alias("__v")).select("__v.*")
    return merged.unionByName(hist.select(*merged.columns))


def pit_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    fact_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Point-in-time (temporal) join of facts against a versioned dimension.

    Each fact row matches the dimension version whose validity interval
    covers the fact's timestamp: ``valid_from <= fact_ts AND (valid_to IS
    NULL OR fact_ts < valid_to)`` — the half-open-interval contract that
    makes SCD2 output (:func:`scd2_merge`) joinable without double-matching
    at version boundaries. With intervals produced by closing each version
    at its successor's ``valid_from`` (the SCD2 invariant), at most ONE
    version matches per fact, so the join never fans out.

    Execution shape: a plain equi-join on ``keys`` with the interval
    predicate as a post-join filter — Spark runs it as a
    shuffled/broadcast hash join on the key, NOT a range join, because the
    version count per key is bounded (dimension keys have few versions;
    the interval check is a cheap residual). That is the property that
    holds at 100 TB: the fact table shuffles once on the key it would
    shuffle on anyway, and the dimension side is usually broadcastable.
    For an unversioned point-event dimension, prefer the union+carry-
    forward as-of shape (plans/sync_ops.py j5) which needs no join at all.

    The reference has no temporal layer (its upsert is Type-1,
    sync_utils.py:174-193); this is the read-side complement of
    :func:`scd2_merge`'s write side.
    """
    f = facts.alias("f")
    d = dim.alias("d")
    cond = None
    for k in keys:
        c = F.col(f"f.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = c if cond is None else (cond & c)
    ts = F.col(f"f.{fact_ts}")
    cond = (
        cond
        & (F.col(f"d.{valid_from}") <= ts)
        & (F.col(f"d.{valid_to}").isNull() | (ts < F.col(f"d.{valid_to}")))
    )
    dim_payload = [
        F.col(f"d.{c}").alias(c)
        for c in dim.columns
        if c not in set(keys)
    ]
    return f.join(d, on=cond, how=how).select(
        *[F.col(f"f.{c}").alias(c) for c in facts.columns], *dim_payload
    )
