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


def merkle_bucket_diff(
    target: DataFrame,
    source: DataFrame,
    key_col: str,
    fingerprint_cols: Sequence[str],
    bucket_size: int = 4096,
) -> DataFrame:
    """Anti-entropy reconciliation: find the key RANGES where two replicas
    diverge without comparing (or even shuffling) any rows — the merkle-tree
    pattern (Dynamo/Cassandra anti-entropy, public literature) flattened to
    one level of range buckets.

    Each side reduces to one row per ``floor(key / bucket_size)`` bucket:
    a row count plus an ORDER-INSENSITIVE 60-bit bucket digest — bit_xor of
    a per-row md5 fingerprint over the canonical ``'|'``-joined rendering of
    ``fingerprint_cols``. XOR is commutative/associative, so the digest is
    identical no matter how rows are partitioned or ordered — map-side
    partial aggregation works and no sort is ever needed. The two tiny
    bucket summaries full-outer join on bucket id; output is ONLY the
    diverging buckets with both sides' counts and digests.

    Scale: at 100 TB per side, each side is one map-side-combined aggregate
    (shuffle payload = #buckets rows of 3 longs each), the join touches
    #buckets rows, and the follow-up row-level :func:`sync_diff` needs to
    run only WHERE bucket IN (diverged) — pushdown-pruning the expensive
    keyed diff to the drifted ranges. XOR collision probability per bucket
    is 2^-60; the row count catches the paired-dup edge XOR misses
    (two identical extra rows cancel in XOR but not in count; a bucket
    where BOTH cancel requires a 2^-60 digest collision on differing
    multisets of differing cardinality — impossible, count differs).

    Caveat (documented, shared with every merkle scheme): a bucket where one
    row was changed TWICE such that fingerprints XOR-cancel pairwise with
    equal counts is a true 2^-60 collision class; rerun with a different
    bucket_size to re-randomize bucket membership if paranoid.
    """
    def summarize(df: DataFrame, side: str) -> DataFrame:
        # 60-bit row fingerprint: md5 over the '|'-joined canonical strings,
        # hex-parsed identically by Spark conv() and DuckDB CAST('0x...').
        # NULLs render as chr(0) — concat_ws SKIPS nulls in both engines,
        # which would make ('a', NULL, 'b') and ('a', 'b', NULL) collide.
        h = F.expr(
            "cast(conv(substring(md5(concat_ws('|', "
            + ", ".join(
                f"coalesce(cast({c} as string), chr(0))" for c in fingerprint_cols
            )
            + ")), 1, 15), 16, 10) as bigint)"
        )
        return (
            df.select(
                (F.floor(F.col(key_col) / bucket_size)).cast("long").alias("bucket"),
                h.alias("h"),
            )
            .groupBy("bucket")
            .agg(
                F.count("*").alias(f"{side}_rows"),
                F.expr("bit_xor(h)").alias(f"{side}_digest"),
            )
        )

    t = summarize(target, "target")
    s = summarize(source, "source")
    j = t.join(s, "bucket", "full_outer")
    diverged = (
        ~F.col("target_rows").eqNullSafe(F.col("source_rows"))
        | ~F.col("target_digest").eqNullSafe(F.col("source_digest"))
    )
    return j.filter(diverged).select(
        "bucket", "target_rows", "target_digest", "source_rows", "source_digest"
    )
