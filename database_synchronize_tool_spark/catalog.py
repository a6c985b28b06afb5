"""Testdata catalog: the ten parquet tables the harness provides.

The reference treats the source database as the schema authority (dynamic
``information_schema`` discovery, ``/root/reference/db-sync-local/sync_utils.py:195-237``);
here the parquet footer plays that role — ``spark.read.parquet`` derives the
StructType, and Catalyst pushes projections/predicates into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Merge-key registry (S4). Parquet carries no primary-key metadata, so the
# engine keeps explicit keys the way the reference's YAML could (explicit >
# discovered); a table absent here falls back to all-columns (the reference's
# no-PK rule, sync_utils.py:156-169 — see operators.merge.dedup_merge).
PRIMARY_KEYS: dict[str, tuple[str, ...]] = {
    "region": ("r_regionkey",),
    "nation": ("n_nationkey",),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey", "l_linenumber"),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Columns written as parquet TIMESTAMP(NANOS), which Spark's vectorized
# reader rejects; with spark.sql.legacy.parquet.nanosAsLong they surface as
# epoch-nanos longs and are converted to timestamp_ntz (micros) here. All
# other timestamps infer as timestamp_ntz directly (isAdjustedToUTC=false).
NANO_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


# DataFrame plans are immutable, so the (session, path) -> DataFrame cache is
# safe to share; it skips re-listing the file and re-reading the parquet
# footer on every query — a metadata catalog, not a data cache. Stored ON
# the session object (not a module dict keyed by id(spark)): entries die
# with their session instead of pinning stopped sessions — and their
# DataFrames — for the process lifetime (round-7 review).
_CACHE_ATTR = "_dst_table_cache"


def _session_cache(spark: SparkSession) -> dict[str, DataFrame]:
    cache = getattr(spark, _CACHE_ATTR, None)
    if cache is None:
        cache = {}
        setattr(spark, _CACHE_ATTR, cache)
    return cache


def convert_nano_ts(df: DataFrame, name: str) -> DataFrame:
    """Normalize any raw nanos-as-bigint timestamp columns of table ``name``
    to ``timestamp_ntz`` — the ONE conversion rule, shared by the batch
    catalog and the streaming reader (round-7 review: two hand-kept copies
    would drift when NANO_TS_COLS grows or the rounding rule changes)."""
    for col in NANO_TS_COLS.get(name, ()):
        if col in df.columns and df.schema[col].dataType.simpleString() == "bigint":
            from pyspark.sql import functions as F

            # integer `div` keeps full precision (double division would round
            # epoch-nanos to ~256ns granularity)
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"`{col}` div 1000")).cast("timestamp_ntz")
            )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One table as a DataFrame. Plain parquet scan: vectorized reader,
    predicate pushdown and column pruning all apply downstream."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    cache = _session_cache(spark)
    cache_key = table_path(sf_dir, name)
    cached = cache.get(cache_key)
    if cached is not None:
        return cached
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = convert_nano_ts(spark.read.parquet(table_path(sf_dir, name)), name)
    cache[cache_key] = df
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register temp views so declared queries can be written in SQL when
    that is the clearer form (same Catalyst plan either way)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def schema_diff(expected, observed):
    """Schema-drift report between an expected schema (what the last sync
    created, reference ``sync_utils.py`` re-derives the target DDL from the
    source every run) and an observed one: rows of ``(column, status,
    expected_type, observed_type)`` with status in {added, removed,
    type_changed, nullability_changed}. Matching columns emit nothing —
    like the row-level diff, the report is the divergence set.

    Pure metadata comparison (no jobs, no scans): drift detection belongs
    BEFORE the 100 TB read, where a silently widened column or a dropped
    field can be rejected or auto-migrated instead of poisoning a sync.
    """
    exp = {f.name: f for f in expected.fields}
    obs = {f.name: f for f in observed.fields}
    out: list[tuple[str, str, str | None, str | None]] = []
    for name in sorted(set(exp) | set(obs)):
        e, o = exp.get(name), obs.get(name)
        if e is None:
            out.append((name, "added", None, o.dataType.simpleString()))
        elif o is None:
            out.append((name, "removed", e.dataType.simpleString(), None))
        elif e.dataType != o.dataType:
            out.append(
                (
                    name,
                    "type_changed",
                    e.dataType.simpleString(),
                    o.dataType.simpleString(),
                )
            )
        elif e.nullable != o.nullable:
            out.append(
                (
                    name,
                    "nullability_changed",
                    f"nullable={e.nullable}",
                    f"nullable={o.nullable}",
                )
            )
    return out


def evolve_target(target, source, evolve_schema: bool = True):
    """Consume a :func:`schema_diff` for one sync step (r10 verdict #6):
    a column ADDED on the source auto-evolves the target — pre-existing
    target rows read NULL for it (the reference re-derives target DDL from
    the source every run, ``sync_utils.py:137-166``, so an added prod
    column must widen staging, not fail the sync). A REMOVED column or a
    TYPE change raises with the full diff: both mean upstream broke the
    contract, and merging would silently poison the target.
    Nullability-only drift is ignored — DataFrame nullability is advisory
    and flaps through unions/outer joins. Returns the (possibly widened)
    target. Shared by ``operators.watermark.incremental_sync`` and
    ``sources.sinks.ParquetMergeSink``."""
    from pyspark.sql import functions as F

    diff = schema_diff(target.schema, source.schema)
    breaking = [d for d in diff if d[1] in ("removed", "type_changed")]
    if breaking:
        raise ValueError(
            "schema drift: source diverges from the target in a "
            f"non-evolvable way: {breaking} (full diff: {diff})"
        )
    added = [d for d in diff if d[1] == "added"]
    if added and not evolve_schema:
        raise ValueError(
            f"schema drift: source added columns {added} and "
            "evolve_schema=False"
        )
    for name, _, _, _ in added:
        target = target.withColumn(
            name, F.lit(None).cast(source.schema[name].dataType)
        )
    return target
