"""Source readers: where the reference extracts with psycopg2 into driver RAM
(``/root/reference/db-sync-local/sync_utils.py:41-77``), the engine declares a
scan and lets Catalyst push projection + the watermark predicate into it.

Two concrete sources:

- ``ParquetSource`` — the test/lakehouse path; schema authority is the footer.
- ``JdbcSource`` — the database path; schema authority is the remote catalog
  (mirrors the reference's information_schema discovery, S3). Reads are
  *partitioned on the watermark column* so a 100 TB table fans out across
  executors instead of the reference's single cursor
  (``partitionColumn/lowerBound/upperBound/numPartitions`` — SURVEY §7.4).

Column pruning by config (P2, ``sync_utils.py:210-217``): ``ignore_columns``
are dropped **iff nullable** — a non-nullable ignore is kept so downstream
inserts can't fail, same rule as the reference.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_synchronize_tool_spark.sources.config import SyncConfig


def prune_ignored(df: DataFrame, cfg: SyncConfig) -> DataFrame:
    """P2: drop ignored columns only when nullable (reference rule)."""
    droppable = [
        f.name
        for f in df.schema.fields
        if f.name in cfg.ignore_columns and f.nullable
    ]
    return df.drop(*droppable) if droppable else df


@dataclass(frozen=True)
class ParquetSource:
    """Lakehouse-side source: one parquet dataset per table."""

    root: str

    def path(self, table: str) -> str:
        import os

        return os.path.join(self.root, f"{table}.parquet")

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self.path(table))

    def schema(self, spark: SparkSession, table: str):
        return self.read(spark, table).schema


def _sql_literal(name: str) -> str:
    """Single-quoted SQL literal with embedded quotes doubled. The reference
    binds ``%(table_name)s`` driver-side (``sync_utils.py:197-204``); Spark's
    JDBC reader ships a textual subquery, so the parameter is inlined."""
    return "'" + name.replace("'", "''") + "'"


def columns_catalog_sql(table: str) -> str:
    """information_schema column-discovery SQL (reference ``get_table_schema``,
    ``/root/reference/db-sync-local/sync_utils.py:195-204``): name, type,
    nullability, and the parameterized-type fields (length / precision /
    scale / udt) that feed the rendered ``type(p,s)`` / ``udt[]`` forms."""
    return (
        "SELECT column_name, data_type, is_nullable, "
        "character_maximum_length, numeric_precision, numeric_scale, udt_name "
        "FROM information_schema.columns "
        f"WHERE table_name = {_sql_literal(table)} "
        "ORDER BY ordinal_position"
    )


def primary_keys_catalog_sql(table: str) -> str:
    """pg_index ⋈ pg_attribute primary-key discovery SQL (reference
    ``get_primary_keys``, ``sync_utils.py:141-150``)."""
    return (
        "SELECT a.attname AS column_name "
        "FROM pg_index i "
        "JOIN pg_attribute a ON a.attrelid = i.indrelid "
        "AND a.attnum = ANY(i.indkey) "
        f"WHERE i.indrelid = {_sql_literal(table)}::regclass "
        "AND i.indisprimary"
    )


def columns_fallback_sql(table: str) -> str:
    """All-columns fallback when no PK exists — the conflict key degenerates
    to every column (reference ``sync_utils.py:153-166``; J4 full-row dedup)."""
    return (
        "SELECT column_name FROM information_schema.columns "
        f"WHERE table_name = {_sql_literal(table)} "
        "ORDER BY ordinal_position"
    )


@dataclass(frozen=True)
class JdbcSource:
    """Database-side source (Postgres et al.) with partitioned scans.

    ``read`` with watermark bounds turns the incremental extract into N
    parallel range scans on the check column — each executor opens its own
    cursor for one slice; the reference's full-delta-in-one-cursor model
    (``sync_utils.py:50``) never appears. Requires the JDBC driver jar on the
    Spark classpath; construction and option-building are testable without it.
    """

    url: str  # jdbc:postgresql://host:port/db
    user: str = ""
    password: str = ""
    driver: str = "org.postgresql.Driver"
    num_partitions: int = 8
    fetch_size: int = 10_000

    def options(
        self,
        table: str,
        partition_column: str | None = None,
        lower: Any = None,
        upper: Any = None,
    ) -> dict[str, str]:
        opts = {
            "url": self.url,
            "dbtable": table,
            "user": self.user,
            "password": self.password,
            "driver": self.driver,
            "fetchsize": str(self.fetch_size),
        }
        if partition_column is not None and lower is not None and upper is not None:
            opts.update(
                partitionColumn=partition_column,
                lowerBound=str(lower),
                upperBound=str(upper),
                numPartitions=str(self.num_partitions),
            )
        return opts

    def read(
        self,
        spark: SparkSession,
        table: str,
        partition_column: str | None = None,
        lower: Any = None,
        upper: Any = None,
    ) -> DataFrame:
        reader = spark.read.format("jdbc")
        for k, v in self.options(table, partition_column, lower, upper).items():
            reader = reader.option(k, v)
        return reader.load()

    def _read_sql(self, spark: SparkSession, sql: str) -> DataFrame:
        """Run arbitrary catalog SQL remotely: Spark's JDBC source accepts a
        parenthesized subquery as ``dbtable``. Single-partition on purpose —
        catalog results are rows-per-column, not data."""
        reader = spark.read.format("jdbc")
        for k, v in self.options(f"({sql}) AS cat").items():
            reader = reader.option(k, v)
        return reader.load()

    def read_columns_catalog(self, spark: SparkSession, table: str) -> DataFrame:
        """S3 against a live database: the remote information_schema is the
        schema authority (reference ``get_table_schema``), not parquet
        footers. Requires the JDBC jar; SQL generation is golden-tested
        without a live server (no Postgres in the sandbox, documented)."""
        return self._read_sql(spark, columns_catalog_sql(table))

    def read_primary_keys(self, spark: SparkSession, table: str) -> DataFrame:
        """S4 against a live database, with the reference's fallback chain:
        callers should fall back to :func:`columns_fallback_sql` columns when
        this returns empty (``sync_utils.py:153-166``)."""
        return self._read_sql(spark, primary_keys_catalog_sql(table))


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines ingestion with corrupt-record quarantine — the raw-text
    landing format of every training-data pipeline.

    Returns ``(good, quarantined)``: rows that parsed against ``schema``
    and rows that did not (carrying the raw line in ``corrupt_col`` for
    replay/debugging). Rules that matter at 100 TB:

    - ``schema`` is REQUIRED (a DDL string). Schema inference reads the
      whole dataset once before the real job — never acceptable at scale,
      and non-deterministic under sampling.
    - ``multiLine`` stays False: JSONL is newline-delimited, so the input
      splits at line boundaries and every executor reads its own range; a
      multi-line JSON array is one unsplittable record.
    - PERMISSIVE mode + corrupt column beats FAILFAST (one bad line among
      billions should quarantine, not kill the job) and beats DROPMALFORMED
      (silent data loss is unauditable — the quarantine count is the audit).

    Both returned frames are lazy single-scan projections of the same read;
    Spark requires a cache/filter split on the corrupt column (SPARK-38954:
    referencing only the corrupt column is disallowed on the raw reader),
    so the quarantine frame selects the raw line alongside a parse marker.
    """
    full_schema = f"{schema}, {corrupt_col} STRING"
    raw = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("multiLine", "false")
        .json(path)
        .cache()  # one scan serves both splits; SPARK-38954 requires it
    )
    good = raw.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    quarantined = raw.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return good, quarantined
