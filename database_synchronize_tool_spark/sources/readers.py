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
