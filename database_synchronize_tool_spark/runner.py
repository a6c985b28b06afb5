"""Sync runner: the control plane (SURVEY §2.11 C1-C4).

Mirrors the reference's orchestration — per-table error isolation
(``/root/reference/db-sync-local/main.py:13-30``), service grouping and
ordered phases (``gcp_main.py:57-82``) — as a driver-side loop; each table is
an independent Spark job over the shared session.

The data plane per table is the SURVEY §7.1 pipeline::

    source.read -> prune_ignored -> probe watermark (dest) -> delta filter
      -> [compat normalize] -> sink.write (upsert merge)

All heavy work stays declarative: the watermark predicate is pushed into the
scan, the merge shuffles once on the key (or broadcasts the delta), and the
driver only ever sees the scalar watermark.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Protocol

from pyspark.sql import DataFrame, SparkSession

from database_synchronize_tool_spark.operators.watermark import (
    delta_filter,
    probe_watermark,
)
from database_synchronize_tool_spark.sources.config import SyncConfig
from database_synchronize_tool_spark.sources.readers import prune_ignored


class Source(Protocol):
    def read(self, spark: SparkSession, table: str) -> DataFrame: ...


class Sink(Protocol):
    def read_target(self, spark: SparkSession, table: str, schema) -> DataFrame: ...

    def write(self, df: DataFrame, table: str, keys) -> None: ...


@dataclass
class SyncResult:
    table: str
    ok: bool
    rows_synced: int = 0
    watermark: Any = None
    error: str | None = None


def sync_table(
    spark: SparkSession,
    cfg: SyncConfig,
    source: Source,
    sink: Sink,
) -> SyncResult:
    """One sync step for one table (reference ``sync_table``,
    ``sync_utils.py:239-287``, re-expressed as a lazy DAG)."""
    src = prune_ignored(source.read(spark, cfg.table), cfg)
    target = sink.read_target(spark, cfg.table, src.schema)

    wm = probe_watermark(target, cfg.check_column, cfg.check_type)
    if cfg.check_type == "id":
        # T2: id watermark coalesced to 0 -> always the delta path
        delta = src.filter(f"{cfg.check_column} > {int(wm)}") if cfg.parity else (
            delta_filter(src, cfg.check_column, wm or None, parity=False)
        )
    else:
        delta = delta_filter(src, cfg.check_column, wm, parity=cfg.parity)

    # P4: empty-delta guard — skip the sink entirely (sync_utils.py:268-279)
    n = delta.count()
    if n == 0:
        return SyncResult(cfg.table, ok=True, rows_synced=0, watermark=wm)

    keys = list(cfg.merge_keys)
    sink.write(delta, cfg.table, keys)
    return SyncResult(cfg.table, ok=True, rows_synced=n, watermark=wm)


def run_all_syncs(
    spark: SparkSession,
    configs: dict[str, SyncConfig],
    source: Source,
    sink: Sink,
) -> list[SyncResult]:
    """C1/C2: group by service, try every table, isolate failures, report.

    Returns one result per table; overall success = ``all(r.ok)`` (the
    reference exits 1 when any table failed, ``main.py:25-30``).
    """
    by_service: dict[str | None, list[SyncConfig]] = {}
    for cfg in configs.values():
        by_service.setdefault(cfg.service, []).append(cfg)

    results: list[SyncResult] = []
    for service in sorted(by_service, key=lambda s: (s is not None, s or "")):
        for cfg in by_service[service]:
            try:
                results.append(sync_table(spark, cfg, source, sink))
            except Exception as e:  # noqa: BLE001 - per-table isolation (C1)
                results.append(SyncResult(cfg.table, ok=False, error=str(e)))
    return results
