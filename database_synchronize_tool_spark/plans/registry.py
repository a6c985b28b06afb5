"""Registry of declared queries.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with (where SQL-expressible) an ANSI-SQL oracle string that DuckDB runs over
the same parquet tables. Column names are aligned on both sides because the
harness sorts columns by name before hashing values.

Determinism rules used throughout (so value-hashes match bit-for-bit):
- Money/double aggregations go through DECIMAL: ``SUM(CAST(x AS DECIMAL(18,2)))``
  is exact (order-insensitive) in both engines; the final result is cast back
  to DOUBLE. Plain double sums depend on accumulation order and would flap.
- Single double arithmetic ops (one multiply, one divide) are IEEE-identical
  across engines when expressed with the same association, so ``sum/count``
  divisions are written identically on both sides.
- Every top-k / window ordering carries a unique tiebreak column.
- Timestamps stay in UTC (session timezone pinned in session.py).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Declared:
    name: str
    builder: Builder
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


_REGISTRY: dict[str, Declared] = {}


def declared(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a query builder under ``name``."""

    def wrap(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate declared query {name!r}")
        _REGISTRY[name] = Declared(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return wrap


def _load_all() -> None:
    # Import side effects populate the registry.
    from database_synchronize_tool_spark.plans import (  # noqa: F401
        analytics,
        extensions,
        sync_ops,
        windows,
    )


def all_queries() -> dict[str, Declared]:
    _load_all()
    return dict(_REGISTRY)


def get(name: str) -> Declared:
    _load_all()
    return _REGISTRY[name]
