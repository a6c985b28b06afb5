"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the declared-operator registry
(``database_synchronize_tool_spark.plans``) — one entry per implemented
operator from SURVEY.md §2, each with a DuckDB-runnable ANSI-SQL oracle where
the semantics are SQL-expressible (rows-only otherwise).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Revenue by nation: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region —
    the multi-way join + hash aggregate at the heart of the analytics
    surface (broadcast dims, decimal-exact money sums).
    """
    from database_synchronize_tool_spark.plans.registry import get

    return get("q5_revenue_by_nation").builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from database_synchronize_tool_spark.plans.registry import all_queries

    return {name: q.builder for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible declared query."""
    from database_synchronize_tool_spark.plans.registry import all_queries

    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
