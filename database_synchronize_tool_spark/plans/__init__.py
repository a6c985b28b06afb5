"""Declared-query plans: the registry consumed by ``__spark_entry__``."""

from database_synchronize_tool_spark.plans.registry import (  # noqa: F401
    Declared,
    all_queries,
    declared,
    get,
)
