"""Shared fixtures: one SparkSession per test session (JVM startup is ~15 s,
so every test module reuses it), plus a DuckDB connection with the sf0.001
tables registered as views for differential tests."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_synchronize_tool_spark.catalog import TABLES, table_path
from database_synchronize_tool_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # Few shuffle partitions: tiny data, so per-partition scheduling overhead
    # dominates otherwise. Cluster sizing lives in session.py defaults.
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF_DIR, t)}')"
        )
    yield con
    con.close()
