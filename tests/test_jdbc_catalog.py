"""Golden tests for the live-JDBC catalog path (SURVEY §2.1 S3/S4 against a
real database).

No Postgres runs in the sandbox, so these pin the *generated SQL* to the
reference's catalog queries instead of executing them: column discovery
(``/root/reference/db-sync-local/sync_utils.py:195-204``), primary-key
discovery (``sync_utils.py:141-150``), and the all-columns fallback
(``sync_utils.py:153-166``). The driver-side counterpart is the declared
``catalog_live_columns_sql`` query, whose DuckDB oracle is an independently
handwritten VALUES literal of the same statements.
"""

from __future__ import annotations

from database_synchronize_tool_spark.sources.readers import (
    JdbcSource,
    columns_catalog_sql,
    columns_fallback_sql,
    primary_keys_catalog_sql,
)


def test_columns_catalog_sql_golden():
    assert columns_catalog_sql("netflix_shows") == (
        "SELECT column_name, data_type, is_nullable, "
        "character_maximum_length, numeric_precision, numeric_scale, udt_name "
        "FROM information_schema.columns "
        "WHERE table_name = 'netflix_shows' "
        "ORDER BY ordinal_position"
    )


def test_primary_keys_catalog_sql_golden():
    assert primary_keys_catalog_sql("netflix_shows") == (
        "SELECT a.attname AS column_name "
        "FROM pg_index i "
        "JOIN pg_attribute a ON a.attrelid = i.indrelid "
        "AND a.attnum = ANY(i.indkey) "
        "WHERE i.indrelid = 'netflix_shows'::regclass "
        "AND i.indisprimary"
    )


def test_columns_fallback_sql_golden():
    assert columns_fallback_sql("orders") == (
        "SELECT column_name FROM information_schema.columns "
        "WHERE table_name = 'orders' "
        "ORDER BY ordinal_position"
    )


def test_table_name_quotes_escaped():
    # inlined literal (Spark JDBC has no driver-side bind params) must not be
    # injectable through a hostile table name
    sql = columns_catalog_sql("evil'; DROP TABLE x; --")
    assert "table_name = 'evil''; DROP TABLE x; --'" in sql


def test_catalog_sql_ships_as_jdbc_subquery():
    src = JdbcSource(url="jdbc:postgresql://h/db", user="u")
    opts = src.options(f"({columns_catalog_sql('orders')}) AS cat")
    assert opts["dbtable"].startswith("(SELECT column_name, data_type")
    assert opts["dbtable"].endswith(") AS cat")
    # catalog reads are unpartitioned: no partitionColumn keys present
    assert "partitionColumn" not in opts


def test_declared_golden_query_matches_generators(spark):
    # the Spark side of catalog_live_columns_sql must emit exactly the
    # generator output for every table and kind
    from database_synchronize_tool_spark.catalog import TABLES
    from database_synchronize_tool_spark.plans.registry import get

    rows = {
        (r["table_name"], r["kind"]): r["stmt"]
        for r in get("catalog_live_columns_sql").builder(spark, "").collect()
    }
    assert len(rows) == 3 * len(TABLES)
    for t in TABLES:
        assert rows[(t, "columns")] == columns_catalog_sql(t)
        assert rows[(t, "primary_keys")] == primary_keys_catalog_sql(t)
        assert rows[(t, "columns_fallback")] == columns_fallback_sql(t)


def test_schema_diff_reports_only_divergence(spark):
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from database_synchronize_tool_spark.catalog import schema_diff

    expected = StructType(
        [
            StructField("id", LongType(), False),
            StructField("name", StringType(), True),
            StructField("age", IntegerType(), True),
            StructField("gone", StringType(), True),
        ]
    )
    observed = StructType(
        [
            StructField("id", LongType(), True),       # nullability drift
            StructField("name", StringType(), True),   # unchanged -> silent
            StructField("age", LongType(), True),      # widened int->bigint
            StructField("extra", StringType(), True),  # new column
        ]
    )
    got = schema_diff(expected, observed)
    assert got == [
        ("age", "type_changed", "int", "bigint"),
        ("extra", "added", None, "string"),
        ("gone", "removed", "string", None),
        ("id", "nullability_changed", "nullable=False", "nullable=True"),
    ]
