"""Differential correctness gate (SURVEY §5.1): every declared query runs on
Spark AND as ANSI SQL on DuckDB over the same parquet; row count, sorted
column names, and the order-insensitive multiset of canonicalized values must
match. Mirrors the driver's CORRECTNESS gate so failures surface pre-round."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from database_synchronize_tool_spark.plans.registry import all_queries

QUERIES = all_queries()


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if hasattr(v, "__float__") and not isinstance(v, (int, bool)):  # Decimal
        return float(v)
    return v


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    q = QUERIES[name]
    sdf = q.builder(spark, sf_dir)
    s_cols = sorted(sdf.columns)
    s_rows = [tuple(canon(r[c]) for c in s_cols) for r in sdf.collect()]

    if q.oracle is None:
        # rows-only check (non-SQL-expressible op): must run and be stable
        assert isinstance(s_rows, list)
        return

    cur = duck.execute(q.oracle)
    d_cols_raw = [d[0] for d in cur.description]
    order = sorted(range(len(d_cols_raw)), key=lambda i: d_cols_raw[i])
    d_cols = sorted(d_cols_raw)
    d_rows = [tuple(canon(r[i]) for i in order) for r in cur.fetchall()]

    assert s_cols == d_cols, f"column mismatch: spark={s_cols} duck={d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"rowcount mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    )
    sk = sorted(repr(r) for r in s_rows)
    dk = sorted(repr(r) for r in d_rows)
    if sk != dk:
        diffs = [(a, b) for a, b in zip(sk, dk) if a != b][:3]
        pytest.fail(f"value mismatch, first diffs: {diffs}")
