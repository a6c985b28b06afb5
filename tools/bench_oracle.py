"""Time the DuckDB-oracle side of the headline queries at a given SF —
the BASELINE comparison point (BASELINE.md: Spark bench within 2× of the
oracle timing at the same scale factor).

Usage: python tools/bench_oracle.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from bench import HEADLINE
from database_synchronize_tool_spark.catalog import TABLES, table_path
from database_synchronize_tool_spark.plans.registry import all_queries


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    qs = all_queries()
    timings = {}
    for name in HEADLINE:
        oracle = qs[name].oracle
        if oracle is None:
            continue
        t0 = time.perf_counter()
        n = len(con.execute(oracle).fetchall())
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_headline_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    main()
