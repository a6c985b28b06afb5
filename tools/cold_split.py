"""Split a query's cost into plan-build / first-execution (includes codegen
class compilation) / warm best-of-3 — the r15 verdict #2 diagnostic for the
text-family cold-path cluster (full-registry tripwire rows time ONE pass
including plan+codegen; warm rows improved while cold rows doubled).

Usage: [SPARK_GRAFT_SF_DIR=...] python tools/cold_split.py <query ...>
Each query runs inside its own cache_scope (like the full-registry tier).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from database_synchronize_tool_spark.caching import cache_scope
from database_synchronize_tool_spark.catalog import TABLES, load_table
from database_synchronize_tool_spark.plans.registry import all_queries
from database_synchronize_tool_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(
        "cold_split",
        shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    qs = all_queries()
    print(f"{'query':36s} {'build':>7s} {'first':>7s} {'warm':>7s}")
    with cache_scope():
        for t in TABLES:
            load_table(spark, sf_dir, t).cache().count()
        for name in names:
            with cache_scope():
                t0 = time.perf_counter()
                df = qs[name].builder(spark, sf_dir)
                t1 = time.perf_counter()
                df.collect()
                t2 = time.perf_counter()
                warm = min(
                    (lambda s: (df.collect(), time.perf_counter() - s)[1])(
                        time.perf_counter()
                    )
                    for _ in range(3)
                )
                print(
                    f"{name:36s} {t1 - t0:7.3f} {t2 - t1:7.3f} {warm:7.3f}"
                )
    spark.stop()


if __name__ == "__main__":
    main()
