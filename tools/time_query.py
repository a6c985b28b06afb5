"""Time named queries with the bench methodology (hot tables, plan once,
best-of-N collect) without running the whole bench.

Usage: python tools/time_query.py [-n N] [--noop] <query ...>
  --noop times df.write.format("noop") instead of collect() (guide §1.4);
  collect() is the bench's timed action, so default matches the bench.
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
    args = sys.argv[1:]
    n_pass = 3
    noop = False
    if "-n" in args:
        i = args.index("-n")
        n_pass = int(args[i + 1])
        del args[i : i + 2]
    if "--noop" in args:
        noop = True
        args.remove("--noop")
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "time_query",
        shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    qs = all_queries()
    with cache_scope():
        for t in TABLES:
            load_table(spark, sf_dir, t).cache().count()
        built = {name: qs[name].builder(spark, sf_dir) for name in names}
        for df in built.values():
            df.collect()
        best: dict[str, float] = {}
        for _ in range(n_pass):
            for name, df in built.items():
                t0 = time.perf_counter()
                if noop:
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.collect()
                el = time.perf_counter() - t0
                if name not in best or el < best[name]:
                    best[name] = el
    for name in names:
        print(f"{best[name]:7.3f}  {name}")
    spark.stop()


if __name__ == "__main__":
    main()
