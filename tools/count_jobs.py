"""Count Spark jobs launched while BUILDING (and optionally executing) a
declared query — evidence tool for plan-build-time training loops (the
trained-quantizer / BPE families run their training eagerly at builder
time, so the interesting number is jobs-at-build, not the plan shape).

Usage: python tools/count_jobs.py <query ...>
Prints per query: jobs_at_build, build_sec, jobs_at_collect, collect_sec.
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "count_jobs",
        shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    qs = all_queries()
    tracker = spark.sparkContext.statusTracker()

    def n_jobs() -> int:
        return len(tracker.getJobIdsForGroup(None) or []) + len(
            spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup()
        ) * 0

    # statusTracker per-group is fiddly; use the AppStatusStore job count
    def total_jobs() -> int:
        return spark._jsparkSession.sparkContext().statusStore().jobsList(None).size()

    with cache_scope():
        for t in TABLES:
            load_table(spark, sf_dir, t).cache().count()
        for name in names:
            with cache_scope():
                j0, t0 = total_jobs(), time.perf_counter()
                df = qs[name].builder(spark, sf_dir)
                j1, t1 = total_jobs(), time.perf_counter()
                df.collect()
                j2, t2 = total_jobs(), time.perf_counter()
            print(
                f"{name:38s} build: {j1 - j0:4d} jobs {t1 - t0:7.2f}s   "
                f"collect: {j2 - j1:4d} jobs {t2 - t1:7.2f}s"
            )
    spark.stop()


if __name__ == "__main__":
    main()
