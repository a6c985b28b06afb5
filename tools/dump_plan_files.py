"""Dump .explain("formatted") for named queries to plans/<round>/<q>_<tag>.txt.

Usage: python tools/dump_plan_files.py <tag> <query_name ...>
(tag is "before" or "after"; optimization-round evidence files. Round dir
defaults to r16; override with SPARK_GRAFT_PLAN_ROUND.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from database_synchronize_tool_spark.plans.registry import all_queries
from database_synchronize_tool_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        "/root/repo", "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r16")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plan_files")
    qs = all_queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = qs[name].builder(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
