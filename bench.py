"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is timed end-to-end (plan + execute + collect-to-count) after a
warmup pass that runs every headline query once: the first execution of a
plan pays one-time JVM/codegen class compilation (~1s per distinct plan
shape on this machine) that a long-running cluster amortizes to zero, so the
timed pass reflects steady-state execution — scan, shuffle, aggregate — not
compiler startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from database_synchronize_tool_spark.plans.registry import all_queries
from database_synchronize_tool_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "q6_revenue_forecast",
    "q10_returned_revenue",
    "j3_merge_upsert",
    "window_topk_per_group",
    "t5_tumbling_window",
    "t6_sessionization",
    "dedup_minhash_lsh",
    "dedup_exact",
    "ann_bruteforce_topk",
    "text_quality_score",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("bench")
    qs = all_queries()

    # Warmup pass: run every headline query once so JVM startup, parquet
    # footer caches, and per-plan codegen compilation are excluded from the
    # steady-state numbers (not counted).
    for name in HEADLINE:
        qs[name].builder(spark, sf_dir).count()

    # Three timed passes, best-of per query: a single pass is hostage to GC
    # pauses and scheduler jitter at this data scale (observed spread ±1s on
    # a ~7s total); the best observed run is the standard steady-state
    # estimator for microbenchmarks.
    timings: dict[str, float] = {}
    for _pass in range(3):
        for name in HEADLINE:
            t0 = time.perf_counter()
            df = qs[name].builder(spark, sf_dir)
            n = df.count()
            elapsed = round(time.perf_counter() - t0, 3)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed
            print(f"# {name}: {elapsed:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
