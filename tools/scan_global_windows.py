"""Sweep every declared batch query's optimized logical plan for GLOBAL
Window nodes (empty partitionSpec) that are not provably bounded by a
limit below them — the single-partition-sort scale-killer class from the
round-9 verdict.

Usage: python tools/scan_global_windows.py [sf_dir] [name ...]
Prints one line per query: OK / BOUNDED (global window above a limit) /
GLOBAL (offender), plus a summary.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from database_synchronize_tool_spark.plans.registry import all_queries
from database_synchronize_tool_spark.session import get_spark

from database_synchronize_tool_spark.plan_checks import (  # noqa: E402
    STREAMING_PREFIXES,
    jchildren,
    low_ndv_partition_windows,
    subtree_has_limit,
)


def global_window_report(df) -> list[str]:
    """Return one tag per global Window node: 'bounded' or 'global'."""
    plan = df._jdf.queryExecution().optimizedPlan()
    tags: list[str] = []
    stack = [plan]
    while stack:
        n = stack.pop()
        if n.nodeName() == "Window" and n.partitionSpec().isEmpty():
            tags.append("bounded" if subtree_has_limit(n) else "global")
        stack.extend(jchildren(n))
    return tags


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("scan_global_windows")
    bad = []
    for name, q in all_queries().items():
        if only and name not in only:
            continue
        if name.startswith(STREAMING_PREFIXES):
            continue
        try:
            # clear persisted subtrees from earlier builders: an
            # InMemoryRelation hides the already-reduced-input exemption
            # from the low-NDV check (same guard as test_plan_shapes)
            spark.catalog.clearCache()
            df = q.builder(spark, sf_dir)
            tags = global_window_report(df)
            n_low = low_ndv_partition_windows(df)
        except Exception as exc:  # noqa: BLE001
            print(f"ERR   {name}: {exc}")
            bad.append(name)
            continue
        n_global = tags.count("global")
        n_bounded = tags.count("bounded")
        if n_global:
            print(f"GLOBAL {name}: {n_global} unbounded ({n_bounded} bounded)")
            bad.append(name)
        elif n_bounded:
            print(f"BOUNDED {name}: {n_bounded} limit-bounded global windows")
        if n_low:
            print(f"LOWNDV {name}: {n_low} bounded-NDV partition windows")
            bad.append(name)
    print(f"\n{len(bad)} queries with unbounded global windows: {sorted(bad)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
