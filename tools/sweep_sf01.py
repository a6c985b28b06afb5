"""Full-registry hash sweep at sf0.1 (r13 verdict #1): every declared
query differentially checked against its DuckDB oracle AT THE BENCH SF,
closing the scale-correctness gap (correctness was previously attested
only at sf0.001/sf0.01 while benches ran at sf0.1/sf1 — an overflow or
accumulation bug appearing only at scale was invisible).

The exact-semantics tier (bench.EXACT_SEMANTICS_TIER) is pinned at
sf0.01, where its block-quadratic oracles are tractable — the same
tiering the bench artifact declares; every other query runs at sf0.1.

Usage: python tools/sweep_sf01.py [> SWEEP_r14_sf0.1.log]
"""

from __future__ import annotations

import subprocess
import sys

sys.path.insert(0, "/root/repo")

from bench import EXACT_SEMANTICS_TIER  # noqa: E402
from database_synchronize_tool_spark.plans.registry import all_queries  # noqa: E402


def main() -> int:
    names = list(all_queries())
    exact = [n for n in names if n in EXACT_SEMANTICS_TIER]
    rest = [n for n in names if n not in EXACT_SEMANTICS_TIER]
    rc = 0
    for sf_dir, batch in (
        ("/root/testdata/sf0.1", rest),
        ("/root/testdata/sf0.01", exact),
    ):
        print(f"=== {len(batch)} queries @ {sf_dir} ===", flush=True)
        p = subprocess.run(
            [sys.executable, "tools/check_oracle.py", sf_dir, *batch],
            cwd="/root/repo",
        )
        rc = rc or p.returncode
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
