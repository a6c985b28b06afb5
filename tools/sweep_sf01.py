"""Full-registry hash sweep at sf0.1 (r13 verdict #1): every declared
query differentially checked against its DuckDB oracle AT THE BENCH SF,
closing the scale-correctness gap (correctness was previously attested
only at sf0.001/sf0.01 while benches ran at sf0.1/sf1 — an overflow or
accumulation bug appearing only at scale was invisible).

Tiering, documented by name in the log:
- the exact-semantics tier (bench.EXACT_SEMANTICS_TIER) is pinned at
  sf0.01 up front — its block-quadratic oracles are the bench artifact's
  declared tiering;
- any OTHER query whose single-process DuckDB replay exceeds
  SPARK_GRAFT_ORACLE_TIMEOUT (default 420 s) at sf0.1 is interrupted,
  reported SLOW, and hash-checked at sf0.01 instead — the SPARK side
  still ran at sf0.1; what moves down is only the oracle comparison
  (measured: dedup_ngram_jaccard's pairwise-verify replay exceeds 40 min
  at sf0.1 while Spark answers in seconds).

Usage: python tools/sweep_sf01.py [--resume done.log] [> SWEEP.log]
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from bench import EXACT_SEMANTICS_TIER  # noqa: E402
from database_synchronize_tool_spark.plans.registry import all_queries  # noqa: E402


def _run(sf_dir: str, batch: list[str], timeout_sec: str | None) -> str:
    env = dict(os.environ)
    if timeout_sec:
        env["SPARK_GRAFT_ORACLE_TIMEOUT"] = timeout_sec
    else:
        env.pop("SPARK_GRAFT_ORACLE_TIMEOUT", None)
    with tempfile.NamedTemporaryFile("r+", suffix=".log") as tf:
        subprocess.run(
            [sys.executable, "tools/check_oracle.py", sf_dir, *batch],
            cwd="/root/repo",
            stdout=tf,
            stderr=subprocess.DEVNULL,
        )
        tf.seek(0)
        out = tf.read()
    print(out, end="", flush=True)
    return out


def main() -> int:
    done: set[str] = set()
    if len(sys.argv) > 2 and sys.argv[1] == "--resume":
        for line in open(sys.argv[2]):
            m = re.match(r"(PASS|ROWS)\s+(\S+?):?\s", line)
            if m:
                done.add(m.group(2).rstrip(":"))
        print(f"=== resume: {len(done)} already green ===", flush=True)
    names = [n for n in all_queries() if n not in done]
    exact = [n for n in names if n in EXACT_SEMANTICS_TIER]
    rest = [n for n in names if n not in EXACT_SEMANTICS_TIER]

    print(f"=== {len(rest)} queries @ /root/testdata/sf0.1 "
          "(oracle timeout 420s) ===", flush=True)
    out = _run("/root/testdata/sf0.1", rest, "420")
    slow = re.findall(r"^SLOW\s+(\S+):", out, re.M)

    down = exact + slow
    if down:
        print(f"=== {len(down)} queries @ /root/testdata/sf0.01 "
              f"(exact tier: {sorted(exact)}; slow-oracle at sf0.1: "
              f"{sorted(slow)}) ===", flush=True)
        out2 = _run("/root/testdata/sf0.01", down, None)
        if re.search(r"^FAIL", out2, re.M):
            return 1
    return 1 if re.search(r"^FAIL", out, re.M) else 0


if __name__ == "__main__":
    raise SystemExit(main())
