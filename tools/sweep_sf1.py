"""Full-registry hash sweep at sf1 (r14 verdict #2): every declared query
differentially checked against its DuckDB oracle at the .scaledata/sf1
replica corpus — one order of magnitude above the r14 sf0.1 sweep, which
immediately caught two real scale-only cross-engine divergences (decimal
rounding mode, >2^53 conversions); the same classes get MORE reachable at
10x rows (denser midpoint draws, HUGEINT intermediates).

Tiering, documented by name in the log (extends the sweep_sf01 protocol
one level up):
- the exact-semantics tier (bench.EXACT_SEMANTICS_TIER) is pinned at
  sf0.01 up front — its block-quadratic oracles are the bench artifact's
  declared tiering;
- any OTHER query whose single-process DuckDB replay exceeds
  SPARK_GRAFT_ORACLE_TIMEOUT (default 420 s) at sf1 is interrupted,
  reported SLOW, and re-checked at sf0.1 (where SWEEP_r14 already proved
  the full registry); anything still SLOW there drops to sf0.01. The
  SPARK side still ran at the bigger SF each time — only the oracle
  comparison moves down.

Usage: python tools/sweep_sf1.py [--resume done.log] [> SWEEP.log]
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

SF1_DIR = "/root/repo/.scaledata/sf1"


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
            env=env,
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

    print(f"=== {len(rest)} queries @ {SF1_DIR} "
          "(oracle timeout 420s) ===", flush=True)
    out = _run(SF1_DIR, rest, "420")
    slow = re.findall(r"^SLOW\s+(\S+):", out, re.M)

    fail = bool(re.search(r"^FAIL", out, re.M))
    if slow:
        print(f"=== {len(slow)} slow-oracle-at-sf1 queries @ "
              f"/root/testdata/sf0.1 (oracle timeout 420s): "
              f"{sorted(slow)} ===", flush=True)
        out2 = _run("/root/testdata/sf0.1", slow, "420")
        fail = fail or bool(re.search(r"^FAIL", out2, re.M))
        slow2 = re.findall(r"^SLOW\s+(\S+):", out2, re.M)
    else:
        slow2 = []

    down = exact + slow2
    if down:
        print(f"=== {len(down)} queries @ /root/testdata/sf0.01 "
              f"(exact tier: {sorted(exact)}; slow-oracle at sf0.1: "
              f"{sorted(slow2)}) ===", flush=True)
        out3 = _run("/root/testdata/sf0.01", down, None)
        fail = fail or bool(re.search(r"^FAIL", out3, re.M))
    return 1 if fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
