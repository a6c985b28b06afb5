"""Time the DuckDB-oracle side of the headline queries at a given SF —
the BASELINE comparison point (BASELINE.md: Spark bench within 2× of the
oracle timing at the same scale factor).

Methodology — IDENTICAL to bench.py's Spark side (round-2 advice: the two
sides must measure comparable steady state):

- **Hot tables.** Inputs are materialized as native in-memory DuckDB tables
  (the analogue of Spark's unified-memory cache) — both engines skip parquet
  decode in the timed region.
- **Warm pass, then best-of-three** timed executions per query, mirroring
  bench.py's plan-once warmup + best-of-3.

``bench.py`` imports :func:`run_oracle_bench` and runs it in the same
process right after the Spark session stops, so each round's artifact
carries BOTH totals measured back-to-back under the same machine
conditions (round-2 verdict item 9).

Usage: python tools/bench_oracle.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from database_synchronize_tool_spark.catalog import TABLES, table_path
from database_synchronize_tool_spark.plans.registry import all_queries


def run_oracle_bench(
    sf_dir: str,
    names: list[str],
    passes: int = 3,
    echo=None,
    memory_limit: str = "60GB",
    failures: dict | None = None,
) -> dict[str, float]:
    """Best-of-``passes`` per-query oracle timings over hot native tables.

    ``memory_limit`` caps DuckDB's allocator and routes overflow to a
    spill directory instead of letting the kernel OOM-kill the whole
    bench process: the r11 sf1 run died silently mid oracle pass 2 with
    no traceback — DuckDB's default limit is 80% of PHYSICAL RAM, sized
    without regard for what the (just-stopped, lazily-reclaimed) JVM and
    the page cache still hold (r11 verdict #3). A spilling oracle query
    shows up as a slow timing, which is honest; a killed process shows up
    as a salvage job.

    Fault isolation (r12): one pathological oracle must not discard every
    other query's timings — the first r12 sf1 attempt lost the WHOLE
    oracle table when one query's spill filled /tmp (the 40GB cap routed
    ~80GB of operator state to a 79GB-headroom disk). Each execution is
    wrapped per query: a failure records the query into ``failures``
    (name -> error string), skips it for the remaining passes, and the
    spill directory is swept between queries so one spill never eats the
    next query's headroom. The warm pass echoes too, so a hang or failure
    is attributable from the log."""
    import os as _os
    import shutil
    import tempfile

    con = duckdb.connect()
    con.execute("SET enable_progress_bar = false")
    con.execute(f"SET memory_limit = '{memory_limit}'")
    spill = _os.path.join(tempfile.gettempdir(), "duckdb_bench_spill")
    _os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory = '{spill}'")

    def _sweep_spill() -> None:
        for f in _os.listdir(spill):
            try:
                p = _os.path.join(spill, f)
                shutil.rmtree(p) if _os.path.isdir(p) else _os.remove(p)
            except OSError:
                pass

    for t in TABLES:
        con.execute(
            f"CREATE TABLE {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    qs = all_queries()
    oracles = {n: qs[n].oracle for n in names if qs[n].oracle is not None}
    if failures is None:
        failures = {}
    for name, sql in list(oracles.items()):  # warm pass (not timed)
        if echo is not None:
            echo(f"# oracle warm {name} ...")
        try:
            con.execute(sql).fetchall()
        except Exception as exc:  # noqa: BLE001 - isolate per query
            failures[name] = f"{type(exc).__name__}: {exc}"
            del oracles[name]
            if echo is not None:
                echo(f"# oracle warm {name} FAILED: {failures[name]}")
        _sweep_spill()
    timings: dict[str, float] = {}
    for _pass in range(passes):
        for name, sql in list(oracles.items()):
            t0 = time.perf_counter()
            try:
                n_rows = len(con.execute(sql).fetchall())
            except Exception as exc:  # noqa: BLE001 - isolate per query
                failures[name] = f"{type(exc).__name__}: {exc}"
                del oracles[name]
                timings.pop(name, None)
                if echo is not None:
                    echo(f"# oracle {name} FAILED: {failures[name]}")
                _sweep_spill()
                continue
            elapsed = round(time.perf_counter() - t0, 3)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed
            if echo is not None:
                echo(f"# oracle {name}: {elapsed:.3f}s ({n_rows} rows)")
            _sweep_spill()
    return timings


def main() -> None:
    from bench import HEADLINE, ORACLE_SKIP

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # same exclusion bench.py applies: ORACLE_SKIP queries cost minutes per
    # oracle execution at sf0.1 (pathological on the DuckDB side only)
    timings = run_oracle_bench(
        sf_dir,
        [n for n in HEADLINE if n not in ORACLE_SKIP],
        echo=lambda s: print(s, file=sys.stderr),
    )
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
