"""Local differential harness: run every declared query on Spark AND its
DuckDB oracle over the same parquet, compare row count, column names, and the
order-insensitive multiset of values. Approximates the driver's t2 gate so
failures surface before a round ends.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

from database_synchronize_tool_spark.caching import cache_scope
from database_synchronize_tool_spark.catalog import TABLES, table_path
from database_synchronize_tool_spark.plans.registry import all_queries
from database_synchronize_tool_spark.session import get_spark


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if hasattr(v, "__float__") and not isinstance(v, (int, bool)):  # Decimal
        return float(v)
    return v


def rows_key(rows):
    return sorted(repr(r) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    oracle_timeout = float(os.environ.get("SPARK_GRAFT_ORACLE_TIMEOUT", "0"))

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )

    qs = all_queries()
    n_pass = n_fail = n_rows_only = n_slow = 0
    for name, q in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            # cache_scope releases operator-internal scoped_persist entries
            # (minhash signatures, shingle sets) right after the collect;
            # the belt-and-suspenders clearCache below also frees anything
            # persisted outside the scoped convention (ADVICE r6 #3).
            with cache_scope():
                sdf = q.builder(spark, sf_dir)
                s_cols = sorted(sdf.columns)
                s_rows = [
                    tuple(canon(r[c]) for c in s_cols) for r in sdf.collect()
                ]
        except Exception:
            print(f"FAIL  {name}: spark raised")
            traceback.print_exc()
            n_fail += 1
            continue
        finally:
            spark.catalog.clearCache()
        if q.oracle is None:
            print(f"ROWS  {name}: {len(s_rows)} rows (no oracle)")
            n_rows_only += 1
            continue
        try:
            # Optional per-query oracle timeout (SPARK_GRAFT_ORACLE_TIMEOUT
            # seconds, r14): a single-process DuckDB replay that is
            # intractable at the sweep SF must not pin the whole sweep —
            # interrupt it, report SLOW, and let the sweep runner re-check
            # the query at a smaller SF (documented by name in the log).
            timer = None
            # Timer-race guard (r15): if the timer fires AFTER the query
            # completes but BEFORE timer.cancel(), con.interrupt() sets
            # the connection's interrupt flag with no query running and
            # the NEXT query raises InterruptException immediately —
            # misclassifying a healthy query as SLOW. The callback checks
            # a "running" flag, records whether it actually fired, and a
            # sacrificial SELECT drains a late interrupt; an interrupt
            # exception with fired=False is re-run once without a timer.
            timer_state = {"running": False, "fired": False}
            if oracle_timeout:
                import threading

                def _interrupt_cb(state=timer_state, con=con):
                    if state["running"]:
                        state["fired"] = True
                        con.interrupt()

                timer = threading.Timer(oracle_timeout, _interrupt_cb)
                timer_state["running"] = True
                timer.start()
            try:
                try:
                    cur = con.execute(q.oracle)
                    d_cols_raw = [d[0] for d in cur.description]
                    d_all = cur.fetchall()
                finally:
                    timer_state["running"] = False
                    if timer is not None:
                        timer.cancel()
                if timer_state["fired"]:
                    # Late fire after completion: drain the stale
                    # interrupt flag so it cannot poison the next query.
                    try:
                        con.execute("SELECT 1").fetchall()
                    except Exception:  # noqa: BLE001 - draining interrupt
                        pass
            except Exception as retry_exc:  # noqa: BLE001
                is_interrupt = "INTERRUPT" in type(
                    retry_exc
                ).__name__.upper() or "interrupt" in str(retry_exc).lower()
                if not (is_interrupt and not timer_state["fired"]):
                    raise
                # Interrupt we did not request (stale flag from a prior
                # query's late timer): re-run once, untimed.
                cur = con.execute(q.oracle)
                d_cols_raw = [d[0] for d in cur.description]
                d_all = cur.fetchall()
            order = sorted(range(len(d_cols_raw)), key=lambda i: d_cols_raw[i])
            d_cols = sorted(d_cols_raw)
            d_rows = [tuple(canon(r[i]) for i in order) for r in d_all]
        except Exception as exc:  # noqa: BLE001 - classify interrupt vs fail
            if "INTERRUPT" in type(exc).__name__.upper() or (
                "interrupt" in str(exc).lower()
            ):
                print(
                    f"SLOW  {name}: oracle exceeded {oracle_timeout}s at "
                    "this SF (re-check at a smaller SF)",
                    flush=True,
                )
                n_slow += 1
                continue
            print(f"FAIL  {name}: duckdb raised")
            traceback.print_exc()
            n_fail += 1
            continue

        problems = []
        if s_cols != d_cols:
            problems.append(f"cols spark={s_cols} duck={d_cols}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            sk, dk = rows_key(s_rows), rows_key(d_rows)
            if sk != dk:
                diff = [(a, b) for a, b in zip(sk, dk) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(s_rows)} rows)")
            n_pass += 1

    slow = f", {n_slow} slow-oracle (re-check at smaller SF)" if n_slow else ""
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only{slow} @ {sf_dir}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
