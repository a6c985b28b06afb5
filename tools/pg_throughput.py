"""Measure the live-Postgres upsert path's throughput: Spark DataFrame →
foreachPartition → pgwire batched multi-statement ON CONFLICT upserts into
an ephemeral local server. This is the reference's core write loop
(``sync_utils.py:239-287``, psycopg2 executemany at batch 1000) running on
the repo's zero-dependency wire client — the number SCALE.md cites.

Usage: python tools/pg_throughput.py [n_rows] [batch_size]
Prints one JSON line.
"""

from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    from database_synchronize_tool_spark.session import get_spark
    from database_synchronize_tool_spark.sources import pgwire
    from database_synchronize_tool_spark.sources.sinks import DbApiUpsertSink

    pg = pgwire.EphemeralPostgres(port=54337)
    if not pg.available:
        print(json.dumps({"error": pg.error}))
        return 1
    try:
        connect = functools.partial(pgwire.connect, **pg.connect_kwargs())
        con = connect()
        cur = con.cursor()
        cur.execute(
            "CREATE TABLE tput (id bigint PRIMARY KEY, ts timestamp, "
            "v double precision, s text)"
        )
        con.commit()

        spark = get_spark("pg_throughput", shuffle_partitions=32)
        from pyspark.sql import functions as F

        df = (
            spark.range(n_rows)
            .select(
                F.col("id"),
                F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
                (F.col("id") * 0.5).alias("v"),
                F.concat(F.lit("row-"), F.col("id")).alias("s"),
            )
            .repartition(16)
            .persist()
        )
        df.count()

        sink = DbApiUpsertSink(connect=connect, batch_size=batch)

        def timed_into_empty(fn):
            # best of 2 into a truncated table: the first foreachPartition
            # of a session pays Python-worker startup, which would bill
            # whichever path runs first
            best, n = 1e18, 0
            for _ in range(2):
                cur.execute("TRUNCATE tput")
                con.commit()
                t0 = time.perf_counter()
                n = fn()
                best = min(best, time.perf_counter() - t0)
            return best, n

        copy_s, n0 = timed_into_empty(lambda: sink.write_copy(df, "tput"))
        insert_s, n1 = timed_into_empty(
            lambda: sink.write(df, "tput", ["id"])
        )
        t0 = time.perf_counter()
        n2 = sink.write(df, "tput", ["id"])  # conflict-update replay
        update_s = time.perf_counter() - t0
        cur.execute("SELECT COUNT(*) FROM tput")
        final = cur.fetchall()[0][0]
        con.close()
        print(
            json.dumps(
                {
                    "n_rows": n_rows,
                    "batch_size": batch,
                    "copy_sec": round(copy_s, 2),
                    "copy_rows_per_sec": round(n0 / copy_s),
                    "insert_sec": round(insert_s, 2),
                    "insert_rows_per_sec": round(n1 / insert_s),
                    "upsert_replay_sec": round(update_s, 2),
                    "upsert_rows_per_sec": round(n2 / update_s),
                    "final_count": final,
                }
            )
        )
        return 0
    finally:
        pg.stop()


if __name__ == "__main__":
    raise SystemExit(main())
