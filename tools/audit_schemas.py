"""Audit declared-query output schemas against the driver comparator's needs.

For every query in the priority window, run the Spark builder and the DuckDB
oracle at a small SF and flag:
- complex-typed output columns (array/map/struct) — the driver canonicalizer
  sorts pandas cells and crashes on unhashable list values;
- dtype divergence between the Spark result and the oracle result once both
  land in pandas (the driver's value-hash is typed: int64 vs object flips it).

Usage: python tools/audit_schemas.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

from database_synchronize_tool_spark.catalog import TABLES, table_path
from database_synchronize_tool_spark.plans.registry import all_queries
from database_synchronize_tool_spark.session import get_spark

COMPLEX = ("array", "map", "struct")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    qs = all_queries()
    names = [n for n in qs if not only or n in only]

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )

    bad = 0
    for name in names:
        q = qs[name]
        try:
            sdf = q.builder(spark, sf_dir)
            sdtypes = dict(sdf.dtypes)
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: spark build failed: {e}")
            bad += 1
            continue
        issues = []
        for col, typ in sdtypes.items():
            if any(typ.startswith(c) for c in COMPLEX):
                issues.append(f"complex spark col {col}:{typ}")
        if q.oracle is not None:
            try:
                opdf = con.execute(q.oracle).fetchdf()
            except Exception as e:  # noqa: BLE001
                print(f"ERR   {name}: oracle failed: {e}")
                bad += 1
                continue
            spdf = sdf.toPandas()
            scols = sorted(spdf.columns)
            ocols = sorted(opdf.columns)
            if scols != ocols:
                issues.append(f"cols spark={scols} oracle={ocols}")
            else:
                for c in scols:
                    sd, od = str(spdf[c].dtype), str(opdf[c].dtype)
                    if sd != od:
                        issues.append(f"dtype {c}: spark={sd} oracle={od}")
        if issues:
            bad += 1
            print(f"FLAG  {name}")
            for i in issues:
                print(f"      - {i}")
        else:
            print(f"ok    {name}")
    print(f"\n{bad} flagged / {len(names)} checked @ {sf_dir}")


if __name__ == "__main__":
    main()
