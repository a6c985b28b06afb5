"""Derive the low-NDV column profile from the testdata itself.

The plan sweep (plan_checks.low_ndv_partition_windows) flags rank windows
partitioned solely by bounded-NDV columns over un-reduced input — the
straggler class where 3 return flags = 3 tasks at 100 TB. Until r12 the
column list was HAND-maintained (r11 verdict #6: profile_column_stats
already computes NDV in one scan; a new low-NDV column would never get
caught). This tool measures every column of every testdata table at two
scale factors and classifies:

    low-NDV  iff  ndv(sf_hi) <= NDV_CAP  and  ndv(sf_hi) <= GROWTH_CAP * ndv(sf_lo)

i.e. the column's cardinality is small AND does not scale with the data —
the signature of a dimension/enum column. Measure columns (ids, keys,
timestamps, free text) fail the cap; bounded codes (status, priority,
segment, mode, brand, ship instructions, even 50-value quantities) pass —
a window partitioned by ANY of them over raw rows is a genuine hazard, so
over-inclusion relative to the old hand list is the point, not a bug.

Writes database_synchronize_tool_spark/ndv_profile.json (committed; the
sweep loads it at import). Re-run after testdata changes:

    python tools/profile_ndv.py
"""

from __future__ import annotations

import json
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(
    REPO, "database_synchronize_tool_spark", "ndv_profile.json"
)
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
SF_LO, SF_HI = "/root/testdata/sf0.01", "/root/testdata/sf0.1"
NDV_CAP = 512  # bounded enough that one group ~ rows/ndv is straggler-sized
GROWTH_CAP = 1.5  # dimension columns don't scale with the fact data


def profile(sf_dir: str) -> dict[str, dict[str, int]]:
    con = duckdb.connect()
    out: dict[str, dict[str, int]] = {}
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        cols = [
            (r[0], r[1])
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{path}'"
            ).fetchall()
        ]
        rows = con.sql(f"SELECT count(*) FROM '{path}'").fetchone()[0]
        for c, typ in cols:
            # array/list columns are never window partition keys; skip
            # (DuckDB can't hash-distinct nested types uniformly anyway)
            if "[" in typ or "STRUCT" in typ.upper():
                continue
            ndv = con.sql(
                f'SELECT count(DISTINCT "{c}") FROM \'{path}\''
            ).fetchone()[0]
            out[c] = {"table": t, "rows": int(rows), "ndv": int(ndv)}
    return out


def classify(
    lo: dict[str, dict[str, int]], hi: dict[str, dict[str, int]]
) -> dict:
    cols = {}
    for c, h in sorted(hi.items()):
        l = lo.get(c, h)
        low = h["ndv"] <= NDV_CAP and h["ndv"] <= GROWTH_CAP * max(
            l["ndv"], 1
        )
        cols[c] = {
            "table": h["table"],
            "ndv_lo": l["ndv"],
            "ndv_hi": h["ndv"],
            "rows_hi": h["rows"],
            "low_ndv": bool(low),
        }
    return {
        "method": (
            f"low_ndv iff ndv(sf_hi) <= {NDV_CAP} and "
            f"ndv(sf_hi) <= {GROWTH_CAP} * ndv(sf_lo); "
            f"sf_lo={SF_LO}, sf_hi={SF_HI}"
        ),
        "columns": cols,
    }


def main() -> None:
    prof = classify(profile(SF_LO), profile(SF_HI))
    with open(OUT, "w") as f:
        json.dump(prof, f, indent=1, sort_keys=True)
        f.write("\n")
    low = [c for c, v in prof["columns"].items() if v["low_ndv"]]
    print(f"wrote {OUT}: {len(prof['columns'])} columns, {len(low)} low-NDV")
    print(" ".join(sorted(low)))


if __name__ == "__main__":
    sys.exit(main())
