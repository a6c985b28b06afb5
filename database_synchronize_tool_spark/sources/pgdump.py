"""pg_dump COPY-fixture source (SURVEY §2.1 S11).

The reference seeds its test database from a pg_dump file whose data section
is tab-separated ``COPY ... FROM stdin`` rows (``data/netflix.sql:45-8851``);
this reader turns that section into a typed DataFrame so the engine can run
the reference's own end-to-end scenario (netflix full-copy → delta sync)
without a Postgres instance.

Format notes (PostgreSQL text COPY): columns separated by TAB, ``\\N`` is
NULL, backslash escapes (``\\t \\n \\r \\\\``) inside values. Parsing happens
driver-side (fixtures are small by definition); a 100 TB ingest would use a
proper bulk format (parquet/CSV via spark.read) instead — this source exists
for reference-parity testing.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_UNESCAPE = {
    "\\t": "\t",
    "\\n": "\n",
    "\\r": "\r",
    "\\\\": "\\",
}


def _unescape(v: str) -> str:
    return re.sub(r"\\[tnr\\]", lambda m: _UNESCAPE[m.group(0)], v)


def parse_copy_block(sql_text: str, table: str) -> tuple[list[str], list[list[str | None]]]:
    """Extract (columns, rows) from the ``COPY <table> (...) FROM stdin``
    block. Values stay as strings (``None`` for ``\\N``); typing is the
    caller's schema decision — mirroring the reference, where Postgres casts
    on insert."""
    m = re.search(
        rf"^COPY\s+(?:\S+\.)?{re.escape(table)}\s*\(([^)]*)\)\s+FROM\s+stdin;\s*$",
        sql_text,
        re.MULTILINE,
    )
    if not m:
        raise ValueError(f"no COPY block for table {table!r}")
    columns = [c.strip() for c in m.group(1).split(",")]
    rows: list[list[str | None]] = []
    body = sql_text[m.end() :]
    lines = body.splitlines()
    # drop only the remnant of the COPY line itself (the text between
    # 'stdin;' and its newline) — NOT every empty line: for a SINGLE-column
    # table an empty body line is a real row whose value is the empty
    # string (NULL would be \N), so a blanket skip silently drops data
    # (round-7 review)
    if lines and lines[0].strip() == "":
        lines = lines[1:]
    for line in lines:
        if line == "\\.":
            break
        if not line and len(columns) != 1:
            continue  # blank separator in a multi-column dump, not a row
        rows.append(
            [None if f == "\\N" else _unescape(f) for f in line.split("\t")]
        )
    return columns, rows


def load_copy_fixture(
    spark: SparkSession, path: str, table: str, ddl_schema: str
) -> DataFrame:
    """COPY block → typed DataFrame. ``ddl_schema`` is the Spark DDL string
    for the target types (strings are cast column-wise, like Postgres does on
    COPY ingest)."""
    with open(path, encoding="utf-8") as f:
        text = f.read()
    columns, rows = parse_copy_block(text, table)
    as_strings = spark.createDataFrame(
        rows, ", ".join(f"{c} string" for c in columns)
    )
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    target = StructType.fromDDL(ddl_schema)
    return as_strings.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in target.fields]
    )


NETFLIX_DDL = (
    "show_id string, type string, title string, director string, "
    "cast_members string, country string, date_added date, "
    "release_year int, rating string, duration string, listed_in string, "
    "description string"
)
