"""Type normalization / compat expression set (the reference's only
"expression evaluator": ``prepare_record``,
``/root/reference/db-sync-local/sync_utils.py:79-139``).

Each per-row Python branch of the reference becomes a Column expression that
runs inside whole-stage codegen — no Python in the hot path. The one genuinely
non-standard piece (the JSON quote-repair heuristic, ``sync_utils.py:101-126``)
is an Arrow-vectorized pandas UDF.

Two modes:
- engine default: exact types (LongType stays exact — no ``int(float(x))``
  2^53 corruption; native dates/decimals — no stringify-everything).
- compat/parity: reproduces the reference's rewrites bit-for-bit for parity
  testing (F1 NULL→[], F4 double-roundtrip int, F5 str+strip).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def null_to_empty_array(col: Column) -> Column:
    """F1: NULL (or malformed) array → ``[]``. The reference deliberately
    collapses NULL arrays to empty (``sync_utils.py:86-94``) — a semantic
    rewrite we preserve under this explicit name."""
    return F.coalesce(col, F.array())


def int_compat(col: Column) -> Column:
    """F4 parity: ``int(float(v))`` — tolerant of "3.0"-style strings but
    lossy above 2^53 (``sync_utils.py:127-132``). Engine default is a plain
    ``cast("long")`` (exact); use this only for byte-parity testing."""
    return col.cast("double").cast("long")


def str_compat(col: Column) -> Column:
    """F5 parity: ``str(v).strip()`` for all remaining types
    (``sync_utils.py:133-138``)."""
    return F.trim(col.cast("string"))


def validate_json(col: Column) -> Column:
    """F3 (standard part): NULL out strings that don't parse as JSON.

    Gated on ``try_parse_json`` (VARIANT), which accepts ANY valid JSON
    value — the reference validates with ``json.loads``, for which arrays
    and scalars ('[1,2]', '42', 'true') are legal jsonb, and the previous
    ``from_json(col, 'map<string,string>')`` gate silently NULLed those
    out (round-7 review)."""
    return F.when(F.try_parse_json(col).isNotNull(), col)


# typed instance, not a DDL string: a DDL string would require an active
# SparkSession at import time just to parse "string"
@F.pandas_udf(StringType())
def repair_json(s: pd.Series) -> pd.Series:
    """F3 quote-repair heuristic, vectorized (Arrow batches).

    Mirrors ``sync_utils.py:97-126``: strip an outer ``'{...}'`` quoting
    layer, map ``''``→``"``, validate with ``json.loads``; dict/list inputs
    are not possible here (string column), so the fallback chain is
    ``'``→``"`` then give up → NULL.
    """

    def fix(v):
        if v is None:
            return None
        t = v.strip()
        if t.startswith("'") and t.endswith("'"):
            t = t[1:-1]
        t = t.replace("''", '"')
        try:
            json.loads(t)
            return t
        except (ValueError, TypeError):
            t2 = t.replace("'", '"')
            try:
                json.loads(t2)
                return t2
            except (ValueError, TypeError):
                return None

    return s.map(fix)


def apply_compat(df: DataFrame, type_map: dict[str, str]) -> DataFrame:
    """Apply the reference's per-type normalization to named columns.

    ``type_map``: column -> reference type string (``'ARRAY'``/``'_text[]'``,
    ``'jsonb'``, ``'bigint'``/``'int*'``, anything else → stringify). Same
    dispatch order as ``prepare_record``.
    """
    out = df
    for name, ref_type in type_map.items():
        c = F.col(name)
        t = ref_type.lower()
        if t.startswith("array") or t.endswith("[]"):
            out = out.withColumn(name, null_to_empty_array(c))
        elif t.startswith("jsonb"):
            out = out.withColumn(name, repair_json(c))
        elif "int" in t or t == "bigserial":
            # substring match is DELIBERATE reference parity
            # (sync_utils.py:127-132 tests `'int' in type`): a type like
            # 'interval' takes the int branch in the reference too — the
            # compat mode reproduces that dispatch bug-for-bug; the
            # engine-default path (no compat) never uses this mapping
            out = out.withColumn(name, int_compat(c))
        else:
            out = out.withColumn(name, str_compat(c))
    return out
