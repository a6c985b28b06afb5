"""Unit tests for the compat expression set (SURVEY §2.7 F1-F5): NULL->[]
array rewrite, JSON quote repair, the 2^53 int_compat boundary, and
stringify-trim parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_synchronize_tool_spark.functions.normalize import (
    apply_compat,
    int_compat,
    null_to_empty_array,
    repair_json,
    str_compat,
    validate_json,
)


def one(df, col="out"):
    return [r[col] for r in df.collect()]


def test_f1_null_to_empty_array(spark):
    df = spark.createDataFrame([([1, 2],), (None,)], "a array<int>")
    got = one(df.select(null_to_empty_array(F.col("a")).alias("out")))
    assert sorted(got, key=len) == [[], [1, 2]]


def test_f4_int_compat_lossy_above_2p53(spark):
    # int(float(x)) corrupts above 2^53 — the documented reference bug
    # (sync_utils.py:127-132); engine default cast("long") is exact.
    big = 2**53 + 1
    df = spark.createDataFrame([(str(big),)], "s string")
    compat = one(df.select(int_compat(F.col("s")).alias("out")))[0]
    exact = one(df.select(F.col("s").cast("long").alias("out")))[0]
    assert exact == big
    assert compat != big  # precision loss reproduced on purpose
    # tolerant of "3.0"-style strings (the reason the reference does this)
    df2 = spark.createDataFrame([("3.0",)], "s string")
    assert one(df2.select(int_compat(F.col("s")).alias("out"))) == [3]
    # ANSI-mode exact cast refuses "3.0" (try_cast -> NULL) — exactly the
    # tolerance gap int_compat exists to fill
    assert one(df2.select(F.col("s").try_cast("long").alias("out"))) == [None]


def test_f5_str_compat_trims(spark):
    df = spark.createDataFrame([("  x  ",), (None,)], "s string")
    assert one(df.select(str_compat(F.col("s")).alias("out"))) == ["x", None]


def test_f3_repair_json(spark):
    df = spark.createDataFrame(
        [
            ("'{''a'': ''b''}'",),  # outer-quoted + doubled quotes -> repaired
            ('{"ok": "1"}',),  # already valid passes through
            ("{'single': 'quotes'}",),  # second-chance ' -> " repair
            ("not json at all",),  # unrepairable -> NULL
            (None,),
        ],
        "s string",
    )
    got = one(df.select(repair_json(F.col("s")).alias("out")))
    assert got[0] == '{"a": "b"}'
    assert got[1] == '{"ok": "1"}'
    assert got[2] == '{"single": "quotes"}'
    assert got[3] is None
    assert got[4] is None


def test_f3_validate_json_gate(spark):
    df = spark.createDataFrame([('{"a":"1"}',), ("nope",)], "s string")
    got = one(df.select(validate_json(F.col("s")).alias("out")))
    assert got == ['{"a":"1"}', None]


def test_apply_compat_dispatch(spark):
    # same dispatch order as prepare_record: array / jsonb / int / fallback str
    df = spark.createDataFrame(
        [(None, "{'k': 'v'}", "41.0", 7)],
        "arr array<int>, js string, n string, other int",
    )
    out = apply_compat(
        df, {"arr": "_text[]", "js": "jsonb", "n": "bigint", "other": "text"}
    ).collect()[0]
    assert out["arr"] == []
    assert out["js"] == '{"k": "v"}'
    assert out["n"] == 41
    assert out["other"] == "7"


def test_f3_validate_json_accepts_non_object_json(spark):
    # arrays and scalars are valid jsonb (the reference validates with
    # json.loads) — the old map<string,string> gate NULLed them out
    df = spark.createDataFrame(
        [("[1,2,3]",), ("42",), ('"x"',), ("true",), ("{bad",), ('{"k":1}',)],
        "s string",
    )
    got = [
        r["out"]
        for r in df.select(validate_json(F.col("s")).alias("out")).collect()
    ]
    assert got == ["[1,2,3]", "42", '"x"', "true", None, '{"k":1}']
