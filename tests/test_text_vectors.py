"""Unit tests for the text-analysis and vector expression libraries."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from database_synchronize_tool_spark.functions.text import (
    fingerprint,
    jaccard,
    lang_id,
    quality_score,
    shingles,
    token_count,
)
from database_synchronize_tool_spark.functions.vectors import cosine, dot, norm


def one(spark, col_expr, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return [r["out"] for r in df.select(col_expr.alias("out")).collect()]


def test_token_count(spark):
    got = one(
        spark, token_count(F.col("t")), [("a  b c",), ("",), ("  x ",)], "t string"
    )
    assert got == [3, 0, 1]


def test_lang_id(spark):
    got = one(
        spark,
        lang_id(F.col("t")),
        [
            ("the cat and the dog is a pet",),
            ("der Hund und die Katze ist",),
            ("le chat et la maison est",),
            ("zzz qqq www",),
        ],
        "t string",
    )
    assert got == ["en", "de", "fr", "unknown"]


def test_fingerprint_normalizes(spark):
    # case/whitespace/punct-insensitive: both normalize to the same md5
    got = one(
        spark,
        fingerprint(F.col("t")),
        [("Hello,   World!",), ("hello world",)],
        "t string",
    )
    assert got[0] == got[1]


def test_shingles_distinct(spark):
    got = one(spark, shingles(F.col("t")), [("abab",)], "t string")
    # "abab" -> aba, bab (distinct)
    assert sorted(got[0]) == ["aba", "bab"]


def test_jaccard_identical_and_disjoint(spark):
    df = spark.createDataFrame([(["a", "b"], ["a", "b"]), (["a"], ["b"])], "x array<string>, y array<string>")
    got = [r["out"] for r in df.select(jaccard(F.col("x"), F.col("y")).alias("out")).collect()]
    assert got == [1.0, 0.0]


def test_quality_score_bounds(spark):
    text = " ".join(["the word and more of text is here fine okay"] * 2)
    got = one(spark, quality_score(F.col("t")), [(text,), ("x",)], "t string")
    assert 0.0 <= got[0] <= 1.0
    assert got[1] < got[0]  # one-token doc scores below a normal sentence


def test_dot_norm_cosine(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<float>, b array<float>"
    )
    d = df.select(dot(F.col("a"), F.col("b")).alias("out")).collect()[0]["out"]
    assert d == 32.0
    n = df.select(norm(F.col("a")).alias("out")).collect()[0]["out"]
    assert math.isclose(n, math.sqrt(14.0))
    c = df.select(cosine(F.col("a"), F.col("a")).alias("out")).collect()[0]["out"]
    assert math.isclose(c, 1.0)


def test_cosine_orthogonal(spark):
    df = spark.createDataFrame([([1.0, 0.0], [0.0, 1.0])], "a array<float>, b array<float>")
    c = df.select(cosine(F.col("a"), F.col("b")).alias("out")).collect()[0]["out"]
    assert c == 0.0
