"""Late-r15 curation operators: CCNet paragraph-level first-occurrence
dedup (operators/dedup.paragraph_dedup) and SSL-prototype pruning
(operators/sampling.prototype_prune). The declared-query twins
(`dedup_paragraph_segments`, `curation_prototype_prune`) are hash-graded
against DuckDB at sf0.001/sf0.01/sf0.1/sf1; these tests pin the semantic
contracts on constructed inputs the synthetic corpus can't isolate."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from database_synchronize_tool_spark.operators.dedup import paragraph_dedup
from database_synchronize_tool_spark.operators.sampling import prototype_prune

# ten-token segments, constructed so segment boundaries are obvious
_SEG_A = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
_SEG_B = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"
_SEG_C = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"


def test_paragraph_dedup_first_occurrence_wins(spark):
    # doc 0: A B; doc 1: B C (B is a repeat -> dropped); doc 2: A A
    # (cross-doc repeat AND within-doc repeat -> both dropped)
    df = spark.createDataFrame(
        [
            (0, f"{_SEG_A} {_SEG_B}"),
            (1, f"{_SEG_B} {_SEG_C}"),
            (2, f"{_SEG_A} {_SEG_A}"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in paragraph_dedup(df).collect()
    }
    assert out[0]["n_segs"] == 2 and out[0]["n_kept"] == 2
    assert out[0]["text_dedup"] == f"{_SEG_A} {_SEG_B}"
    assert out[1]["n_segs"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["text_dedup"] == _SEG_C
    assert out[2]["n_segs"] == 2 and out[2]["n_kept"] == 0
    assert out[2]["text_dedup"] == ""


def test_paragraph_dedup_position_order_and_case_fold(spark):
    # kept segments reassemble in seg_idx order even when the collect
    # order differs; tokenization lowercases first (A1 == a1)
    df = spark.createDataFrame(
        [
            (7, f"{_SEG_C} {_SEG_B} {_SEG_A}"),
            (9, _SEG_A.upper()),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}
    assert out[7]["text_dedup"] == f"{_SEG_C} {_SEG_B} {_SEG_A}"
    # doc 9's only segment lowercases to _SEG_A, first seen in doc 7
    assert out[9]["n_kept"] == 0


def test_paragraph_dedup_short_tail_segment(spark):
    # a 15-token doc yields one full segment + one 5-token tail segment
    df = spark.createDataFrame(
        [(1, f"{_SEG_A} t1 t2 t3 t4 t5")], "doc_id long, text string"
    )
    row = paragraph_dedup(df).collect()[0]
    assert row["n_segs"] == 2 and row["n_kept"] == 2
    assert row["text_dedup"] == f"{_SEG_A} t1 t2 t3 t4 t5"


def test_prototype_prune_keeps_hardest_half_per_label(spark, sf_dir):
    from database_synchronize_tool_spark.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings")
    out = prototype_prune(e)
    per_label = (
        out.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
            F.min(F.when(F.col("kept"), F.col("sim_prototype"))).alias(
                "min_kept"
            ),
            F.max(F.when(F.col("kept"), F.col("sim_prototype"))).alias(
                "max_kept"
            ),
            F.min(F.when(~F.col("kept"), F.col("sim_prototype"))).alias(
                "min_pruned"
            ),
        )
        .collect()
    )
    assert per_label
    for r in per_label:
        # keep exactly ceil(n/2) of each label
        assert r["n_kept"] == math.ceil(r["n"] / 2)
        # kept = hardest (lowest similarity): every kept score <= every
        # pruned score
        assert r["max_kept"] <= r["min_pruned"]


def test_prototype_prune_rank_is_dense_from_one(spark, sf_dir):
    from database_synchronize_tool_spark.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings")
    out = prototype_prune(e)
    stats = (
        out.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("hard_rank").alias("lo"),
            F.max("hard_rank").alias("hi"),
            F.countDistinct("hard_rank").alias("nd"),
        )
        .collect()
    )
    for r in stats:
        assert (r["lo"], r["hi"], r["nd"]) == (1, r["n"], r["n"])
