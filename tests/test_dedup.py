"""Unit tests for the near-duplicate operator family on crafted corpora:
MinHash-LSH must surface an exact duplicate pair and must not pair disjoint
documents; hamming/simhash basics."""

from __future__ import annotations

from database_synchronize_tool_spark.operators.dedup import (
    minhash_lsh_pairs,
)


def test_minhash_finds_exact_dup_not_disjoint(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
            (3, "completely unrelated words zebra quartz vortex nymph glyph"),
        ],
        "doc_id bigint, text string",
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_minhash_near_dup_above_threshold(spark):
    base = "spark engines shuffle partitions across the cluster nodes quickly"
    docs = spark.createDataFrame(
        [(1, base), (2, base + " now"), (3, "different text entirely here")],
        "doc_id bigint, text string",
    )
    got = {(r["doc_a"], r["doc_b"]): r["jacc"] for r in minhash_lsh_pairs(docs).collect()}
    assert (1, 2) in got and got[(1, 2)] >= 0.8
