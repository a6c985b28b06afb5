"""Persisted IVF-PQ vector indexes: build once, search many times.

Every declared ANN query in this repo is self-contained (it derives
centroids/codebooks/codes in the same job because the correctness harness
requires it), but a production corpus does NOT re-encode 10^11 vectors per
query batch. This module persists the three index artifacts the fused
scan needs, in the layout that makes the 100 TB search cheap:

- ``centroids/``  — (cell, centroid) parquet. Bounded quantizer metadata.
- ``codebooks/``  — (sub, code, cv) parquet. Bounded (m × ksub) metadata.
- ``codes/``      — (vid, codes) parquet **partitioned by cell**. This is
  the big artifact (m bytes per vector instead of dim×8) and the
  partitioning is the point: an ``n_probe``-cell search reads ONLY the
  probed cells' files — Spark partition pruning turns the inverted-list
  probe of FAISS into plain ``PartitionFilters`` on a parquet scan, no
  index server required. A pinned test asserts the pruning is visible in
  the executed plan.
- ``manifest.json`` — dims/params for validation at load time.

``search_ivfpq_index`` is bit-identical to :func:`similarity.ivf_pq_topk`
run end-to-end on the raw vectors (pinned by test): same stable argmax
assignment, same LUT construction, same ADC left-fold, same tie-breaks.
The difference is purely physical — the search scans m-byte codes from
the probed cells instead of re-encoding the whole corpus.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from database_synchronize_tool_spark.operators.similarity import (
    PQ_KSUB,
    PQ_M,
    _adc_accumulate,
    _codebook_np,
    _collect_queries,
    _cosine_sim_np,
    _pq_luts_np,
    ivf_assign_cells,
    pq_codebooks,
    pq_encode,
    seed_centroids,
)


@dataclass(frozen=True)
class IvfPqIndex:
    path: str
    centroids: DataFrame
    codebooks: DataFrame
    codes: DataFrame  # (vid, codes, cell) — cell is the partition column
    meta: dict


def build_ivfpq_index(
    vectors: DataFrame,
    index_dir: str,
    n_cells: int = 16,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    codebooks: DataFrame | None = None,
) -> IvfPqIndex:
    """Build and persist the index. ``centroids``/``codebooks`` accept
    trained tables (:func:`train_centroids_kmeans` /
    :func:`train_pq_codebooks`); the deterministic data-seeded defaults
    otherwise. The codes write is one narrow encode pass + a
    partitionBy(cell) write — no shuffle beyond the write's own file
    routing."""
    spark = vectors.sparkSession
    cents = (
        centroids
        if centroids is not None
        else seed_centroids(vectors, n_cells, id_col, vec_col)
    )
    cb = (
        codebooks
        if codebooks is not None
        else pq_codebooks(vectors, m, ksub, id_col, vec_col)
    )
    assign = ivf_assign_cells(vectors, cents, id_col, vec_col, top_cells=1)
    codes = pq_encode(vectors, cb, m, id_col, vec_col).join(
        assign.select("vid", "cell"), "vid"
    )
    dim = len(
        vectors.select(F.col(vec_col).alias("v")).first()["v"]
    )
    cents.write.mode("overwrite").parquet(os.path.join(index_dir, "centroids"))
    cb.write.mode("overwrite").parquet(os.path.join(index_dir, "codebooks"))
    codes.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(index_dir, "codes")
    )
    meta = {
        "n_cells": n_cells,
        "m": m,
        "ksub": ksub,
        "dim": dim,
        "n_vectors": codes.count(),
        "format": "ivfpq-parquet-v1",
    }
    with open(os.path.join(index_dir, "manifest.json"), "w") as fh:
        json.dump(meta, fh)
    return load_ivfpq_index(spark, index_dir)


def load_ivfpq_index(spark: SparkSession, index_dir: str) -> IvfPqIndex:
    with open(os.path.join(index_dir, "manifest.json")) as fh:
        meta = json.load(fh)
    if meta.get("format") != "ivfpq-parquet-v1":
        raise ValueError(f"unknown index format in {index_dir}: {meta}")
    return IvfPqIndex(
        path=index_dir,
        centroids=spark.read.parquet(os.path.join(index_dir, "centroids")),
        codebooks=spark.read.parquet(os.path.join(index_dir, "codebooks")),
        codes=spark.read.parquet(os.path.join(index_dir, "codes")),
        meta=meta,
    )


def search_ivfpq_index(
    index: IvfPqIndex,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k over the persisted codes, probing ``n_probe`` cells per
    query. The cell filter is applied to the partitioned codes table, so
    unprobed cells never leave the parquet footer (PartitionFilters); the
    scanned bytes are ``(probed fraction) × m bytes/vector``.
    """
    cb_np = _codebook_np(index.codebooks)
    cent_rows = index.centroids.orderBy("cell").collect()
    cent_np = np.array(
        [list(map(float, r["centroid"])) for r in cent_rows], dtype=np.float64
    )
    cell_ids = [int(r["cell"]) for r in cent_rows]
    qids, qvecs = _collect_queries(queries, id_col, vec_col)
    luts = (
        _pq_luts_np(qvecs, cb_np) if qids else np.zeros((0,) + cb_np.shape[:2])
    )
    probes_by_cell: dict[int, list[int]] = {}
    probed_cells: set[int] = set()
    if qids:
        qsim = _cosine_sim_np(qvecs, cent_np)
        probe = np.argsort(-qsim, axis=1, kind="stable")[:, :n_probe]
        for qi in range(len(qids)):
            for pos in probe[qi]:
                cell = cell_ids[int(pos)]
                probes_by_cell.setdefault(cell, []).append(qi)
                probed_cells.add(cell)
    qid_type = dict(queries.dtypes)[id_col]
    schema = f"query_id {qid_type}, cand_id bigint, adist double"

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.array(pdf["codes"].tolist(), dtype=np.int64)
            cand = pdf["vid"].to_numpy()
            cells = pdf["cell"].to_numpy()
            for c in np.unique(cells):
                qis = probes_by_cell.get(int(c))
                if not qis:
                    continue
                idx = np.where(cells == c)[0]
                acc = _adc_accumulate(luts[qis], codes[idx])
                for row, qi in enumerate(qis):
                    qid = qids[qi]
                    mask = cand[idx] != qid
                    yield pd.DataFrame(
                        {
                            "query_id": [qid] * int(mask.sum()),
                            "cand_id": cand[idx][mask],
                            "adist": acc[row][mask],
                        }
                    )

    pruned = index.codes.filter(
        F.col("cell").isin(sorted(probed_cells) or [-1])
    )
    scored = pruned.mapInPandas(score, schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "cand_id",
            "adist",
            F.col("rank").cast("int").alias("rank"),
        )
    )
