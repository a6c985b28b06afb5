"""Persisted IVF-PQ vector indexes: build once, search many times.

Every declared ANN query in this repo is self-contained (it derives
centroids/codebooks/codes in the same job because the correctness harness
requires it), but a production corpus does NOT re-encode 10^11 vectors per
query batch. This module persists the three index artifacts the fused
scan needs, in the layout that makes the 100 TB search cheap:

- ``centroids/``  — (cell, centroid) parquet. Bounded quantizer metadata.
- ``codebooks/``  — (sub, code, cv) parquet. Bounded (m × ksub) metadata.
- ``codes/``      — (vid, codes) parquet laid out ``batch=<label>/cell=<c>``.
  This is the big artifact (m bytes per vector instead of dim×8) and the
  cell partitioning is the point: an ``n_probe``-cell search reads ONLY the
  probed cells' files — Spark partition pruning turns the inverted-list
  probe of FAISS into plain ``PartitionFilters`` on a parquet scan, no
  index server required. A pinned test asserts the pruning is visible in
  the executed plan. The ``batch=`` level is the append unit: each
  incremental append owns one token-keyed subdir (written with
  mode=overwrite, so a re-delivered micro-batch rewrites rather than
  duplicates) and the manifest's ``batches`` list is the visibility log
  read at load time (r14 — closes the crash-between-data-and-manifest
  double-append window the r13 advice flagged).
- ``manifest.json`` — dims/params + the committed-batches log.

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
    rotate_vectors_exact,
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
    # OPQ rotation (integer matrix, scale OPQ_RS) or None for plain PQ —
    # stored with the index because queries and appended vectors must be
    # rotated with the SAME matrix the build used (r13)
    rotation: "np.ndarray | None" = None


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
    rotation=None,
) -> IvfPqIndex:
    """Build and persist the index. ``centroids``/``codebooks`` accept
    trained tables (:func:`train_centroids_kmeans` /
    :func:`train_pq_codebooks`); the deterministic data-seeded defaults
    otherwise. The codes write is one narrow encode pass + a
    partitionBy(cell) write — no shuffle beyond the write's own file
    routing.

    ``rotation`` (r13): an OPQ integer rotation matrix (scale
    ``similarity.OPQ_RS``, e.g. from ``train_opq_pq_exact(...,
    with_rotation=True)``). The corpus is rotated BEFORE assignment and
    encoding, and the matrix is persisted as a fourth index artifact —
    searches and appends then rotate queries/new vectors with the stored
    matrix automatically, so callers never handle rotated coordinates.
    Pass codebooks trained in ROTATED space alongside (the OPQ trainer's
    cb_opq); centroids default to data-seeded over the rotated corpus."""
    spark = vectors.sparkSession
    if rotation is not None:
        rotation = np.asarray(rotation, dtype=np.int64)
        vectors = rotate_vectors_exact(vectors, rotation, id_col, vec_col)
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
    if rotation is not None:
        spark.createDataFrame(
            [(i, [int(x) for x in row]) for i, row in enumerate(rotation)],
            "i int, rv array<long>",
        ).write.mode("overwrite").parquet(
            os.path.join(index_dir, "rotation")
        )
    codes.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(index_dir, "codes", "batch=base")
    )
    meta = {
        "n_cells": n_cells,
        "m": m,
        "ksub": ksub,
        "dim": dim,
        "n_vectors": codes.count(),
        "format": "ivfpq-parquet-v2",
        "rotation": rotation is not None,
        # the mini transaction log (r13 advice): only batch subdirs listed
        # here are visible to load_ivfpq_index, so a crash between a data
        # append and its manifest commit leaves an INVISIBLE orphan dir
        # that the re-delivered batch overwrites in place
        "batches": ["base"],
    }
    with open(os.path.join(index_dir, "manifest.json"), "w") as fh:
        json.dump(meta, fh)
    return load_ivfpq_index(spark, index_dir)


def load_ivfpq_index(spark: SparkSession, index_dir: str) -> IvfPqIndex:
    with open(os.path.join(index_dir, "manifest.json")) as fh:
        meta = json.load(fh)
    if meta.get("format") not in ("ivfpq-parquet-v1", "ivfpq-parquet-v2"):
        raise ValueError(f"unknown index format in {index_dir}: {meta}")
    rotation = None
    if meta.get("rotation"):
        rows = (
            spark.read.parquet(os.path.join(index_dir, "rotation"))
            .orderBy("i")
            .collect()
        )
        rotation = np.array([r["rv"] for r in rows], dtype=np.int64)
    codes_dir = os.path.join(index_dir, "codes")
    if meta.get("format") == "ivfpq-parquet-v2":
        # Reconcile-on-load (r13 advice): read ONLY the committed batch
        # subdirs from the manifest's transaction list. An orphan
        # batch= dir from a crash between data append and manifest
        # commit is never read; its re-delivery overwrites it in place.
        codes = (
            spark.read.option("basePath", codes_dir)
            .parquet(
                *[
                    os.path.join(codes_dir, f"batch={b}")
                    for b in meta["batches"]
                ]
            )
            .drop("batch")
        )
    else:  # v1: flat cell-partitioned layout, no batch log
        codes = spark.read.parquet(codes_dir)
    return IvfPqIndex(
        path=index_dir,
        centroids=spark.read.parquet(os.path.join(index_dir, "centroids")),
        codebooks=spark.read.parquet(os.path.join(index_dir, "codebooks")),
        codes=codes,
        meta=meta,
        rotation=rotation,
    )


def _batch_label(token: str) -> str:
    """Directory-safe, collision-free label for a batch token: the token
    itself when it is already path-safe, else a sanitized form suffixed
    with a content hash so distinct tokens can never alias one dir."""
    import hashlib
    import re

    safe = re.sub(r"[^A-Za-z0-9_.-]", "_", token)
    if safe == token and token:
        return token
    return f"{safe}-{hashlib.sha1(token.encode()).hexdigest()[:10]}"


def append_ivfpq_index(
    index: IvfPqIndex,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_token: str | None = None,
) -> IvfPqIndex:
    """Incrementally maintain the persisted index (r11 verdict #8): encode
    the NEW vectors with the index's OWN frozen quantizers (existing
    centroids for the cell assignment, existing codebooks for the PQ
    codes) and APPEND them into the cell-partitioned codes table — the
    ``minhash_lsh_join`` batch-vs-corpus discipline applied to ANN. The
    append writes files only under the touched ``cell=`` partitions;
    existing code files are never read, rewritten, or moved (pinned by
    test), so maintaining a 10^11-vector index costs O(batch), not
    O(corpus).

    Because the quantizers are frozen, search-after-append is BIT-IDENTICAL
    to a full rebuild over the union corpus with the same quantizers
    (pinned by test) — the only thing that degrades is how well the old
    centroids fit the drifting data. The manifest tracks
    ``n_appended_since_train``; :func:`needs_retrain` turns it into the
    staleness rule (default: retrain once appends exceed half the corpus
    the quantizers were trained on — past that, Lloyd-optimal cells for
    the ORIGINAL distribution can be arbitrarily unbalanced for the
    union, and cell skew is the thing that serializes probes).

    Caller contract: ``new_vectors`` ids must be disjoint from the
    indexed ids (a sync pipeline dedups upstream); appends are visible to
    searches immediately via a fresh :func:`load_ivfpq_index`.

    Streaming idempotence (r13, t19): foreachBatch delivery is
    at-least-once — a crash after the data write but before the
    CHECKPOINT commit re-delivers the whole batch on restart. Passing a
    ``batch_token`` makes re-delivery a no-op: the manifest records every
    applied token, and a token already present skips the append entirely
    (the common re-delivery case, since the manifest is written in the
    same foreachBatch invocation as the data). Token UNIQUENESS is the
    caller's contract (r13 review): a bare micro-batch id collides when a
    SECOND stream feeds the same index or a recreated checkpoint restarts
    numbering at 0 — silently dropping real data. Scope the token by the
    stream's identity, e.g. ``f"{checkpoint_id}-b{batch_id}"`` (t19 does).
    The manifest keeps only the most recent 1024 tokens: Structured
    Streaming re-delivers only batches at or after the last uncommitted
    checkpoint entry, never batches 1024 commits back, so the trim cannot
    break the no-op guarantee while bounding manifest growth.
    A crash BETWEEN the parquet write and the manifest commit cannot
    double-append either (r14, closing the r13 advice item): each append
    writes an OWN ``batch=`` subdir (token-derived label, mode=overwrite)
    and the manifest's ``batches`` list is the visibility log —
    ``load_ivfpq_index`` reads only listed dirs, so the orphan from a
    crashed attempt is invisible until the re-delivered batch overwrites
    it in place and commits. This is a minimal txn-log of the kind table
    formats provide (Delta/Iceberg), scoped to exactly this append path.
    """
    meta = dict(index.meta)
    if batch_token is not None and batch_token in meta.get(
        "applied_tokens", []
    ):
        return index
    # dim check on the RAW vectors, before any rotation (r13 advice #2):
    # a wrong-dimension append must fail with this ValueError, not an
    # opaque matmul shape error inside rotate_vectors_exact's UDF
    dim = len(new_vectors.select(F.col(vec_col).alias("v")).first()["v"])
    if dim != meta["dim"]:
        raise ValueError(
            f"appended vectors have dim {dim}, index was built at "
            f"{meta['dim']}"
        )
    if index.rotation is not None:
        new_vectors = rotate_vectors_exact(
            new_vectors, index.rotation, id_col, vec_col
        )
    assign = ivf_assign_cells(
        new_vectors, index.centroids, id_col, vec_col, top_cells=1
    )
    codes = pq_encode(
        new_vectors, index.codebooks, meta["m"], id_col, vec_col
    ).join(assign.select("vid", "cell"), "vid")
    n_new = codes.count()
    if meta.get("format") == "ivfpq-parquet-v2":
        # Token-keyed batch subdir + overwrite (r13 advice #1): the data
        # write is idempotent BY PATH. Re-delivery after a crash at ANY
        # point (including between data and manifest) rewrites the same
        # batch= dir instead of appending duplicates; until the manifest
        # commit below lists the label, load_ivfpq_index never reads it.
        # "t-" prefix keeps token labels disjoint from the "base" build
        # dir and the "a<n>" counter labels of tokenless appends
        label = (
            f"t-{_batch_label(batch_token)}"
            if batch_token is not None
            else f"a{len(meta.get('batches', []))}"
        )
        codes.write.mode("overwrite").partitionBy("cell").parquet(
            os.path.join(index.path, "codes", f"batch={label}")
        )
        if label not in meta.get("batches", []):
            meta["batches"] = [*meta.get("batches", []), label]
    else:  # v1 back-compat: flat append, double-append window documented
        codes.write.mode("append").partitionBy("cell").parquet(
            os.path.join(index.path, "codes")
        )
    meta["n_vectors"] = meta["n_vectors"] + n_new
    meta["n_appended_since_train"] = (
        meta.get("n_appended_since_train", 0) + n_new
    )
    if batch_token is not None:
        meta["applied_tokens"] = [
            *meta.get("applied_tokens", []),
            batch_token,
        ][-1024:]
    with open(os.path.join(index.path, "manifest.json"), "w") as fh:
        json.dump(meta, fh)
    return load_ivfpq_index(index.codes.sparkSession, index.path)


def needs_retrain(index: IvfPqIndex, max_appended_fraction: float = 0.5) -> bool:
    """Staleness rule for the frozen quantizers: True once the appended
    volume exceeds ``max_appended_fraction`` of the corpus the quantizers
    were trained on. The retrain itself is :func:`build_ivfpq_index` with
    freshly trained centroids/codebooks over the union — a full rewrite,
    which is exactly why it is rule-triggered instead of per-append."""
    appended = index.meta.get("n_appended_since_train", 0)
    trained_on = index.meta["n_vectors"] - appended
    return appended > max_appended_fraction * max(trained_on, 1)


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
    if index.rotation is not None:
        queries = rotate_vectors_exact(
            queries, index.rotation, id_col, vec_col
        )
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
