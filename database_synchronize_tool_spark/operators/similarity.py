"""Similarity search over embedding columns (``array<float>``).

Two regimes:

- ``bruteforce_topk``: exact cosine top-k. Queries × candidates cross join —
  correct baseline, and the right choice whenever the *query* set is small:
  broadcast the queries, stream the candidate table once, per-partition
  partial top-k via the ranking window. Cost O(|Q|·N) but only one scan of N.
- ``lsh_bucket_topk``: random-hyperplane LSH. Each vector maps to a sign
  bucket over H deterministic pseudo-random hyperplanes; top-k runs within a
  query's bucket only. At 100 TB: bucket is a plain equi-join key (shuffle or
  broadcast of bucketed queries), recall tuned by H and multi-probe.
- ``lsh_multiprobe_topk``: the recall knob made real — probe the query's own
  bucket plus Hamming-1 neighbor buckets (query-side explode only; the
  candidate table stays single-bucketed, the join stays an equi-join).

Hyperplanes are derived from an integer LCG (Knuth multiplier) so the oracle
can reproduce them literally — no RNG state, no driver-side arrays shipped.
All vector math is built-in higher-order functions (JVM, codegen).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from database_synchronize_tool_spark.functions.vectors import as_double, cosine_pairs

LSH_PLANES = 8
LCG_MULT = 2654435761  # Knuth's 2^32 golden-ratio multiplier
LCG_MOD = 4294967296


def _plane_component(plane: int, dim: Column) -> Column:
    """Deterministic pseudo-random plane component in [-0.5, 0.5)."""
    idx = (F.lit(plane) * 4096 + dim).cast("bigint")
    return ((idx * F.lit(LCG_MULT)) % F.lit(LCG_MOD)) / F.lit(float(LCG_MOD)) - 0.5


def lsh_bucket(vec: Column) -> Column:
    """Sign-bit bucket id over LSH_PLANES hyperplanes."""
    def plane_fn(p: int):
        # factory (not default-arg capture): a 2-param lambda would be bound
        # as transform's (element, index) form with the wrong semantics
        return lambda d: _plane_component(p, d)

    v = as_double(vec)
    bucket = F.lit(0).cast("bigint")
    for p in range(LSH_PLANES):
        dot_p = F.aggregate(
            F.zip_with(
                v,
                F.transform(F.sequence(F.lit(0), F.size(v) - 1), plane_fn(p)),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot_p > 0, F.lit(1 << p)).otherwise(0)
    return bucket


def bruteforce_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query (excluding self). Queries broadcast;
    ranking window tiebreaks on candidate id for determinism."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = candidates.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("sim", cosine_pairs(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "sim", F.col("rank").cast("int").alias("rank"))
    )


def lsh_bucket_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    Same output shape as bruteforce_topk; recall < 1 by construction (tested
    against the exact baseline). The bucket equi-join replaces the cross
    join — the step that makes this survive a 100× scale-up.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_bucket(F.col(vec_col)).alias("bucket"),
    )
    c = candidates.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket(F.col(vec_col)).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("sim", cosine_pairs(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "sim", F.col("rank").cast("int").alias("rank"))
    )


def lsh_multiprobe_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    probes: int = LSH_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe LSH top-k: each query probes its own bucket plus the
    ``probes`` Hamming-1 neighbor buckets (one sign bit flipped per probe).

    Near-miss neighbors land in buckets that differ by exactly one hyperplane
    sign, so probing those recovers most of the recall lost to bucketing at
    ~(probes+1)× the candidate cost — far cheaper than halving LSH_PLANES
    (which doubles every bucket's population). The probe expansion is an
    ``explode`` on the (small, broadcast) query side only; the candidate table
    keeps exactly one bucket per vector, so the join stays a bucket equi-join
    and each (query, candidate) pair appears at most once (probe buckets of a
    query are pairwise distinct). Recall ≥ the single-bucket variant by
    construction — the candidate pool is a superset (unit-tested against the
    exact baseline).
    """
    if not 0 <= probes <= LSH_PLANES:
        raise ValueError(f"probes must be in [0, {LSH_PLANES}], got {probes}")
    q0 = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_bucket(F.col(vec_col)).alias("bucket0"),
    )
    probe_buckets = [F.col("bucket0")] + [
        F.col("bucket0").bitwiseXOR(F.lit(1 << p)) for p in range(probes)
    ]
    q = q0.withColumn("bucket", F.explode(F.array(*probe_buckets))).drop("bucket0")
    c = candidates.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket(F.col(vec_col)).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("sim", cosine_pairs(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "sim", F.col("rank").cast("int").alias("rank"))
    )


def ivf_assign_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    top_cells: int = 1,
) -> DataFrame:
    """Assign each vector to its ``top_cells`` nearest centroids by cosine.

    ``centroids`` is small by construction (|cells| ≪ N) and broadcasts; the
    assignment is one narrow pass over the vector table — per-row argmax
    against the broadcast list, no shuffle of the big side. Ties break on
    centroid id for determinism. Returns (id, vec, cell, cell_rank).
    """
    v = vectors.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
    c = centroids.select(
        F.col("cell").alias("cell"), F.col("centroid").alias("cv")
    )
    scored = v.crossJoin(F.broadcast(c)).withColumn(
        "csim", cosine_pairs(F.col("v"), F.col("cv"))
    )
    w = Window.partitionBy("vid").orderBy(F.col("csim").desc(), F.col("cell"))
    return (
        scored.withColumn("cell_rank", F.row_number().over(w))
        .filter(F.col("cell_rank") <= top_cells)
        .select("vid", "v", "cell", F.col("cell_rank").cast("int").alias("cell_rank"))
    )


def seed_centroids(
    candidates: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse quantizer: the ``n_cells`` smallest-id vectors
    act as centroids (cell = their rank by id). Zero RNG state, so the
    DuckDB oracle reproduces the quantizer literally. At corpus scale swap
    in k-means-trained centroids (e.g. pyspark.ml KMeans over a sample) —
    every downstream step is unchanged: the IVF contract only needs a small
    deterministic (cell, centroid) table."""
    w = Window.orderBy(F.col(id_col))
    # global sort over n_cells seed rows only: the filter keeps the smallest
    # ids via one pass (at scale, seed from a sample or a known id range)
    seeds = candidates.select(F.col(id_col).alias("sid"), F.col(vec_col).alias("centroid"))
    smallest = seeds.orderBy("sid").limit(n_cells)
    return smallest.select(
        (F.row_number().over(Window.orderBy("sid")) - 1).alias("cell"),
        "centroid",
    )


# Hard ceiling on rows entering a k-means trainer. Training canonicalizes the
# sample to ONE partition for seed determinism, so a caller passing the full
# corpus without `sample_mod` would silently single-thread (and eventually
# OOM) the fit. Past the ceiling we refuse instead.
TRAIN_MAX_ROWS = 100_000


def _training_sample(
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    sample_mod: int | None,
) -> DataFrame:
    """Hash-deterministic training sample with a size guard.

    ``xxhash64(id) % sample_mod == 0`` keeps ~1/sample_mod of the corpus
    regardless of partitioning (unlike ``DataFrame.sample``, whose draw
    depends on the partition layout). Raises if the resulting training set
    exceeds TRAIN_MAX_ROWS — the canonical-layout step would otherwise
    coalesce the whole corpus to one partition silently.
    """
    data = candidates.select(
        F.col(id_col).alias("sid"), as_double(F.col(vec_col)).alias("v")
    )
    if sample_mod is not None and sample_mod > 1:
        data = data.filter(
            F.pmod(F.xxhash64(F.col("sid")), F.lit(sample_mod)) == 0
        )
    n = data.count()
    if n > TRAIN_MAX_ROWS:
        raise ValueError(
            f"k-means training set has {n} rows > TRAIN_MAX_ROWS="
            f"{TRAIN_MAX_ROWS}; pass sample_mod to subsample the corpus "
            "(training coalesces to one partition for seed determinism)"
        )
    return data


def train_centroids_kmeans(
    candidates: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_mod: int | None = None,
) -> DataFrame:
    """K-means-trained coarse quantizer: the quality upgrade over
    :func:`seed_centroids` (whose smallest-id seeds carry no information
    about the vector distribution — seed quality drives IVF recall at
    corpus scale).

    Deterministic end-to-end: a fixed KMeans ``seed`` plus an optional
    **hash-deterministic** training sample — ``xxhash64(id) % sample_mod
    == 0`` keeps ~1/sample_mod of the corpus regardless of partitioning,
    so the same ids train on every run and every cluster size (unlike
    ``DataFrame.sample``, whose draw depends on the partition layout). At
    100 TB you train on the sample (k-means cost is |sample|·k·iters,
    driver holds only k centers) and assign the full corpus with the same
    broadcast-argmax pass as any other centroid table. Output matches the
    ``(cell, centroid)`` contract, so every downstream IVF step is
    unchanged."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    data = _training_sample(candidates, id_col, vec_col, sample_mod)
    # canonical layout for the trainer: KMeans' k-means|| init draws from a
    # per-partition RNG, so the same seed on a different partitioning yields
    # different centers. Sorting by id and collapsing the (small) training
    # sample to one partition pins the draw — training is reproducible no
    # matter how the input arrived partitioned.
    feats = (
        data.orderBy("sid")
        .coalesce(1)
        .select(array_to_vector(F.col("v")).alias("features"))
    )
    model = KMeans(k=n_cells, seed=seed, featuresCol="features").fit(feats)
    rows = [
        (i, [float(x) for x in center])
        for i, center in enumerate(model.clusterCenters())
    ]
    return candidates.sparkSession.createDataFrame(
        rows, "cell int, centroid array<double>"
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: coarse-quantize the candidate
    table into ``n_cells`` cells, probe each query's ``n_probe`` nearest
    cells, exact cosine top-k within the probed cells only.

    The classic ANN scale shape complementing sign-LSH: candidate work per
    query is ~``n_probe/n_cells`` of the corpus, the cell equi-join replaces
    the cross join, and recall is tuned by ``n_probe`` (monotone — probing
    more cells only grows the candidate pool; unit-tested). Candidates are
    assigned to exactly one cell (their inverted file); queries fan out to
    ``n_probe`` cells on the broadcast side only.

    ``centroids`` overrides the quantizer: pass a ``(cell, centroid)``
    table — e.g. from :func:`train_centroids_kmeans` — to trade the
    oracle-reproducible smallest-id seeds for trained cells with better
    recall at equal ``n_probe`` (tested). Default stays ``seed_centroids``
    so the declared query remains literally reproducible in SQL.
    """
    cents = (
        centroids
        if centroids is not None
        else seed_centroids(candidates, n_cells, id_col, vec_col)
    )
    cand_cells = ivf_assign_cells(candidates, cents, id_col, vec_col, top_cells=1)
    c = cand_cells.select(
        F.col("vid").alias("cand_id"), F.col("v").alias("cv"), "cell"
    )
    q_cells = ivf_assign_cells(queries, cents, id_col, vec_col, top_cells=n_probe)
    q = q_cells.select(
        F.col("vid").alias("query_id"), F.col("v").alias("qv"), "cell"
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("sim", cosine_pairs(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "sim", F.col("rank").cast("int").alias("rank"))
    )


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    probes: int = 0,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above ``threshold``, blocked to
    bound the pair count. Without a natural block column the sign-LSH bucket
    becomes the block: same equi-join shape (a bucket collision is required
    for a candidate pair), so the unblocked call can never degenerate to the
    O(n²) inequality-only self-join. Bucketing loses cross-bucket pairs —
    ``probes > 0`` (LSH mode only) recovers them the multi-probe way: one
    side of the self-join additionally probes its Hamming-1 neighbor
    buckets, so pairs whose buckets differ by ≤1 sign bit become candidates
    too, at (probes+1)× the left side's rows — still an equi-join, recall ≥
    the unprobed call by construction (superset candidate set; unit-tested).
    """
    if block_col is not None and probes:
        raise ValueError("probes apply only to the LSH-bucketed (unblocked) mode")
    if not 0 <= probes <= LSH_PLANES:
        raise ValueError(f"probes must be in [0, {LSH_PLANES}], got {probes}")
    base = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        (
            F.col(block_col) if block_col else lsh_bucket(F.col(vec_col))
        ).alias("blk"),
    )
    a = base.alias("a")
    if probes:
        probe_buckets = [F.col("blk")] + [
            F.col("blk").bitwiseXOR(F.lit(1 << p)) for p in range(probes)
        ]
        a = (
            base.withColumn("blk_probe", F.explode(F.array(*probe_buckets)))
            .drop("blk")
            .withColumnRenamed("blk_probe", "blk")
            .alias("a")
        )
    b = base.alias("b")
    cond = (F.col("a.blk") == F.col("b.blk")) & (F.col("a.vid") < F.col("b.vid"))
    pairs = (
        a.join(b, cond)
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
        )
    )
    if probes:
        # a pair can collide twice (a probes b's bucket AND shares its own);
        # dedupe on ids before the verify so each pair is scored once
        pairs = pairs.dropDuplicates(["vec_a", "vec_b"])
    return (
        pairs.withColumn("sim", cosine_pairs(F.col("va"), F.col("vb")))
        .filter(F.col("sim") >= threshold)
        .select("vec_a", "vec_b", "sim")
    )


# --- product quantization (PQ) ---------------------------------------------
#
# The memory-side complement to IVF: instead of pruning WHICH candidates are
# scored (inverted files), PQ shrinks WHAT is scored — each vector becomes m
# small codes (one byte each at ksub<=256), and query-candidate distance is
# approximated from per-subvector lookup tables (ADC, asymmetric distance
# computation). At 100 TB the IVF+PQ stack is the canonical ANN layout: codes
# are ~dim*4/m bytes smaller than raw float vectors, so candidate lists stay
# cache-resident; the LUT join below is the distributed form of the classic
# in-memory table scan.

PQ_M = 4  # subvectors per vector
PQ_KSUB = 16  # codebook entries per subvector


def _subvec(v: Column, sub: Column, m: int) -> Column:
    """Subvector ``sub`` (0-based) of ``v`` split into ``m`` equal slices."""
    dsub = (F.size(v) / m).cast("int")
    return F.slice(v, sub * dsub + F.lit(1), dsub)


def _codebooks_from_seeds(seeds: DataFrame, ksub: int, m: int) -> DataFrame:
    """(sid, v) rows → (sub, code, cv) codebooks from the ksub smallest-sid
    vectors' subvector slices (zero RNG — SQL-reproducible)."""
    smallest = seeds.orderBy("sid").limit(ksub)
    coded = smallest.select(
        (F.row_number().over(Window.orderBy("sid")) - 1).alias("code"), "v"
    )
    return coded.select(
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        "code",
        "v",
    ).select("sub", "code", _subvec(F.col("v"), F.col("sub"), m).alias("cv"))


def pq_codebooks(
    candidates: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic data-seeded PQ codebooks: the ``ksub`` smallest-id
    vectors donate their subvectors as code entries (the seed_centroids
    pattern — zero RNG, so the DuckDB oracle rebuilds the codebooks
    literally; swap in per-subvector k-means for trained quality, the
    (sub, code, cv) contract is unchanged). Output: m*ksub tiny rows."""
    seeds = candidates.select(
        F.col(id_col).alias("sid"), as_double(F.col(vec_col)).alias("v")
    )
    return _codebooks_from_seeds(seeds, ksub, m)


def pq_encode(
    vectors: DataFrame,
    codebooks: DataFrame,
    m: int = PQ_M,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector as ``m`` nearest-code ids (squared-L2 per
    subvector). One explode to (vid, sub) rows, one broadcast join against
    the m*ksub codebook, argmin via min(struct(dist, code)) — a map-side
    combined aggregate, no window sort — then codes re-assembled in
    subvector order. N*m*ksub distance evaluations, the irreducible PQ
    encode cost, all Arrow-vectorized; the big side never shuffles wide
    rows (the raw vector stays behind, only (vid, sub, subvector) moves).
    Output: (vid, codes array<int>)."""
    from database_synchronize_tool_spark.functions.vectors import l2_sq_pairs

    v = vectors.select(
        F.col(id_col).alias("vid"), as_double(F.col(vec_col)).alias("v")
    )
    sv = v.select(
        "vid",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        F.col("v"),
    ).select("vid", "sub", _subvec(F.col("v"), F.col("sub"), m).alias("sv"))
    scored = sv.join(F.broadcast(codebooks), "sub").select(
        "vid",
        "sub",
        "code",
        l2_sq_pairs(F.col("sv"), F.col("cv")).alias("dist"),
    )
    best = scored.groupBy("vid", "sub").agg(
        F.min(F.struct("dist", "code"))["code"].alias("code")
    )
    return best.groupBy("vid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "code"))),
            lambda s: s["code"],
        ).alias("codes")
    )


def train_pq_codebooks(
    candidates: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_mod: int | None = None,
) -> DataFrame:
    """Per-subvector k-means-trained PQ codebooks: the quality upgrade over
    the data-seeded :func:`pq_codebooks` (whose smallest-id seeds carry no
    information about the subvector distribution — codebook quality drives
    ADC recall, exactly as centroid quality drives IVF recall).

    Mirrors :func:`train_centroids_kmeans`: hash-deterministic sample via
    ``sample_mod`` (with the same TRAIN_MAX_ROWS guard), canonical sorted
    single-partition layout so a fixed ``seed`` reproduces the same centers
    on any cluster, one KMeans fit per subvector (m fits of ksub centers
    each — driver holds only m*ksub small arrays). Output matches the
    ``(sub, code, cv)`` contract of :func:`pq_codebooks`, so
    :func:`pq_encode` / :func:`pq_adc_topk` / :func:`ivf_pq_topk` work
    unchanged with either codebook source.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    data = _training_sample(candidates, id_col, vec_col, sample_mod)
    canonical = data.orderBy("sid").coalesce(1).persist()
    rows = []
    try:
        for sub in range(m):
            feats = canonical.select(
                array_to_vector(_subvec(F.col("v"), F.lit(sub), m)).alias(
                    "features"
                )
            )
            # distinct seed per subvector: identical seeds on near-identical
            # subvector distributions would correlate the codebooks
            model = KMeans(k=ksub, seed=seed + sub, featuresCol="features").fit(
                feats
            )
            rows.extend(
                (sub, code, [float(x) for x in center])
                for code, center in enumerate(model.clusterCenters())
            )
    finally:
        canonical.unpersist()
    return candidates.sparkSession.createDataFrame(
        rows, "sub int, code int, cv array<double>"
    )


def _pq_lut(
    queries: DataFrame,
    codebooks: DataFrame,
    m: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """ADC lookup table: (query_id, sub, code, pdist) — squared-L2 between
    each query subvector and each codebook entry. |Q|*m*ksub tiny rows,
    always broadcast by callers."""
    from database_synchronize_tool_spark.functions.vectors import l2_sq_pairs

    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    qsub = q.select(
        "query_id",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        F.col("qv"),
    ).select("query_id", "sub", _subvec(F.col("qv"), F.col("sub"), m).alias("qsv"))
    return qsub.join(F.broadcast(codebooks), "sub").select(
        "query_id",
        "sub",
        "code",
        l2_sq_pairs(F.col("qsv"), F.col("cv")).alias("pdist"),
    )


def ivf_pq_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """The composed IVF+PQ stack — the canonical ANN layout at 100 TB: IVF
    prunes WHO gets scored (each query touches ~n_probe/n_cells of the
    corpus), PQ shrinks WHAT is scored (m byte codes + LUT adds instead of a
    full-dimension dot product). :func:`pq_adc_topk` alone ADC-scores all N
    candidates; this operator cell-prunes first, so the ADC aggregate sees
    ``n_probe/n_cells · N`` code rows instead of N.

    Index build (one-time, linear): assign every candidate to its nearest
    cell (broadcast-centroid argmax, no shuffle of the big side) and
    PQ-encode it (explode + broadcast-codebook argmin). Query path: queries
    fan out to ``n_probe`` cells on the broadcast side, the cell equi-join
    selects survivors, survivors' codes hash-join the broadcast LUT and
    re-aggregate to decimal-exact ADC sums. Two equi-joins, zero cross
    joins on the big side. ``centroids`` / ``codebooks`` override the
    deterministic data-seeded defaults with trained tables
    (:func:`train_centroids_kmeans` / :func:`train_pq_codebooks`) — every
    downstream step is unchanged.
    """
    cents = (
        centroids
        if centroids is not None
        else seed_centroids(candidates, n_cells, id_col, vec_col)
    )
    cb = codebooks if codebooks is not None else pq_codebooks(
        candidates, m, ksub, id_col, vec_col
    )
    # index build: (cand_id, cell, codes) — both passes are linear in N
    cand_cells = ivf_assign_cells(
        candidates, cents, id_col, vec_col, top_cells=1
    ).select(F.col("vid").alias("cand_id"), "cell")
    enc = pq_encode(candidates, cb, m, id_col, vec_col).select(
        F.col("vid").alias("cand_id"), "codes"
    )
    index = cand_cells.join(enc, "cand_id")
    # query path: prune WHO (cell equi-join) ...
    q_cells = ivf_assign_cells(
        queries, cents, id_col, vec_col, top_cells=n_probe
    ).select(F.col("vid").alias("query_id"), "cell")
    surv = index.join(F.broadcast(q_cells), "cell").filter(
        F.col("cand_id") != F.col("query_id")
    )
    # ... then shrink WHAT (m LUT lookups per survivor)
    lut = _pq_lut(queries, cb, m, id_col, vec_col)
    codes = surv.select(
        "query_id", "cand_id", F.posexplode("codes").alias("sub", "code")
    )
    adist = codes.join(F.broadcast(lut), ["query_id", "sub", "code"]).groupBy(
        "query_id", "cand_id"
    ).agg(
        F.sum(F.col("pdist").cast("decimal(28,12)")).cast("double").alias("adist")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adist").asc(), F.col("cand_id"))
    return (
        adist.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "adist", F.col("rank").cast("int").alias("rank"))
    )


def _residual(v: Column, c: Column) -> Column:
    """Element-wise v − c (both array<double>)."""
    return F.zip_with(v, c, lambda x, y: x - y)


def ivf_pq_residual_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Residual-encoded IVF+PQ — the geometry production IVF-PQ indexes
    actually quantize: each candidate stores PQ codes of its RESIDUAL
    ``v − centroid(cell)``, and the identity ``‖q−c‖² = ‖(q−ccv)−(c−ccv)‖²``
    lets ADC run on residuals with a per-(query, probed-cell) LUT. Residuals
    concentrate around the origin regardless of which cell a vector lives
    in, so a codebook TRAINED on residuals spends its ksub^m capacity on
    what the coarse quantizer left behind — the reason production IVF-PQ
    encodes residuals. With the deterministic data-SEEDED codebooks used
    for oracle reproducibility the recall ordering vs the raw-vector
    composition is corpus-dependent (measured both ways on the two test
    tables), so no comparative recall claim is pinned; correctness is
    pinned by the bit-exact SQL oracle and the structural tests
    (probed-cell restriction, determinism).

    Scale shape is unchanged from :func:`ivf_pq_topk` — linear index build,
    cell equi-join prune, broadcast-LUT ADC — with one difference: the LUT
    is |Q|·n_probe·m·ksub rows (one slab per probed cell, since the query's
    residual depends on the cell) — still tiny, still broadcast. Codebooks
    are seeded from the ksub smallest-id vectors' residuals (deterministic,
    SQL-reproducible)."""
    cents = (
        centroids
        if centroids is not None
        else seed_centroids(candidates, n_cells, id_col, vec_col)
    )
    cents2 = cents.select("cell", as_double(F.col("centroid")).alias("ccv"))
    # index build: every candidate's residual vs its own cell, PQ-encoded
    cand_assign = ivf_assign_cells(candidates, cents, id_col, vec_col, top_cells=1)
    cand_res = cand_assign.join(F.broadcast(cents2), "cell").select(
        "vid", "cell", _residual(as_double(F.col("v")), F.col("ccv")).alias("v")
    )
    cb = _codebooks_from_seeds(
        cand_res.select(F.col("vid").alias("sid"), "v"), ksub, m
    )
    enc = pq_encode(cand_res, cb, m, id_col="vid", vec_col="v")
    index = cand_assign.select(F.col("vid").alias("cand_id"), "cell").join(
        enc.select(F.col("vid").alias("cand_id"), "codes"), "cand_id"
    )
    # query path: residual per PROBED cell (not the query's own cell)
    q_cells = ivf_assign_cells(queries, cents, id_col, vec_col, top_cells=n_probe)
    q_res = q_cells.join(F.broadcast(cents2), "cell").select(
        F.col("vid").alias("query_id"),
        "cell",
        _residual(as_double(F.col("v")), F.col("ccv")).alias("qv"),
    )
    qsub = q_res.select(
        "query_id",
        "cell",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        F.col("qv"),
    ).select(
        "query_id", "cell", "sub", _subvec(F.col("qv"), F.col("sub"), m).alias("qsv")
    )
    from database_synchronize_tool_spark.functions.vectors import l2_sq_pairs

    lut = qsub.join(F.broadcast(cb), "sub").select(
        "query_id",
        "cell",
        "sub",
        "code",
        l2_sq_pairs(F.col("qsv"), F.col("cv")).alias("pdist"),
    )
    surv = index.join(
        F.broadcast(q_res.select("query_id", "cell")), "cell"
    ).filter(F.col("cand_id") != F.col("query_id"))
    codes = surv.select(
        "query_id", "cand_id", "cell", F.posexplode("codes").alias("sub", "code")
    )
    adist = codes.join(
        F.broadcast(lut), ["query_id", "cell", "sub", "code"]
    ).groupBy("query_id", "cand_id").agg(
        F.sum(F.col("pdist").cast("decimal(28,12)")).cast("double").alias("adist")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adist").asc(), F.col("cand_id"))
    return (
        adist.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "adist", F.col("rank").cast("int").alias("rank"))
    )


def pq_adc_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k by asymmetric distance: candidates are PQ codes,
    queries stay exact; distance ≈ Σ_sub LUT[sub][code] where LUT holds the
    query-subvector-to-code squared-L2 distances.

    Scale shape: the LUT is |Q|*m*ksub rows (tiny — broadcast); candidates
    expand to N*m code rows that hash-join the LUT and re-aggregate to
    (query, cand) sums — per-candidate work is m lookups + one add, never a
    full-dimension dot product, which is the entire point of PQ. The sum
    runs through DECIMAL so partial-order can't perturb the double result.
    Ranking tiebreaks on cand_id; rank ascends with distance."""
    cb = codebooks if codebooks is not None else pq_codebooks(
        candidates, m, ksub, id_col, vec_col
    )
    enc = pq_encode(candidates, cb, m, id_col, vec_col)
    cand_codes = enc.select(
        F.col("vid").alias("cand_id"),
        F.posexplode("codes").alias("sub", "code"),
    )
    lut = _pq_lut(queries, cb, m, id_col, vec_col)
    joined = cand_codes.join(F.broadcast(lut), ["sub", "code"])
    adist = joined.groupBy("query_id", "cand_id").agg(
        F.sum(F.col("pdist").cast("decimal(28,12)")).cast("double").alias("adist")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adist").asc(), F.col("cand_id"))
    return (
        adist.filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "adist", F.col("rank").cast("int").alias("rank"))
    )
