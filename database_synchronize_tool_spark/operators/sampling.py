"""Corpus sampling operators shared by the declared queries and the
curation pipeline — ONE implementation per formula, so the oracle-graded
builder and the pipeline stage cannot drift apart (round-7 review
finding: the temperature-sample math existed in two copies)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Knuth's 2^32 golden-ratio multiplier: the portable deterministic draw
# every sampling operator in the engine uses (cf. deterministic_sample).
KNUTH_MULT = 2654435761
HASH_MOD = 4294967296


def temperature_sample(
    df: DataFrame,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based stratum resampling at alpha = 0.5: target share of
    stratum s ∝ p_s^alpha — the standard multilingual softening between
    proportional (alpha=1) and equal-share (alpha=0). Per-row keep rate is
    ``min(1, N·w_s/Z/n_s)`` with ``w_s = sqrt(n_s/N)``; the draw is the
    portable Knuth hash of ``id_col`` so the sample is engine-independent
    and re-runnable. The stratum-weight normalizer Z accumulates through
    DECIMAL so summation order cannot perturb the double result. Scale
    shape: one tiny per-stratum aggregate (broadcast) + a NARROW filter —
    no window, no per-stratum sort. Returns the input rows that survive,
    all columns intact."""
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_s"))
    n = df.agg(F.count(F.lit(1)).alias("n_docs"))
    w = counts.crossJoin(F.broadcast(n)).withColumn(
        "w", F.sqrt(F.col("n_s").cast("double") / F.col("n_docs"))
    )
    z = w.agg(
        F.sum(F.col("w").cast("decimal(28,12)")).cast("double").alias("z")
    )
    rate = F.least(
        F.lit(1.0), F.col("n_docs") * F.col("w") / F.col("z") / F.col("n_s")
    )
    bucket = (
        (F.col(id_col) * F.lit(KNUTH_MULT)) % F.lit(HASH_MOD)
    ).cast("double") / F.lit(float(HASH_MOD))
    return (
        df.join(F.broadcast(w), strata_col)
        .crossJoin(F.broadcast(z))
        .filter(bucket < rate)
        .select(*df.columns)
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Deterministic per-group cap (RefinedWeb/C4-style host capping): keep
    at most ``k`` rows per ``group_col``, selected by md5-hash order over
    ``id_col`` with the id itself as the unique tiebreak — a stable "random"
    subset that never changes across reruns or partitionings.

    Scale: one rank window PARTITIONED by the group (no global sort); the
    cap bounds every partition's output, and AQE splits a mega-group's
    skewed window partition. Same selection rule as the graded
    ``curation_source_cap`` query.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string").cast("binary")), id_col
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )
