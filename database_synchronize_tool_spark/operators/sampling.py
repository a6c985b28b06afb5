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

    Scale: per-group row numbers via ``ranks.grouped_row_numbers`` (one
    range shuffle on (group, hash, id), parallelism n_parts) — a rank
    window PARTITIONED by the group would run each group's sort in ONE
    task, and contrary to the claim this code used to make, AQE does NOT
    split a skewed WINDOW partition (skew splitting is a join/rebalance
    optimization); a mega-host under a per-host cap would single-thread
    (r11 review, same class as the r10-verdict low-NDV rank windows).
    Same selection rule as the graded ``curation_source_cap`` query.
    """
    from database_synchronize_tool_spark.operators.ranks import (
        grouped_row_numbers,
    )

    ranked = grouped_row_numbers(
        df.withColumn(
            "__h", F.md5(F.col(id_col).cast("string").cast("binary"))
        ),
        group_col,
        [F.col("__h"), F.col(id_col)],
        "__rk",
    )
    return ranked.filter(F.col("__rk") <= k).drop("__rk", "__h")


def priority_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    k: int,
    seed: str = "ps",
) -> DataFrame:
    """Priority sampling (Duffield–Lund–Thorup, JACM 2007): a
    weight-proportional sample WITHOUT replacement whose Horvitz–Thompson
    estimator is unbiased for the total weight of ANY subset predicate.
    Each row draws priority ``w / u`` with the portable uniform
    ``u = hash60(seed ⊕ id) + 1`` (the 2^60 scale constant cancels in the
    ordering); the sample is the top-k by priority, ``tau`` is the
    (k+1)-th priority, and each sampled row's HT contribution is
    ``max(w, tau)`` — summing contributions over rows matching a filter
    estimates that filter's true weight sum.

    Determinism: the only float ops are one IEEE division per row
    (bigint→double conversion is correctly rounded in both engines) and a
    greatest() comparison, so the sample and every output column are
    bit-reproducible against the SQL-oracle twin.

    Scale: top-(k+1) is a TakeOrderedAndProject — per-partition heaps of
    k+1 rows, no global sort, no shuffle beyond the k+1 survivors — and
    tau comes from a 1-row aggregate broadcast back. This is the
    bounded-state answer to "give me a weighted 10k-document sample of a
    100 TB corpus with calibrated estimates", where A-Res-style
    exponential-key sampling would need log()/pow() that cross-engine
    float semantics cannot pin.

    Returns the k sampled rows plus ``priority, smp_rank, tau,
    ht_contrib``.
    """
    from pyspark.sql import Window

    from database_synchronize_tool_spark.operators.membership import (
        seeded_hash60,
    )

    h = seeded_hash60(F.col(id_col), seed)
    pri = F.col(weight_col).cast("double") / (h + F.lit(1)).cast("double")
    topk1 = (
        df.withColumn("priority", pri)
        .orderBy(F.col("priority").desc(), F.col(id_col))
        .limit(k + 1)
    )
    w = Window.orderBy(F.col("priority").desc(), F.col(id_col))
    ranked = topk1.withColumn(
        "smp_rank", F.row_number().over(w).cast("int")
    )
    # tau = the (k+1)-th priority; 0.0 when the input has <= k rows (then
    # every row is sampled and HT contribution degenerates to the weight).
    tau = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("smp_rank") == k + 1, F.col("priority"))),
            F.lit(0.0),
        ).alias("tau")
    )
    return (
        ranked.filter(F.col("smp_rank") <= k)
        .crossJoin(F.broadcast(tau))
        .withColumn(
            "ht_contrib",
            F.greatest(F.col(weight_col).cast("double"), F.col("tau")),
        )
    )


def priority_sample_stratified(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    stratum_col: str,
    k: int,
    seed: str = "pss",
) -> DataFrame:
    """Per-stratum priority sampling: an independent Duffield–Lund–Thorup
    weighted sample of size k inside EVERY stratum, each with its own tau
    and Horvitz–Thompson contributions — the calibrated version of
    per-language / per-source corpus sampling (cf. temperature_sample,
    which resamples by stratum share but offers no estimator).

    Scale: a row_number window PARTITIONED by the stratum would run each
    stratum's sort in ONE task (strata are low-NDV: languages, sources —
    the r10-verdict straggler class), so per-stratum ranks come from
    ``ranks.grouped_row_numbers`` instead — one range shuffle on
    (stratum, priority desc, id), parallelism n_parts regardless of
    stratum count — plus a tiny per-stratum tau aggregate that broadcasts
    back. Same draw/priority formula as ``priority_sample`` so the two
    stay parity-twins of one SQL form.
    """
    from database_synchronize_tool_spark.operators.membership import (
        seeded_hash60,
    )
    from database_synchronize_tool_spark.operators.ranks import (
        grouped_row_numbers,
    )

    h = seeded_hash60(F.col(id_col), seed)
    pri = F.col(weight_col).cast("double") / (h + F.lit(1)).cast("double")
    ranked = (
        grouped_row_numbers(
            df.withColumn("priority", pri),
            stratum_col,
            [F.col("priority").desc(), F.col(id_col)],
            "__rn",
        )
        .withColumn("smp_rank", F.col("__rn").cast("int"))
        .drop("__rn")
        .filter(F.col("smp_rank") <= k + 1)
    )
    tau = ranked.groupBy(stratum_col).agg(
        F.coalesce(
            F.max(F.when(F.col("smp_rank") == k + 1, F.col("priority"))),
            F.lit(0.0),
        ).alias("tau")
    )
    return (
        ranked.filter(F.col("smp_rank") <= k)
        .join(F.broadcast(tau), stratum_col)
        .withColumn(
            "ht_contrib",
            F.greatest(F.col(weight_col).cast("double"), F.col("tau")),
        )
    )
