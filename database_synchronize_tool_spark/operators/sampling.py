"""Corpus sampling operators shared by the declared queries and the
curation pipeline — ONE implementation per formula, so the oracle-graded
builder and the pipeline stage cannot drift apart (round-7 review
finding: the temperature-sample math existed in two copies)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType

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


# --- DSIR-style importance selection (r13; Xie et al. NeurIPS 2023,
# "Data Selection for Language Models via Importance Resampling" — public
# literature), on the integer grid so the DuckDB oracle replays scoring
# bit-identically.
DSIR_BUCKETS = 1024  # hashed-bigram feature space
DSIR_SCALE = 2**20  # fixed-point scale of the per-bucket ratio terms

_DSIR_PRIME = 2147483647
_DSIR_COMBINE = 1000003


@F.pandas_udf(ArrayType(IntegerType()))
def word_bigram_buckets(texts: pd.Series) -> pd.Series:
    """Per doc, the hashed word-bigram bucket of EVERY bigram occurrence
    (non-distinct — the feature is a count vector). Same portable word
    hashing as word_shingle_features: lowercase split on
    non-alphanumerics, Horner poly-31 mod p per word, bigram =
    (h1*1000003 + h2) mod p, bucket = bigram mod DSIR_BUCKETS."""
    import re

    p, base, nb = _DSIR_PRIME, _DSIR_COMBINE, DSIR_BUCKETS
    out = []
    for t in texts:
        words = (
            [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]
            if t is not None
            else []
        )
        if len(words) < 2:
            out.append([])
            continue
        hw = np.empty(len(words), dtype=np.int64)
        for i, word in enumerate(words):
            h = 0
            for c in word:
                h = (h * 31 + ord(c)) % p
            hw[i] = h
        bg = (hw[:-1] * base + hw[1:]) % p
        out.append((bg % nb).astype(np.int32).tolist())
    return pd.Series(out)


def dsir_topk(
    docs: DataFrame,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_mod: int = 7,
    target_rem: int = 0,
) -> DataFrame:
    """DSIR-style hashed-ngram importance selection: score every document
    by how much its hashed word-bigram distribution looks like a TARGET
    set's distribution relative to the raw corpus, take the top-k — the
    published recipe for matching pretraining data to a quality domain
    without training a classifier. Target = the ``doc_id % 7 == 0`` slice
    (the repo's held-out convention, same as decontamination); real
    deployments pass their curated target here.

    Cross-engine-exact departure from the paper, documented: DSIR weights
    are log-likelihood ratios ``Σ c_b·ln(p_t[b]/p_r[b])`` and ln is not
    bit-reproducible across engines (neither Java's Math.log nor C's
    std::log is required to be correctly rounded, and a 1-ulp divergence
    breaks value-hash grading). The score here is the LINEAR-ratio sum on
    a fixed-point grid:

        term[b] = floor(SCALE · (ct[b]+1) · (Nr+B) / ((cr[b]+1) · (Nt+B)))
        score   = Σ_occurrences term[bucket]      (integers end to end)

    — add-one-smoothed ``p_t/p_r`` per bucket, scaled and floored once,
    then summed exactly. Monotone in each bucket ratio (the ordering
    agrees with log-DSIR when per-doc bucket ratios are on the same side
    of 1; it up-weights strong positive evidence more than log does),
    deterministic, and HUGEINT-safe in the oracle. ``score_norm`` divides
    by the doc's bigram count (integer floor) to remove the length bias
    both formulations share; ranking uses (score_norm, score, doc_id).

    Scale shape: one vectorized featurize pass, two 1024-row global
    aggregates (target + raw bucket counts — bounded index metadata,
    collected and folded into a broadcast term table), one scoring map
    with NO shuffle (the term table rides into the UDF closure), and a
    TakeOrderedAndProject top-k. The corpus never shuffles."""
    from pyspark.sql.types import LongType

    from database_synchronize_tool_spark.caching import scoped_persist

    feats = scoped_persist(
        docs.select(
            F.col(id_col).alias("doc_id"),
            word_bigram_buckets(F.col(text_col)).alias("bks"),
        )
    )
    ex = feats.select("doc_id", F.explode("bks").alias("b"))
    raw_rows = ex.groupBy("b").count().collect()
    tgt_rows = (
        ex.filter(F.col("doc_id") % target_mod == target_rem)
        .groupBy("b")
        .count()
        .collect()
    )
    cr = {int(r["b"]): int(r["count"]) for r in raw_rows}
    ct = {int(r["b"]): int(r["count"]) for r in tgt_rows}
    n_raw, n_tgt = sum(cr.values()), sum(ct.values())
    nb, scale = DSIR_BUCKETS, DSIR_SCALE
    # exact Python-int terms (arbitrary precision; the oracle uses HUGEINT)
    term = np.zeros(nb, dtype=np.int64)
    for b in range(nb):
        tv = (
            scale * (ct.get(b, 0) + 1) * (n_raw + nb)
        ) // ((cr.get(b, 0) + 1) * (n_tgt + nb))
        # int64-wrap guard (r13 review): the oracle sums in HUGEINT, the
        # scoring UDF in numpy int64 — fail FAST instead of silently
        # diverging. Bound: raw counts include the target, so tv <=
        # SCALE*(Nr+B)/(Nt+B); with tv < 2^40 any doc under 2^23 bigram
        # occurrences (the score_udf assert) sums below 2^63.
        if tv >= 2**40:
            raise ValueError(
                f"dsir term {tv} for bucket {b} exceeds the int64-safe "
                "scoring bound; lower DSIR_SCALE or raise the target share"
            )
        term[b] = tv
    spark = docs.sparkSession
    term_b = spark.sparkContext.broadcast(term)

    @F.pandas_udf(LongType())
    def score_udf(bks: pd.Series) -> pd.Series:
        tv = term_b.value
        out = []
        for b in bks:
            if not len(b):
                out.append(0)
                continue
            # paired with the term < 2^40 build-time guard: 2^40 * 2^23
            # < 2^63, so the int64 sum cannot wrap past this assert
            assert len(b) < 2**23, "document bigram count exceeds scoring bound"
            out.append(int(tv[np.asarray(b, dtype=np.int64)].sum()))
        return pd.Series(out)

    from pyspark.sql import Window

    scored = feats.select(
        "doc_id",
        F.size("bks").cast("bigint").alias("n_bigrams"),
        score_udf(F.col("bks")).alias("score"),
    ).withColumn(
        # integer floor division (non-negative, so Spark's truncating div
        # == DuckDB's floor //) — never a double quotient in the ranking
        "score_norm",
        F.expr("score div greatest(n_bigrams, 1L)").cast("bigint"),
    )
    order = [
        F.col("score_norm").desc(), F.col("score").desc(), F.col("doc_id")
    ]
    w = F.row_number().over(Window.orderBy(*order))
    return (
        scored.orderBy(*order)
        .limit(k)
        .select(
            "doc_id",
            "n_bigrams",
            "score",
            "score_norm",
            w.cast("int").alias("rank"),
        )
    )
