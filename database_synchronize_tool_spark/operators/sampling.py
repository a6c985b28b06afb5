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


def knuth_hash32(idc):
    """``(id * KNUTH_MULT) mod 2^32`` with overflow-safe modular
    multiplication (r15, advice fix): the naive ``id * 2654435761``
    product exceeds int64 for id >= ~3.47e9 — Spark (non-ANSI) silently
    wraps while ANSI engines (DuckDB) raise, a cross-engine divergence
    exactly in the billions-of-docs domain a 100-TB corpus occupies.
    Here the id is first reduced mod 2^32 (pmod, so negative ids are
    total and engine-agreed too), then split 16/16 and recombined:
    every int64 intermediate stays below 2^49. Bit-identical to the
    naive form wherever that product fits in int64, so existing graded
    hashes are unchanged."""
    a = F.pmod(idc.cast("bigint"), F.lit(HASH_MOD))
    lo = a % F.lit(65536)
    hi = F.shiftright(a, 16)
    return (
        hi * F.lit(KNUTH_MULT) % F.lit(65536) * F.lit(65536)
        + lo * F.lit(KNUTH_MULT)
    ) % F.lit(HASH_MOD)


def knuth_hash32_sql(x: str) -> str:
    """DuckDB/ANSI SQL twin of :func:`knuth_hash32` over the SQL
    expression ``x`` — same 16/16-split modular multiplication, all
    intermediates < 2^49, value-identical to Spark's column form for
    every bigint input (verified incl. >2^32, negative, 2^62)."""
    am = f"((({x} % 4294967296) + 4294967296) % 4294967296)"
    return (
        f"((({am} // 65536) * 2654435761 % 65536 * 65536"
        f" + ({am} % 65536) * 2654435761) % 4294967296)"
    )


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
    bucket = knuth_hash32(F.col(id_col)).cast("double") / F.lit(
        float(HASH_MOD)
    )
    return (
        df.join(F.broadcast(w), strata_col)
        .crossJoin(F.broadcast(z))
        .filter(bucket < rate)
        .select(*df.columns)
    )


def perplexity_buckets(
    df: DataFrame,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style language-model quality bucketing (Wenzek et al. 2020,
    public literature; r14 verdict #5): train an add-1-smoothed bigram LM
    on the TARGET slice (the repo's ``doc_id % 7`` held-out benchmark
    convention — real deployments train on their clean target corpus),
    score EVERY document by how predictable its token transitions are
    under that LM, and split each language into head/middle/tail
    terciles of the score — the standard CCNet pre-filter where "head"
    is kept outright and "tail" is the usual prune.

    Cross-engine-exact departure from the paper, same discipline as
    :func:`dsir_topk` / ``corpus_bigram_avg_prob``: perplexity is a
    monotone transform of MEAN LOG probability, but ln is not
    bit-reproducible across engines — the score here is the per-document
    MEAN smoothed transition probability ``p(w2|w1) = (C_t(w1 w2)+1) /
    (C_t(w1)+V_t)`` with counts from the target slice only, each term
    one exact-integer-ratio IEEE divide, summed through DECIMAL(28,12).
    The ordering differs from true perplexity (arithmetic vs geometric
    mean) — documented, deterministic, and engine-agreed. Docs with no
    bigrams score 0.0 (tail-bound). Buckets are exact deterministic
    terciles: rank by (score DESC, id) within language, bucket
    ``head | middle | tail`` by pure integer comparison
    ``3·(rank−1) <> k·n_lang`` — no ntile dialect, no float division.

    Scale shape: bigrams stay in-row until ONE explode; the TARGET
    bigram/context tables (vocab², language-bounded) aggregate once and
    broadcast back onto the stream with the corpus never shuffling —
    identical to the ``corpus_bigram_avg_prob`` plan; per-language
    counts are a tiny broadcast agg. The one wide op is a single
    row_number sort per language partition (the exact-tercile
    requirement); at 100 TB replace exact ranks with score-histogram
    thresholds (bounded agg, broadcast, narrow filter) at the cost of
    threshold granularity — the head/tail semantics survive."""
    from pyspark.sql import Window

    from database_synchronize_tool_spark.functions import text as TX

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        TX.tokens(F.lower(F.col(text_col))).alias("t"),
    )
    is_target = F.col("doc_id") % 7 == 0
    vocab = (
        toks.filter(is_target)
        .select(F.explode("t").alias("term"))
        .agg(F.countDistinct("term").alias("vocab"))
    )
    bigrams = F.when(
        F.size("t") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("t") - 1),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("t"), i),
                F.element_at(F.col("t"), i + 1),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    from database_synchronize_tool_spark.caching import scoped_persist

    # bg feeds the target bigram counts, the target context counts, and
    # the scoring join — persist so the corpus tokenizes + explodes once.
    bg = scoped_persist(
        toks.select("doc_id", F.explode(bigrams).alias("bg"))
    )
    tbg = bg.filter(is_target)
    tbgc = scoped_persist(
        tbg.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg"))
    )
    # context counts roll up exactly from the bigram counts — aggregate
    # the vocab²-bounded summary, not the target stream again.
    tctx = (
        tbgc.select(F.substring_index("bg", " ", 1).alias("w1"), "c_bg")
        .groupBy("w1")
        .agg(F.sum("c_bg").alias("c_w1"))
    )
    p = (F.coalesce(F.col("c_bg"), F.lit(0)) + 1).cast("double") / (
        F.coalesce(F.col("c_w1"), F.lit(0)) + F.col("vocab")
    ).cast("double")
    scored = (
        bg.join(F.broadcast(tbgc), "bg", "left")
        .join(
            F.broadcast(tctx),
            F.substring_index(F.col("bg"), " ", 1) == F.col("w1"),
            "left",
        )
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            (
                F.sum(p.cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("lm_score"),
        )
    )
    # full is read by the per-language counts AND the tercile rank join;
    # persist the narrow per-doc row (saves re-running the scoring join).
    full = scoped_persist(
        df.select(F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias(
                "n_bigrams"
            ),
            F.coalesce("lm_score", F.lit(0.0)).alias("lm_score"),
        )
    )
    n_lang = full.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lang")
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("lm_score").desc(), F.col("doc_id")
    )
    r3 = (F.row_number().over(w).cast("bigint") - 1) * 3
    return (
        full.join(F.broadcast(n_lang), "lang")
        .withColumn("r3", r3)
        .select(
            "doc_id",
            "lang",
            "n_bigrams",
            "lm_score",
            F.when(F.col("r3") < F.col("n_lang"), "head")
            .when(F.col("r3") < 2 * F.col("n_lang"), "middle")
            .otherwise("tail")
            .alias("ppl_bucket"),
        )
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
    from database_synchronize_tool_spark.caching import scoped_persist

    w = Window.orderBy(F.col("priority").desc(), F.col(id_col))
    # ranked is read twice (tau aggregate + the sample filter); it is k+1
    # rows, but each unpersisted consumer re-ran the full-table TakeOrdered
    # — persist the bounded survivors so the table is scanned once.
    ranked = scoped_persist(
        topk1.withColumn("smp_rank", F.row_number().over(w).cast("int"))
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
    from database_synchronize_tool_spark.caching import scoped_persist

    # k+1 survivors per stratum, read by the tau aggregate AND the sample
    # filter — persist so the range-shuffle rank pass runs once.
    ranked = scoped_persist(
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

    feats, cr, ct, n_raw, n_tgt = _bigram_bucket_counts(
        docs, text_col, id_col, target_mod, target_rem
    )
    # exact Python-int terms (arbitrary precision; the oracle uses
    # HUGEINT), int64-wrap guarded in _ratio_terms (r13 review): with
    # every term < 2^40 any doc under 2^23 bigram occurrences (the
    # score_udf assert) sums below 2^63. Shared with nb_quality_topk —
    # one implementation per formula.
    term = _ratio_terms(ct, cr, n_tgt, n_raw)
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


def _bigram_bucket_counts(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    target_mod: int,
    target_rem: int,
):
    """Shared featurize + bounded count step of the hashed-bigram selectors
    (DSIR, NB quality): per-doc bucket lists (scoped-persisted — the
    caller's cache_scope releases them) plus the raw/target per-bucket
    count dicts and grand totals. The two aggregates are 1024-row bounded
    index metadata; the corpus itself never shuffles."""
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
    return feats, cr, ct, sum(cr.values()), sum(ct.values())


def _ratio_terms(num_counts, den_counts, n_num: int, n_den: int) -> "np.ndarray":
    """Fixed-point add-one-smoothed ratio table shared by DSIR and NB:
    term[b] = floor(SCALE·(num[b]+1)·(n_den+B) / ((den[b]+1)·(n_num+B))),
    exact Python ints, int64-wrap guarded (the oracle replays in HUGEINT,
    the scoring UDF sums in numpy int64)."""
    nb, scale = DSIR_BUCKETS, DSIR_SCALE
    term = np.zeros(nb, dtype=np.int64)
    for b in range(nb):
        tv = (
            scale * (num_counts.get(b, 0) + 1) * (n_den + nb)
        ) // ((den_counts.get(b, 0) + 1) * (n_num + nb))
        if tv >= 2**40:
            raise ValueError(
                f"ratio term {tv} for bucket {b} exceeds the int64-safe "
                "scoring bound; lower DSIR_SCALE or rebalance the classes"
            )
        term[b] = tv
    return term


def nb_quality_topk(
    docs: DataFrame,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_mod: int = 7,
    target_rem: int = 0,
) -> DataFrame:
    """Naive-Bayes quality classifier over hashed word-bigram buckets —
    the CCNet/fastText-recipe companion to :func:`dsir_topk` (Wenzek et
    al. 2020 train a linear classifier on a quality domain vs the crawl;
    multinomial NB over hashed n-gram counts is its training-free exact
    analogue, public literature). Positive class = the ``doc_id %
    target_mod == target_rem`` slice (the repo's held-out quality-domain
    convention), negative class = THE REST — where DSIR weighs target vs
    the WHOLE raw corpus, NB weighs class vs class, so the two selectors
    genuinely differ on docs near the target share.

    Cross-engine-exact scoring, same documented departure as DSIR: the NB
    log-posterior ``Σ c_b·ln(p(b|pos)/p(b|neg))`` is replaced by the
    fixed-point LINEAR-ratio sum with add-one smoothing (ln is not
    bit-reproducible across engines; the linear form is monotone in each
    bucket ratio), integers end to end:

        term[b] = floor(SCALE·(cpos[b]+1)·(Nneg+B) / ((cneg[b]+1)·(Npos+B)))
        nb_score = Σ_occurrences term[bucket]; nb_score_norm = score div n

    ``in_dsir_topk`` marks overlap with the DSIR top-k computed over the
    SAME featurize pass (selection-agreement is the quantity a curation
    pipeline actually tunes on) — both rankings use the
    (score_norm desc, score desc, doc_id) tie-break.

    Scale shape: one vectorized featurize pass, two 1024-row bounded
    aggregates folded into TWO broadcast term tables, ONE shuffle-free
    scoring map emitting both scores, and two TakeOrderedAndProject
    top-ks joined broadcast (k×k). The corpus never shuffles."""
    from pyspark.sql import Window
    from pyspark.sql.types import LongType

    feats, cr, ct, n_raw, n_tgt = _bigram_bucket_counts(
        docs, text_col, id_col, target_mod, target_rem
    )
    cneg = {b: cr[b] - ct.get(b, 0) for b in cr}
    n_neg = n_raw - n_tgt
    nb_term = _ratio_terms(ct, cneg, n_tgt, n_neg)
    dsir_term = _ratio_terms(ct, cr, n_tgt, n_raw)
    spark = docs.sparkSession
    terms_b = spark.sparkContext.broadcast(
        np.stack([nb_term, dsir_term])
    )

    @F.pandas_udf("nb_score long, dsir_score long")
    def score2_udf(bks: pd.Series) -> pd.DataFrame:
        tv = terms_b.value
        nb_out, ds_out = [], []
        for b in bks:
            if not len(b):
                nb_out.append(0)
                ds_out.append(0)
                continue
            # paired with the term < 2^40 build-time guard: 2^40 * 2^23
            # < 2^63, so the int64 sums cannot wrap past this assert
            assert len(b) < 2**23, "document bigram count exceeds scoring bound"
            idx = np.asarray(b, dtype=np.int64)
            nb_out.append(int(tv[0][idx].sum()))
            ds_out.append(int(tv[1][idx].sum()))
        return pd.DataFrame({"nb_score": nb_out, "dsir_score": ds_out})

    scored = (
        feats.select(
            "doc_id",
            F.size("bks").cast("bigint").alias("n_bigrams"),
            score2_udf(F.col("bks")).alias("s"),
        )
        .select("doc_id", "n_bigrams", "s.nb_score", "s.dsir_score")
        .withColumn(
            "nb_score_norm",
            F.expr("nb_score div greatest(n_bigrams, 1L)").cast("bigint"),
        )
        .withColumn(
            "dsir_score_norm",
            F.expr("dsir_score div greatest(n_bigrams, 1L)").cast("bigint"),
        )
    )
    from database_synchronize_tool_spark.caching import scoped_persist

    scored = scoped_persist(scored)
    nb_order = [
        F.col("nb_score_norm").desc(), F.col("nb_score").desc(), F.col("doc_id")
    ]
    ds_order = [
        F.col("dsir_score_norm").desc(),
        F.col("dsir_score").desc(),
        F.col("doc_id"),
    ]
    w = F.row_number().over(Window.orderBy(*nb_order))
    dsir_top = scored.orderBy(*ds_order).limit(k).select("doc_id")
    return (
        scored.orderBy(*nb_order)
        .limit(k)
        .join(
            F.broadcast(dsir_top.withColumn("in_dsir_topk", F.lit(1))),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.col("nb_score"),
            F.col("nb_score_norm"),
            w.cast("int").alias("rank"),
            F.coalesce("in_dsir_topk", F.lit(0)).cast("int").alias(
                "in_dsir_topk"
            ),
        )
    )


# --- token-balanced shard manifest (r14; r13 verdict #7) ----------------
CURATION_SHARDS = 8
CURATION_SUBBINS = 128  # 16 sub-bins per shard: LPT input granularity


def shard_manifest(
    docs: DataFrame,
    n_shards: int = CURATION_SHARDS,
    n_bins: int = CURATION_SUBBINS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-balanced output sharding: assign every document to one of
    ``n_shards`` shards so per-shard token totals are near-equal — the
    write-path manifest a training pipeline needs for equal-cost data
    files. Hierarchical design, because item-level greedy LPT is
    inherently SEQUENTIAL (each placement depends on all previous loads —
    a global sort + serial scan, the single-partition scale-killer
    class):

    1. hash-bin: doc -> sub_bin via the portable Knuth draw on the id
       (``n_bins`` >> ``n_shards``, so bin totals concentrate tightly
       around corpus/n_bins — law of large numbers; no sort, no window,
       no shuffle beyond a 128-key aggregate);
    2. exact greedy LPT over the BOUNDED bin totals (longest-processing-
       time: bins by total DESC, each to the currently least-loaded
       shard, ties -> lowest index on both levels) — 128 collected rows
       of index metadata, replayed in the oracle as a recursive CTE
       carrying the loads list.

    Deterministic end to end (integer totals, fixed tie-breaks), so the
    per-doc manifest is hash-gradable. The balance bound (max/min shard
    token ratio) is pytest-pinned; at 100 TB the hash-binning spread
    only tightens."""
    m = _doc_token_bins(docs, n_bins, text_col, id_col)
    mapping = shard_bin_mapping(m, n_shards)
    return m.join(F.broadcast(mapping), "sub_bin").select(
        "doc_id", "n_tokens", "sub_bin", "shard"
    )


def sub_bin_expr(id_col: str, n_bins: int = CURATION_SUBBINS):
    """The doc -> sub-bin assignment expression (portable Knuth draw,
    overflow-safe via :func:`knuth_hash32`)."""
    return (knuth_hash32(F.col(id_col)) % n_bins).cast("int")


def _doc_token_bins(
    docs: DataFrame, n_bins: int, text_col: str, id_col: str
) -> DataFrame:
    """(doc_id, n_tokens, sub_bin): the narrow per-doc featurize of the
    shard manifest — a pure expression, no shuffle."""
    from database_synchronize_tool_spark.functions import text as TX

    return docs.select(
        F.col(id_col).alias("doc_id"),
        TX.token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
    ).withColumn("sub_bin", sub_bin_expr("doc_id", n_bins))


def shard_bin_mapping(
    binned: DataFrame, n_shards: int = CURATION_SHARDS
) -> DataFrame:
    """Exact greedy LPT over the bounded sub-bin token totals of
    ``binned`` (a :func:`_doc_token_bins` output): bins by total DESC
    (ties: lowest sub_bin) each to the currently least-loaded shard
    (ties: lowest shard). Returns the (sub_bin, shard) mapping — bounded
    index metadata, broadcast-joinable onto a corpus of any size."""
    bins = binned.groupBy("sub_bin").agg(
        F.sum("n_tokens").cast("bigint").alias("total")
    ).collect()
    loads = [0] * n_shards
    assign = []
    for r in sorted(bins, key=lambda r: (-int(r["total"]), int(r["sub_bin"]))):
        s = loads.index(min(loads))  # first (lowest) least-loaded shard
        assign.append((int(r["sub_bin"]), s))
        loads[s] += int(r["total"])
    return binned.sparkSession.createDataFrame(
        assign, "sub_bin int, shard int"
    )


def prototype_prune(e: DataFrame) -> DataFrame:
    """Prototype-based data pruning (Sorscher et al. 2022, "Beyond neural
    scaling laws" — public literature; supervised-prototypes variant):
    each class's prototype is its exact label centroid, every example is
    scored by cosine similarity to its prototype, and within each label
    the EASIEST half (highest similarity — the examples prototypes
    already explain) is pruned, keeping the hardest ceil(n/2).

    Exactness discipline (the r14 sweep conventions): centroid cells go
    through the explicit IEEE half-up quantization floor(v*1e9 + 0.5) and
    a DECIMAL(38,0) integer sum, then the identically-associated
    double-divide chain — bit-identical cross-engine at any corpus size;
    the cosine is the shared left-fold (functions/vectors.py) with a
    correctly-rounded IEEE sqrt, so the per-row scores — and therefore
    the ranks, with vec_id tiebreak — agree exactly. The keep rule is the
    integer comparison 2*rank <= n+1 (= rank <= ceil(n/2)), no float
    threshold.

    Scale shape: the centroid pass is one (label, dim)-keyed shuffle of
    |labels|*d cells; prototypes (|labels| rows) broadcast back, so the
    scoring pass never shuffles the corpus; the within-label rank uses
    operators/ranks.grouped_row_numbers (range-partitioned two-pass — a
    plain row_number window partitioned by the 10-value label column
    would funnel a tenth of a 100 TB corpus through one sorter); the
    per-label counts are a tiny broadcast agg.
    """
    from database_synchronize_tool_spark.functions import vectors as VX
    from database_synchronize_tool_spark.operators.ranks import (
        grouped_row_numbers,
    )

    cells = e.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>"))
    ).select(
        "label",
        F.col("pos").alias("dim"),
        F.floor(F.col("col") * F.lit(1.0e9) + F.lit(0.5)).alias("q"),
    )
    cent = cells.groupBy("label", "dim").agg(
        (
            F.sum(F.col("q").cast("decimal(38,0)")).cast("double")
            / F.lit(1.0e9)
            / F.count("*")
        ).alias("c")
    )
    protos = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))),
            lambda x: x["c"],
        ).alias("cv")
    )
    scored = e.join(F.broadcast(protos), "label").select(
        "vec_id",
        "label",
        VX.cosine(F.col("embedding"), F.col("cv")).alias("sim_prototype"),
    )
    ranked = grouped_row_numbers(
        scored,
        "label",
        [F.col("sim_prototype"), F.col("vec_id")],
        alias="hard_rank",
    )
    counts = scored.groupBy("label").agg(F.count(F.lit(1)).alias("n_label"))
    return ranked.join(F.broadcast(counts), "label").select(
        "vec_id",
        "label",
        "sim_prototype",
        F.col("hard_rank").cast("int").alias("hard_rank"),
        (F.col("hard_rank") * 2 <= F.col("n_label") + 1).alias("kept"),
    )


DOREMI_STEPS = 8
DOREMI_FP = 10**12  # fixed-point scale for losses and weights
DOREMI_SMOOTH_C = DOREMI_FP // 100  # uniform-mixture smoothing c = 0.01


def doremi_weights(
    df: DataFrame,
    domain_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    steps: int = DOREMI_STEPS,
) -> DataFrame:
    """DoReMi-style domain-mixture reweighting (Xie et al. 2023, "DoReMi:
    Optimizing Data Mixtures Speeds Up Language Model Pretraining" —
    public literature): a multiplicative-weights (Group-DRO) loop over
    the corpus's domains whose per-step minibatch losses upweight the
    domains where the proxy model lags the reference model most, with
    per-step renormalization, uniform-mixture smoothing, and the paper's
    final output = the AVERAGE of the smoothed weights across steps.

    Deterministic cross-engine re-expression (documented departures, the
    ``perplexity_buckets`` discipline):

    - The reference model is the corpus-trained add-1 bigram LM (trained
      on the uniform mixture, exactly the paper's reference role); the
      proxy stand-in is the smaller target-slice LM (the repo's
      ``doc_id % 7`` convention). Per-document loss under an LM is
      ``1 - mean smoothed transition probability``, so the per-document
      EXCESS loss (proxy minus reference, clipped at 0 as in the paper)
      reduces to ``max(0, s_ref - s_proxy) / n_bigrams`` where the
      ``s_*`` are fixed-point probability sums.
    - exp(eta*excess) is libm and not bit-reproducible; the update uses
      the rational multiplicative-weights form ``w *= (1 + excess)``
      (eta = 1; Arora-Hazan-Kale MW variant) in pure integer fixed
      point: every probability is quantized ONCE by the engine-exact
      ``floor(p * 1e12 + 0.5)``, and the loop is integer multiply /
      floor-divide all the way down, so the whole trajectory replays
      bit-identically as unrolled DuckDB HUGEINT CTEs.
    - The stochastic minibatch at step t is the deterministic corpus
      slice ``knuth_hash32(doc_id) % steps == t-1`` — every document
      participates in exactly one step, so the per-step per-domain batch
      excess is one bounded groupBy.

    Scale shape: ONE corpus scan/explode builds the bigram stream; both
    LM count tables (vocabulary-bounded, not corpus-bounded) broadcast
    back onto it, so scoring never shuffles the corpus; the per-(step,
    domain) aggregate is map-side combinable to steps x |domains| rows
    per partition (bounded shuffle); the MW recursion runs driver-side
    over those <= steps x |domains| collected rows — bounded index
    metadata, the BPE-trainer precedent — and the corpus is never
    rescanned. Excess sums go through DECIMAL(38,0) so even a
    billions-of-docs cell cannot overflow an int64 partial sum.
    """
    from database_synchronize_tool_spark.functions import text as TX

    FP = DOREMI_FP
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(domain_col).alias("domain"),
        TX.tokens(F.lower(F.col(text_col))).alias("t"),
    )
    is_target = F.col("doc_id") % 7 == 0
    vocab_c = toks.select(F.explode("t").alias("term")).agg(
        F.countDistinct("term").alias("vocab_c")
    )
    vocab_t = (
        toks.filter(is_target)
        .select(F.explode("t").alias("term"))
        .agg(F.countDistinct("term").alias("vocab_t"))
    )
    bigrams = F.when(
        F.size("t") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("t") - 1),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("t"), i),
                F.element_at(F.col("t"), i + 1),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = toks.select("doc_id", F.explode(bigrams).alias("bg"))
    cbgc = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg_c"))
    cctx = (
        bg.select(F.substring_index("bg", " ", 1).alias("w1c"))
        .groupBy("w1c")
        .agg(F.count(F.lit(1)).alias("c_w1_c"))
    )
    tbg = bg.filter(is_target)
    tbgc = tbg.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg_t"))
    tctx = (
        tbg.select(F.substring_index("bg", " ", 1).alias("w1t"))
        .groupBy("w1t")
        .agg(F.count(F.lit(1)).alias("c_w1_t"))
    )
    p_ref = (F.col("c_bg_c") + 1).cast("double") / (
        F.col("c_w1_c") + F.col("vocab_c")
    ).cast("double")
    p_proxy = (F.coalesce(F.col("c_bg_t"), F.lit(0)) + 1).cast("double") / (
        F.coalesce(F.col("c_w1_t"), F.lit(0)) + F.col("vocab_t")
    ).cast("double")
    q_ref = F.floor(p_ref * F.lit(float(FP)) + F.lit(0.5)).cast("bigint")
    q_proxy = F.floor(p_proxy * F.lit(float(FP)) + F.lit(0.5)).cast("bigint")
    perdoc = (
        bg.join(F.broadcast(cbgc), "bg")
        .join(
            F.broadcast(cctx),
            F.substring_index(F.col("bg"), " ", 1) == F.col("w1c"),
        )
        .join(F.broadcast(tbgc), "bg", "left")
        .join(
            F.broadcast(tctx),
            F.substring_index(F.col("bg"), " ", 1) == F.col("w1t"),
            "left",
        )
        .crossJoin(F.broadcast(vocab_c))
        .crossJoin(F.broadcast(vocab_t))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nb"),
            F.sum(q_ref).cast("bigint").alias("s_ref"),
            F.sum(q_proxy).cast("bigint").alias("s_proxy"),
        )
    )
    docx = (
        df.select(
            F.col(id_col).alias("doc_id"), F.col(domain_col).alias("domain")
        )
        .join(perdoc, "doc_id", "left")
        .select(
            "domain",
            (knuth_hash32(F.col("doc_id")) % steps + 1)
            .cast("int")
            .alias("step"),
            F.expr(
                "CASE WHEN coalesce(nb, 0) = 0 THEN CAST(0 AS BIGINT) "
                "ELSE CAST(greatest(CAST(0 AS BIGINT), s_ref - s_proxy) "
                "div nb AS BIGINT) END"
            ).alias("excess_fp"),
        )
    )
    cells = (
        docx.groupBy("step", "domain")
        .agg(
            F.sum(F.col("excess_fp").cast("decimal(38,0)")).alias("sx"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    by_cell = {(r["step"], r["domain"]): (int(r["sx"]), int(r["n"])) for r in cells}
    domains = sorted({r["domain"] for r in cells})
    excess = {}
    for t in range(1, steps + 1):
        for d in domains:
            sx, n = by_cell.get((t, d), (0, 0))
            excess[(t, d)] = sx // n if n else 0
    traj, final = mw_trajectory(excess, domains, steps)
    return df.sparkSession.createDataFrame(
        [(t, d, ex, ab, final[d]) for (t, d, ex, ab) in traj],
        schema=(
            "step int, domain string, batch_excess_fp bigint, "
            "weight_fp bigint, final_weight_fp bigint"
        ),
    )


def mw_trajectory(
    excess: dict,
    domains: list,
    steps: int = DOREMI_STEPS,
    fp: int = DOREMI_FP,
    c: int = DOREMI_SMOOTH_C,
):
    """The pure integer multiplicative-weights recursion of
    :func:`doremi_weights`, factored out so its invariants unit-test
    without a corpus: ``excess[(t, d)]`` in fixed-point ``fp`` units,
    rational update ``w *= (1 + excess)``, per-step normalize to ``fp``,
    uniform smoothing ``c``, final weight = mean smoothed weight across
    steps. Returns ``(trajectory_rows, final_by_domain)`` where rows are
    ``(step, domain, excess, smoothed_weight)``. Exact Python-int
    arithmetic, bit-identical to the unrolled HUGEINT oracle CTEs."""
    k = len(domains)
    w = {d: fp for d in domains}
    abar_sum = {d: 0 for d in domains}
    traj = []
    for t in range(1, steps + 1):
        for d in domains:
            w[d] = w[d] * (fp + excess[(t, d)]) // fp
        total = sum(w.values())
        for d in domains:
            a = w[d] * fp // total
            abar = ((fp - c) * a + c * (fp // k)) // fp
            abar_sum[d] += abar
            traj.append((t, d, excess[(t, d)], abar))
    final = {d: abar_sum[d] // steps for d in domains}
    return traj, final


def doremi_resample(
    df: DataFrame,
    weights_from: DataFrame | None = None,
    domain_col: str = "lang",
    id_col: str = "doc_id",
    steps: int = DOREMI_STEPS,
) -> DataFrame:
    """Apply a DoReMi-trained domain mixture as a deterministic resample:
    target share of domain d is proportional to its final averaged
    weight, so the per-row keep rate is ``min(1, N*w_d/Z/n_d)`` — the
    ``temperature_sample`` rule with the learned mixture in place of the
    sqrt-share weights — drawn with the portable Knuth hash so the
    survivor set is engine-independent and re-runnable.

    ``weights_from`` lets the mixture train on the FULL corpus while the
    resample applies to a downstream survivor frame (the pipeline's
    stage composition — weights stay stable against what earlier stages
    rejected); default is ``df`` itself. Exactness: the final weights
    and their sum are exact integers < 2^53, so every int->double
    conversion is correctly rounded, and the rate chain
    ``N * w / Z / n_d`` is evaluated left-to-right as three IEEE ops —
    engine-agreed bit-for-bit. Scale shape: two tiny broadcast
    aggregates + the bounded DoReMi cell grid + one narrow filter — no
    window, no per-domain sort, corpus shuffles only inside the (step,
    domain) bounded aggregate of the training pass."""
    wts = (
        doremi_weights(
            weights_from if weights_from is not None else df,
            domain_col=domain_col,
            id_col=id_col,
            steps=steps,
        )
        .select("domain", "final_weight_fp")
        .distinct()
    )
    z = wts.agg(F.sum("final_weight_fp").alias("z_fp"))
    n = df.agg(F.count(F.lit(1)).alias("n_docs"))
    ns = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_s")
    )
    rate = F.least(
        F.lit(1.0),
        F.col("n_docs").cast("double")
        * F.col("final_weight_fp").cast("double")
        / F.col("z_fp").cast("double")
        / F.col("n_s").cast("double"),
    )
    draw = knuth_hash32(F.col(id_col)).cast("double") / F.lit(float(HASH_MOD))
    return (
        df.join(F.broadcast(wts), df[domain_col] == wts["domain"])
        .join(F.broadcast(ns), "domain")
        .crossJoin(F.broadcast(z))
        .crossJoin(F.broadcast(n))
        .filter(draw < rate)
        .select(*df.columns)
    )
