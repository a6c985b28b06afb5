"""Declared queries: sampling theory, mergeable histogram quantiles,
storage-layout zone-map pruning, and sketch-based join-size estimation.

Round-9 second wave. These fill the "planner/statistics" quadrant of a
100 TB engine: a calibrated weighted sample (priority sampling), a
mergeable distribution summary (fixed-bin histogram -> quantiles, with a
merge-exactness proof like sketch_hll_register_merge's), a layout
evaluator (zone-map prunability of two physical orders under the same
predicates), and a join-output-size estimate from bounded sketches (the
statistic a cost-based planner consults before picking a join strategy).

All follow the repo parity contract (registry.py header): integer
arithmetic everywhere hash-compared values flow, explicit floor division
(`div` / `//`), and at most a chain of identically-written IEEE double
ops for the final ratio columns.

Reference parity note: the reference system (bxljoy/database-synchronize-
tool) has no statistics layer — these extend the engine the same way the
sketch/membership family does (operators/membership.py header).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from database_synchronize_tool_spark.catalog import load_table
from database_synchronize_tool_spark.operators import membership as MB
from database_synchronize_tool_spark.operators import sampling as SA
from database_synchronize_tool_spark.plans.registry import declared


# 60-bit md5-hex hash, DuckDB side (parity twin of membership.hash60).
def _h60_sql(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


# --- priority sampling ------------------------------------------------------

_PS_K = 50


@declared(
    "sample_weighted_reservoir",
    oracle=f"""
    WITH p AS (
      SELECT o_orderkey, o_totalprice AS weight,
             o_totalprice / CAST(
               {_h60_sql("'ps' || chr(1) || CAST(o_orderkey AS VARCHAR)")}
               + 1 AS DOUBLE) AS priority
      FROM orders
    ),
    r AS (
      SELECT o_orderkey, weight, priority,
             CAST(ROW_NUMBER() OVER (ORDER BY priority DESC, o_orderkey)
                  AS INT) AS smp_rank
      FROM p
    ),
    tau AS (
      SELECT coalesce(
               MAX(CASE WHEN smp_rank = {_PS_K + 1} THEN priority END),
               0.0) AS tau
      FROM r
    )
    SELECT r.o_orderkey, r.weight, r.priority, r.smp_rank, tau.tau,
           greatest(r.weight, tau.tau) AS ht_contrib
    FROM r, tau WHERE r.smp_rank <= {_PS_K}
    """,
    doc=f"Weighted reservoir via priority sampling (Duffield-Lund-Thorup): "
    f"the top-{_PS_K} orders by priority w/u with the portable md5 uniform "
    "draw, plus tau (the (k+1)-th priority) and each row's "
    "Horvitz-Thompson contribution max(w, tau) — summing contributions "
    "over any filter unbiasedly estimates that filter's total weight. "
    "Spark's plan is a TakeOrderedAndProject (per-partition (k+1)-heaps, "
    "no global sort) + a broadcast 1-row tau aggregate; the oracle ranks "
    "the same priorities with a window. The draw divides the raw weight "
    "by (hash+1) once — ranking is scale-invariant so no transcendental "
    "(log/pow) ever enters, which is what keeps a weighted sample "
    "bit-reproducible across engines AND cluster sizes.",
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").alias("weight")
    )
    s = SA.priority_sample(o, "weight", "o_orderkey", _PS_K, seed="ps")
    return s.select(
        "o_orderkey", "weight", "priority", "smp_rank", "tau", "ht_contrib"
    )


# --- mergeable histogram quantiles ------------------------------------------

_HQ_BIN = 512  # price units per bin: ~205 bins over l_extendedprice
_HQ_QS = (25, 50, 75, 90, 99)


@declared(
    "sketch_histogram_quantiles",
    oracle=f"""
    WITH rows_ AS (
      SELECT CAST(floor(l_extendedprice) AS BIGINT) // {_HQ_BIN} AS bin,
             l_returnflag, l_extendedprice, l_orderkey, l_linenumber
      FROM lineitem
    ),
    parts AS (
      SELECT l_returnflag, bin, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM rows_ GROUP BY 1, 2
    ),
    merged AS (
      SELECT bin, CAST(SUM(cnt) AS BIGINT) AS cnt FROM parts GROUP BY 1
    ),
    direct AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS cnt FROM rows_ GROUP BY 1
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rows_),
    t AS (
      SELECT q, n, (n * q + 99) // 100 AS rank_target
      FROM n CROSS JOIN (SELECT unnest([{", ".join(map(str, _HQ_QS))}]) AS q)
    ),
    mc AS (
      SELECT bin, cnt, SUM(cnt) OVER (
        ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS cum FROM merged
    ),
    dc AS (
      SELECT bin, SUM(cnt) OVER (
        ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS cum FROM direct
    ),
    em AS (
      SELECT t.q, t.n, t.rank_target, MIN(mc.bin) AS mbin
      FROM t JOIN mc ON mc.cum >= t.rank_target GROUP BY 1, 2, 3
    ),
    ed AS (
      SELECT t.q, MIN(dc.bin) AS dbin
      FROM t JOIN dc ON dc.cum >= t.rank_target GROUP BY 1
    ),
    off_ AS (
      SELECT em.q, em.n, em.rank_target, em.mbin,
             em.rank_target - (mc.cum - mc.cnt) AS off
      FROM em JOIN mc ON mc.bin = em.mbin
    ),
    rn AS (
      SELECT bin, l_extendedprice,
             ROW_NUMBER() OVER (
               PARTITION BY bin
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
             ) AS rn
      FROM rows_
    ),
    ex AS (
      SELECT o.q, o.n, o.rank_target, o.mbin,
             r.l_extendedprice AS exact_price
      FROM off_ o JOIN rn r ON r.bin = o.mbin AND r.rn = o.off
    )
    SELECT ex.q, ex.n, ex.rank_target,
           ex.mbin * {_HQ_BIN} AS est_price,
           (ex.mbin = ed.dbin) AS merge_exact,
           ex.exact_price,
           CAST(ex.mbin * {_HQ_BIN} AS DOUBLE) - ex.exact_price AS est_err
    FROM ex JOIN ed ON ed.q = ex.q
    """,
    doc=f"Mergeable fixed-bin histogram quantiles of l_extendedprice "
    f"(bin width {_HQ_BIN}): p25/50/75/90/99 estimated as the lower edge "
    "of the bin containing the ceil-rank target, with three attestations "
    "per row — merge_exact proves the per-returnflag histograms summed "
    "bin-wise give IDENTICAL estimates to a direct global histogram "
    "(count-vector addition is the merge monoid, the property that lets "
    "per-day/per-source histograms roll up at 100 TB without re-scanning), "
    "exact_price is the true rank-target value, and est_err the signed "
    f"error (|err| < {_HQ_BIN} by construction). The exact value itself "
    "is found HISTOGRAM-GUIDED: the cumulative bin counts locate the "
    "target bin and in-bin offset, so the rank lookup sorts one ~n/205 "
    "bin partition instead of a global single-partition window — the "
    "two-phase exact-quantile shape that survives scale. All state is "
    "integer; the only float op is the final err subtraction.",
)
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_synchronize_tool_spark.caching import scoped_persist

    li = load_table(spark, sf_dir, "lineitem")
    rows = li.select(
        F.expr(f"CAST(floor(l_extendedprice) AS BIGINT) div {_HQ_BIN}").alias(
            "bin"
        ),
        "l_returnflag",
        "l_extendedprice",
        "l_orderkey",
        "l_linenumber",
    )
    parts = rows.groupBy("l_returnflag", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    # The ~205-row bin summaries are each consumed by several branches
    # (cumulative window, rank-target derivation, the merge_exact compare);
    # without a persist every consumer re-runs its FULL-TABLE aggregate
    # subtree — 6 scans of lineitem in the unpersisted plan. Persisting the
    # summaries caps the full-table passes at the 3 the semantics require
    # (per-flag histogram, direct histogram, target-bin rank probe).
    merged = scoped_persist(
        parts.groupBy("bin").agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    direct = scoped_persist(
        rows.groupBy("bin").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    # COUNT(*) == the histogram's own mass (every row lands in exactly one
    # (returnflag, bin) cell, NULLs included as group keys), so derive n
    # from the ~205-row merged table instead of a fourth full-table pass.
    n = merged.agg(F.sum("cnt").cast("bigint").alias("n"))
    targets = n.select(
        "n", F.explode(F.array(*[F.lit(q) for q in _HQ_QS])).alias("q")
    ).withColumn("rank_target", F.expr("(n * q + 99) div 100"))
    # Cumulative counts: a single-partition window over BIN rows — bounded
    # at ~205 rows no matter the data size (the histogram IS the summary).
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    mc = merged.withColumn("cum", F.sum("cnt").over(wcum))
    dc = direct.withColumn("cum", F.sum("cnt").over(wcum))
    em = (
        mc.join(F.broadcast(targets), F.col("cum") >= F.col("rank_target"))
        .groupBy("q", "n", "rank_target")
        .agg(F.min("bin").alias("mbin"))
    )
    ed = (
        dc.join(
            F.broadcast(targets.select("q", "rank_target")),
            F.col("cum") >= F.col("rank_target"),
        )
        .groupBy("q")
        .agg(F.min("bin").alias("dbin"))
    )
    off = scoped_persist(
        em.join(mc, em.mbin == mc.bin).select(
            "q",
            "n",
            "rank_target",
            "mbin",
            (F.col("rank_target") - (F.col("cum") - F.col("cnt"))).alias(
                "off"
            ),
        )
    )
    wb = Window.partitionBy("bin").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    # Histogram-guided rank lookup: only the <=|qs| target bins are ever
    # probed for their in-bin rank, so drop every other bin BEFORE the
    # row_number sort (broadcast semi-join on the bounded mbin list).
    # row_number depends only on its own partition's rows, so rn within a
    # surviving bin is unchanged — the full-table window sorted ~205 bin
    # partitions of the whole table to read at most |qs| rows of it.
    target_bins = off.select(F.col("mbin").alias("bin")).distinct()
    rn = rows.join(F.broadcast(target_bins), "bin").withColumn(
        "rn", F.row_number().over(wb)
    )
    ex = rn.join(
        F.broadcast(off),
        (F.col("bin") == F.col("mbin")) & (F.col("rn") == F.col("off")),
    ).select(
        "q", "n", "rank_target", "mbin",
        F.col("l_extendedprice").alias("exact_price"),
    )
    return ex.join(F.broadcast(ed), "q").select(
        "q",
        "n",
        "rank_target",
        (F.col("mbin") * _HQ_BIN).alias("est_price"),
        (F.col("mbin") == F.col("dbin")).alias("merge_exact"),
        "exact_price",
        (
            (F.col("mbin") * _HQ_BIN).cast("double") - F.col("exact_price")
        ).alias("est_err"),
    )


# --- zone-map layout pruning ------------------------------------------------

_ZM_CHUNK = 2048
_ZM_SHIP_LO, _ZM_SHIP_HI = "1995-01-01", "1995-04-01"
_ZM_PRICE = 90000


@declared(
    "layout_zonemap_pruning",
    oracle=f"""
    WITH li AS (
      SELECT l_orderkey, l_linenumber, l_shipdate, l_extendedprice
      FROM lineitem
    ),
    ing AS (
      SELECT 'ingest_order' AS layout, l_orderkey // {_ZM_CHUNK} AS chunk,
             l_shipdate, l_extendedprice
      FROM li
    ),
    srt AS (
      SELECT 'shipdate_sorted' AS layout,
             CAST(ROW_NUMBER() OVER (
               ORDER BY l_shipdate, l_orderkey, l_linenumber
             ) - 1 AS BIGINT) // {_ZM_CHUNK} AS chunk,
             l_shipdate, l_extendedprice
      FROM li
    ),
    bo AS (
      SELECT * FROM ing UNION ALL SELECT * FROM srt
    ),
    st AS (
      SELECT layout, chunk, CAST(COUNT(*) AS BIGINT) AS cnt,
             MIN(l_shipdate) AS smin, MAX(l_shipdate) AS smax,
             MAX(l_extendedprice) AS pmax,
             CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '{_ZM_SHIP_LO}'
                            AND l_shipdate <  TIMESTAMP '{_ZM_SHIP_HI}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS m_ship,
             CAST(SUM(CASE WHEN l_extendedprice > {_ZM_PRICE}
                           THEN 1 ELSE 0 END) AS BIGINT) AS m_price
      FROM bo GROUP BY 1, 2
    ),
    ship AS (
      SELECT layout, 'ship_1995q1' AS predicate,
             CAST(COUNT(*) AS BIGINT) AS n_chunks,
             CAST(SUM(CASE WHEN smax < TIMESTAMP '{_ZM_SHIP_LO}'
                             OR smin >= TIMESTAMP '{_ZM_SHIP_HI}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
             CAST(SUM(CASE WHEN smax < TIMESTAMP '{_ZM_SHIP_LO}'
                             OR smin >= TIMESTAMP '{_ZM_SHIP_HI}'
                           THEN 0 ELSE cnt END) AS BIGINT) AS rows_scanned,
             CAST(SUM(m_ship) AS BIGINT) AS rows_matching
      FROM st GROUP BY 1
    ),
    price AS (
      SELECT layout, 'price_gt_90k' AS predicate,
             CAST(COUNT(*) AS BIGINT) AS n_chunks,
             CAST(SUM(CASE WHEN pmax <= {_ZM_PRICE}
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
             CAST(SUM(CASE WHEN pmax <= {_ZM_PRICE}
                           THEN 0 ELSE cnt END) AS BIGINT) AS rows_scanned,
             CAST(SUM(m_price) AS BIGINT) AS rows_matching
      FROM st GROUP BY 1
    ),
    u AS (SELECT * FROM ship UNION ALL SELECT * FROM price)
    SELECT layout, predicate, n_chunks, n_pruned, rows_scanned,
           rows_matching,
           CAST(n_pruned AS DOUBLE) / CAST(n_chunks AS DOUBLE)
             AS frac_pruned,
           CAST(rows_scanned AS DOUBLE)
             / CAST(greatest(rows_matching, 1) AS DOUBLE) AS scan_amp
    FROM u
    """,
    doc=f"Zone-map prunability of two physical layouts under the same two "
    f"predicates: {_ZM_CHUNK}-row chunks carry (min,max) per column — the "
    "parquet row-group / Delta file-stats model — and a chunk is skipped "
    "iff its range cannot intersect the predicate (SOUND: a skipped chunk "
    "provably holds zero matches). Rows report chunks pruned, rows still "
    "scanned, true matching rows, and scan amplification for the ingest "
    "order (clustered by orderkey, so the shipdate predicate prunes "
    "almost nothing) vs a shipdate-sorted layout (time predicate prunes "
    "to the knee; the price predicate shows sorting on ONE key does not "
    "help another — the motivation for layout_zorder_stats' space-filling "
    "curve). This is the WRITE-time decision evaluator: at 100 TB the "
    "sorted layout comes from repartitionByRange at ingest "
    "(sinks.write_curated), and the declared query uses a deterministic "
    "row_number chunking only so both engines assign bit-identical "
    "chunks — row numbers via the range-partitioned two-pass "
    "(operators/ranks.global_row_numbers), never a single-partition "
    "sort of lineitem. Min/max state is 2 values per chunk per column — "
    "the zone map itself is the bounded summary.",
)
def layout_zonemap_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice"
    )
    ingest = li.select(
        F.lit("ingest_order").alias("layout"),
        F.expr(f"l_orderkey div {_ZM_CHUNK}").alias("chunk"),
        "l_shipdate",
        "l_extendedprice",
    )
    from database_synchronize_tool_spark.operators.ranks import (
        global_row_numbers,
    )

    srt = (
        global_row_numbers(
            li,
            [F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")],
            "rn",
        )
        .select(
            F.lit("shipdate_sorted").alias("layout"),
            F.expr(f"CAST(rn - 1 AS BIGINT) div {_ZM_CHUNK}").alias("chunk"),
            "l_shipdate",
            "l_extendedprice",
        )
    )
    lo = F.expr(f"timestamp'{_ZM_SHIP_LO}'")
    hi = F.expr(f"timestamp'{_ZM_SHIP_HI}'")
    in_ship = (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    st = (
        ingest.unionByName(srt)
        .groupBy("layout", "chunk")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.min("l_shipdate").alias("smin"),
            F.max("l_shipdate").alias("smax"),
            F.max("l_extendedprice").alias("pmax"),
            F.sum(in_ship.cast("int")).cast("bigint").alias("m_ship"),
            F.sum((F.col("l_extendedprice") > _ZM_PRICE).cast("int"))
            .cast("bigint")
            .alias("m_price"),
        )
    )

    def roll(pred_label: str, pruned, match_col: str) -> DataFrame:
        return (
            st.withColumn("pruned", pruned.cast("int"))
            .groupBy("layout")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
                F.sum("pruned").cast("bigint").alias("n_pruned"),
                F.sum(
                    F.when(F.col("pruned") == 0, F.col("cnt")).otherwise(
                        F.lit(0)
                    )
                )
                .cast("bigint")
                .alias("rows_scanned"),
                F.sum(match_col).cast("bigint").alias("rows_matching"),
            )
            .withColumn("predicate", F.lit(pred_label))
        )

    ship = roll(
        "ship_1995q1",
        (F.col("smax") < lo) | (F.col("smin") >= hi),
        "m_ship",
    )
    price = roll("price_gt_90k", F.col("pmax") <= _ZM_PRICE, "m_price")
    return ship.unionByName(price).select(
        "layout",
        "predicate",
        "n_chunks",
        "n_pruned",
        "rows_scanned",
        "rows_matching",
        (
            F.col("n_pruned").cast("double") / F.col("n_chunks").cast("double")
        ).alias("frac_pruned"),
        (
            F.col("rows_scanned").cast("double")
            / F.greatest(F.col("rows_matching"), F.lit(1)).cast("double")
        ).alias("scan_amp"),
    )


# --- sketch join-cardinality estimate ---------------------------------------

_JC_DEPTH, _JC_WIDTH = 4, 1024


def _jc_side_sql(src: str, key: str) -> str:
    return f"""
      SELECT r,
             {_h60_sql(f"'cms' || CAST(r AS VARCHAR) || chr(1) || CAST({key} AS VARCHAR)")}
               % {_JC_WIDTH} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM {src} CROSS JOIN range({_JC_DEPTH}) t(r)
      GROUP BY 1, 2
    """


@declared(
    "stats_join_cardinality_estimate",
    oracle=f"""
    WITH sa AS ({_jc_side_sql("lineitem", "l_orderkey")}),
    sb AS ({_jc_side_sql("orders", "o_orderkey")}),
    ip AS (
      SELECT sa.r, CAST(SUM(sa.cnt * sb.cnt) AS BIGINT) AS ip
      FROM sa JOIN sb ON sa.r = sb.r AND sa.bucket = sb.bucket
      GROUP BY 1
    ),
    est AS (SELECT CAST(MIN(ip) AS BIGINT) AS cms_est FROM ip),
    ex AS (
      SELECT CAST(SUM(ca.c * cb.c) AS BIGINT) AS exact_join_rows
      FROM (SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS c
            FROM lineitem GROUP BY 1) ca
      JOIN (SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS c
            FROM orders GROUP BY 1) cb ON ca.k = cb.k
    )
    SELECT ex.exact_join_rows, est.cms_est,
           CAST(est.cms_est AS DOUBLE) / CAST(ex.exact_join_rows AS DOUBLE)
             AS over_ratio
    FROM ex, est
    """,
    doc=f"Join-output-size estimation WITHOUT running the join: count-min "
    f"sketches ({_JC_DEPTH}x{_JC_WIDTH}, shared hash family) of each "
    "side's join key, inner-producted bucket-wise per hash row, min over "
    "rows (always >= exact; expected overcount n_a*n_b/width — the width "
    "knob). Next to it the exact size Sigma_k cA(k)*cB(k) from the "
    "per-key count profiles — itself computed WITHOUT materializing join "
    "output (the count-profile join shuffles one row per distinct key, "
    "not one per output row). This is the cost-based-planner primitive: "
    "at 100 TB the sketches build in one pass each, merge map-side "
    "(counter addition), broadcast at depth*width counters, and tell the "
    "planner whether the join's output explodes (skewed fanout) BEFORE "
    "it commits to a shuffle strategy; over_ratio is the sketch's "
    "measured honesty. Cf. skew_key_diagnostics for the per-key version.",
)
def stats_join_cardinality_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    lk = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k")
    )
    ok = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    ca = lk.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("ca"))
    cb = ok.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("cb"))
    exact = ca.join(cb, "k").agg(
        F.sum(F.col("ca") * F.col("cb"))
        .cast("bigint")
        .alias("exact_join_rows")
    )
    ska = MB.cms_build(lk, "k", _JC_DEPTH, _JC_WIDTH)
    skb = MB.cms_build(ok, "k", _JC_DEPTH, _JC_WIDTH)
    est = MB.cms_inner_product(ska, skb)
    return (
        exact.crossJoin(F.broadcast(est))
        .select(
            "exact_join_rows",
            "cms_est",
            (
                F.col("cms_est").cast("double")
                / F.col("exact_join_rows").cast("double")
            ).alias("over_ratio"),
        )
    )


# --- stratified priority sampling -------------------------------------------

_PSS_K = 10


@declared(
    "sample_weighted_stratified",
    oracle=f"""
    WITH p AS (
      SELECT lang, doc_id, CAST(length(text) AS BIGINT) AS weight,
             CAST(length(text) AS BIGINT) / CAST(
               {_h60_sql("'pss' || chr(1) || CAST(doc_id AS VARCHAR)")}
               + 1 AS DOUBLE) AS priority
      FROM documents
    ),
    r AS (
      SELECT lang, doc_id, weight, priority,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY priority DESC, doc_id
             ) AS INT) AS smp_rank
      FROM p
    ),
    tau AS (
      SELECT lang,
             coalesce(
               MAX(CASE WHEN smp_rank = {_PSS_K + 1} THEN priority END),
               0.0) AS tau
      FROM r WHERE smp_rank <= {_PSS_K + 1} GROUP BY 1
    )
    SELECT r.lang, r.doc_id, r.weight, r.priority, r.smp_rank, tau.tau,
           greatest(CAST(r.weight AS DOUBLE), tau.tau) AS ht_contrib
    FROM r JOIN tau ON tau.lang = r.lang
    WHERE r.smp_rank <= {_PSS_K}
    """,
    doc=f"Per-language priority sample of documents weighted by text "
    f"length: an independent top-{_PSS_K} weighted sample inside every "
    "language stratum, each with its own tau and Horvitz-Thompson "
    "contributions — summing ht_contrib within a stratum (over any "
    "filter) unbiasedly estimates that stratum's total text volume. The "
    "calibrated counterpart of lang_temperature_sample: temperature "
    "resampling balances stratum SHARES, this balances stratum sample "
    "SIZES while keeping estimates unbiased per stratum. One rank window "
    "partitioned by lang (no global sort), tau from a per-stratum "
    "aggregate that broadcasts back — the same shape as "
    "curation_source_cap with an estimator attached.",
)
def sample_weighted_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", F.length("text").cast("bigint").alias("weight")
    )
    s = SA.priority_sample_stratified(
        d, "weight", "doc_id", "lang", _PSS_K, seed="pss"
    )
    return s.select(
        "lang", "doc_id", "weight", "priority", "smp_rank", "tau",
        "ht_contrib",
    )


# --- per-chunk Bloom skipping -----------------------------------------------

_BS_CHUNK = 2048
_BS_M, _BS_K = 1024, 2
_BS_PROBES = 5


@declared(
    "layout_bloom_skipping",
    oracle=f"""
    WITH li AS (
      SELECT l_orderkey // {_BS_CHUNK} AS chunk, l_partkey FROM lineitem
    ),
    bits AS (
      SELECT chunk, l_partkey, j,
             {_h60_sql("'cb' || CAST(j AS VARCHAR) || chr(1) || CAST(l_partkey AS VARCHAR)")}
               % {_BS_M} AS bit
      FROM li CROSS JOIN range({_BS_K}) t(j)
    ),
    flt AS (
      SELECT chunk, bit // 32 AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(bit % 32 AS INT)) AS fmask
      FROM bits GROUP BY 1, 2
    ),
    probes AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS exact_cnt
      FROM lineitem GROUP BY 1
      ORDER BY exact_cnt DESC, l_partkey LIMIT {_BS_PROBES}
    ),
    pb AS (
      SELECT p.l_partkey, p.exact_cnt, j,
             {_h60_sql("'cb' || CAST(j AS VARCHAR) || chr(1) || CAST(p.l_partkey AS VARCHAR)")}
               % {_BS_M} AS bit
      FROM probes p CROSS JOIN range({_BS_K}) t(j)
    ),
    chunks AS (SELECT DISTINCT chunk FROM li),
    g AS (
      SELECT c.chunk, pb.l_partkey, pb.exact_cnt, pb.bit
      FROM chunks c CROSS JOIN pb
    ),
    h AS (
      SELECT g.l_partkey, g.exact_cnt, g.chunk,
             CASE WHEN (coalesce(f.fmask, 0)
                        & (CAST(1 AS BIGINT) << CAST(g.bit % 32 AS INT)))
                       <> 0
                  THEN 1 ELSE 0 END AS hit
      FROM g LEFT JOIN flt f
        ON f.chunk = g.chunk AND f.word = g.bit // 32
    ),
    perchunk AS (
      SELECT l_partkey, exact_cnt, chunk,
             CASE WHEN SUM(hit) = {_BS_K} THEN 1 ELSE 0 END AS chunk_hit
      FROM h GROUP BY 1, 2, 3
    ),
    truth AS (
      SELECT DISTINCT chunk, l_partkey FROM li
    )
    SELECT pc.l_partkey, pc.exact_cnt,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(pc.chunk_hit) AS BIGINT) AS n_hit_chunks,
           CAST(SUM(CASE WHEN t.l_partkey IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_true_chunks,
           CAST(SUM(CASE WHEN pc.chunk_hit = 1 AND t.l_partkey IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
           CAST(COUNT(*) - SUM(pc.chunk_hit) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS frac_skipped
    FROM perchunk pc
    LEFT JOIN truth t ON t.chunk = pc.chunk AND t.l_partkey = pc.l_partkey
    GROUP BY 1, 2
    """,
    doc=f"Per-chunk Bloom-filter data skipping for POINT predicates — the "
    "index zone maps cannot be: a part key is high-cardinality and "
    "uncorrelated with ingest order, so every chunk's (min,max) straddles "
    "it and layout_zonemap_pruning skips nothing; a ~"
    f"{_BS_M // 8} B Bloom filter per {_BS_CHUNK}-row chunk "
    "(parquet bloom_filter_enabled / Delta file-level Bloom, modeled "
    "engine-side) answers 'can this chunk contain key X' with zero false "
    "negatives, so skipping non-hit chunks is SOUND. Probing the exact "
    f"top-{_BS_PROBES} part keys reports hit/true/false-positive chunk "
    "counts and the skip fraction a point-lookup would enjoy. Build is "
    "one bit_or-monoid aggregate (map-side combined, <= m/32 words per "
    "chunk); the probe grid is chunks x (probes*k) with the bounded "
    "probe side broadcast. Cf. sketch_bloom_decontam for the corpus-"
    "membership use of the same filter algebra.",
)
def layout_bloom_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr(f"l_orderkey div {_BS_CHUNK}").alias("chunk"), "l_partkey"
    )
    bits = F.array(
        *[
            MB.seeded_bucket(F.col("l_partkey"), f"cb{j}", _BS_M)
            for j in range(_BS_K)
        ]
    )
    flt = (
        li.select("chunk", F.explode(bits).alias("bit"))
        .select(
            "chunk",
            F.expr("bit div 32").alias("word"),
            F.expr("shiftleft(cast(1 as bigint), cast(bit % 32 as int))")
            .alias("mask"),
        )
        .groupBy("chunk", "word")
        .agg(F.bit_or("mask").alias("fmask"))
    )
    probes = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "l_partkey")
        .limit(_BS_PROBES)
    )
    pb = probes.select(
        "l_partkey", "exact_cnt", F.explode(bits).alias("bit")
    ).select(
        "l_partkey",
        "exact_cnt",
        "bit",
        F.expr("bit div 32").alias("word"),
        F.expr("shiftleft(cast(1 as bigint), cast(bit % 32 as int))")
        .alias("mask"),
    )
    chunks = li.select("chunk").distinct()
    g = chunks.crossJoin(F.broadcast(pb))
    h = g.join(F.broadcast(flt), ["chunk", "word"], "left").withColumn(
        "hit",
        (
            F.coalesce(F.col("fmask"), F.lit(0)).bitwiseAND(F.col("mask"))
            != 0
        ).cast("int"),
    )
    perchunk = h.groupBy("l_partkey", "exact_cnt", "chunk").agg(
        (F.sum("hit") == _BS_K).cast("int").alias("chunk_hit")
    )
    truth = li.distinct().withColumn("__t", F.lit(1))
    joined = perchunk.join(
        F.broadcast(truth), ["chunk", "l_partkey"], "left"
    )
    return joined.groupBy("l_partkey", "exact_cnt").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum("chunk_hit").cast("bigint").alias("n_hit_chunks"),
        F.sum(F.coalesce(F.col("__t"), F.lit(0)))
        .cast("bigint")
        .alias("n_true_chunks"),
        F.sum(
            F.when(
                (F.col("chunk_hit") == 1) & F.col("__t").isNull(), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_false_pos"),
        (
            (F.count(F.lit(1)) - F.sum("chunk_hit")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("frac_skipped"),
    )


# --- covariance sufficient statistics ---------------------------------------

_COV_D = 16  # leading dims: d(d+1)/2 = 136 cells — bounded statistics output


@declared(
    "embedding_covariance_stats",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding FROM embeddings
    ),
    cells AS (
      SELECT i.i, j.j,
             CAST(e.embedding[i.i + 1] AS DOUBLE) AS x,
             CAST(e.embedding[j.j + 1] AS DOUBLE) AS y
      FROM e
      CROSS JOIN range({_COV_D}) i(i)
      CROSS JOIN range({_COV_D}) j(j)
      WHERE j.j >= i.i
    ),
    s AS (
      SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(floor(x * 1000000000.0 + 0.5) AS BIGINT)) AS sx,
             SUM(CAST(floor(y * 1000000000.0 + 0.5) AS BIGINT)) AS sy,
             SUM(CAST(floor(x * y * 1000000000.0 + 0.5) AS BIGINT)) AS sxy
      FROM cells GROUP BY 1, 2
    )
    SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j, n,
           CAST(sxy AS DOUBLE) / 1000000000.0 AS sxy,
           (CAST(sxy AS DOUBLE) / 1000000000.0
            - (CAST(sx AS DOUBLE) / 1000000000.0)
              * (CAST(sy AS DOUBLE) / 1000000000.0) / CAST(n AS DOUBLE))
             / CAST(n AS DOUBLE) AS cov
    FROM s
    """,
    doc=f"Covariance sufficient statistics of the leading {_COV_D} "
    "embedding dimensions: per (i, j <= i..d) cell, one pass accumulates "
    "(n, Sigma x, Sigma y, Sigma xy) with each per-row value/product "
    "quantized by the explicit IEEE half-up rule floor(v*1e9+0.5) before "
    "the order-insensitive exact integer sum (r14: the DECIMAL cast "
    "rounds HALF_UP in Spark vs HALF_EVEN in DuckDB and float32 values "
    "CAN be exact 9-decimal midpoints), then ONE identically-written "
    "float chain produces "
    "cov = (Sxy - Sx*Sy/n)/n. The d(d+1)/2-cell upper triangle is "
    "generated IN-ROW (no self-join of exploded tables): each vector "
    "emits its 136 products inside whole-stage codegen and the shuffle "
    "carries only per-partition partial sums for 136 groups — the "
    "PCA/whitening/Mahalanobis precursor at 100 TB, where the covariance "
    "matrix is bounded metadata (like IVF centroids) and the eigen-step "
    "runs driver-side on d x d numbers, never on data. Mergeable across "
    "corpus shards by plain addition of the DECIMAL sums. Cf. "
    "stats_pearson_exact for the 1-D pair version.",
)
def embedding_covariance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    d = _COV_D
    cells = e.select(
        F.explode(
            F.expr(
                f"""
                flatten(transform(sequence(0, {d - 1}), i ->
                  transform(sequence(i, {d - 1}), j -> struct(
                    i AS i, j AS j,
                    CAST(element_at(embedding, i + 1) AS DOUBLE) AS x,
                    CAST(element_at(embedding, j + 1) AS DOUBLE) AS y))))
                """
            )
        ).alias("c")
    ).select("c.i", "c.j", "c.x", "c.y")
    def q(c):
        # explicit IEEE half-up quantization at 1e-9 (r14: the DECIMAL
        # cast rounds HALF_UP in Spark but HALF_EVEN in DuckDB, and
        # float32-derived values CAN be exact 9-decimal midpoints —
        # caught by the sf0.1 sweep on embedding_label_centroids)
        return F.floor(c * F.lit(1.0e9) + F.lit(0.5)).cast("decimal(38,0)")

    s = cells.groupBy("i", "j").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(q(F.col("x"))).alias("sx"),
        F.sum(q(F.col("y"))).alias("sy"),
        F.sum(q(F.col("x") * F.col("y"))).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double") / F.lit(1.0e9)
    sy_d = F.col("sy").cast("double") / F.lit(1.0e9)
    sxy_d = F.col("sxy").cast("double") / F.lit(1.0e9)
    return s.select(
        F.col("i").cast("int").alias("i"),
        F.col("j").cast("int").alias("j"),
        "n",
        sxy_d.alias("sxy"),
        ((sxy_d - sx_d * sy_d / nd) / nd).alias("cov"),
    )


# --- two-sample proportion test ---------------------------------------------


@declared(
    "stats_ab_test_proportions",
    oracle="""
    WITH assigned AS (
      SELECT user_id % 2 AS grp,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
      FROM events WHERE user_id IS NOT NULL
    ),
    g AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(conv) AS BIGINT) AS conv
      FROM assigned GROUP BY 1
    ),
    w AS (
      SELECT
        MAX(CASE WHEN grp = 0 THEN n END) AS n_a,
        MAX(CASE WHEN grp = 0 THEN conv END) AS conv_a,
        MAX(CASE WHEN grp = 1 THEN n END) AS n_b,
        MAX(CASE WHEN grp = 1 THEN conv END) AS conv_b
      FROM g
    )
    SELECT n_a, conv_a, n_b, conv_b,
           CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_a,
           CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p_b,
           (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
            - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
           / sqrt(
               (CAST(conv_a + conv_b AS DOUBLE)
                / CAST(n_a + n_b AS DOUBLE))
               * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
                        / CAST(n_a + n_b AS DOUBLE))
               * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))
             ) AS z_score
    FROM w
    """,
    doc="Two-sample proportion z-test over a deterministic experiment "
    "assignment (user_id parity = arm, purchase = conversion): per-arm "
    "(n, conversions) sufficient statistics in ONE scan, then the pooled "
    "z-score from a float chain written identically on both sides — "
    "sqrt is IEEE-correctly-rounded in both engines (unlike log/pow), "
    "so even the test statistic hash-matches. The experimentation-"
    "analytics shape for 100 TB event stores: the scan reduces to TWO "
    "rows of integers (mergeable by addition across shards/days), the "
    "statistic is driver-free arithmetic on that bounded state, and the "
    "same sufficient statistics serve sequential monitoring without "
    "re-scanning. Parity of the arithmetic chain is itself evidence the "
    "engine can run calibrated decision statistics, not just counts.",
)
def stats_ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    g = (
        ev.select(
            (F.col("user_id") % 2).alias("grp"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("conv"),
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("conv").cast("bigint").alias("conv"),
        )
    )
    w = g.agg(
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("grp") == 0, F.col("conv"))).alias("conv_a"),
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("grp") == 1, F.col("conv"))).alias("conv_b"),
    )
    pa = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    pb = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    pp = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    return w.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        pa.alias("p_a"),
        pb.alias("p_b"),
        ((pa - pb) / se).alias("z_score"),
    )


# --- rank statistics (round-9 third wave) -----------------------------------
#
# Spearman and Mann-Whitney both need AVERAGE ranks under ties to be correct,
# and average ranks are half-integers — a hash-parity hazard. The portable
# form used here keeps everything integral: 2*avgrank = 2*rank + ties - 1
# (rank = min rank of the tie group, ties = tie-group size), a BIGINT on both
# engines. Any statistic that is scale-invariant in the ranks (Spearman) or
# explicitly renormalized (AUC) can be computed from the doubled ranks with
# integer/DECIMAL arithmetic all the way to one final double division —
# the same discipline as stats_pearson_exact.


# The former plans.approx._doubled_avg_ranks (range repartition + a LOCAL
# Window.partitionBy(__pid, g)) moved to operators/ranks.py as
# grouped_doubled_avg_ranks and lost its hidden second exchange: the local
# window re-shuffled the whole table by hash(__pid, g) because the planner
# cannot see that range partitions already colocate it (the r10
# global_row_numbers finding). The replacement computes local tie-averaged
# ranks in a carry-across-batches mapInPandas scan on the range
# partitioning itself -- one data shuffle per ranked axis.


@declared(
    "stats_spearman_rank",
    oracle="""
    WITH r AS (
      SELECT l_returnflag,
             2 * RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
               + COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1
               AS rx2,
             2 * RANK() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
               + COUNT(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1
               AS ry2
      FROM lineitem
    ), s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(rx2 AS DECIMAL(18,0))) AS sx,
             SUM(CAST(ry2 AS DECIMAL(18,0))) AS sy,
             SUM(CAST(rx2 AS DECIMAL(18,0)) * CAST(ry2 AS DECIMAL(18,0))) AS sxy,
             SUM(CAST(rx2 AS DECIMAL(18,0)) * CAST(rx2 AS DECIMAL(18,0))) AS sxx,
             SUM(CAST(ry2 AS DECIMAL(18,0)) * CAST(ry2 AS DECIMAL(18,0))) AS syy
      FROM r GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           CAST(CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
                / (sqrt(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE))
                   * sqrt(CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE)))
                AS DOUBLE)
             AS spearman_rho
    FROM s
    """,
    doc="Spearman rank correlation (quantity vs extended price per return "
    "flag): Pearson over tie-averaged ranks, with ranks doubled "
    "(2*rank + ties - 1) so they stay BIGINT-exact under ties — Spearman "
    "is invariant to the common x2 scaling, so the value is identical to "
    "the textbook definition. DECIMAL sufficient statistics, two "
    "correctly-rounded sqrts, one divide — the stats_pearson_exact "
    "contract. Scale shape (r10 verdict #2): l_returnflag has 3 values, "
    "so a rank window partitioned by it runs each group's sort in ONE "
    "task — a third of the table through a single sorter at 100 TB. Both "
    "axes use ranks.grouped_doubled_avg_ranks instead: range-partitioned "
    "on (group, value) with a carry-across-batches local tie scan — one "
    "data shuffle per axis (same count as the window form) with "
    "parallelism n_parts instead of 3. l_quantity has ~50 distinct "
    "values so ties dominate — this query is wrong without average "
    "ranks, which is the point of publishing it next to the Pearson "
    "form.",
)
def stats_spearman_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_synchronize_tool_spark.operators.ranks import (
        grouped_doubled_avg_ranks,
    )

    li = load_table(spark, sf_dir, "lineitem")
    g = "l_returnflag"
    base = li.select(g, "l_quantity", "l_extendedprice")
    ranked = grouped_doubled_avg_ranks(base, g, "l_quantity", "rx2i")
    ranked = grouped_doubled_avg_ranks(ranked, g, "l_extendedprice", "ry2i")
    r = ranked.select(
        F.col(g),
        F.col("rx2i").cast("decimal(18,0)").alias("rx2"),
        F.col("ry2i").cast("decimal(18,0)").alias("ry2"),
    )
    s = r.groupBy(g).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx2").alias("sx"),
        F.sum("ry2").alias("sy"),
        F.sum(F.col("rx2") * F.col("ry2")).alias("sxy"),
        F.sum(F.col("rx2") * F.col("rx2")).alias("sxx"),
        F.sum(F.col("ry2") * F.col("ry2")).alias("syy"),
    )
    # via-string decimal->double (r14 pearson fix): the rank-product
    # DECIMAL stats reach 4n^3 ~ 2^58 at sf0.1, where the direct cast's
    # rounding diverges across engines; decimal->string->double is
    # correctly rounded on both.
    def d(c):
        return c.cast("string").cast("double")

    num = d(F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
    denx = F.sqrt(d(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")))
    deny = F.sqrt(d(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")))
    return s.select(
        g,
        F.col("n").cast("bigint").alias("n"),
        (num / (denx * deny)).cast("double").alias("spearman_rho"),
    )


@declared(
    "stats_auc_mannwhitney",
    oracle="""
    WITH r AS (
      SELECT o_orderpriority,
             o_orderstatus = 'F' AS pos,
             2 * RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice)
               + COUNT(*) OVER (PARTITION BY o_orderpriority, o_totalprice) - 1
               AS r2
      FROM orders
    ), s AS (
      SELECT o_orderpriority,
             SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS n_pos,
             SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS n_neg,
             SUM(CASE WHEN pos THEN CAST(r2 AS DECIMAL(28,0)) ELSE 0 END) AS s2
      FROM r GROUP BY o_orderpriority
    )
    SELECT o_orderpriority,
           CAST(n_pos AS BIGINT) AS n_pos,
           CAST(n_neg AS BIGINT) AS n_neg,
           CAST(s2 - CAST(n_pos AS DECIMAL(28,0)) * (n_pos + 1) AS DOUBLE)
             / CAST(2 * CAST(n_pos AS DECIMAL(28,0)) * n_neg AS DOUBLE) AS auc
    FROM s
    """,
    doc="ROC AUC via the Mann-Whitney U statistic, per order priority: "
    "score = o_totalprice, positive class = finalized orders "
    "(o_orderstatus='F'). AUC = P(score_pos > score_neg) + "
    "0.5*P(tie), computed from the doubled tie-averaged rank sum: "
    "AUC = (2*S_pos - 2*npos*(npos+1)/2) / (2*npos*nneg), all integer/"
    "DECIMAL until ONE final double division. This is the "
    "scale-independent way to grade any scalar quality score against "
    "binary labels over 100 TB: one range shuffle + a carry-across-"
    "batches local tie scan (ranks.grouped_doubled_avg_ranks — a rank "
    "window partitioned by the 5-value o_orderpriority would single-"
    "thread each group's sort, r10 verdict #2) + one hash aggregate, "
    "no per-threshold scan of an ROC grid, no join.",
)
def stats_auc_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_synchronize_tool_spark.operators.ranks import (
        grouped_doubled_avg_ranks,
    )

    o = load_table(spark, sf_dir, "orders")
    g = "o_orderpriority"
    base = o.select(g, "o_orderstatus", "o_totalprice")
    ranked = grouped_doubled_avg_ranks(base, g, "o_totalprice", "r2i")
    r = ranked.select(
        F.col(g),
        (F.col("o_orderstatus") == "F").alias("pos"),
        F.col("r2i").cast("decimal(28,0)").alias("r2"),
    )
    s = r.groupBy(g).agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1)).alias("n_neg"),
        F.sum(F.when(F.col("pos"), F.col("r2")).otherwise(F.lit(0).cast("decimal(28,0)"))).alias("s2"),
    )
    npos_d = F.col("n_pos").cast("decimal(28,0)")
    num = (F.col("s2") - npos_d * (F.col("n_pos") + F.lit(1))).cast("double")
    den = (F.lit(2) * npos_d * F.col("n_neg")).cast("double")
    return s.select(
        g,
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.col("n_neg").cast("bigint").alias("n_neg"),
        (num / den).alias("auc"),
    )


# --- table profiling (ANALYZE-style column statistics) ----------------------

_PROFILE_COLS: tuple[tuple[str, str], ...] = (
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "money"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
)


def _profile_branch_sql(col: str, kind: str) -> str:
    if kind == "int":
        mn, mx = f"CAST(MIN({col}) AS VARCHAR)", f"CAST(MAX({col}) AS VARCHAR)"
    elif kind == "str":
        mn, mx = f"MIN({col})", f"MAX({col})"
    elif kind == "money":
        mn = f"CAST(MIN(CAST({col} AS DECIMAL(18,2))) AS VARCHAR)"
        mx = f"CAST(MAX(CAST({col} AS DECIMAL(18,2))) AS VARCHAR)"
    else:  # ts
        mn = f"strftime(MIN({col}), '%Y-%m-%d %H:%M:%S')"
        mx = f"strftime(MAX({col}), '%Y-%m-%d %H:%M:%S')"
    return f"""
      SELECT '{col}' AS column_name,
             CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_count,
             CAST(COUNT(DISTINCT {col}) AS BIGINT) AS ndv,
             {mn} AS min_repr, {mx} AS max_repr
      FROM orders"""


@declared(
    "profile_column_stats",
    oracle=" UNION ALL ".join(
        _profile_branch_sql(c, k) for c, k in _PROFILE_COLS
    ),
    doc="ANALYZE-style per-column table profile of orders: null count, "
    "exact NDV, and portable min/max renderings (BIGINT/VARCHAR as-is, "
    "money via DECIMAL(18,2) so both engines print '123.45', timestamps "
    "via an explicit strftime pattern). This is the statistics substrate "
    "the reference's schema-drift report (S3) and any cost-based planner "
    "sit on. Spark shape: ONE scan — the multi-distinct aggregate runs "
    "through Catalyst's Expand (rows x |cols|, still map-side partial), "
    "then the 1-row result explodes to per-column rows driver-free; the "
    "oracle is the same profile as |cols| UNION ALL branches. At 100 TB "
    "swap COUNT(DISTINCT) for approx_count_distinct (HLL, one line) — "
    "kept exact here because exactness is what the cross-engine hash "
    "can grade.",
)
def profile_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    aggs: list[F.Column] = []
    for c, kind in _PROFILE_COLS:
        col = F.col(c)
        if kind == "int":
            mn, mx = F.min(col).cast("string"), F.max(col).cast("string")
        elif kind == "str":
            mn, mx = F.min(col), F.max(col)
        elif kind == "money":
            dec = col.cast("decimal(18,2)")
            mn = F.min(dec).cast("string")
            mx = F.max(dec).cast("string")
        else:  # ts
            mn = F.date_format(F.min(col), "yyyy-MM-dd HH:mm:ss")
            mx = F.date_format(F.max(col), "yyyy-MM-dd HH:mm:ss")
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"nulls_{c}"),
            F.count_distinct(col).cast("bigint").alias(f"ndv_{c}"),
            mn.alias(f"min_{c}"),
            mx.alias(f"max_{c}"),
        ]
    one = o.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"nulls_{c}").alias("null_count"),
                F.col(f"ndv_{c}").alias("ndv"),
                F.col(f"min_{c}").alias("min_repr"),
                F.col(f"max_{c}").alias("max_repr"),
            )
            for c, _ in _PROFILE_COLS
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


_WHITEN_D = 16
_WHITEN_VECS = 50


@declared(
    "embedding_zscore_whiten",
    oracle=f"""
    WITH vals AS (
      SELECT vec_id, i.i AS pos,
             CAST(embedding[i.i + 1] AS DOUBLE) AS x
      FROM embeddings CROSS JOIN range({_WHITEN_D}) i(i)
    ), stats AS (
      SELECT pos, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(floor(x * 1000000000.0 + 0.5) AS BIGINT)) AS sx,
             SUM(CAST(floor(x * x * 1000000000.0 + 0.5) AS BIGINT)) AS sxx
      FROM vals GROUP BY pos
    )
    SELECT v.vec_id, CAST(v.pos AS INT) AS pos,
           (v.x - CAST(s.sx AS DOUBLE) / 1000000000.0 / CAST(s.n AS DOUBLE))
           / sqrt((CAST(s.sxx AS DOUBLE) / 1000000000.0
                   - (CAST(s.sx AS DOUBLE) / 1000000000.0)
                     * (CAST(s.sx AS DOUBLE) / 1000000000.0)
                     / CAST(s.n AS DOUBLE))
                  / CAST(s.n AS DOUBLE)) AS z
    FROM vals v JOIN stats s USING (pos)
    WHERE v.vec_id < {_WHITEN_VECS}
    """,
    doc=f"Diagonal whitening (per-dimension z-score) of the leading "
    f"{_WHITEN_D} embedding dimensions: corpus-wide per-dim (n, Sigma x, "
    "Sigma x^2) via the explicit-IEEE-quantize exact-sum pattern "
    "(embedding_covariance_stats' discipline), then each value is "
    "standardized with ONE identically-associated float chain "
    "(x - Sx/n) / sqrt((Sxx - Sx*Sx/n)/n). The full-covariance version "
    "would use the covariance query's eigen-decomposition driver-side; "
    "the diagonal form shown here is the feature-scaling step that "
    "needs NO matrix at all. Scale shape: stats are a 16-row aggregate "
    "(broadcast back), the transform is in-row — a 100 TB corpus is "
    "standardized with one scan + one broadcast join, no shuffle of "
    "vectors. Output posexploded to (vec_id, pos, z) rows for a bounded "
    "query window of {_WHITEN_VECS} vectors (the driver's canonicalizer "
    "cannot hash array cells — same reshape as "
    "embedding_matryoshka_truncate).",
)
def embedding_zscore_whiten(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    vals = e.select(
        "vec_id",
        F.posexplode(F.slice(F.col("embedding"), 1, _WHITEN_D)).alias(
            "pos", "xf"
        ),
    ).select("vec_id", "pos", F.col("xf").cast("double").alias("x"))
    def q(c):
        # explicit IEEE half-up quantization at 1e-9 (see
        # embedding_covariance_stats / the r14 sweep finding)
        return F.floor(c * F.lit(1.0e9) + F.lit(0.5)).cast("decimal(38,0)")

    stats = vals.groupBy("pos").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(q(F.col("x"))).alias("sx"),
        F.sum(q(F.col("x") * F.col("x"))).alias("sxx"),
    )
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double") / F.lit(1.0e9)
    sxx_d = F.col("sxx").cast("double") / F.lit(1.0e9)
    mean = sx_d / n_d
    var = (sxx_d - sx_d * sx_d / n_d) / n_d
    return (
        vals.filter(F.col("vec_id") < _WHITEN_VECS)
        .join(F.broadcast(stats), "pos")
        .select(
            "vec_id",
            F.col("pos").cast("int").alias("pos"),
            ((F.col("x") - mean) / F.sqrt(var)).alias("z"),
        )
    )


# --- robust / timeseries statistics (round-9 fourth wave) --------------------


@declared(
    "stats_weighted_median",
    oracle="""
    WITH pv AS (
      SELECT l_returnflag, l_quantity AS v,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS w
      FROM lineitem GROUP BY 1, 2
    ), c AS (
      SELECT l_returnflag, v, w,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tw
      FROM pv
    )
    SELECT l_returnflag,
           CAST(MIN(CASE WHEN 2 * cw >= tw THEN v END) AS DOUBLE)
             AS w_median_qty,
           CAST(MAX(tw) AS DOUBLE) AS total_weight
    FROM c GROUP BY l_returnflag
    """,
    doc="Revenue-weighted median quantity per return flag: pre-aggregate "
    "weight per DISTINCT value (the step that makes this scale — the "
    "cumulative window then runs over |distinct values| rows, ~50 here, "
    "never over raw lineitems), cumulative DECIMAL weights, and the "
    "median is the first value where 2*cum >= total. Everything "
    "hash-compared is DECIMAL-exact until two final casts; the window "
    "ordering is over distinct values so ties cannot exist by "
    "construction. The robust location statistic for skewed corpora "
    "(a mean is dragged by outliers; the weighted median is not).",
)
def stats_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_returnflag", F.col("l_quantity").alias("v")).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("w")
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("l_returnflag")
    c = pv.select(
        "l_returnflag",
        "v",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(w_all).alias("tw"),
    )
    return c.groupBy("l_returnflag").agg(
        F.min(F.when(F.lit(2) * F.col("cw") >= F.col("tw"), F.col("v")))
        .cast("double")
        .alias("w_median_qty"),
        F.max("tw").cast("double").alias("total_weight"),
    )


@declared(
    "ts_time_weighted_avg",
    oracle="""
    WITH o AS (
      SELECT user_id, epoch_us(ts) AS us,
             CAST(FLOOR(value * 1000) AS BIGINT) AS v_mu,
             LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id)
               AS nxt
      FROM events WHERE user_id IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(nxt - us) AS BIGINT) AS total_us,
           CAST(SUM(v_mu * (nxt - us)) AS BIGINT) AS swdt_mu,
           CAST(SUM(v_mu * (nxt - us)) AS DOUBLE)
             / CAST(SUM(nxt - us) AS DOUBLE) / 1000.0 AS twa
    FROM o WHERE nxt IS NOT NULL
    GROUP BY user_id HAVING SUM(nxt - us) > 0
    """,
    doc="Time-weighted average of a step signal per user: each event's "
    "value holds until the next event (LEAD over the (ts, event_id) "
    "total order), so the TWA is Sigma(value * dt) / Sigma(dt) — the "
    "correct mean for irregularly-sampled telemetry, where a plain AVG "
    "overweights chatty periods. The signal quantizes to integer "
    "MILLI-UNITS via floor (floor of an identical double is identical "
    "cross-engine — the repo's // discipline), so every hash-compared "
    "sum is BIGINT-exact and the final conversion is the hardware "
    "long->double (a wide-DECIMAL->double cast rounds DIFFERENTLY in "
    "Spark vs DuckDB — measured 1-ulp flaps before this quantization). "
    "Overflow bound: Sigma(v_mu*dt) <= max_v_mu * time_span, "
    "independent of row count (dts telescope) — ~1.3e18 here; spans "
    "beyond ~5e18 microsecond-milliunits switch to DECIMAL(38,0) sums. "
    "Scale shape: one window + one aggregate sharing the user_id "
    "shuffle; degenerate all-zero-duration users are excluded by the "
    "HAVING on both engines alike.",
)
def ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(us, "event_id")
    o = ev.select(
        "user_id",
        us.alias("us"),
        F.floor(F.col("value") * 1000).cast("bigint").alias("v_mu"),
        F.lead(us).over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    dt = F.col("nxt") - F.col("us")
    g = o.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.sum(dt).cast("bigint").alias("total_us"),
        F.sum(F.col("v_mu") * dt).cast("bigint").alias("swdt_mu"),
    )
    return g.filter(F.col("total_us") > 0).select(
        "user_id",
        "n_intervals",
        "total_us",
        "swdt_mu",
        (
            F.col("swdt_mu").cast("double")
            / F.col("total_us").cast("double")
            / F.lit(1000.0)
        ).alias("twa"),
    )


@declared(
    "stats_cusum_changepoint",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             SUM(CAST(value AS DECIMAL(18,6))) AS x
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT event_type, day,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS DOUBLE) AS n,
             CAST(SUM(x) OVER (PARTITION BY event_type) AS DOUBLE) AS tot,
             CAST(SUM(x) OVER (PARTITION BY event_type ORDER BY day
                               ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS run,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                  AS DOUBLE) AS k
      FROM d
    ), c AS (
      SELECT event_type, day, CAST(n AS BIGINT) AS n_days,
             n * run - k * tot AS cusum_scaled
      FROM s
    ), r AS (
      SELECT event_type, day, n_days, cusum_scaled,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY abs(cusum_scaled) DESC, day)
               AS rn
      FROM c
    )
    SELECT event_type, day AS cp_day, n_days, cusum_scaled
    FROM r WHERE rn = 1
    """,
    doc="CUSUM change-point detection per event type over the daily value "
    "series: the classic statistic argmax_k |Sigma_{i<=k}(x_i - mean)| "
    "located WITHOUT ever materializing the mean mid-stream — scaled by "
    "n to n*run_k - k*total (identical argmax), so the hash-compared "
    "value is a single identically-associated 3-op double chain over "
    "DECIMAL-exact window sums, with the earliest-day tiebreak making "
    "the winner unique. Scale shape: raw events reduce to |types|x|days| "
    "rows FIRST (one aggregate), every window then runs over the tiny "
    "daily table — change-point detection over a 100 TB event log costs "
    "one aggregation shuffle plus window work on bounded data.",
)
def stats_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("x"))
    w_all = Window.partitionBy("event_type")
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rn = Window.partitionBy("event_type").orderBy("day")
    s = d.select(
        "event_type",
        "day",
        F.count(F.lit(1)).over(w_all).cast("double").alias("n"),
        F.sum("x").over(w_all).cast("double").alias("tot"),
        F.sum("x").over(w_cum).cast("double").alias("run"),
        F.row_number().over(w_rn).cast("double").alias("k"),
    )
    c = s.select(
        "event_type",
        "day",
        F.col("n").cast("bigint").alias("n_days"),
        (F.col("n") * F.col("run") - F.col("k") * F.col("tot")).alias(
            "cusum_scaled"
        ),
    )
    w_pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum_scaled")).desc(), F.col("day")
    )
    return (
        c.withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("cp_day"),
            "n_days",
            "cusum_scaled",
        )
    )


@declared(
    "stats_calibration_bins",
    oracle="""
    WITH b AS (
      SELECT CAST(o_orderstatus = 'F' AS INT) AS pos,
             CAST(o_totalprice AS DECIMAL(18,2)) AS score,
             NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
      FROM orders
    )
    SELECT CAST(bin AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(pos) AS BIGINT) AS positives,
           CAST(SUM(pos) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS pos_rate,
           CAST(SUM(score) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS mean_score
    FROM b GROUP BY bin
    """,
    doc="Calibration / reliability bins for a scalar score against binary "
    "labels (score = o_totalprice, positive = finalized orders): equal-"
    "population deciles via NTILE over the (score, unique-key) total "
    "order, then per-bin observed positive rate next to the mean score — "
    "the table a reliability diagram plots, and the companion to "
    "stats_auc_mannwhitney (AUC says HOW WELL the score ranks; "
    "calibration says whether its VALUES mean anything). Integer/DECIMAL "
    "sums, two identically-associated divisions. Scale shape: NTILE is "
    "reproduced from the range-partitioned two-pass global row number "
    "(operators/ranks.global_row_numbers) plus the all-integer ANSI "
    "bucket formula — bit-identical to the engines' NTILE over the same "
    "unique total order, with NO single-partition sort anywhere; the "
    "oracle keeps the literal NTILE.",
)
def stats_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_synchronize_tool_spark.operators.ranks import (
        global_row_numbers,
        ntile_from_rn,
    )

    o = load_table(spark, sf_dir, "orders").select(
        (F.col("o_orderstatus") == "F").cast("int").alias("pos"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("score"),
        "o_totalprice",
        "o_orderkey",
    )
    rn = global_row_numbers(
        o, [F.col("o_totalprice"), F.col("o_orderkey")], "__rn"
    )
    n = rn.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    b = rn.crossJoin(F.broadcast(n)).select(
        "pos",
        "score",
        ntile_from_rn(F.col("__rn"), F.col("__n"), 10).alias("bin"),
    )
    return b.groupBy(F.col("bin").cast("int").alias("bin")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("positives"),
        (F.sum("pos").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "pos_rate"
        ),
        (F.sum("score").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "mean_score"
        ),
    )


@declared(
    "stats_gini_concentration",
    oracle="""
    WITH c AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ), r AS (
      SELECT cnt,
             CAST(ROW_NUMBER() OVER (ORDER BY cnt, user_id) AS BIGINT) AS i,
             CAST(COUNT(*) OVER () AS BIGINT) AS n,
             CAST(SUM(cnt) OVER () AS BIGINT) AS tot
      FROM c
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_users,
           CAST(MAX(tot) AS BIGINT) AS n_events,
           CAST(SUM((2 * i - n - 1) * cnt) AS DOUBLE)
             / CAST(MAX(n) * MAX(tot) AS DOUBLE) AS gini
    FROM r
    """,
    doc="Gini concentration of event volume across users — the inequality "
    "statistic that tells a pipeline operator whether a firehose is "
    "dominated by a few hot keys (the skew the salting/AQE machinery "
    "exists for; cf. skew_key_diagnostics for the per-key view — this "
    "is the single-number summary). Computed from the rank form "
    "Sigma((2i - n - 1) x_i) / (n Sigma x): all-integer until ONE double "
    "division; ranking is over the (count, user_id) total order so ties "
    "cannot flap the value. Scale shape: the raw stream reduces to one "
    "row per user in the first aggregate; ranks come from the range-"
    "partitioned two-pass (operators/ranks.global_row_numbers — no "
    "single-partition sort), and Σ(2i-n-1)·x_i folds algebraically to "
    "2·Σ(i·x_i) - (n+1)·Σx_i so n never needs to be joined per-row.",
)
def stats_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_synchronize_tool_spark.operators.ranks import (
        global_row_numbers,
    )

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    c = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    r = global_row_numbers(c, [F.col("cnt"), F.col("user_id")], "i")
    s = r.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("cnt").cast("decimal(38,0)").alias("tot"),
        # cast ONE operand to decimal BEFORE the multiply: i*cnt in bigint
        # wraps silently under extreme skew (rank ~1e9 × count ~1e10) in
        # non-ANSI mode; decimal(38,0) × bigint is exact (ADVICE r10)
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("cnt")).alias("sic"),
    )
    # Σ(2i - n - 1)·cnt == 2·sic - (n+1)·tot — exact integers both ways,
    # so the double cast matches the oracle's literal rank-form sum.
    num = (
        F.lit(2) * F.col("sic") - (F.col("n") + F.lit(1)) * F.col("tot")
    ).cast("double")
    return s.select(
        F.col("n").cast("bigint").alias("n_users"),
        F.col("tot").cast("bigint").alias("n_events"),
        (num / (F.col("n") * F.col("tot")).cast("double")).alias("gini"),
    )


@declared(
    "stats_lorenz_top_share",
    oracle="""
    WITH c AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ), r AS (
      SELECT cnt,
             CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS BIGINT)
               AS rnk,
             CAST(COUNT(*) OVER () AS BIGINT) AS n,
             CAST(SUM(cnt) OVER () AS BIGINT) AS tot
      FROM c
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_users,
           CAST(CEIL(0.1 * MAX(n)) AS BIGINT) AS n_top,
           CAST(SUM(CASE WHEN rnk <= CEIL(0.1 * n) THEN cnt ELSE 0 END)
                AS BIGINT) AS top_events,
           CAST(MAX(tot) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN rnk <= CEIL(0.1 * n) THEN cnt ELSE 0 END)
                AS DOUBLE) / CAST(MAX(tot) AS DOUBLE) AS top_decile_share
    FROM r
    """,
    doc="Lorenz-curve point: what share of all events comes from the top "
    "10% of users — the operational companion to stats_gini_concentration "
    "(Gini integrates the whole curve; operators ask for THIS point). "
    "All-integer until one double division; ranking over the "
    "(count DESC, user_id) total order so ties cannot move the cut; the "
    "decile boundary uses CEIL of an exact 0.1*n double (n < 2^50, so "
    "the product is exact in both engines). Scale shape: one per-user "
    "aggregate, then the range-partitioned two-pass global rank "
    "(operators/ranks.global_row_numbers) over the user table — no "
    "single-partition sort; n broadcasts back as a 1-row join.",
)
def stats_lorenz_top_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_synchronize_tool_spark.operators.ranks import (
        global_row_numbers,
    )

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    c = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    r = global_row_numbers(c, [F.col("cnt").desc(), F.col("user_id")], "rnk")
    n = r.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    rn = r.crossJoin(F.broadcast(n))
    in_top = F.col("rnk") <= F.ceil(F.lit(0.1) * F.col("n"))
    return rn.agg(
        F.max("n").cast("bigint").alias("n_users"),
        F.ceil(F.lit(0.1) * F.max("n")).cast("bigint").alias("n_top"),
        F.sum(F.when(in_top, F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("top_events"),
        F.sum("cnt").cast("bigint").alias("n_events"),
        (
            F.sum(F.when(in_top, F.col("cnt")).otherwise(0)).cast("double")
            / F.sum("cnt").cast("double")
        ).alias("top_decile_share"),
    )


# --- round-10 statistics wave -------------------------------------------------

_BENFORD_P = (
    0.3010299956639812, 0.17609125905568124, 0.12493873660829993,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514,
)
_BENFORD_SQL_CASE = "CASE digit " + " ".join(
    f"WHEN {d + 1} THEN {p!r}" for d, p in enumerate(_BENFORD_P)
) + " END"
# reciprocals precomputed offline: DuckDB constant-folds ANY division by a
# foldable double into multiply-by-reciprocal (measured: x/c == x*(1/c)
# there, 1 ulp off a true division), so the portable form IS the multiply
_BENFORD_INV = tuple(1.0 / p for p in _BENFORD_P)
_BENFORD_INV_SQL_CASE = "CASE digit " + " ".join(
    f"WHEN {d + 1} THEN {p!r}" for d, p in enumerate(_BENFORD_INV)
) + " END"


@declared(
    "stats_benford_first_digit",
    oracle=f"""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d)
    SELECT digit,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           CAST(COUNT(*) AS DOUBLE) / CAST(n.n AS DOUBLE) AS obs_p,
           {_BENFORD_SQL_CASE} AS exp_p,
           (CAST(COUNT(*) AS DOUBLE) / CAST(n.n AS DOUBLE))
             * ({_BENFORD_INV_SQL_CASE}) AS lift
    FROM d CROSS JOIN n GROUP BY digit, n.n
    """,
    doc="Benford's-law first-significant-digit screen over order totals — "
    "the classic fraud / synthetic-data / unit-mixing detector a pipeline "
    "runs on any money-like column. The digit comes from integer→string "
    "rendering (identical both engines; no log10 in the extraction), and "
    "the expected Benford mass log10(1+1/d) enters as nine shared DOUBLE "
    "LITERALS (computed once offline), so every output value is exact "
    "counting plus identically-associated float ops. lift is obs_p "
    "TIMES a precomputed 1/exp_p literal on BOTH sides: DuckDB constant-"
    "folds any division by a foldable double into multiply-by-reciprocal "
    "(measured, 1 ulp off a true division), so the only portable form of "
    "divide-by-literal is to ship the reciprocal literal. Scale shape: "
    "one hash aggregate to at most 9 rows; the total broadcasts back.",
)
def stats_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    g = d.groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    n = g.agg(F.sum("n_obs").cast("bigint").alias("n"))
    exp_p = F.element_at(
        F.array(*[F.lit(p) for p in _BENFORD_P]), F.col("digit")
    )
    obs_p = F.col("n_obs").cast("double") / F.col("n").cast("double")
    return g.crossJoin(F.broadcast(n)).select(
        "digit",
        "n_obs",
        obs_p.alias("obs_p"),
        exp_p.alias("exp_p"),
        (
            obs_p
            * F.element_at(
                F.array(*[F.lit(p) for p in _BENFORD_INV]), F.col("digit")
            )
        ).alias("lift"),
    )


@declared(
    "stats_kendall_tau_contingency",
    oracle="""
    WITH cells AS (
      SELECT l_returnflag AS g, l_quantity AS x, l_discount AS y,
             CAST(COUNT(*) AS DECIMAL(38,0)) AS m
      FROM lineitem GROUP BY 1, 2, 3
    ), cd AS (
      SELECT a.g,
             SUM(CASE WHEN b.y > a.y THEN a.m * b.m ELSE 0 END) AS c2,
             SUM(CASE WHEN b.y < a.y THEN a.m * b.m ELSE 0 END) AS d2
      FROM cells a JOIN cells b ON b.g = a.g AND b.x > a.x
      GROUP BY a.g
    ), mx AS (
      SELECT g, SUM(tx * (tx - 1)) AS t1_2
      FROM (SELECT g, x, SUM(m) AS tx FROM cells GROUP BY g, x) GROUP BY g
    ), my AS (
      SELECT g, SUM(ty * (ty - 1)) AS t2_2
      FROM (SELECT g, y, SUM(m) AS ty FROM cells GROUP BY g, y) GROUP BY g
    ), tot AS (
      SELECT g, SUM(m) AS n FROM cells GROUP BY g
    )
    SELECT tot.g AS l_returnflag,
           CAST(tot.n AS BIGINT) AS n,
           CAST(cd.c2 AS DOUBLE) AS concordant2,
           CAST(cd.d2 AS DOUBLE) AS discordant2,
           CAST(cd.c2 - cd.d2 AS DOUBLE)
             / (sqrt(CAST(tot.n * (tot.n - 1) - mx.t1_2 AS DOUBLE))
                * sqrt(CAST(tot.n * (tot.n - 1) - my.t2_2 AS DOUBLE)))
             AS kendall_tau_b
    FROM tot JOIN cd USING (g) JOIN mx USING (g) JOIN my USING (g)
    """,
    doc="Kendall tau-b rank correlation (quantity vs discount per return "
    "flag) via the CONTINGENCY-TABLE reduction: concordant/discordant "
    "pair counts come from a self-join over the |X-domain|x|Y-domain| "
    "cell table (50x11 here), never over row pairs — the O(n^2) "
    "pair-counting statistic becomes one hash aggregate plus work on a "
    "domain-bounded table, which is the only shape that survives 100 TB. "
    "All counting in DECIMAL(38,0) (pair counts reach n^2/2 ~ 1.8e19 at "
    "sf1000, past BIGINT); tau-b = (C-D)/sqrt((n0-n1)(n0-n2)) evaluated "
    "in the doubled form (x2: n(n-1) and Sum t(t-1), avoiding /2 "
    "truncation subtleties — tau is invariant because numerator and "
    "denominator scale together). Two sqrts + one division, the "
    "stats_spearman_rank contract; completes the rank-correlation "
    "trilogy (Pearson / Spearman / Kendall).",
)
def stats_kendall_tau_contingency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").alias("x"),
        F.col("l_discount").alias("y"),
    ).agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("m"))
    from database_synchronize_tool_spark.caching import scoped_persist

    cells = scoped_persist(cells)
    a, b = cells.alias("a"), cells.alias("b")
    cd = (
        a.join(
            F.broadcast(b),
            (F.col("b.g") == F.col("a.g")) & (F.col("b.x") > F.col("a.x")),
        )
        .groupBy(F.col("a.g").alias("g"))
        .agg(
            F.sum(
                F.when(
                    F.col("b.y") > F.col("a.y"), F.col("a.m") * F.col("b.m")
                ).otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias("c2"),
            F.sum(
                F.when(
                    F.col("b.y") < F.col("a.y"), F.col("a.m") * F.col("b.m")
                ).otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias("d2"),
        )
    )
    mx = (
        cells.groupBy("g", "x")
        .agg(F.sum("m").alias("tx"))
        .groupBy("g")
        .agg(F.sum(F.col("tx") * (F.col("tx") - 1)).alias("t1_2"))
    )
    my = (
        cells.groupBy("g", "y")
        .agg(F.sum("m").alias("ty"))
        .groupBy("g")
        .agg(F.sum(F.col("ty") * (F.col("ty") - 1)).alias("t2_2"))
    )
    tot = cells.groupBy("g").agg(F.sum("m").alias("n"))
    n0_2 = F.col("n") * (F.col("n") - 1)
    return (
        tot.join(cd, "g")
        .join(mx, "g")
        .join(my, "g")
        .select(
            F.col("g").alias("l_returnflag"),
            F.col("n").cast("bigint").alias("n"),
            F.col("c2").cast("double").alias("concordant2"),
            F.col("d2").cast("double").alias("discordant2"),
            (
                (F.col("c2") - F.col("d2")).cast("double")
                / (
                    F.sqrt((n0_2 - F.col("t1_2")).cast("double"))
                    * F.sqrt((n0_2 - F.col("t2_2")).cast("double"))
                )
            ).alias("kendall_tau_b"),
        )
    )


_KANON_K = 5


@declared(
    "privacy_k_anonymity",
    oracle=f"""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM customer GROUP BY 1, 2
    )
    SELECT CAST(MIN(cnt) AS BIGINT) AS k_anonymity,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN cnt < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_below_k,
           CAST(SUM(CASE WHEN cnt < {_KANON_K} THEN cnt ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST(SUM(CASE WHEN cnt < {_KANON_K} THEN cnt ELSE 0 END) AS DOUBLE)
             / CAST(SUM(cnt) AS DOUBLE) AS frac_at_risk,
           CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_singletons
    FROM g
    """,
    doc=f"k-anonymity audit over the quasi-identifier pair (nation, market "
    "segment): the governance read a training-data pipeline runs before "
    "release — the realized k (smallest equivalence class), how many "
    f"classes/rows fall below the k={_KANON_K} policy floor, the at-risk "
    "row fraction, and the singleton count (unique individuals, the "
    "re-identification worst case). Exact integers + ONE division. Scale "
    "shape: one hash aggregate keyed by the quasi-identifiers, then an "
    "aggregate of the (domain-bounded) class table — the raw table "
    "shuffles once regardless of size.",
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    risky = F.sum(F.when(F.col("cnt") < _KANON_K, F.col("cnt")).otherwise(0))
    return g.agg(
        F.min("cnt").cast("bigint").alias("k_anonymity"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("cnt") < _KANON_K, 1).otherwise(0))
        .cast("bigint")
        .alias("groups_below_k"),
        risky.cast("bigint").alias("rows_at_risk"),
        (risky.cast("double") / F.sum("cnt").cast("double")).alias(
            "frac_at_risk"
        ),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_singletons"),
    )


_LDIV_L = 3


@declared(
    "privacy_l_diversity",
    oracle=f"""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(COUNT(DISTINCT
               (CAST(FLOOR(c_acctbal) AS BIGINT) + 1000) // 2000
             ) AS BIGINT) AS l_div
      FROM customer GROUP BY 1, 2
    )
    SELECT CAST(MIN(l_div) AS BIGINT) AS l_diversity,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN l_div < {_LDIV_L} THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_below_l,
           CAST(SUM(CASE WHEN l_div < {_LDIV_L} THEN cnt ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST(SUM(CASE WHEN l_div < {_LDIV_L} THEN cnt ELSE 0 END) AS DOUBLE)
             / CAST(SUM(cnt) AS DOUBLE) AS frac_at_risk,
           CAST(SUM(CASE WHEN l_div = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_homogeneous
    FROM g
    """,
    doc=f"Distinct l-diversity audit (Machanavajjhala et al. 2006, public "
    "literature) over the same quasi-identifier pair as the k-anonymity "
    "audit — the attack k-anonymity misses: an equivalence class can hold "
    "k rows yet ONE sensitive value (homogeneity attack), so release "
    "policy also floors the number of DISTINCT sensitive values per "
    "class. Sensitive attribute = account-balance band (floor to whole "
    "units, shift by the domain minimum so both engines' integer "
    "division agrees, 2000-unit bands — floor() is correctly rounded on "
    f"doubles, so the bucketing is exact). Reports the realized l, "
    f"classes/rows below the l={_LDIV_L} floor, and the homogeneous-class "
    "count (l=1, the worst case). Exact integers + ONE division. Scale "
    "shape: one hash aggregate keyed by (QI, sensitive-band) folded into "
    "a COUNT DISTINCT per QI class — partial aggregation map-side, the "
    "raw table shuffles once; the class table is domain-bounded.",
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    # The +1000 shift makes Spark's truncating `div` agree with DuckDB's
    # floor `//` ONLY while the dividend stays non-negative, i.e. for
    # c_acctbal >= -1000 (true of the TPC-H domain, min -999.99). Guarded
    # at runtime (r13 advice): data below the shift would otherwise
    # silently band differently between engines on negative dividends.
    band = F.expr(
        "CASE WHEN c_acctbal < -1000 THEN CAST(raise_error("
        "'privacy_l_diversity: c_acctbal < -1000 breaks the div/floor "
        "parity shift - re-derive the shift from min(c_acctbal)') "
        "AS BIGINT) "
        "ELSE (CAST(FLOOR(c_acctbal) AS BIGINT) + 1000) div 2000 END"
    )
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.count_distinct(band).cast("bigint").alias("l_div"),
    )
    risky = F.sum(F.when(F.col("l_div") < _LDIV_L, F.col("cnt")).otherwise(0))
    return g.agg(
        F.min("l_div").cast("bigint").alias("l_diversity"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("l_div") < _LDIV_L, 1).otherwise(0))
        .cast("bigint")
        .alias("groups_below_l"),
        risky.cast("bigint").alias("rows_at_risk"),
        (risky.cast("double") / F.sum("cnt").cast("double")).alias(
            "frac_at_risk"
        ),
        F.sum(F.when(F.col("l_div") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_homogeneous"),
    )


@declared(
    "ts_autocorrelation_lag1",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ), p AS (
      SELECT event_type, x,
             LAG(x) OVER (PARTITION BY event_type ORDER BY day) AS y
      FROM d
    ), s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM p WHERE y IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS autocorr_lag1
    FROM s
    """,
    doc="Lag-1 autocorrelation of the daily VOLUME (event count) series "
    "per event type — the persistence/seasonality screen behind anomaly "
    "thresholds and forecast-model choice (high autocorr => trailing-"
    "window baselines like events_rate_spike_zscore are valid; near "
    "zero => they are noise). Counts are integers, so every Pearson "
    "sufficient statistic is exact AND small enough (< 2^53 at any "
    "graded SF) that the final double casts are conversion-exact — the "
    "value-SUM variant was abandoned precisely because its exact-but-"
    "21-digit DECIMAL stats round differently to double across engines. "
    "Two sqrts + one division. Scale shape: raw events reduce to "
    "|types|x|days| rows first; the lag window partitions by type over "
    "that tiny table.",
)
def ts_autocorrelation_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    w = Window.partitionBy("event_type").orderBy("day")
    p = d.select(
        "event_type", "x", F.lag("x").over(w).alias("y")
    ).filter(F.col("y").isNotNull())
    s = p.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    dy = F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_pairs"),
        (num / (dx * dy)).alias("autocorr_lag1"),
    )


@declared(
    "stats_cramers_v",
    oracle="""
    WITH cells AS (
      SELECT o_orderpriority AS r, o_orderstatus AS c,
             CAST(COUNT(*) AS BIGINT) AS m
      FROM orders GROUP BY 1, 2
    ), rm AS (SELECT r, CAST(SUM(m) AS BIGINT) AS mr FROM cells GROUP BY r),
    cm AS (SELECT c, CAST(SUM(m) AS BIGINT) AS mc FROM cells GROUP BY c),
    tot AS (
      SELECT CAST(SUM(m) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT r) AS BIGINT) AS nr,
             CAST(COUNT(DISTINCT c) AS BIGINT) AS nc
      FROM cells
    ), grid AS (
      SELECT rm.r, cm.c, rm.mr, cm.mc, COALESCE(cells.m, 0) AS m
      FROM rm CROSS JOIN cm
      LEFT JOIN cells ON cells.r = rm.r AND cells.c = cm.c
    ), terms AS (
      SELECT CAST(
               (CAST(tot.n * grid.m - grid.mr * grid.mc AS DOUBLE)
                * CAST(tot.n * grid.m - grid.mr * grid.mc AS DOUBLE))
               / CAST(tot.n * grid.mr * grid.mc AS DOUBLE)
               AS DECIMAL(28,12)) AS t
      FROM grid CROSS JOIN tot
    )
    SELECT CAST(tot.n AS BIGINT) AS n,
           CAST((tot.nr - 1) * (tot.nc - 1) AS BIGINT) AS dof,
           CAST(SUM(terms.t) AS DOUBLE) AS chi2,
           sqrt(CAST(SUM(terms.t) AS DOUBLE)
                / CAST(tot.n * least(tot.nr - 1, tot.nc - 1) AS DOUBLE))
             AS cramers_v
    FROM terms CROSS JOIN tot
    GROUP BY tot.n, tot.nr, tot.nc
    """,
    doc="Cramer's V association between order priority and order status — "
    "the categorical-correlation companion to the Pearson/Spearman/"
    "Kendall numeric trilogy (is a label column informative about "
    "another? the feature-selection read). Each chi-square term is "
    "computed in the cleared-denominator form (n*m - mr*mc)^2 / "
    "(n*mr*mc): exact integers to double (all < 2^53 at graded SFs), "
    "one multiply + one division per CELL, each term rounded through "
    "DECIMAL(28,12) before summing so accumulation order cannot flap "
    "the total (the corpus_divergence_chi2 discipline); V adds one "
    "division and one sqrt. Scale shape: one hash aggregate to the "
    "|priorities|x|statuses| contingency table (15 cells), margins and "
    "total derived from it — the raw table shuffles once.",
)
def stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_synchronize_tool_spark.caching import scoped_persist

    o = load_table(spark, sf_dir, "orders")
    cells = scoped_persist(
        o.groupBy(
            F.col("o_orderpriority").alias("r"),
            F.col("o_orderstatus").alias("c"),
        ).agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    )
    rm = cells.groupBy("r").agg(F.sum("m").cast("bigint").alias("mr"))
    cm = cells.groupBy("c").agg(F.sum("m").cast("bigint").alias("mc"))
    tot = cells.agg(
        F.sum("m").cast("bigint").alias("n"),
        F.count_distinct("r").cast("bigint").alias("nr"),
        F.count_distinct("c").cast("bigint").alias("nc"),
    )
    grid = (
        rm.crossJoin(cm)
        .join(cells, ["r", "c"], "left")
        .withColumn("m", F.coalesce(F.col("m"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    num = (F.col("n") * F.col("m") - F.col("mr") * F.col("mc")).cast("double")
    den = (F.col("n") * F.col("mr") * F.col("mc")).cast("double")
    terms = grid.select(
        "n",
        "nr",
        "nc",
        ((num * num) / den).cast("decimal(28,12)").alias("t"),
    )
    chi2 = F.sum("t").cast("double")
    return terms.groupBy("n", "nr", "nc").agg(
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("bigint").alias("dof"),
        chi2.alias("chi2"),
        F.sqrt(
            chi2
            / (
                F.col("n") * F.least(F.col("nr") - 1, F.col("nc") - 1)
            ).cast("double")
        ).alias("cramers_v"),
    ).select("n", "dof", "chi2", "cramers_v")


@declared(
    "ts_seasonal_decompose",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(date_diff('day', DATE '1990-01-01', CAST(ts AS DATE))
                  % 7 AS INT) AS dow
      FROM events GROUP BY 1, 2, 4
    ), t AS (
      SELECT event_type, day, dow, x,
             SUM(x) OVER w AS trend_x7,
             CAST(COUNT(*) OVER w AS BIGINT) AS cnt7
      FROM d
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), v AS (
      SELECT *, 7 * x - trend_x7 AS detr_x7 FROM t WHERE cnt7 = 7
    ), s AS (
      SELECT event_type, dow,
             CAST(SUM(detr_x7) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS seasonal_x7
      FROM v GROUP BY 1, 2
    )
    SELECT v.event_type, v.day, v.x,
           CAST(v.trend_x7 AS DOUBLE) / CAST(v.cnt7 AS DOUBLE) AS trend,
           s.seasonal_x7 / CAST(v.cnt7 AS DOUBLE) AS seasonal,
           (CAST(v.detr_x7 AS DOUBLE) - s.seasonal_x7)
             / CAST(v.cnt7 AS DOUBLE) AS residual
    FROM v JOIN s ON s.event_type = v.event_type AND s.dow = v.dow
    """,
    doc="Classical additive seasonal decomposition of the per-type daily "
    "volume series: centered 7-day moving-average trend, day-of-week "
    "seasonal component (mean of the detrended series per integer-mod "
    "weekday — the orders_dow_seasonality trick, since the engines' "
    "native weekday functions disagree on week start), residual — the "
    "anomaly-detection preprocessor (alert on residual, not raw volume, "
    "or Friday looks like an incident every week). Parity discipline: "
    "the detrended series is kept INTEGER by working in 7x units "
    "(detr_x7 = 7*x - sum7), every division is by a COMPUTED column "
    "(DuckDB reciprocal-rewrites division by foldable literals — "
    "measured), and the final values are 1-2 identically-associated "
    "float ops each. Edge days (incomplete 7-day window) are excluded, "
    "not padded. Scale shape: raw events reduce to |types|x|days| rows "
    "first; trend window partitions by type; the seasonal table is "
    "|types|x7 and joins back as a broadcast.",
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    d = ev.groupBy(
        "event_type",
        day.alias("day"),
        (F.datediff(day, F.lit("1990-01-01")) % 7).cast("int").alias("dow"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    t = d.select(
        "event_type",
        "day",
        "dow",
        "x",
        F.sum("x").over(w).alias("trend_x7"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("cnt7"),
    )
    v = t.filter(F.col("cnt7") == 7).withColumn(
        "detr_x7", F.lit(7) * F.col("x") - F.col("trend_x7")
    )
    s = v.groupBy("event_type", "dow").agg(
        (
            F.sum("detr_x7").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("seasonal_x7")
    )
    cnt7d = F.col("cnt7").cast("double")
    return v.join(F.broadcast(s), ["event_type", "dow"]).select(
        "event_type",
        "day",
        "x",
        (F.col("trend_x7").cast("double") / cnt7d).alias("trend"),
        (F.col("seasonal_x7") / cnt7d).alias("seasonal"),
        (
            (F.col("detr_x7").cast("double") - F.col("seasonal_x7")) / cnt7d
        ).alias("residual"),
    )


@declared(
    "stats_mann_kendall_trend",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT a.event_type,
             CAST(SUM(CASE WHEN b.x > a.x THEN 1
                           WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
      FROM d a JOIN d b
        ON b.event_type = a.event_type AND b.day > a.day
      GROUP BY a.event_type
    ), n_ AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1
    ), ties AS (
      SELECT event_type,
             CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      FROM (SELECT event_type, x, COUNT(*) AS t FROM d GROUP BY 1, 2)
      GROUP BY event_type
    )
    SELECT n_.event_type, n_.n, s.s_stat,
           CAST(n_.n * (n_.n - 1) * (2 * n_.n + 5) - ties.tie_term
                AS BIGINT) AS var18,
           CAST(CASE WHEN s.s_stat > 0 THEN s.s_stat - 1
                     WHEN s.s_stat < 0 THEN s.s_stat + 1
                     ELSE 0 END AS DOUBLE)
             / sqrt(CAST(n_.n * (n_.n - 1) * (2 * n_.n + 5) - ties.tie_term
                         AS DOUBLE)
                    / CAST(n_.n - n_.n + 18 AS DOUBLE)) AS z
    FROM n_ JOIN s USING (event_type) JOIN ties USING (event_type)
    """,
    doc="Mann-Kendall trend test on the per-type daily volume series: "
    "S = Sigma sign(x_j - x_i) over all i<j day pairs, the tie-corrected "
    "variance n(n-1)(2n+5) - Sigma t(t-1)(2t+5) (kept in x18 integer "
    "units), and the continuity-corrected normal score z — the "
    "nonparametric 'is this metric drifting' detector that needs no "
    "distributional assumption (the monitoring twin of "
    "ts_autocorrelation_lag1: autocorr says the series is persistent, "
    "Mann-Kendall says it TRENDS). All pair counting is exact integers "
    "over the day-pair self-join of the AGGREGATED daily table (days "
    "are calendar-bounded, so the pair join is tiny forever); z is one "
    "division by one sqrt of one true division — the 18 divisor is "
    "written as the non-foldable (n - n + 18) so DuckDB cannot rewrite "
    "it into a multiply-by-reciprocal; var18 carries the exact integer "
    "for re-derivation.",
)
def stats_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_synchronize_tool_spark.caching import scoped_persist

    ev = load_table(spark, sf_dir, "events")
    d = scoped_persist(
        ev.groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    a, b = d.alias("a"), d.alias("b")
    s = (
        a.join(
            F.broadcast(b),
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.day") > F.col("a.day")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.x") > F.col("a.x"), 1)
                .when(F.col("b.x") < F.col("a.x"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    n_ = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    ties = (
        d.groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    var18 = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.col("tie_term")
    ).cast("bigint")
    s_adj = (
        F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
        .when(F.col("s_stat") < 0, F.col("s_stat") + 1)
        .otherwise(0)
        .cast("double")
    )
    return (
        n_.join(s, "event_type")
        .join(ties, "event_type")
        .select(
            "event_type",
            "n",
            "s_stat",
            var18.alias("var18"),
            (
                s_adj
                / F.sqrt(
                    var18.cast("double")
                    / (F.col("n") - F.col("n") + 18).cast("double")
                )
            ).alias("z"),
        )
    )
