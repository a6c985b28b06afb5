"""Declared queries: the analytic DataFrame/SQL surface (SURVEY §2.3-2.7).

The reference delegates all query execution to Postgres; the engine exposes
the full relational surface natively — multi-way joins (broadcast dims), hash
aggregates with map-side partials, window functions, rollup/cube, set ops,
pivot, and the scalar function library — all built-in Catalyst operators, no
Python in the hot path.

Determinism: money aggregations run through DECIMAL (exact, order-insensitive)
and are cast back to DOUBLE; every ordering carries a unique tiebreak; moment
aggregates (stddev/corr) are rounded to 4 decimals on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from database_synchronize_tool_spark.catalog import load_table
from database_synchronize_tool_spark.plans.registry import declared

DEC2 = "decimal(18,2)"
DEC6 = "decimal(18,6)"


def _dsum(expr: F.Column, alias: str, scale: str = DEC2) -> F.Column:
    """Order-insensitive exact sum of a double expression via decimal.

    The final decimal->double goes VIA STRING (r15, SWEEP_r15_sf1
    finding on lineitem_revenue_waterfall): the direct cast is only
    correctly rounded while the decimal's significand fits in 2^53, and
    scale-6 revenue sums cross that between sf0.1 and sf1 (e.g. q1's
    per-group sum_charge ≈ 1e11 -> significand ≈ 1e17). Via-string is
    bit-identical below 2^53 and correctly rounded always, on both
    engines — every oracle twin carries the same VARCHAR hop."""
    return F.sum(expr.cast(scale)).cast("string").cast("double").alias(alias)


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --- TPC-H-style join/agg pipelines ----------------------------------------


@declared(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary: two-column hash aggregate, 7 aggregates, "
    "map-side partial aggregation before one shuffle on (returnflag, "
    "linestatus).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.expr("timestamp'1998-09-02'")
    )
    qty_dec = F.sum(F.col("l_quantity").cast(DEC2)).cast("double")
    price_dec = F.sum(F.col("l_extendedprice").cast(DEC2)).cast("double")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        qty_dec.alias("sum_qty"),
        price_dec.alias("sum_base_price"),
        _dsum(_revenue(), "sum_disc_price", DEC6),
        _dsum(_revenue() * (1 + F.col("l_tax")), "sum_charge", DEC6),
        (qty_dec / F.count(F.lit(1))).alias("avg_qty"),
        (price_dec / F.count(F.lit(1))).alias("avg_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


@declared(
    "q3_shipping_priority",
    oracle="""
    SELECT o.o_orderkey,
           CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shipping priority: selective dim filter broadcast into the "
    "fact join, aggregate, TakeOrderedAndProject top-10.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.expr("timestamp'1998-01-01'")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.expr("timestamp'1998-01-01'")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(_dsum(_revenue(), "revenue", DEC6))
        .select("o_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@declared(
    "q5_revenue_by_nation",
    oracle="""
    SELECT n.n_name,
           CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5-style revenue by nation: star join — facts shuffle once on "
    "the orderkey join, every dimension broadcast (no dim-side shuffles).",
)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_dsum(_revenue(), "revenue", DEC6))
    )


@declared(
    "q6_revenue_forecast",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 forecast: pure scan-filter-aggregate; all predicates push "
    "into the parquet scan, no shuffle beyond the final 1-row reduce.",
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.expr("timestamp'1996-01-01'"))
        & (F.col("l_shipdate") < F.expr("timestamp'1997-01-01'"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(_dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue", DEC6))


@declared(
    "q10_returned_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue,
           n.n_name
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10-style returned-item revenue by customer, top-20.",
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_dsum(_revenue(), "revenue", DEC6))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --- aggregation surface ----------------------------------------------------


@declared(
    "agg_having",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS n_customers
    FROM customer GROUP BY c_nationkey HAVING COUNT(*) > 3
    """,
    doc="GROUP BY + HAVING (post-aggregate filter).",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .filter(F.col("n_customers") > 3)
    )


@declared(
    "agg_distinct_count",
    oracle="""
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact multi-column COUNT DISTINCT (Catalyst expands to partial "
    "aggregates; approx_count_distinct is the sketch variant, rows-only).",
)
def agg_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
    )


@declared(
    "agg_stats_moments",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_qty,
           ROUND(CORR(l_extendedprice, l_quantity), 4) AS corr_price_qty,
           ROUND(MIN(l_quantity), 4) AS min_qty,
           ROUND(MAX(l_quantity), 4) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Moment aggregates (stddev, corr): single-pass co-moment formulas in "
    "both engines; rounded to 4 decimals to absorb accumulation-order noise.",
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("corr_price_qty"),
        F.round(F.min("l_quantity"), 4).alias("min_qty"),
        F.round(F.max("l_quantity"), 4).alias("max_qty"),
    )


@declared(
    "rollup_returns",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP hierarchy (grouping-sets expansion inside one aggregate).",
)
def rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast(DEC2)).cast("double").alias("sum_qty"),
        )
    )


@declared(
    "cube_events",
    oracle="""
    SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
    FROM events GROUP BY CUBE (event_type, CAST(ts AS DATE))
    """,
    doc="CUBE over event type × day.",
)
def cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("date")
    )
    return ev.cube("event_type", "day").agg(F.count(F.lit(1)).alias("n"))


@declared(
    "pivot_status_by_year",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "O",
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "F",
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "P"
    FROM orders GROUP BY 1
    """,
    doc="Pivot (wide aggregation): explicit value list keeps the schema "
    "static; equivalent to conditional aggregation.",
)
def pivot_status_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("int")
    )
    return (
        o.groupBy("order_year")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum(F.col("o_totalprice").cast(DEC2)).cast("double"))
    )


# --- window functions -------------------------------------------------------


@declared(
    "window_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    doc="Top-3 orders per customer: ranking window, one shuffle on the "
    "partition key; deterministic tiebreak.",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice")
    )


@declared(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total
    FROM orders
    """,
    doc="Running total per customer (frame UNBOUNDED PRECEDING..CURRENT ROW); "
    "decimal accumulation keeps the prefix sums exact.",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC2)).over(w).cast("double").alias(
            "running_total"
        ),
    )


@declared(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id, value,
           LAG(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
    FROM events
    """,
    doc="LAG/LEAD over per-user event streams (offset windows).",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


# --- set operations ---------------------------------------------------------


@declared(
    "set_except_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 2000.0
    """,
    doc="EXCEPT (distinct set difference) — nations with customers but no "
    "well-funded suppliers (filter keeps the difference non-empty so the "
    "check is non-vacuous).",
)
def set_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 2000.0)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.subtract(s)


@declared(
    "set_intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    doc="INTERSECT (distinct).",
)
def set_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@declared(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
    doc="UNION (distinct).",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.union(s).distinct()


# --- subqueries & scalar function library ----------------------------------


@declared(
    "scalar_subquery_above_avg",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_acctbal >
      (SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(28,10))) AS VARCHAR)
                   AS DOUBLE)
              / COUNT(*) FROM customer)
    """,
    doc="Scalar subquery threshold (broadcast single-row join). The "
    "threshold accumulates through DECIMAL and divides once — a plain "
    "double AVG's accumulation order differs between engines, so a "
    "boundary-row c_acctbal could flip in/out of the result (registry "
    "determinism rule; round-7 review).",
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    avg = c.agg(
        (
            # via-string: the DECIMAL(28,10) sum's significand is ~7e17
            # at sf1 — past 2^53, where the direct cast is not correctly
            # rounded on both engines (SWEEP_r15_sf1 class)
            F.sum(F.col("c_acctbal").cast("decimal(28,10)"))
            .cast("string")
            .cast("double")
            / F.count(F.lit(1))
        ).alias("__avg")
    )
    return (
        c.crossJoin(F.broadcast(avg))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .select("c_custkey", "c_acctbal")
    )


@declared(
    "scalar_function_showcase",
    oracle="""
    SELECT o_orderkey,
           upper(substr(o_orderpriority, 1, 3)) AS prio3,
           concat(o_orderstatus, '#', o_orderpriority) AS tag,
           CAST(length(o_orderpriority) AS INT) AS prio_len,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since,
           CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_k,
           abs(o_totalprice - 100000) AS dist_100k
    FROM orders
    """,
    doc="Scalar function library: string (upper/substr/concat/length), "
    "date (year/month/date_trunc/datediff), math (round/abs) — all "
    "JVM-side codegen'd expressions.",
)
def scalar_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 1, 3)).alias("prio3"),
        F.concat_ws("#", "o_orderstatus", "o_orderpriority").alias("tag"),
        F.length("o_orderpriority").cast("int").alias("prio_len"),
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("m"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1995-01-01").cast("date"),
        )
        .cast("int")
        .alias("days_since"),
        # floor, not round: round() of a double division differs across
        # engines (Spark rounds the shortest decimal repr, DuckDB the binary)
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("price_k"),
        F.abs(F.col("o_totalprice") - 100000).alias("dist_100k"),
    )


@declared(
    "case_when_bucketing",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS price_tier,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY 1
    """,
    doc="CASE WHEN bucketing + aggregate over the derived category.",
)
def case_when_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return (
        o.groupBy(tier.alias("price_tier"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC2)).cast("double").alias("total"),
        )
    )


@declared(
    "skew_salted_twophase_agg",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
    doc="Skew-resilient two-phase aggregation: phase 1 groups on "
    "(key, salt=event_id%16) so a hot key spreads over 16 reducers, phase "
    "2 re-aggregates the 16 partials per key. Same answer as the plain "
    "groupBy (the oracle); the plan is the one that survives a key owning "
    "half the table. Decimal partials make the two-phase sum exact, so "
    "re-aggregation order can't perturb the result.",
)
def skew_salted_twophase_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    phase1 = (
        ev.withColumn("__salt", (F.col("event_id") % 16).cast("int"))
        .groupBy("event_type", "__salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("pv"),
        )
    )
    return (
        phase1.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n"),
            F.sum("pv").cast("double").alias("total_value"),
        )
    )


@declared(
    "correlated_exists_subquery",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    """,
    doc="Correlated EXISTS decorrelated by Catalyst into a left-semi join "
    "(RewriteCorrelatedScalarSubquery/RewritePredicateSubquery) — written "
    "as SQL to exercise the subquery front door, not a hand-built join.",
)
def correlated_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_synchronize_tool_spark.catalog import register_views

    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
        """
    )


@declared(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (late-line predicate adapted to this schema's "
    "columns): EXISTS decorrelates to a left-semi join on orderkey, then a "
    "tiny hash aggregate on priority.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("timestamp'1997-01-01'"))
        & (F.col("o_orderdate") < F.expr("timestamp'1997-04-01'"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate")
    ).select("l_orderkey").distinct()
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@declared(
    "q12_priority_by_linestatus",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
    doc="TPC-H Q12 shape: conditional aggregation (pivot-style CASE sums) "
    "over the lineitem-orders join, year-filtered at the scan.",
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("timestamp'1997-01-01'"))
        & (F.col("l_shipdate") < F.expr("timestamp'1998-01-01'"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@declared(
    "q14_promo_revenue",
    oracle="""
    SELECT 100.0 * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))
                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS VARCHAR) AS DOUBLE)
           / CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
           AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01'
      AND l_shipdate < TIMESTAMP '1997-07-01'
    """,
    doc="TPC-H Q14 promo revenue share: broadcast part into the month-"
    "filtered lineitem scan, decimal-exact conditional sums, one double "
    "division at the end (identical association on both engines).",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("timestamp'1997-06-01'"))
        & (F.col("l_shipdate") < F.expr("timestamp'1997-07-01'"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(DEC6)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DEC6))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("string").cast("double")
                / F.sum(rev).cast("string").cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@declared(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10 AND l_quantity <= 40)
       OR (p_brand = 'Brand#7' AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 20 AND l_quantity <= 50)
    """,
    doc="TPC-H Q19 shape: OR-of-AND predicate bundles across both join "
    "sides — Catalyst extracts the common join key and pushes the "
    "single-side conjuncts below the join.",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    b = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#20") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 40))
        | ((F.col("p_brand") == "Brand#7") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 50))
    )
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(DEC6)
    return j.filter(b).agg(F.sum(rev).cast("double").alias("revenue"))


@declared(
    "window_ntile_quartiles",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal, c_custkey) AS INT) AS quartile
    FROM customer
    """,
    doc="NTILE quartiles per market segment (unique tiebreak on custkey "
    "keeps bucket assignment deterministic). Scale shape: c_mktsegment "
    "has 5 values, so an NTILE window partitioned by it runs each "
    "segment's sort in ONE task (the r10-verdict low-NDV straggler "
    "class) — instead, per-segment row numbers come from "
    "ranks.grouped_row_numbers (one range shuffle, parallelism n_parts) "
    "and the ANSI bucket formula ranks.ntile_from_rn reproduces NTILE "
    "bit-identically from (rn, segment size).",
)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_synchronize_tool_spark.operators.ranks import (
        grouped_row_numbers,
        ntile_from_rn,
    )

    c = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_custkey", "c_acctbal"
    )
    rn = grouped_row_numbers(
        c, "c_mktsegment", [F.col("c_acctbal"), F.col("c_custkey")], "__rn"
    )
    sizes = c.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("__n"))
    # eqNullSafe sizes join: grouped_row_numbers deliberately ranks a NULL
    # segment as a real group, so the sizes broadcast must not drop it
    # (r11 advice — null-unsafe name join disagreed with the rank side)
    return (
        rn.join(
            F.broadcast(sizes.withColumnRenamed("c_mktsegment", "__seg")),
            F.col("c_mktsegment").eqNullSafe(F.col("__seg")),
        )
        .select(
            "c_mktsegment",
            "c_custkey",
            ntile_from_rn(F.col("__rn"), F.col("__n"), 4).alias("quartile"),
        )
    )


@declared(
    "map_functions_showcase",
    oracle="""
    SELECT event_id,
           CAST(len(map_keys(m)) AS INT) AS n_keys,
           map_keys(m)[1] AS first_key,
           m['type'][1] AS type_value
    FROM (
      SELECT event_id, MAP {'type': event_type, 'user': CAST(user_id AS VARCHAR)} AS m
      FROM events
    )
    """,
    doc="Map-type surface: construct a map column, inspect keys, index by "
    "key — create_map/map_keys/element_at (the engine's MapType story for "
    "jsonb-like semi-structured data).",
)
def map_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("user"), F.col("user_id").cast("string"),
    )
    return ev.select(
        "event_id",
        F.size(F.map_keys(m)).cast("int").alias("n_keys"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.element_at(m, "type").alias("type_value"),
    )


@declared(
    "date_functions_showcase",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(date_part('year', o_orderdate) AS INT) AS order_year,
           CAST(date_part('dow', o_orderdate) AS INT) AS order_dow,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT)
             AS days_to_y2k
    FROM orders
    """,
    doc="Date/time function surface: truncation, parts, month boundaries, "
    "date arithmetic — identical semantics on both engines (dow: Sunday=0).",
)
def date_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("order_dow"),
        F.last_day(od).alias("month_end"),
        F.datediff(F.lit("2000-01-01").cast("date"), od).cast("int").alias("days_to_y2k"),
    )


@declared(
    "q2_min_per_group_scalar_subquery",
    oracle="""
    SELECT p.p_partkey, p.p_brand, p.p_retailprice
    FROM part p
    WHERE p.p_retailprice = (
      SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
    )
    """,
    doc="TPC-H Q2 shape: correlated scalar subquery (min per group) — "
    "Catalyst decorrelates into an aggregate + join; written through the "
    "SQL front door.",
)
def q2_min_per_group_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_synchronize_tool_spark.catalog import register_views

    register_views(spark, sf_dir, ("part",))
    return spark.sql(
        """
        SELECT p.p_partkey, p.p_brand, p.p_retailprice
        FROM part p
        WHERE p.p_retailprice = (
          SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
        )
        """
    )


@declared(
    "agg_approx_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           TRUE AS within_bound
    FROM orders GROUP BY o_orderstatus
    """,
    doc="approx_count_distinct (HyperLogLog++) per order status — at 100 TB "
    "the sketch is what you'd run INSTEAD of exact COUNT(DISTINCT) (no "
    "giant shuffle of distinct keys; mergeable partial sketches). This "
    "declared query computes BOTH on purpose: the exact count is what the "
    "oracle independently verifies; the within_bound boolean (sketch "
    "within 5% of exact, rsd=0.02) is computed Spark-side and the oracle "
    "hardcodes TRUE — so the bound is self-reported, not independently "
    "checked (a >5% drift still fails the hash, but the real error-bound "
    "evidence is tests/test_sketches.py, which asserts the raw relative "
    "error directly).",
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count_distinct("o_custkey").cast("long").alias("exact_customers"),
        (
            F.abs(
                F.approx_count_distinct("o_custkey", rsd=0.02)
                - F.count_distinct("o_custkey")
            )
            / F.count_distinct("o_custkey")
            <= F.lit(0.05)
        ).alias("within_bound"),
    )


@declared(
    "agg_exact_percentiles",
    oracle="""
    SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.5) AS p50,
           quantile_cont(o_totalprice, 0.9) AS p90
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Exact percentiles (linear interpolation) per group — Spark "
    "percentile() and DuckDB quantile_cont share the interpolation "
    "definition, so the doubles match bit-for-bit on identical sorted "
    "inputs.",
)
def agg_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
    )


@declared(
    "agg_approx_percentile",
    oracle="""
    SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.5) AS exact_p50,
           TRUE AS within_rank_bound
    FROM orders GROUP BY o_orderstatus
    """,
    doc="approx_percentile (Greenwald-Khanna sketch, accuracy=100 => rank "
    "error <= 1%) per order status — the quantile sketch that replaces an "
    "exact per-group sort at 100 TB (mergeable partial summaries, no "
    "full-column shuffle-sort). Same verification pattern as "
    "agg_approx_count_distinct: the oracle independently verifies only "
    "the exact p50; within_rank_bound (sketch p50 between the exact 0.48 "
    "and 0.52 quantiles, i.e. inside a 2x-cushioned rank band) is "
    "computed Spark-side, so a sketch drifting past its rank guarantee "
    "flips the boolean and fails the hash.",
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("exact_p50"),
        F.expr(
            "approx_percentile(o_totalprice, 0.5, 100) "
            "BETWEEN percentile(o_totalprice, 0.48) "
            "AND percentile(o_totalprice, 0.52)"
        ).alias("within_rank_bound"),
    )


@declared(
    "unpivot_order_metrics",
    oracle="""
    SELECT o_orderkey, metric, val
    FROM (SELECT o_orderkey, o_totalprice, CAST(o_custkey AS DOUBLE) AS o_custkey_d
          FROM orders)
    UNPIVOT (val FOR metric IN (o_totalprice, o_custkey_d))
    """,
    doc="UNPIVOT/melt (wide→long, the inverse of pivot_status_by_year): "
    "narrow map-side transform, no shuffle.",
)
def unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.col("o_custkey").cast("double").alias("o_custkey_d"),
    )
    return o.unpivot(
        ids=["o_orderkey"],
        values=["o_totalprice", "o_custkey_d"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@declared(
    "join_strategy_hints",
    oracle="""
    SELECT n.n_name, COUNT(*) AS n_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="Join-strategy hint surface: the same equi-join planned with an "
    "explicit SHUFFLE_MERGE hint (overriding the broadcast default) — "
    "results identical by definition; the hint API is how a 100 TB job "
    "pins a strategy when statistics mislead the optimizer.",
)
def join_strategy_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").hint("shuffle_merge")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@declared(
    "set_intersect_all_statuses",
    oracle="""
    SELECT o_orderstatus FROM orders WHERE o_totalprice > 100000
    INTERSECT ALL
    SELECT o_orderstatus FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    """,
    doc="INTERSECT ALL (bag semantics — duplicate-preserving, min of the "
    "two multiplicities per value).",
)
def set_intersect_all_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 100000).select("o_orderstatus")
    b = o.filter(F.col("o_orderdate") >= F.expr("timestamp'1997-01-01'")).select(
        "o_orderstatus"
    )
    return a.intersectAll(b)


@declared(
    "set_except_all_statuses",
    oracle="""
    SELECT o_orderstatus FROM orders WHERE o_totalprice > 100000
    EXCEPT ALL
    SELECT o_orderstatus FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    """,
    doc="EXCEPT ALL (bag difference — multiplicities subtract).",
)
def set_except_all_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 100000).select("o_orderstatus")
    b = o.filter(F.col("o_orderdate") >= F.expr("timestamp'1997-01-01'")).select(
        "o_orderstatus"
    )
    return a.exceptAll(b)


@declared(
    "j6_range_join_value_bands",
    oracle="""
    SELECT band, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    JOIN (VALUES ('low', 0.0, 10.0), ('mid', 10.0, 100.0), ('high', 100.0, 1e9))
         AS bands(band, lo, hi)
      ON value >= lo AND value < hi
    GROUP BY band
    """,
    doc="J6 range (non-equi) join: events banded against interval boundaries "
    "— with a tiny boundary table the right physical plan IS "
    "BroadcastNestedLoopJoin (each row tests 3 intervals in-place, no "
    "shuffle); at many-interval scale this becomes a sorted bucket lookup "
    "(F.bucket / searchsorted UDF) instead.",
)
def j6_range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bands = ev.sparkSession.createDataFrame(
        [("low", 0.0, 10.0), ("mid", 10.0, 100.0), ("high", 100.0, 1e9)],
        "band string, lo double, hi double",
    )
    return (
        ev.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
    )


@declared(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(date_part('year', l.l_shipdate) AS INT) AS l_year,
           CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE n1.n_name <> n2.n_name
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    GROUP BY n1.n_name, n2.n_name, 3
    """,
    doc="TPC-H Q7 volume shipping: six-way join with the nation dim joined "
    "twice under different roles (supplier vs customer side) — both "
    "broadcast; facts shuffle only on the orderkey join.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.expr("timestamp'1996-01-01'")
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(_dsum(_revenue(), "revenue", DEC6))
    )


@declared(
    "q15_top_supplier",
    oracle="""
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no,
             CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue0 r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
    """,
    doc="TPC-H Q15 top supplier: revenue view + scalar-subquery max filter "
    "(decimal-exact revenue makes the max deterministic).",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("timestamp'1997-01-01'"))
        & (F.col("l_shipdate") < F.expr("timestamp'1997-04-01'"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dsum(_revenue(), "total_revenue", DEC6)
    )
    max_rev = rev.agg(F.max("total_revenue").alias("m"))
    return (
        s.join(rev, s.s_suppkey == rev.supplier_no)
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@declared(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11'
      AND l.l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
    """,
    doc="TPC-H Q17 small-quantity order revenue: correlated scalar AVG "
    "subquery per part (Catalyst decorrelates to an aggregate+join; AVG "
    "of doubles is a single sum/count division — deterministic only "
    "because each part group is small and DuckDB sums in the same "
    "arrival order; the brand filter keeps groups tiny).",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_synchronize_tool_spark.catalog import register_views

    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
               AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#11'
          AND l.l_quantity < (
            SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = l.l_partkey
          )
        """
    )


@declared(
    "q18_large_orders",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    doc="TPC-H Q18 large orders: IN-subquery with HAVING (left-semi join "
    "against the pre-aggregated key set), then the detail join-aggregate.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC2)).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast(DEC2)).cast("double").alias("total_qty"))
    )


@declared(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM (
      SELECT substr(c_name, 10, 1) AS cntrycode, c_acctbal
      FROM customer c
      WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(28,10))) AS DOUBLE)
               / COUNT(*)
        FROM customer c2 WHERE c2.c_acctbal > 0.0
      )
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
    )
    GROUP BY cntrycode
    """,
    doc="TPC-H Q22 shape: uncorrelated scalar AVG subquery + anti-join "
    "(NOT EXISTS) + substring-derived grouping key. The threshold is "
    "SUM(DECIMAL)/COUNT with ONE double division on both engines — "
    "Spark's decimal AVG and DuckDB's double-accumulated AVG round "
    "differently at the comparison boundary (round-7 review), and a "
    "boundary-row flip changes numcust/totacctbal.",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(28,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("ab")
        )
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(
            o.filter(F.col("o_totalprice") > 300000)
            .select(F.col("o_custkey").alias("c_custkey")),
            "c_custkey",
            "left_anti",
        )
        .select(F.substring("c_name", 10, 1).alias("cntrycode"), "c_acctbal")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC2)).cast("double").alias("totacctbal"),
        )
    )


@declared(
    "window_cume_dist_percent_rank",
    oracle="""
    SELECT s_suppkey,
           cume_dist() OVER (ORDER BY s_acctbal, s_suppkey) AS cd,
           percent_rank() OVER (ORDER BY s_acctbal, s_suppkey) AS pr
    FROM supplier
    """,
    doc="Distribution window functions (cume_dist / percent_rank) over a "
    "global ordering with unique tiebreak. The oracle keeps the literal "
    "window functions; the Spark side reproduces them from the range-"
    "partitioned two-pass global row number (operators/ranks."
    "global_row_numbers): with a UNIQUE total order, cume_dist = rn/n "
    "and percent_rank = (rn-1)/(n-1) — each one exact-integer-to-double "
    "division, bit-identical to the engines' own definitions, with no "
    "single-partition sort of the base table.",
)
def window_cume_dist_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_synchronize_tool_spark.operators.ranks import (
        global_row_numbers,
    )

    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    r = global_row_numbers(
        s, [F.col("s_acctbal"), F.col("s_suppkey")], "__rn"
    )
    n = r.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    return r.crossJoin(F.broadcast(n)).select(
        "s_suppkey",
        (F.col("__rn").cast("double") / F.col("__n").cast("double")).alias(
            "cd"
        ),
        # percent_rank() is DEFINED as 0 for a single-row partition; the
        # raw (rn-1)/(n-1) would be a NULL-making 0/0 there (r10 review)
        F.when(
            F.col("__n") > 1,
            (F.col("__rn") - F.lit(1)).cast("double")
            / (F.col("__n") - F.lit(1)).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("pr"),
    )


@declared(
    "grouping_sets_events",
    oracle="""
    SELECT event_type, CAST(date_part('hour', ts) AS INT) AS hr,
           COUNT(*) AS n, GROUPING(event_type) AS g_type,
           GROUPING(hr) AS g_hr
    FROM events
    GROUP BY GROUPING SETS ((event_type), (hr), (event_type, hr))
    """,
    doc="GROUPING SETS (the general form under cube/rollup) with GROUPING() "
    "markers disambiguating real NULLs from subtotal rows.",
)
def grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_synchronize_tool_spark.catalog import register_views

    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        """
        SELECT event_type, CAST(hour(ts) AS INT) AS hr,
               COUNT(*) AS n, CAST(GROUPING(event_type) AS BIGINT) AS g_type,
               CAST(GROUPING(hour(ts)) AS BIGINT) AS g_hr
        FROM events
        GROUP BY GROUPING SETS ((event_type), (hour(ts)), (event_type, hour(ts)))
        """
    )


@declared(
    "window_first_last_nth",
    oracle="""
    SELECT s_suppkey, s_nationkey,
           FIRST_VALUE(s_acctbal) OVER w AS first_bal,
           LAST_VALUE(s_acctbal)  OVER w AS last_bal,
           NTH_VALUE(s_acctbal, 2) OVER w AS second_bal
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="first/last/nth_value over an explicit full-partition frame (the "
    "default frame would make last_value degenerate to the current row). "
    "Scale shape (r12: the data-derived NDV sweep caught the original "
    "25-task nationkey window): under the full-frame deterministic order "
    "(s_acctbal, s_suppkey), first/last_value are the min/max-STRUCT "
    "aggregates (one map-side-combined shuffle, no per-group sort) and "
    "nth_value(2) is the rn=2 row from ranks.grouped_row_numbers (one "
    "range shuffle, parallelism independent of group count); the "
    "per-group scalars broadcast back onto the fact rows.",
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_synchronize_tool_spark.operators.ranks import (
        grouped_row_numbers,
    )

    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    key = F.struct("s_acctbal", "s_suppkey")
    ends = s.groupBy("s_nationkey").agg(
        F.min(key)["s_acctbal"].alias("first_bal"),
        F.max(key)["s_acctbal"].alias("last_bal"),
    )
    rn = grouped_row_numbers(
        s, "s_nationkey", [F.col("s_acctbal"), F.col("s_suppkey")], "__rn"
    )
    seconds = rn.filter(F.col("__rn") == 2).select(
        F.col("s_nationkey").alias("__g2"),
        F.col("s_acctbal").alias("second_bal"),
    )
    # eqNullSafe broadcasts: grouped_row_numbers ranks a NULL group as a
    # real group, so the per-group scalars must not drop it
    return (
        s.join(
            F.broadcast(ends.withColumnRenamed("s_nationkey", "__g1")),
            F.col("s_nationkey").eqNullSafe(F.col("__g1")),
            "left",
        )
        .join(
            F.broadcast(seconds),
            F.col("s_nationkey").eqNullSafe(F.col("__g2")),
            "left",
        )
        .select(
            "s_suppkey", "s_nationkey", "first_bal", "last_bal", "second_bal"
        )
    )


@declared(
    "array_agg_sorted_per_group",
    oracle="""
    SELECT s_nationkey,
           array_to_string(list_sort(list(s_suppkey)), ',') AS suppkeys,
           CAST(len(list(s_suppkey)) AS INT) AS n
    FROM supplier GROUP BY s_nationkey
    """,
    doc="Grouped array aggregation: collect_list is order-nondeterministic "
    "by contract, so the engine always sorts the collected array before "
    "surfacing it — the only deterministic form at any parallelism. The "
    "declared output serializes the array to a CSV string so the harness "
    "compares hashable scalars (list cells crash its canonicalizer).",
)
def array_agg_sorted_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    return s.groupBy("s_nationkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("s_suppkey"))).alias(
            "suppkeys"
        ),
        F.size(F.collect_list("s_suppkey")).cast("int").alias("n"),
    )


@declared(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume_dec
                         ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
           / CAST(SUM(volume_dec) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(date_part('year', o.o_orderdate) AS INT) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)) AS volume_dec,
             n2.n_name AS nation
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n1.n_regionkey
      JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    )
    GROUP BY o_year
    """,
    doc="TPC-H Q8 market share: the deepest join in the set (7 tables, "
    "nation twice) — one fact shuffle on orderkey, every dim broadcast; "
    "share = conditional decimal sum / total decimal sum, one double "
    "division per year.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.cast(DEC6).alias("volume_dec"),
            "nation",
        )
    )
    num = F.sum(
        F.when(F.col("nation") == "NATION_3", F.col("volume_dec")).otherwise(
            F.lit(0).cast(DEC6)
        )
    ).cast("double")
    return base.groupBy("o_year").agg(
        (num / F.sum("volume_dec").cast("double")).alias("mkt_share")
    )


@declared(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    doc="TPC-H Q13 customer order-count distribution: outer join with a "
    "join-level predicate (kept customers count 0), then a second "
    "aggregate over the counts — two small shuffles.",
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@declared(
    "q21_sole_supplier_orders",
    oracle="""
    SELECT s.s_name, COUNT(DISTINCT l1.l_orderkey) AS n_orders
    FROM lineitem l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    """,
    doc="TPC-H Q21 shape (adapted to available columns): EXISTS + "
    "NOT EXISTS against the same fact table — suppliers who were the "
    "SOLE supplier on finished orders. Catalyst plans the pair as "
    "left-semi + left-anti joins on the orderkey.",
)
def q21_sole_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_synchronize_tool_spark.catalog import register_views

    register_views(spark, sf_dir, ("lineitem", "supplier", "orders"))
    return spark.sql(
        """
        SELECT s.s_name, COUNT(DISTINCT l1.l_orderkey) AS n_orders
        FROM lineitem l1
        JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY s.s_name
        """
    )


@declared(
    "q9_product_type_profit",
    oracle="""
    SELECT nation, o_year, CAST(SUM(profit_dec) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(date_part('year', o.o_orderdate) AS INT) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount)
                  - 0.6 * p.p_retailprice * l.l_quantity AS DECIMAL(18,6)) AS profit_dec
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%gear%'
    )
    GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 product-type profit (adapted: the schema has no partsupp, "
    "so supply cost is the deterministic proxy 0.6*p_retailprice per unit). "
    "Five-table join — one fact shuffle on orderkey, every dim broadcast, "
    "name-LIKE filter pushed into the part scan — then a (nation, year) "
    "hash aggregate with map-side partials. Profit goes through DECIMAL so "
    "the mixed +/- sum is order-insensitive.",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            profit.cast(DEC6).alias("profit_dec"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("profit_dec").cast("double").alias("sum_profit"))
    )


@declared(
    "q11_important_part_value",
    oracle="""
    WITH v AS (
      SELECT l.l_partkey,
             SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS value_dec
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name IN ('NATION_5', 'NATION_6', 'NATION_7')
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
    FROM v
    WHERE CAST(value_dec AS DOUBLE) >
          (SELECT CAST(SUM(value_dec) AS DOUBLE) FROM v) * 0.001
    """,
    doc="TPC-H Q11 important stock (adapted: no partsupp, so per-part value "
    "is revenue routed through suppliers of three nations). Group-aggregate "
    "vs global-aggregate threshold: the per-part decimal sums are computed "
    "once, the grand total is a one-row broadcast joined back (no second "
    "fact scan), and the HAVING-style filter keeps parts above 0.1% of "
    "total — a scale-free relative threshold.",
)
def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_5", "NATION_6", "NATION_7")
    )
    v = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(_revenue().cast(DEC6)).alias("value_dec"))
    )
    tot = v.agg(F.sum("value_dec").cast("double").alias("tot"))
    return (
        v.crossJoin(F.broadcast(tot))
        .filter(F.col("value_dec").cast("double") > F.col("tot") * 0.001)
        .select("l_partkey", F.col("value_dec").cast("double").alias("part_value"))
    )


@declared(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 parts/supplier relationship (adapted: lineitem stands in "
    "for partsupp; suppliers with negative balance stand in for the "
    "complaints exclusion). NOT-IN over a non-null key compiles to a "
    "broadcast left_anti join; the brand/type/size predicates push into "
    "the part scan; COUNT(DISTINCT) runs as a two-phase expand+agg.",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@declared(
    "q20_potential_part_promotion",
    oracle="""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'red%'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l.l_suppkey
      HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 300
    ) AND s.s_acctbal > 0
    """,
    doc="TPC-H Q20 potential part promotion (adapted: the availqty>half-"
    "shipped test becomes shipped-quantity-above-threshold, no partsupp). "
    "Nested IN-subquery = aggregate-then-left_semi: the red/1997 filters "
    "push into the part/lineitem scans, quantities sum exactly via "
    "DECIMAL, and the qualifying supplier keys semi-join the supplier "
    "table (broadcast — the agg output is tiny).",
)
def q20_potential_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("timestamp'1997-01-01'"))
        & (F.col("l_shipdate") < F.expr("timestamp'1998-01-01'"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 0)
    qualifying = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC2)).alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_suppkey")
    )
    return s.join(
        F.broadcast(qualifying), s.s_suppkey == qualifying.l_suppkey, "left_semi"
    ).select("s_name", "s_acctbal")


@declared(
    "stats_grouped_ols_trend",
    oracle="""
    WITH s AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                 AS BIGINT)) AS sx,
             SUM(CAST(value AS DECIMAL(18,6))) AS sy,
             SUM(CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                 AS BIGINT) * CAST(value AS DECIMAL(18,6))) AS sxy,
             SUM(CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                 AS BIGINT) * CAST(date_diff('day', DATE '2024-01-01',
                 CAST(ts AS DATE)) AS BIGINT)) AS sxx
      FROM events GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
                / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
                AS DOUBLE) AS slope
    FROM s
    """,
    doc="Grouped OLS trend (closed-form least squares): per event_type, the "
    "slope of value over days-since-2024-01-01 via the single-pass "
    "sufficient statistics (n, Sx, Sy, Sxy, Sxx) — the map-side-combinable "
    "form that replaces any iterative fit at 100 TB (one aggregate, no "
    "second pass, mergeable partials). Every sum is integer or DECIMAL "
    "(order-exact); only the final slope division happens in doubles, with "
    "identical association on both engines and via-string decimal->double "
    "conversions (correctly rounded on both engines, r14). Spark's built-in regr_slope "
    "would sum doubles in partition order and flap the hash — this is the "
    "deterministic equivalent.",
)
def stats_grouped_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    x = F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01")).cast("long")
    y = F.col("value").cast("decimal(18,6)")
    s = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    # via-string decimal->double: correctly rounded on both engines (the
    # pearson r14 fix; the direct cast diverges on >2^53 significands)
    num = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("string")
        .cast("double")
    )
    den = (
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("string")
        .cast("double")
    )
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        (num / den).cast("double").alias("slope"),
    )


@declared(
    "stats_pearson_exact",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
             SUM(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
             SUM(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           CAST(CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
                / (sqrt(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE))
                   * sqrt(CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE)))
                AS DOUBLE)
             AS pearson_r
    FROM s
    """,
    doc="Exact Pearson correlation (quantity vs extended price per return "
    "flag) from DECIMAL sufficient statistics — same single-pass mergeable "
    "shape as the OLS trend. The only floating-point steps are two sqrt "
    "calls (IEEE 754 requires sqrt correctly rounded, so both engines "
    "agree bit-for-bit), one multiply, one divide, written with identical "
    "association, and the decimal->double conversions go VIA STRING so "
    "they are correctly rounded on both engines (>2^53 significands "
    "diverge under the direct cast — r14 sf0.1 sweep finding) "
    "association. Spark's corr() sums doubles in partition order — "
    "nondeterministic at the hash level; this is the order-exact form.",
)
def stats_pearson_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    # decimal -> double through a STRING cast (r14, caught by the sf0.1
    # sweep): these exact decimals carry >2^53 significands, and the
    # DIRECT decimal->double conversion is 1 ulp off between engines
    # (measured: DuckDB 0x...819 vs correctly rounded 0x...818). A
    # decimal->string cast is exact and string->double is REQUIRED to be
    # correctly rounded on both engines (Double.parseDouble / fast_float),
    # so the via-string conversion is bit-identical always.
    def d(c):
        return c.cast("string").cast("double")

    num = d(F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
    denx = F.sqrt(d(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")))
    deny = F.sqrt(d(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")))
    return s.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        (num / (denx * deny)).cast("double").alias("pearson_r"),
    )


@declared(
    "agg_argmax_showcase",
    oracle="""
    SELECT o_orderpriority,
           arg_max(o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) * 1000000000000
                               + o_orderkey) AS max_price_orderkey,
           arg_min(o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) * 1000000000000
                               + o_orderkey) AS min_price_orderkey,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Argmax/argmin without a sort or window: max_by/min_by (DuckDB "
    "arg_max/arg_min) per priority — one hash aggregate with map-side "
    "partials, the way to fetch the extreme row's payload at 100 TB "
    "(a rank-1 window would shuffle AND sort every partition). Prices tie "
    "across orders, and both engines break ties arbitrarily — so the "
    "ordering value is the DECIMAL pack price*1e12 + orderkey — "
    "collision-free while o_orderkey < 1e10 (adjacent 0.01 price steps "
    "differ by 1e10 pack units; TPC-H sf1000 tops out near 6e9 orderkeys), "
    "making the winner unique and portable across engines.",
)
def agg_argmax_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    pack = F.col("o_totalprice").cast("decimal(18,2)") * F.lit(1000000000000).cast(
        "decimal(18,0)"
    ) + F.col("o_orderkey")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", pack).alias("max_price_orderkey"),
        F.min_by("o_orderkey", pack).alias("min_price_orderkey"),
        F.max(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("max_price"),
    )


@declared(
    "skew_key_diagnostics",
    oracle="""
    WITH k AS (
      SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_orderkey
    ), t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM k)
    SELECT l_orderkey, CAST(cnt AS BIGINT) AS cnt,
           CAST(CAST(cnt AS DOUBLE) / (SELECT total FROM t) AS DOUBLE) AS share
    FROM k ORDER BY cnt DESC, l_orderkey LIMIT 10
    """,
    doc="Join-key skew diagnostics: the top-10 heaviest l_orderkey values "
    "with their row share — what you run BEFORE choosing a salting factor "
    "or trusting AQE's skew-join split on a 100 TB join. One "
    "map-side-combined aggregate + TakeOrdered(10); the share division is "
    "a single double op. The operational complement to "
    "skew_salted_twophase_agg (which fixes the skew this query "
    "localizes).",
)
def skew_key_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # one scan: rollup emits the per-key counts AND the grand-total row
    # (NULL key) from a single two-level aggregate — no second scan, and
    # nothing the size of the key histogram is ever materialized
    r = (
        li.rollup("l_orderkey")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)  # two consumers; blocks = the histogram
    )
    k = r.filter(F.col("l_orderkey").isNotNull())
    total = r.filter(F.col("l_orderkey").isNull()).select(
        F.col("cnt").cast("long").alias("total")
    )
    return (
        k.crossJoin(F.broadcast(total))
        .select(
            "l_orderkey",
            F.col("cnt").cast("long").alias("cnt"),
            (F.col("cnt").cast("double") / F.col("total")).cast("double").alias("share"),
        )
        .orderBy(F.col("cnt").desc(), "l_orderkey")
        .limit(10)
    )


@declared(
    "orders_dow_seasonality",
    oracle="""
    WITH d AS (
      SELECT CAST(date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
                  % 7 AS INT) AS dow,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders
    ), g AS (
      SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_orders,
             SUM(price) AS rev
      FROM d GROUP BY dow
    ), t AS (SELECT SUM(rev) AS tot FROM g)
    SELECT g.dow, g.n_orders,
           CAST(g.rev AS DOUBLE) AS revenue,
           CAST(g.rev AS DOUBLE) / CAST(t.tot AS DOUBLE) AS revenue_share
    FROM g, t
    """,
    doc="Day-of-week revenue seasonality: weekday derived as integer days "
    "since a known Monday (1990-01-01, before all data so the diff is non-negative — truncated %% of a negative diff would mint a phantom dow -1) mod 7 — dow 0 = Monday — because "
    "the engines' native dayofweek() disagree on the week start "
    "(Spark: Sunday=1; DuckDB: Sunday=0) and integer arithmetic cannot. "
    "DECIMAL revenue sums, two final divisions with identical "
    "association. One hash aggregate to 7 rows; the share denominator "
    "is an aggregate OF the aggregate (7 rows, no second scan).",
)
def orders_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    dow = (
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1990-01-01"))
        % 7
    ).cast("int")
    g = o.select(
        dow.alias("dow"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    ).groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("price").alias("rev"),
    )
    tot = F.sum("rev").over(Window.partitionBy())
    return g.select(
        "dow",
        "n_orders",
        F.col("rev").cast("double").alias("revenue"),
        (F.col("rev").cast("double") / tot.cast("double")).alias(
            "revenue_share"
        ),
    )


@declared(
    "lineitem_revenue_waterfall",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS gross,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_discount AS DECIMAL(18,2))) AS discount_amt,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))
                 * CAST(l_tax AS DECIMAL(18,2))) AS tax_amt
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(CAST(gross AS VARCHAR) AS DOUBLE) AS gross,
           CAST(CAST(discount_amt AS VARCHAR) AS DOUBLE) AS discount_amt,
           CAST(CAST(gross - discount_amt AS VARCHAR) AS DOUBLE) AS net,
           CAST(CAST(tax_amt AS VARCHAR) AS DOUBLE) AS tax_amt,
           CAST(CAST(gross - discount_amt + tax_amt AS VARCHAR) AS DOUBLE)
             AS charged
    FROM s
    """,
    doc="Revenue waterfall per return flag: gross -> minus discount -> "
    "net -> plus tax -> charged, every stage a DECIMAL-exact sum (the "
    "q1 discipline) so the stages ALGEBRAICALLY reconcile — "
    "net + tax = charged holds bit-for-bit, not approximately, because "
    "no float ever enters before the final casts. This is the finance "
    "reconciliation read where approximate sums are unacceptable; one "
    "hash aggregate with map-side partials, mergeable across shards by "
    "addition. The final decimal->double conversions go VIA STRING "
    "(r15: the SWEEP_r15_sf1 sweep caught the charged column — scale-6 "
    "decimal, significand ~1.05e17 at sf1 — 1 ulp apart across engines; "
    "the direct cast is only correctly rounded below 2^53, the r14 "
    "pearson rule).",
)
def lineitem_revenue_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ep = F.col("l_extendedprice").cast("decimal(18,2)")
    dc = F.col("l_discount").cast("decimal(18,2)")
    tx = F.col("l_tax").cast("decimal(18,2)")
    s = li.groupBy("l_returnflag").agg(
        F.sum(ep).alias("gross"),
        F.sum(ep * dc).alias("discount_amt"),
        F.sum(ep * (F.lit(1) - dc) * tx).alias("tax_amt"),
    )
    def via_str(c):
        # via-string decimal->double: correctly rounded on both engines
        # at ANY magnitude (direct cast diverges past 2^53 significands)
        return c.cast("string").cast("double")

    return s.select(
        "l_returnflag",
        via_str(F.col("gross")).alias("gross"),
        via_str(F.col("discount_amt")).alias("discount_amt"),
        via_str(F.col("gross") - F.col("discount_amt")).alias("net"),
        via_str(F.col("tax_amt")).alias("tax_amt"),
        via_str(
            F.col("gross") - F.col("discount_amt") + F.col("tax_amt")
        ).alias("charged"),
    )
