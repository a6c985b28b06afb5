"""Event-behavior analytics and curation layout queries (round 8).

Product-analytics shapes a sync'd events table feeds downstream — funnels,
retention cohorts, time-range rolling features, mergeable exact distinct
rollups — plus a per-source corpus cap. The reference ships the events data
path (db-sync-gcp syncs an append-only event log); these are the queries a
warehouse consumer runs on top of it, re-expressed Spark-first.

Scale notes (100 TB):
- The funnel and cohort queries reduce events to one row per user (or per
  user x week) with a single hash aggregate before any join — the shuffled
  key is ``user_id``, never the raw event stream.
- The rolling-feature window partitions by ``user_id``; no global window
  (WindowExec "no partition" single-partition collapse) anywhere.
- ``bitmap_rollup_distinct`` is the mergeable-sketch pattern for exact
  COUNT(DISTINCT) maintenance: daily (type, bucket) bitmaps OR-merge to the
  type level, so a new day's partition updates the rollup without rescanning
  history — the same partial-merge shape HLL sketches give approximately,
  but exact.
- ``curation_source_cap`` ranks within each source partition only (hash
  partition by source, no global sort); skewed mega-sources are the known
  hazard and the cap itself bounds the output, while the rank window is
  per-source and AQE splits skewed partitions.

Determinism: integer day arithmetic for cohorts; DECIMAL sums before any
double division; md5-hex ranking (identical in Spark and DuckDB); strict
``>`` timestamp comparisons on microsecond-resolution data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from database_synchronize_tool_spark.catalog import load_table
from database_synchronize_tool_spark.plans.registry import declared

_FUNNEL_STEPS = ("signup", "view", "click", "purchase")


@declared(
    "events_funnel_conversion",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    ), stages AS (
      SELECT
        (t_signup IS NOT NULL) AS r1,
        (t_signup IS NOT NULL AND t_view > t_signup) AS r2,
        (t_signup IS NOT NULL AND t_view > t_signup AND t_click > t_view) AS r3,
        (t_signup IS NOT NULL AND t_view > t_signup AND t_click > t_view
         AND t_purchase > t_click) AS r4
      FROM per_user
    )
    SELECT 1 AS step, 'signup' AS step_name,
           CAST(SUM(CASE WHEN r1 THEN 1 ELSE 0 END) AS BIGINT) AS users FROM stages
    UNION ALL
    SELECT 2, 'view', CAST(SUM(CASE WHEN r2 THEN 1 ELSE 0 END) AS BIGINT) FROM stages
    UNION ALL
    SELECT 3, 'click', CAST(SUM(CASE WHEN r3 THEN 1 ELSE 0 END) AS BIGINT) FROM stages
    UNION ALL
    SELECT 4, 'purchase', CAST(SUM(CASE WHEN r4 THEN 1 ELSE 0 END) AS BIGINT) FROM stages
    """,
    doc="Strict-sequence conversion funnel signup -> view -> click -> "
    "purchase: a user reaches step k only if the first occurrence of step "
    "k's event is strictly after the first occurrence of step k-1's. One "
    "hash aggregate to a per-user row (min-ts per step via conditional "
    "MIN), then a 4-row rollup — the event stream is shuffled once, keyed "
    "by user_id. Strict `>` on microsecond timestamps is tie-safe on this "
    "data and identical in both engines.",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t_{s}")
            for s in _FUNNEL_STEPS
        ]
    )
    reached = [F.col("t_signup").isNotNull()]
    for prev, cur in zip(_FUNNEL_STEPS, _FUNNEL_STEPS[1:]):
        reached.append(reached[-1] & (F.col(f"t_{cur}") > F.col(f"t_{prev}")))
    stages = per_user.select(
        *[r.alias(f"r{i+1}") for i, r in enumerate(reached)]
    )
    counts = stages.agg(
        *[
            F.sum(F.when(F.col(f"r{i+1}"), 1).otherwise(0))
            .cast("long")
            .alias(f"u{i+1}")
            for i in range(len(_FUNNEL_STEPS))
        ]
    )
    # 4-row unpivot of a single aggregated row: stack() is driver-free.
    return counts.selectExpr(
        "stack(4, 1, 'signup', u1, 2, 'view', u2, 3, 'click', u3, "
        "4, 'purchase', u4) AS (step, step_name, users)"
    )


@declared(
    "events_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(date_diff('day', DATE '2024-01-01',
                            CAST(MIN(ts) AS DATE)) // 7 AS INTEGER) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(date_diff('day', DATE '2024-01-01',
                            CAST(e.ts AS DATE)) // 7 AS INTEGER)
               - f.cohort_week AS week_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_week, week_offset,
           CAST(COUNT(*) AS BIGINT) AS active_users
    FROM activity GROUP BY cohort_week, week_offset
    """,
    doc="Weekly retention cohorts: cohort = integer week (7-day buckets "
    "anchored at 2024-01-01) of each user's first event; for every later "
    "event, the week offset from that cohort. Counts distinct users per "
    "(cohort, offset) cell. All-integer day arithmetic (datediff / 7 with "
    "truncating integer division on non-negative values) — no engine "
    "week-truncation semantics involved. Shuffles are keyed by user_id "
    "(first-event agg + the join back) then by the small (cohort, offset) "
    "pair; at 100 TB the firsts side is one row per user and the join is "
    "a plain shuffled hash join on the same user_id partitioning Spark "
    "reuses from the aggregate.",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    week = lambda c: F.floor(F.datediff(c, F.lit("2024-01-01")) / 7).cast("int")  # noqa: E731
    firsts = e.groupBy("user_id").agg(
        week(F.min("ts").cast("date")).alias("cohort_week")
    )
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (week(F.col("ts").cast("date")) - F.col("cohort_week")).alias(
                "week_offset"
            ),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count("*").cast("long").alias("active_users")
    )


@declared(
    "ts_rolling_features",
    oracle="""
    WITH t AS (
      SELECT event_id, user_id, value, epoch(ts) AS sec FROM events
    )
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h
    FROM t
    WINDOW w AS (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 3600.0 PRECEDING AND CURRENT ROW)
    """,
    doc="Per-user rolling 1-hour features (event count + value sum) via a "
    "RANGE window over fractional epoch seconds — the value-based frame "
    "Spark and DuckDB define identically, with microsecond-exact doubles "
    "(< 2^53) so there are no truncation ties. The window partitions by "
    "user_id: state per partition is one user's hour of events, never a "
    "global sort. The windowed sum goes through DECIMAL so frame "
    "accumulation order can't flap the double.",
)
def ts_rolling_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.col("ts").cast("timestamp").cast("double").alias("sec"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("long").alias("n_1h"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(w)
        .cast("double")
        .alias("sum_1h"),
    )


@declared(
    "bitmap_rollup_distinct",
    oracle="""
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users
    FROM events GROUP BY event_type
    """,
    doc="Exact COUNT(DISTINCT) by mergeable bitmaps: per (event_type, day, "
    "bucket) partial bitmaps (bitmap_construct_agg over "
    "bitmap_bit_position), OR-merged across days per (type, bucket), then "
    "summed bitmap_count per type. The oracle recomputes the plain exact "
    "distinct — values must match exactly. This is the incremental-"
    "maintenance shape for distinct counts at 100 TB: a new day's "
    "partition contributes new partial bitmaps that OR into the rollup "
    "without rescanning history, and the shuffled payload is fixed-size "
    "bitmap bytes per (type, day, bucket), not the distinct keys "
    "themselves.",
)
def bitmap_rollup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("event_type", "day", "bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    merged = daily.groupBy("event_type", "bucket").agg(
        F.expr("bitmap_or_agg(bm)").alias("bm")
    )
    return merged.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("distinct_users")
    )


@declared(
    "outlier_mad_orders",
    oracle="""
    WITH med AS (
      SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS m
      FROM orders GROUP BY o_orderpriority
    ), dev AS (
      SELECT o.o_orderpriority,
             quantile_cont(abs(o.o_totalprice - med.m), 0.5) AS mad
      FROM orders o JOIN med ON o.o_orderpriority = med.o_orderpriority
      GROUP BY o.o_orderpriority
    )
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN abs(0.6745 * (o.o_totalprice - med.m) / dev.mad)
                              > 3.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM orders o
    JOIN med ON o.o_orderpriority = med.o_orderpriority
    JOIN dev ON o.o_orderpriority = dev.o_orderpriority
    GROUP BY o.o_orderpriority
    """,
    doc="Robust outlier detection per order priority: modified z-score "
    "0.6745*(x - median)/MAD with the classic 3.5 cutoff. Two broadcast-"
    "joined scalar-per-group stats passes (median, then MAD) and a final "
    "aggregate — the stats side is 5 rows, so both joins broadcast and "
    "the orders fact is never shuffled by the stats. The double "
    "expression is written with identical association in both engines "
    "(single multiply, single subtract, single divide), so the cutoff "
    "comparison sees bit-identical values.",
)
def outlier_mad_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    med = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("m")
    )
    dev = (
        o.join(F.broadcast(med), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(abs(o_totalprice - m), 0.5)").alias("mad")
        )
    )
    z = F.abs(
        F.lit(0.6745) * (F.col("o_totalprice") - F.col("m")) / F.col("mad")
    )
    return (
        o.join(F.broadcast(med), "o_orderpriority")
        .join(F.broadcast(dev), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.when(z > 3.5, 1).otherwise(0)).cast("long").alias("n_outliers"),
        )
    )


@declared(
    "curation_source_cap",
    oracle="""
    WITH ranked AS (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    )
    SELECT source, doc_id, CAST(rk AS INTEGER) AS rk
    FROM ranked WHERE rk <= 10
    """,
    doc="Per-source document cap (RefinedWeb/C4-style host capping): keep "
    "at most K=10 docs per source, selected by a deterministic md5 "
    "shuffle order (identical hex in Spark and DuckDB) with doc_id as "
    "the unique tiebreak. The rank window partitions by source — no "
    "global sort — and the cap bounds each partition's output; at 100 TB "
    "a mega-source is one skewed window partition, which AQE splits, and "
    "the K rows survive regardless of source size.",
)
def curation_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_synchronize_tool_spark.operators.sampling import cap_per_group

    d = load_table(spark, sf_dir, "documents")
    capped = cap_per_group(d.select("source", "doc_id"), "source", "doc_id", 10)
    # re-derive the rank for the graded output (the operator drops it)
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id"
    )
    return capped.select("source", "doc_id", F.row_number().over(w).alias("rk"))


@declared(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
    doc="First-order behavioral transition matrix: per user, each adjacent "
    "event pair (ordered by ts with event_id tiebreak) counts one "
    "from_type -> to_type transition — the Markov-chain sufficient "
    "statistic for session modeling. One window partitioned by user_id "
    "(lead) + one small hash aggregate (|types|² rows); the event stream "
    "shuffles once on user_id and the aggregate's partials combine "
    "map-side.",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    return seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count("*").cast("long").alias("n"))


@declared(
    "market_basket_pairs",
    oracle="""
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 20
    """,
    doc="Market-basket co-occurrence: the top part pairs that appear in the "
    "same order. One shuffle of (order, part) keyed by order builds each "
    "basket's distinct sorted part set (collect_set does the per-order "
    "dedup in the same aggregate), the ordered a<b pairs stream out of "
    "TWO chained explodes in the same stage (posexplode each element, "
    "explode its tail slice — per-row memory O(basket), r15 verdict #8's "
    "mega-basket row-buffer guard), and a pair count + top-k finish. The "
    "r15 self-join form computed the distinct table twice (two full-width "
    "shuffles) and broadcast one copy — at 100 TB that broadcast falls "
    "back to a sort-merge join, i.e. a THIRD full shuffle; this form "
    "moves the base data exactly once and the per-order pair fan-out "
    "stays bounded by basket size, never N². Top-k is TakeOrdered with "
    "the (part_a, part_b) tiebreak making it deterministic.",
)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    # All a<b pairs of the sorted distinct set, generated as TWO chained
    # explodes in the same post-aggregation stage (no exchange between
    # them): posexplode streams one (i, part_a, parts) row per element,
    # and each row explodes only the tail slice after position i (1-based
    # slice start i+2; slice clamps at the array end). Same pair multiset
    # as the r15 single flatten-of-transforms explode, but per-ROW memory
    # is O(basket) instead of O(basket²) — the r15 form materialized the
    # full pair array of a basket inside one row, so one pathological
    # mega-basket at 100 TB became a row-buffer hazard (r15 verdict #8);
    # here the largest value any row holds is the parts array itself.
    # Total pair rows are unchanged (that is the declared output).
    lefts = baskets.select(
        F.posexplode("parts").alias("i", "part_a"), F.col("parts")
    )
    pairs = lefts.select(
        "part_a",
        F.explode(
            F.slice("parts", F.col("i") + F.lit(2), F.size("parts"))
        ).alias("part_b"),
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(20)
    )


@declared(
    "embedding_label_centroids",
    oracle="""
    SELECT label, i - 1 AS dim,
           CAST(SUM(CAST(floor(CAST(embedding AS DOUBLE[])[i]
                                * 1000000000.0 + 0.5) AS BIGINT))
                AS DOUBLE) / 1000000000.0 / COUNT(*) AS centroid
    FROM embeddings, (SELECT unnest(range(1, 65)) AS i) idx
    GROUP BY label, i
    """,
    doc="Per-label embedding centroids (class prototypes — the nearest-"
    "centroid classifier / SemDeDup seed): posexplode each vector to "
    "(label, dim, value), quantize each value with the EXPLICIT IEEE "
    "half-up rule floor(v*1e9 + 0.5) — the r14 sf0.1 sweep caught the "
    "previous cast-to-DECIMAL(18,9) form diverging, because a float32 "
    "value CAN be an exact 9-decimal midpoint (e.g. n·2^-10) and Spark "
    "rounds the cast HALF_UP while DuckDB rounds HALF_EVEN; the "
    "multiply/add/floor chain is one correctly-rounded IEEE op each, so "
    "both engines produce the identical integer ALWAYS — then exact "
    "integer sums and one identically-associated double division chain. "
    "One shuffle keyed by (label, dim) — |labels|·d cells regardless of "
    "corpus size, with map-side partials doing the reduction; the "
    "transpose-free alternative (array-typed zip_with fold) would be "
    "order-dependent in floats.",
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    cells = e.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>"))
    ).select(
        "label",
        F.col("pos").alias("dim"),
        F.floor(F.col("col") * F.lit(1.0e9) + F.lit(0.5)).alias("q"),
    )
    return cells.groupBy("label", "dim").agg(
        (
            # decimal(38,0) sum: exact at any corpus size (Spark's bigint
            # sum would wrap silently past 2^63; DuckDB's is HUGEINT)
            F.sum(F.col("q").cast("decimal(38,0)")).cast("double")
            / F.lit(1.0e9)
            / F.count("*")
        ).alias("centroid")
    )


@declared(
    "events_attribution_last_touch",
    oracle="""
    WITH seq AS (
      SELECT event_id, user_id, event_type, ts,
             last_value(CASE WHEN event_type IN ('view', 'click')
                             THEN event_id END IGNORE NULLS)
               OVER w AS touch_id,
             last_value(CASE WHEN event_type IN ('view', 'click')
                             THEN ts END IGNORE NULLS)
               OVER w AS touch_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id AS purchase_id, user_id, touch_id,
           CAST(epoch_us(ts) - epoch_us(touch_ts) AS BIGINT) AS lag_us
    FROM seq
    WHERE event_type = 'purchase' AND touch_id IS NOT NULL
      AND epoch_us(ts) - epoch_us(touch_ts) <= CAST(604800000000 AS BIGINT)
    """,
    doc="Last-touch attribution: each purchase credits the user's latest "
    "STRICTLY-prior view/click within 7 days — the carry-forward as-of "
    "pattern (one window per user with an ignorenulls last over the "
    "preceding-rows frame), not a join: at 100 TB the event stream sorts "
    "once per user partition and both the touch id and its timestamp ride "
    "the same WindowExec, so attribution costs one shuffle total. "
    "Integer-microsecond lag arithmetic on both engines.",
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin("view", "click")
    seq = e.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.last(F.when(is_touch, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("touch_id"),
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_ts"),
    )
    lag_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.col("touch_ts").cast("timestamp")
    )
    return (
        seq.filter(
            (F.col("event_type") == "purchase")
            & F.col("touch_id").isNotNull()
            & (lag_us <= F.lit(604800000000))
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "touch_id",
            lag_us.cast("long").alias("lag_us"),
        )
    )


@declared(
    "events_debounce",
    oracle="""
    WITH g AS (
      SELECT event_id, user_id, event_type, ts,
             LAG(ts) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS prev_ts
      FROM events
    )
    SELECT event_id, user_id, event_type
    FROM g
    WHERE prev_ts IS NULL
       OR epoch_us(ts) - epoch_us(prev_ts) > CAST(86400000000 AS BIGINT)
    """,
    doc="Debounce / burst suppression: keep only the FIRST event of each "
    "burst per (user, type) — a row survives when the previous raw event "
    "of the same key is more than 1 day older (island starts of the "
    "gaps-and-islands decomposition). One lag window per (user_id, "
    "event_type) partition, integer-microsecond gap compare; the "
    "telemetry dedup shape that cuts a 100 TB event firehose before "
    "anything downstream shuffles it again.",
)
def events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    g = e.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.lag("ts").over(w).alias("prev_ts"),
    )
    gap_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.col("prev_ts").cast("timestamp")
    )
    return g.filter(
        F.col("prev_ts").isNull() | (gap_us > F.lit(86400000000))
    ).select("event_id", "user_id", "event_type")


@declared(
    "events_rfm_scores",
    oracle="""
    WITH p AS (
      SELECT user_id, epoch_us(ts) AS us,
             CAST(FLOOR(value * 1000) AS BIGINT) AS v_mu
      FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL
    ), m AS (SELECT MAX(us) AS corpus_us FROM p),
    rfm AS (
      SELECT user_id,
             CAST(m.corpus_us - MAX(us) AS BIGINT) AS recency_us,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(v_mu) AS BIGINT) AS monetary_mu
      FROM p, m GROUP BY user_id, m.corpus_us
    )
    SELECT user_id, recency_us, frequency, monetary_mu,
           CAST(NTILE(4) OVER (ORDER BY recency_us, user_id) AS INT) AS r_q,
           CAST(NTILE(4) OVER (ORDER BY frequency DESC, user_id) AS INT)
             AS f_q,
           CAST(NTILE(4) OVER (ORDER BY monetary_mu DESC, user_id) AS INT)
             AS m_q
    FROM rfm
    """,
    doc="RFM (recency / frequency / monetary) behavioral scoring per user "
    "over purchase events: recency as integer microseconds behind the "
    "corpus watermark (no wall clock — reproducible), monetary in the "
    "milli-unit quantization (BIGINT-exact, the ts_time_weighted_avg "
    "discipline), and quartile scores via NTILE over (metric, user_id) "
    "total orders so ties cannot flap bins. Quartile 1 is best on every "
    "axis (most recent / most frequent / highest spend). Scale shape: "
    "events reduce to one row per user in ONE aggregate and that table "
    "is persisted once; the corpus watermark is a 1-row broadcast off "
    "it, and each NTILE is reproduced from the range-partitioned "
    "two-pass global row number (operators/ranks.global_row_numbers) "
    "plus the all-integer ANSI bucket formula — three range shuffles of "
    "the user table, zero single-partition sorts. The oracle keeps the "
    "literal NTILEs — the segmentation query behind every retention "
    "campaign, shaped to never re-scan raw events.",
)
def events_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_synchronize_tool_spark.caching import scoped_persist
    from database_synchronize_tool_spark.operators.ranks import (
        global_row_numbers,
        ntile_from_rn,
    )

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(
        (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
    ).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.floor(F.col("value") * 1000).cast("bigint").alias("v_mu"),
    )
    # per-user reduction FIRST, persisted: the corpus watermark and the
    # three rank passes all reuse the one events scan.
    per_user = scoped_persist(
        p.groupBy("user_id").agg(
            F.max("us").alias("last_us"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum("v_mu").cast("bigint").alias("monetary_mu"),
        )
    )
    corpus = per_user.agg(F.max("last_us").alias("__corpus_us"))
    rfm = per_user.crossJoin(F.broadcast(corpus)).select(
        "user_id",
        (F.col("__corpus_us") - F.col("last_us"))
        .cast("bigint")
        .alias("recency_us"),
        "frequency",
        "monetary_mu",
    )
    r1 = global_row_numbers(
        rfm, [F.col("recency_us"), F.col("user_id")], "__r_rn"
    )
    r2 = global_row_numbers(
        r1, [F.col("frequency").desc(), F.col("user_id")], "__f_rn"
    )
    r3 = global_row_numbers(
        r2, [F.col("monetary_mu").desc(), F.col("user_id")], "__m_rn"
    )
    n = r3.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    return r3.crossJoin(F.broadcast(n)).select(
        "user_id",
        "recency_us",
        "frequency",
        "monetary_mu",
        ntile_from_rn(F.col("__r_rn"), F.col("__n"), 4).alias("r_q"),
        ntile_from_rn(F.col("__f_rn"), F.col("__n"), 4).alias("f_q"),
        ntile_from_rn(F.col("__m_rn"), F.col("__n"), 4).alias("m_q"),
    )


_CONC_GAP_US = 30 * 60 * 1000000  # session gap, matches t6's contract


@declared(
    "events_session_concurrency",
    oracle=f"""
    WITH o AS (
      SELECT user_id, epoch_us(ts) AS us,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_id)
               AS prev_us
      FROM events WHERE user_id IS NOT NULL
    ), marked AS (
      SELECT user_id, us,
             CASE WHEN prev_us IS NULL
                       OR us - prev_us > {_CONC_GAP_US}
                  THEN 1 ELSE 0 END AS is_start
      FROM o
    ), sess AS (
      SELECT user_id,
             MIN(us) AS start_us,
             MAX(us) + {_CONC_GAP_US} AS end_us
      FROM (SELECT user_id, us,
                   SUM(is_start) OVER (PARTITION BY user_id ORDER BY us
                                       ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked)
      GROUP BY user_id, sid
    ), deltas AS (
      SELECT start_us AS t, CAST(1 AS BIGINT) AS d FROM sess
      UNION ALL
      SELECT end_us AS t, CAST(-1 AS BIGINT) AS d FROM sess
    ), agg AS (
      SELECT t, SUM(d) AS dsum FROM deltas GROUP BY t
    ), run AS (
      SELECT t, SUM(dsum) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
               AS concurrent
      FROM agg
    )
    SELECT CAST(MAX(concurrent) AS BIGINT) AS peak_concurrency,
           CAST((SELECT COUNT(*) FROM sess) AS BIGINT) AS n_sessions,
           CAST(MIN(t) AS BIGINT) AS first_edge_us,
           CAST(MAX(t) AS BIGINT) AS last_edge_us
    FROM run
    """,
    doc="Peak session concurrency via the sweep line: sessionize per user "
    "(gap rule shared with t6), emit +1/-1 edges at session start/close "
    "(close = last event + gap, the same half-open convention), "
    "PRE-AGGREGATE the edges per timestamp (the step that makes the "
    "sweep scale: the running sum then runs over distinct edge times, "
    "not raw sessions — and equal-time edges can't flap the max because "
    "they collapse into one net delta first), then a running sum whose "
    "max is the answer. This is the capacity-planning read (peak "
    "simultaneous load) computed in two aggregates + two windows, no "
    "join; 100 TB shape: the per-user sessionize shuffles on user_id "
    "once, edges reduce to |distinct times| rows, and the final sweep's "
    "prefix sum is the range-partitioned two-pass with carry-in offsets "
    "(operators/ranks.global_running_sum) — no single-partition sort "
    "even when the edge table outgrows one node.",
)
def events_session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(us, "event_id")
    o = ev.select("user_id", us.alias("us"), F.lag(us).over(w).alias("prev_us"))
    marked = o.select(
        "user_id",
        "us",
        F.when(
            F.col("prev_us").isNull()
            | (F.col("us") - F.col("prev_us") > _CONC_GAP_US),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    w_sid = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = (
        marked.withColumn("sid", F.sum("is_start").over(w_sid))
        .groupBy("user_id", "sid")
        .agg(
            F.min("us").alias("start_us"),
            (F.max("us") + F.lit(_CONC_GAP_US)).alias("end_us"),
        )
    )
    deltas = sess.select(
        F.col("start_us").alias("t"), F.lit(1).cast("bigint").alias("d")
    ).unionByName(
        sess.select(F.col("end_us").alias("t"), F.lit(-1).cast("bigint").alias("d"))
    )
    agg = deltas.groupBy("t").agg(F.sum("d").alias("dsum"))
    from database_synchronize_tool_spark.operators.ranks import (
        global_running_sum,
    )

    # the sweep's prefix sum via the range-partitioned two-pass — edge
    # timestamps grow with the data, so this must never single-partition
    run = global_running_sum(agg, [F.col("t")], "dsum", "concurrent").select(
        "t", "concurrent"
    )
    n_sessions = sess.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )
    return (
        run.agg(
            F.max("concurrent").cast("bigint").alias("peak_concurrency"),
            F.min("t").cast("bigint").alias("first_edge_us"),
            F.max("t").cast("bigint").alias("last_edge_us"),
        )
        .crossJoin(F.broadcast(n_sessions))
        .select(
            "peak_concurrency", "n_sessions", "first_edge_us", "last_edge_us"
        )
    )


@declared(
    "events_dau_wau_stickiness",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      FROM events WHERE user_id IS NOT NULL
    ), days AS (SELECT DISTINCT day FROM ud),
    dau AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day
    ), wau AS (
      SELECT d.day, CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS wau
      FROM days d JOIN ud
        ON ud.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
      GROUP BY d.day
    )
    SELECT dau.day, dau.dau, wau.wau,
           CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
    FROM dau JOIN wau USING (day)
    """,
    doc="DAU / trailing-7-day WAU / stickiness per day — the engagement "
    "read every product dashboard serves. Shape that scales: the raw "
    "stream first reduces to DISTINCT (user, day) — one shuffle, after "
    "which everything runs on at most users x days rows; the trailing "
    "window is a bounded-fan-out join against the tiny day spine "
    "(<= 7 source days per target day), NOT a sliding count-distinct "
    "window (which cannot merge map-side). Stickiness is one double "
    "division of exact integers.",
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    ud = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    days = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    wau = (
        days.alias("d")
        .join(
            ud.alias("u"),
            F.col("u.day").between(
                F.date_sub(F.col("d.day"), 6), F.col("d.day")
            ),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.count_distinct("u.user_id").cast("bigint").alias("wau"))
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
            "stickiness"
        ),
    )


@declared(
    "events_rate_spike_zscore",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ), w AS (
      SELECT event_type, day, x,
             CAST(SUM(x) OVER tw AS BIGINT) AS sx,
             CAST(SUM(x * x) OVER tw AS BIGINT) AS sxx,
             CAST(COUNT(*) OVER tw AS BIGINT) AS n
      FROM d
      WINDOW tw AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, day, x, n,
           (CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
           / sqrt((CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                     / CAST(n AS DOUBLE))
                  / CAST(n AS DOUBLE)) AS zscore
    FROM w
    WHERE n = 7
      AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          > CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
    """,
    doc="Daily event-rate anomaly score per type: each day's count against "
    "the TRAILING 7-day window's mean and standard deviation (the window "
    "excludes the current day, so a spike cannot mask itself). Sums are "
    "BIGINT-exact window aggregates over the tiny |types| x |days| daily "
    "table; the z-score is one identically-associated float chain with a "
    "correctly-rounded sqrt (the stats_pearson_exact contract). Rows "
    "with an incomplete window or zero variance are excluded by integer "
    "predicates on BOTH engines alike (a constant trailing week has no "
    "defined z). At 100 TB the daily reduction is the only scan; "
    "everything after runs on bounded data — the alerting read behind "
    "every ops dashboard, cheap enough to run per trigger.",
)
def events_rate_spike_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    tw = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    w = d.select(
        "event_type",
        "day",
        "x",
        F.sum("x").over(tw).cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).over(tw).cast("bigint").alias("sxx"),
        F.count(F.lit(1)).over(tw).cast("bigint").alias("n"),
    )
    xd = F.col("x").cast("double")
    sxd = F.col("sx").cast("double")
    sxxd = F.col("sxx").cast("double")
    nd = F.col("n").cast("double")
    z = (xd - sxd / nd) / F.sqrt((sxxd - sxd * sxd / nd) / nd)
    return w.filter(
        (F.col("n") == 7) & (nd * sxxd > sxd * sxd)
    ).select("event_type", "day", "x", "n", z.alias("zscore"))


@declared(
    "orders_customer_adoption",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             date_trunc('month', MIN(CAST(o_orderdate AS DATE)))
               AS first_month
      FROM orders GROUP BY o_custkey
    ), per_month AS (
      SELECT first_month AS month, CAST(COUNT(*) AS BIGINT) AS new_customers
      FROM firsts GROUP BY first_month
    )
    SELECT month, new_customers,
           CAST(SUM(new_customers) OVER (ORDER BY month
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cumulative_customers
    FROM per_month
    """,
    doc="Customer adoption curve: new customers per month (each customer "
    "counted in the month of their FIRST order) and the running total — "
    "the growth metric that looks like a running COUNT(DISTINCT) over an "
    "expanding window but must never be computed as one (expanding "
    "distinct windows cannot merge map-side and re-scan per period). "
    "Shape: one per-customer MIN aggregate, one tiny per-month count, "
    "one cumulative window over |months| rows. Everything integer; "
    "date_trunc to month is identical in both engines on DATE inputs.",
)
def orders_customer_adoption(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.trunc(F.min(F.col("o_orderdate").cast("date")), "month").alias(
            "first_month"
        )
    )
    per_month = firsts.groupBy(F.col("first_month").alias("month")).agg(
        F.count(F.lit(1)).cast("bigint").alias("new_customers")
    )
    w = Window.orderBy("month").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_month.select(
        "month",
        "new_customers",
        F.sum("new_customers").over(w).cast("bigint").alias(
            "cumulative_customers"
        ),
    )


@declared(
    "events_behavior_diversity",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(SUM(c) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           1.0 - CAST(SUM(c * c) AS DOUBLE)
                 / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE))
             AS simpson_diversity
    FROM c GROUP BY user_id
    """,
    doc="Behavioral diversity per user via the Gini-Simpson index "
    "1 - Sigma p_i^2 — the entropy-style concentration measure that "
    "needs NO logarithm (Shannon entropy's ln is not correctly rounded "
    "cross-engine; Simpson is a rational function of integer counts, so "
    "it hash-grades exactly: one division of exact BIGINT sums with one "
    "squared denominator, identical association both engines). 0 = "
    "single-behavior user, ->0.8 = uniform over 5 types. Shape: one "
    "(user, type) aggregate then one per-user aggregate — the event "
    "stream shuffles once; the diversity segmentation every churn model "
    "consumes.",
)
def events_behavior_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    sc = F.sum("c").cast("double")
    return c.groupBy("user_id").agg(
        F.sum("c").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        (
            F.lit(1.0)
            - F.sum(F.col("c") * F.col("c")).cast("double") / (sc * sc)
        ).alias("simpson_diversity"),
    )


_UTOUCH_WINDOW_US = 604800000000  # 7 days


@declared(
    "events_attribution_position_based",
    oracle=f"""
    WITH seq AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
             first_value(CASE WHEN event_type = 'purchase'
                              THEN event_id END IGNORE NULLS)
               OVER w AS purchase_id,
             first_value(CASE WHEN event_type = 'purchase'
                              THEN epoch_us(ts) END IGNORE NULLS)
               OVER w AS purchase_us
      FROM events WHERE user_id IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    ), touches AS (
      SELECT user_id, event_id AS touch_id, event_type, us,
             purchase_id, purchase_us
      FROM seq
      WHERE event_type IN ('view', 'click')
        AND purchase_id IS NOT NULL
        AND purchase_us - us <= {_UTOUCH_WINDOW_US}
    ), j AS (
      SELECT user_id, purchase_id, touch_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, purchase_id
                                ORDER BY us, touch_id) AS pos,
             CAST(COUNT(*) OVER (PARTITION BY user_id, purchase_id)
                  AS BIGINT) AS n_touches
      FROM touches
    )
    SELECT purchase_id, touch_id, user_id, event_type,
           CAST(pos AS INT) AS pos, n_touches,
           CASE WHEN n_touches = 1 THEN 1.0
                WHEN n_touches = 2 THEN 0.5
                WHEN pos = 1 OR pos = n_touches THEN 0.4
                ELSE 0.2 / CAST(n_touches - 2 AS DOUBLE)
           END AS credit
    FROM j
    """,
    doc="Position-based (U-shaped) multi-touch attribution: every "
    "view/click credits its user's NEXT purchase within 7 days — 40% to "
    "the first touch, 40% to the last, 20% split across the middle "
    "(100%/50-50 for 1- and 2-touch journeys) — the marketing-analytics "
    "companion to events_attribution_last_touch that answers 'which "
    "touches assisted', not just 'which closed'. The touch→purchase "
    "assignment is a forward carry (first_value IGNORE NULLS over the "
    "FOLLOWING frame, per-user partition — one shuffle, no join); "
    "journey position/size are one more window on the (user, purchase) "
    "partition. Credits are emitted PER ROW (never summed across rows — "
    "double accumulation order would flap the hash); each credit is "
    "exact literals or one division by a computed integer.",
)
def events_attribution_position_based(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w_next = (
        Window.partitionBy("user_id")
        .orderBy(us, "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    is_p = F.col("event_type") == "purchase"
    seq = e.select(
        "event_id",
        "user_id",
        "event_type",
        us.alias("us"),
        F.first(F.when(is_p, F.col("event_id")), ignorenulls=True)
        .over(w_next)
        .alias("purchase_id"),
        F.first(F.when(is_p, us), ignorenulls=True)
        .over(w_next)
        .alias("purchase_us"),
    )
    touches = seq.filter(
        F.col("event_type").isin("view", "click")
        & F.col("purchase_id").isNotNull()
        & (F.col("purchase_us") - F.col("us") <= _UTOUCH_WINDOW_US)
    ).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        "event_type",
        "us",
        "purchase_id",
    )
    wj = Window.partitionBy("user_id", "purchase_id")
    j = touches.select(
        "purchase_id",
        "touch_id",
        "user_id",
        "event_type",
        F.row_number()
        .over(wj.orderBy("us", "touch_id"))
        .cast("int")
        .alias("pos"),
        F.count(F.lit(1)).over(wj).cast("bigint").alias("n_touches"),
    )
    credit = (
        F.when(F.col("n_touches") == 1, F.lit(1.0))
        .when(F.col("n_touches") == 2, F.lit(0.5))
        .when(
            (F.col("pos") == 1) | (F.col("pos") == F.col("n_touches")),
            F.lit(0.4),
        )
        .otherwise(F.lit(0.2) / (F.col("n_touches") - 2).cast("double"))
    )
    return j.select(
        "purchase_id",
        "touch_id",
        "user_id",
        "event_type",
        "pos",
        "n_touches",
        credit.alias("credit"),
    )


@declared(
    "orders_cohort_ltv",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             MIN(CAST(date_part('year', o_orderdate) AS BIGINT) * 12
                 + CAST(date_part('month', o_orderdate) AS BIGINT))
               AS cohort_m
      FROM orders GROUP BY o_custkey
    ), g AS (
      SELECT f.cohort_m,
             (CAST(date_part('year', o.o_orderdate) AS BIGINT) * 12
              + CAST(date_part('month', o.o_orderdate) AS BIGINT))
               - f.cohort_m AS month_offset,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
      GROUP BY 1, 2
    )
    SELECT CAST(cohort_m AS BIGINT) AS cohort_m,
           CAST(month_offset AS BIGINT) AS month_offset,
           n_orders,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(SUM(rev) OVER (PARTITION BY cohort_m ORDER BY month_offset
                               ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             AS cum_revenue
    FROM g
    """,
    doc="Cohort lifetime-value curve: customers cohorted by the integer "
    "month index (year*12+month — exact integers; the engines' "
    "months_between/AGE semantics disagree) of their FIRST order; per "
    "(cohort, month offset), order count, DECIMAL-exact revenue, and the "
    "cumulative LTV running sum — the retention-economics read behind "
    "every payback-period decision. The cumulative window partitions BY "
    "COHORT over the tiny (cohort x offset) grid (calendar-bounded — "
    "at 100 TB still ~84x84 rows after the aggregate). Revenue stays "
    "DECIMAL through the window sum, so accumulation order cannot flap "
    "the double cast.",
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    midx = (
        F.year("o_orderdate").cast("bigint") * 12
        + F.month("o_orderdate").cast("bigint")
    )
    firsts = o.groupBy("o_custkey").agg(F.min(midx).alias("cohort_m"))
    g = (
        o.join(firsts, "o_custkey")
        .groupBy(
            "cohort_m", (midx - F.col("cohort_m")).alias("month_offset")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
        )
    )
    w = (
        Window.partitionBy("cohort_m")
        .orderBy("month_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return g.select(
        F.col("cohort_m").cast("bigint").alias("cohort_m"),
        F.col("month_offset").cast("bigint").alias("month_offset"),
        "n_orders",
        F.col("rev").cast("double").alias("revenue"),
        F.sum("rev").over(w).cast("double").alias("cum_revenue"),
    )


@declared(
    "events_growth_accounting",
    oracle="""
    WITH um AS (
      SELECT DISTINCT user_id,
             CAST(date_diff('day', DATE '1990-01-01', CAST(ts AS DATE))
                  // 7 AS BIGINT) AS m
      FROM events WHERE user_id IS NOT NULL
    ), lagged AS (
      SELECT user_id, m,
             LAG(m) OVER (PARTITION BY user_id ORDER BY m) AS prev_m,
             MIN(m) OVER (PARTITION BY user_id) AS first_m
      FROM um
    ), classified AS (
      SELECT m,
             CASE WHEN m = first_m THEN 'new'
                  WHEN prev_m = m - 1 THEN 'retained'
                  ELSE 'resurrected'
             END AS state
      FROM lagged
    ), churned AS (
      -- churned in period m+1: active in m, absent in m+1 (within span)
      SELECT l.m + 1 AS m, 'churned' AS state
      FROM lagged l
      WHERE NOT EXISTS (
        SELECT 1 FROM um u2 WHERE u2.user_id = l.user_id AND u2.m = l.m + 1
      ) AND l.m < (SELECT MAX(m) FROM um)
    ), allrows AS (
      SELECT m, state FROM classified
      UNION ALL
      SELECT m, state FROM churned
    )
    SELECT CAST(m AS BIGINT) AS week_idx, state,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM allrows GROUP BY m, state
    """,
    doc="Growth accounting (the canonical new / retained / resurrected / "
    "churned decomposition of WAU): per user-week, 'new' in the first "
    "active week, 'retained' when the previous week was active, "
    "'resurrected' after a gap; 'churned' counts toward the week AFTER "
    "the last consecutive active week (absent-next-week, bounded by the "
    "corpus span). Weeks are exact integer indices (days since a fixed "
    "Monday, integer-divided by 7 — the retention-cohorts trick, since "
    "the engines' week functions disagree on week start). Shape: the "
    "event stream reduces to DISTINCT (user, week) in one shuffle; "
    "lag/min windows partition per user; the churn anti-check is a self "
    "left-anti join on (user, week+1) — every stage keyed, nothing "
    "global. This is the week-over-week health read every growth team "
    "reconciles DAU dashboards against.",
)
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    m = (
        F.floor(
            F.datediff(F.col("ts").cast("date"), F.lit("1990-01-01")) / 7
        ).cast("bigint")
    ).alias("m")
    from database_synchronize_tool_spark.caching import scoped_persist

    # The distinct user-week table feeds the lag window, the max-week
    # aggregate and the churn anti-join; its window output feeds both the
    # classification and the churn probe. Unpersisted, each consumer
    # re-ran the full events scan + distinct shuffle (3 scan subtrees in
    # the r15 before-plan) — persist the two narrow per-user-week tables.
    um = scoped_persist(ev.select("user_id", m).distinct())
    wu = Window.partitionBy("user_id")
    lagged = scoped_persist(
        um.select(
            "user_id",
            "m",
            F.lag("m").over(wu.orderBy("m")).alias("prev_m"),
            F.min("m").over(wu).alias("first_m"),
        )
    )
    classified = lagged.select(
        "m",
        F.when(F.col("m") == F.col("first_m"), "new")
        .when(F.col("prev_m") == F.col("m") - 1, "retained")
        .otherwise("resurrected")
        .alias("state"),
    )
    max_m = um.agg(F.max("m").alias("__max_m"))
    nxt = lagged.select(
        "user_id", (F.col("m") + 1).alias("m")
    ).crossJoin(F.broadcast(max_m)).filter(F.col("m") <= F.col("__max_m"))
    churned = nxt.join(um, ["user_id", "m"], "left_anti").select(
        "m", F.lit("churned").alias("state")
    )
    allrows = classified.unionByName(churned)
    return allrows.groupBy(
        F.col("m").cast("bigint").alias("week_idx"), "state"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
