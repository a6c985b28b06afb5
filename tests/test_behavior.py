"""Unit + plan-shape tests for plans/behavior.py (round 8).

Value correctness is driver/oracle territory (all six queries are
oracle-paired); these tests pin the semantics edges the oracle can't see
(strict-sequence funnel ordering, tombstone-free bitmap merge equivalence,
cap determinism) and the plan shapes the 100 TB story depends on
(partitioned windows, broadcast stat joins, no global sort).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from database_synchronize_tool_spark.plans.registry import all_queries
from tests.test_plan_shapes import plan_of


def _ts(day, h=0, m=0):
    return dt.datetime(2024, 1, day, h, m)


def test_funnel_requires_strict_order(spark):
    # user 1 completes the funnel in order; user 2 has every event but
    # clicked BEFORE viewing -> reaches only step 2; user 3 never signed up.
    rows = [
        Row(user_id=1, event_type="signup", ts=_ts(1)),
        Row(user_id=1, event_type="view", ts=_ts(2)),
        Row(user_id=1, event_type="click", ts=_ts(3)),
        Row(user_id=1, event_type="purchase", ts=_ts(4)),
        Row(user_id=2, event_type="signup", ts=_ts(1)),
        Row(user_id=2, event_type="click", ts=_ts(2)),
        Row(user_id=2, event_type="view", ts=_ts(3)),
        Row(user_id=2, event_type="purchase", ts=_ts(4)),
        Row(user_id=3, event_type="view", ts=_ts(1)),
        Row(user_id=3, event_type="purchase", ts=_ts(2)),
    ]
    df = spark.createDataFrame(rows)
    df.createOrReplaceTempView("events")

    from database_synchronize_tool_spark.plans import behavior

    steps = {s: None for s in behavior._FUNNEL_STEPS}
    per_user = df.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t_{s}")
            for s in steps
        ]
    )
    # replicate the builder's reach chain on the tiny frame
    reached = [F.col("t_signup").isNotNull()]
    names = list(steps)
    for prev, cur in zip(names, names[1:]):
        reached.append(reached[-1] & (F.col(f"t_{cur}") > F.col(f"t_{prev}")))
    got = per_user.select(
        "user_id", *[r.alias(f"r{i+1}") for i, r in enumerate(reached)]
    ).collect()
    by_user = {r.user_id: (r.r1, r.r2, r.r3, r.r4) for r in got}
    assert by_user[1] == (True, True, True, True)
    # first click (day 2) precedes first view (day 3): chain breaks at step 3
    assert by_user[2] == (True, True, False, False)
    assert by_user[3][0] is False


def test_rolling_features_window_is_partitioned(spark, sf_dir):
    # the 1-hour RANGE window must partition by user_id — a global window
    # (WindowExec "no partition defined") single-partitions 100 TB of events
    plan = plan_of(spark, sf_dir, "ts_rolling_features")
    assert "Window" in plan
    window_lines = [l for l in plan.splitlines() if "PartitionSpecification" in l or "windowspecdefinition" in l.lower()]
    assert any("user_id" in l for l in window_lines), window_lines


def test_outlier_mad_broadcasts_stats(spark, sf_dir):
    # both per-group stats (5 rows each) broadcast — the orders fact must
    # not be shuffled by the stats joins
    plan = plan_of(spark, sf_dir, "outlier_mad_orders")
    assert plan.count("BroadcastHashJoin") >= 2


def test_source_cap_no_global_sort(spark, sf_dir):
    # rank window partitions by source; a global Sort (no partition) would
    # be the scale bug
    plan = plan_of(spark, sf_dir, "curation_source_cap")
    assert "row_number" in plan
    assert any(
        "source" in l
        for l in plan.splitlines()
        if "windowspecdefinition" in l.lower() or "PartitionSpecification" in l
    )


def test_bitmap_rollup_matches_exact_distinct(spark, sf_dir):
    # bitmap OR-merge across days must reproduce plain COUNT(DISTINCT)
    q = all_queries()["bitmap_rollup_distinct"]
    got = {r.event_type: r.distinct_users for r in q.builder(spark, sf_dir).collect()}
    from database_synchronize_tool_spark.catalog import load_table

    exact = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert got == exact


def test_curation_cap_is_deterministic_and_bounded(spark, sf_dir):
    q = all_queries()["curation_source_cap"]
    a = sorted(map(tuple, q.builder(spark, sf_dir).collect()))
    b = sorted(map(tuple, q.builder(spark, sf_dir).collect()))
    assert a == b  # md5 order is run-stable
    per_source = {}
    for source, _doc, rk in a:
        per_source[source] = max(per_source.get(source, 0), rk)
        assert rk <= 10
    assert all(v <= 10 for v in per_source.values())


def test_retention_cohort_week_arithmetic(spark):
    # a user first seen on day 8 (week 1) active on day 16 (week 2)
    # lands in cohort 1 offset 1 — integer day arithmetic, no ISO-week
    rows = [
        Row(user_id=9, event_type="view", ts=_ts(9)),   # day idx 8 -> week 1
        Row(user_id=9, event_type="view", ts=_ts(17)),  # day idx 16 -> week 2
    ]
    df = spark.createDataFrame(rows)
    week = F.floor(F.datediff(F.col("d"), F.lit("2024-01-01")) / 7).cast("int")
    got = (
        df.select(F.col("ts").cast("date").alias("d"))
        .select(week.alias("w"))
        .collect()
    )
    assert sorted(r.w for r in got) == [1, 2]


def test_transition_matrix_window_partitioned_by_user(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "events_transition_matrix")
    assert "lead(" in plan.lower()
    assert any(
        "user_id" in l
        for l in plan.splitlines()
        if "windowspecdefinition" in l.lower() or "PartitionSpecification" in l
    )


def test_market_basket_is_equijoin_topk(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "market_basket_pairs")
    # the a<b self-join must hash/merge on the order-key equi condition,
    # never a nested-loop cross product over parts
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_label_centroids_match_numpy(spark, sf_dir):
    import numpy as np

    from database_synchronize_tool_spark.catalog import load_table

    got = {
        (r.label, r.dim): r.centroid
        for r in all_queries()["embedding_label_centroids"]
        .builder(spark, sf_dir)
        .collect()
    }
    rows = load_table(spark, sf_dir, "embeddings").select("label", "embedding").collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(np.array(r.embedding, dtype=np.float64))
    for label, vecs in by_label.items():
        mean = np.mean(np.stack(vecs), axis=0)
        for d in range(len(mean)):
            assert abs(got[(label, d)] - mean[d]) < 1e-9


def test_funnel_counts_are_monotone(spark, sf_dir):
    rows = {
        r.step: r.users
        for r in all_queries()["events_funnel_conversion"]
        .builder(spark, sf_dir)
        .collect()
    }
    assert rows[1] >= rows[2] >= rows[3] >= rows[4] >= 0


def test_drift_metrics_are_bounded(spark, sf_dir):
    ks = all_queries()["corpus_drift_ks"].builder(spark, sf_dir).collect()
    assert all(0.0 <= r.ks <= 1.0 for r in ks)
    chi2 = all_queries()["corpus_divergence_chi2"].builder(spark, sf_dir).collect()
    assert all(r.chi2 >= 0.0 for r in chi2)


def test_referential_audit_clean_on_consistent_testdata(spark, sf_dir):
    rows = (
        all_queries()["j11_referential_integrity_audit"]
        .builder(spark, sf_dir)
        .collect()
    )
    # driver testdata is internally consistent: every FK resolves
    assert {r.relationship: r.orphans for r in rows} == {
        "lineitem->orders": 0,
        "orders->customer": 0,
        "customer->nation": 0,
        "supplier->nation": 0,
    }


def test_skew_shares_sum_below_one(spark, sf_dir):
    rows = all_queries()["skew_key_diagnostics"].builder(spark, sf_dir).collect()
    assert len(rows) == 10
    assert sum(r.share for r in rows) < 1.0
    assert all(rows[i].cnt >= rows[i + 1].cnt for i in range(9))


def test_rfm_scores_quartiles_and_accounting(spark, sf_dir):
    from database_synchronize_tool_spark.catalog import load_table
    from database_synchronize_tool_spark.plans.behavior import events_rfm_scores

    rows = events_rfm_scores(spark, sf_dir).collect()
    p = (
        load_table(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & F.col("user_id").isNotNull())
        .toPandas()
    )
    assert len(rows) == p["user_id"].nunique()
    assert sum(r["frequency"] for r in rows) == len(p)
    # the freshest purchaser has recency exactly 0
    assert min(r["recency_us"] for r in rows) == 0
    for q in ("r_q", "f_q", "m_q"):
        vals = [r[q] for r in rows]
        assert set(vals) <= {1, 2, 3, 4}
        # NTILE(4) balance: bucket sizes differ by at most 1
        from collections import Counter

        c = Counter(vals)
        assert max(c.values()) - min(c.values()) <= 1
    # quartile 1 on the R axis is strictly fresher than quartile 4
    r1 = max(r["recency_us"] for r in rows if r["r_q"] == 1)
    r4 = min(r["recency_us"] for r in rows if r["r_q"] == 4)
    assert r1 <= r4


def test_session_concurrency_invariants(spark, sf_dir):
    from database_synchronize_tool_spark.catalog import load_table
    from database_synchronize_tool_spark.plans.behavior import (
        _CONC_GAP_US,
        events_session_concurrency,
    )

    row = events_session_concurrency(spark, sf_dir).collect()[0]
    n_users = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
        .count()
    )
    # at any instant a user holds at most one open session
    assert 1 <= row["peak_concurrency"] <= n_users
    assert row["n_sessions"] >= n_users  # every user has >= 1 session
    assert row["first_edge_us"] < row["last_edge_us"]
    # direct sweep over collected sessions reproduces the peak
    import itertools

    sess = []
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", "ts", "event_id")
        .toPandas()
    )
    us = ev["ts"].astype("int64") // 1000
    ev = ev.assign(us=us)
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["us", "event_id"])
        start = prev = None
        for t in g["us"]:
            if start is None or t - prev > _CONC_GAP_US:
                if start is not None:
                    sess.append((start, prev + _CONC_GAP_US))
                start = t
            prev = t
        sess.append((start, prev + _CONC_GAP_US))
    edges = sorted(
        itertools.chain(
            ((s, 1) for s, _ in sess), ((e, -1) for _, e in sess)
        )
    )
    cur = peak = 0
    from collections import defaultdict

    net = defaultdict(int)
    for t, d in edges:
        net[t] += d
    for t in sorted(net):
        cur += net[t]
        peak = max(peak, cur)
    assert row["peak_concurrency"] == peak
    assert row["n_sessions"] == len(sess)


def test_dau_wau_stickiness_invariants(spark, sf_dir):
    from database_synchronize_tool_spark.plans.behavior import (
        events_dau_wau_stickiness,
    )

    rows = events_dau_wau_stickiness(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # WAU is a superset window of DAU: dau <= wau always
        assert 1 <= r["dau"] <= r["wau"]
        assert 0.0 < r["stickiness"] <= 1.0
    # days are distinct and contiguous-ish (30-day generator window)
    days = [r["day"] for r in rows]
    assert len(set(days)) == len(days)


def test_rate_spike_zscore_matches_pandas(spark, sf_dir):
    import numpy as np

    from database_synchronize_tool_spark.catalog import load_table
    from database_synchronize_tool_spark.plans.behavior import (
        events_rate_spike_zscore,
    )

    out = {(r["event_type"], r["day"]): r for r in
           events_rate_spike_zscore(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts").toPandas()
    ev["day"] = ev["ts"].dt.date
    checked = 0
    for etype, grp in ev.groupby("event_type"):
        daily = grp.groupby("day").size().sort_index()
        vals = daily.to_numpy(dtype=float)
        days = list(daily.index)
        for i in range(len(vals)):
            wnd = vals[max(0, i - 7):i]
            key = (etype, days[i])
            if len(wnd) < 7 or wnd.std() == 0:
                assert key not in out
                continue
            ref = (vals[i] - wnd.mean()) / wnd.std()
            assert abs(out[key]["zscore"] - ref) < 1e-9
            checked += 1
    assert checked == len(out) > 0


def test_customer_adoption_monotone_and_accounts(spark, sf_dir):
    from database_synchronize_tool_spark.catalog import load_table
    from database_synchronize_tool_spark.plans.behavior import (
        orders_customer_adoption,
    )

    rows = sorted(
        orders_customer_adoption(spark, sf_dir).collect(),
        key=lambda r: r["month"],
    )
    o = load_table(spark, sf_dir, "orders")
    n_cust = o.select("o_custkey").distinct().count()
    assert rows[-1]["cumulative_users" if "cumulative_users" in rows[-1] else "cumulative_customers"] == n_cust
    run = 0
    for r in rows:
        assert r["new_customers"] > 0
        run += r["new_customers"]
        assert r["cumulative_customers"] == run


def test_behavior_diversity_bounds_and_extremes(spark, sf_dir):
    from database_synchronize_tool_spark.plans.behavior import (
        events_behavior_diversity,
    )

    rows = events_behavior_diversity(spark, sf_dir).collect()
    for r in rows:
        # Simpson bounds: 0 (single type) .. 1 - 1/k (uniform over k)
        assert -1e-12 <= r["simpson_diversity"] <= 1 - 1 / r["n_types"] + 1e-12
        if r["n_types"] == 1:
            assert abs(r["simpson_diversity"]) < 1e-12
        assert r["n_events"] >= r["n_types"]


def test_gap_fill_gap_form_matches_spine_join_with_nulls(spark):
    """The r15 gap-generation rewrite of ts_gap_fill_interpolate must match
    the original spine-join form on inputs the fixture cannot produce:
    NULL-valued observations (leading, interior, trailing) — a NULL-valued
    day is a spine member (it extends the per-user range) but NOT an
    interpolation anchor."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    d = dt.date
    rows = [
        # user 1: leading NULL obs day, interior gap, interior NULL obs day
        (1, d(2024, 1, 1), None),
        (1, d(2024, 1, 3), 10.0),
        (1, d(2024, 1, 5), None),
        (1, d(2024, 1, 8), 40.0),
        # user 2: trailing NULL obs day
        (2, d(2024, 2, 1), 5.0),
        (2, d(2024, 2, 4), None),
        # user 3: single observed day
        (3, d(2024, 3, 1), 7.0),
    ]
    obs = spark.createDataFrame(rows, "user_id int, day date, value double")

    def spine_join_reference(obs):
        spine = (
            obs.groupBy("user_id")
            .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
            .select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
        )
        j = spine.join(obs, ["user_id", "day"], "left")
        w_fwd = Window.partitionBy("user_id").orderBy("day").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        w_bwd = Window.partitionBy("user_id").orderBy("day").rowsBetween(
            Window.currentRow, Window.unboundedFollowing
        )
        obs_day = F.when(F.col("value").isNotNull(), F.col("day"))
        f = j.select(
            "user_id",
            "day",
            "value",
            F.last("value", ignorenulls=True).over(w_fwd).alias("pv"),
            F.last(obs_day, ignorenulls=True).over(w_fwd).alias("pd"),
            F.first("value", ignorenulls=True).over(w_bwd).alias("nv"),
            F.first(obs_day, ignorenulls=True).over(w_bwd).alias("nd"),
        )
        frac = F.datediff(F.col("day"), F.col("pd")).cast(
            "double"
        ) / F.datediff(F.col("nd"), F.col("pd")).cast("double")
        return f.select(
            "user_id",
            "day",
            F.when(F.col("value").isNotNull(), F.col("value"))
            .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
            .alias("value_filled"),
            F.col("value").isNotNull().alias("observed"),
        )

    def gap_form(obs):
        w = Window.partitionBy("user_id").orderBy("day")
        w_fwd = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        w_nxt = w.rowsBetween(1, Window.unboundedFollowing)
        obs_day = F.when(F.col("value").isNotNull(), F.col("day"))
        anchored = obs.select(
            "user_id",
            "day",
            "value",
            F.lead("day").over(w).alias("nxt_day"),
            F.last("value", ignorenulls=True).over(w_fwd).alias("pv"),
            F.last(obs_day, ignorenulls=True).over(w_fwd).alias("pd"),
            F.first("value", ignorenulls=True).over(w_nxt).alias("nv"),
            F.first(obs_day, ignorenulls=True).over(w_nxt).alias("nd"),
        )
        g = anchored.select(
            "user_id",
            "day",
            "value",
            "pv",
            "pd",
            "nv",
            "nd",
            F.explode(
                F.sequence(
                    F.col("day"),
                    F.coalesce(F.date_sub(F.col("nxt_day"), 1), F.col("day")),
                )
            ).alias("g"),
        )
        observed = (F.col("g") == F.col("day")) & F.col("value").isNotNull()
        frac = F.datediff(F.col("g"), F.col("pd")).cast(
            "double"
        ) / F.datediff(F.col("nd"), F.col("pd")).cast("double")
        return g.select(
            "user_id",
            F.col("g").alias("day"),
            F.when(observed, F.col("value"))
            .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
            .alias("value_filled"),
            observed.alias("observed"),
        )

    key = lambda r: (r["user_id"], r["day"])  # noqa: E731
    ref = sorted(spine_join_reference(obs).collect(), key=key)
    got = sorted(gap_form(obs).collect(), key=key)
    assert [tuple(r) for r in got] == [tuple(r) for r in ref]
    # the NULL-valued days are spine members but never observed
    by_key = {key(r): r for r in got}
    assert by_key[(1, d(2024, 1, 1))]["value_filled"] is None  # no prev anchor
    assert by_key[(1, d(2024, 1, 5))]["observed"] is False  # NULL obs day
    assert (
        abs(by_key[(1, d(2024, 1, 5))]["value_filled"] - (10 + 30 * 2 / 5))
        < 1e-12
    )  # interpolates ACROSS the NULL obs day (anchors 1/3 and 1/8)
    assert by_key[(2, d(2024, 2, 4))]["value_filled"] is None  # no next anchor


def test_market_basket_inrow_pairs_match_self_join(spark):
    # r15: market_basket_pairs switched from the distinct self-join to
    # in-row pair generation over sort_array(collect_set(...)). Pin value
    # parity on edges the fixture may not produce: duplicate parts within
    # an order (distinct must collapse), single-part orders (no pairs),
    # and a part that co-occurs across several orders (count > 1).
    rows = [
        (1, 10), (1, 20), (1, 20), (1, 30),   # dup part 20 in order 1
        (2, 10),                              # single-part order
        (3, 10), (3, 20),                     # repeat pair (10, 20)? no — (10,20) in 1 and 3
        (4, 30), (4, 10),                     # unsorted arrival order
    ]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")

    distinct = li.distinct()
    a, b = distinct.alias("a"), distinct.alias("b")
    join_form = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_orders"))
    )

    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    inrow_form = (
        baskets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "parts",
                        lambda x, i: F.transform(
                            F.slice("parts", i + F.lit(2), F.size("parts")),
                            lambda y: F.struct(
                                x.alias("part_a"), y.alias("part_b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .groupBy("p.part_a", "p.part_b")
        .agg(F.count("*").alias("n_orders"))
    )

    got = {(r.part_a, r.part_b): r.n_orders for r in inrow_form.collect()}
    want = {(r.part_a, r.part_b): r.n_orders for r in join_form.collect()}
    assert got == want
    assert got[(10, 20)] == 2 and got[(10, 30)] == 2 and got[(20, 30)] == 1
