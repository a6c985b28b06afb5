"""Invariants for the approx/statistics layer (plans/approx.py +
operators.sampling.priority_sample + operators.membership.cms_inner_product):

- priority sampling: sample size, tau semantics (every sampled priority
  >= tau), HT contribution lower bound, and determinism across reruns;
- histogram quantiles: estimate brackets the exact value within one bin
  width, merge-exactness holds, estimates are monotone in q;
- zone-map pruning: soundness (scanned rows always cover all matching
  rows) and the layout story (sorting by shipdate prunes at least as
  well as ingest order for the shipdate predicate);
- CMS join-cardinality: the estimate never undercounts the exact size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from database_synchronize_tool_spark.catalog import load_table
from database_synchronize_tool_spark.operators import membership as MB
from database_synchronize_tool_spark.operators.sampling import priority_sample
from database_synchronize_tool_spark.plans import approx as AP


def test_priority_sample_invariants(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").alias("weight")
    )
    rows = priority_sample(o, "weight", "o_orderkey", 20).collect()
    assert len(rows) == 20
    taus = {r["tau"] for r in rows}
    assert len(taus) == 1
    tau = taus.pop()
    assert tau > 0.0
    for r in rows:
        # top-k by priority: every sampled priority beats the (k+1)-th
        assert r["priority"] >= tau
        # HT contribution is max(w, tau) — never below the raw weight
        assert r["ht_contrib"] >= r["weight"]
        assert r["ht_contrib"] >= tau
    ranks = sorted(r["smp_rank"] for r in rows)
    assert ranks == list(range(1, 21))


def test_priority_sample_deterministic_and_small_input(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").alias("weight")
    )
    a = sorted(r["o_orderkey"] for r in priority_sample(o, "weight", "o_orderkey", 10).collect())
    b = sorted(r["o_orderkey"] for r in priority_sample(o, "weight", "o_orderkey", 10).collect())
    assert a == b
    # fewer rows than k: everything sampled, tau degenerates to 0
    tiny = o.limit(3)
    rows = priority_sample(tiny, "weight", "o_orderkey", 10).collect()
    assert len(rows) == 3
    assert all(r["tau"] == 0.0 for r in rows)
    assert all(r["ht_contrib"] == r["weight"] for r in rows)


def test_histogram_quantiles_bracket_exact(spark, sf_dir):
    rows = AP.sketch_histogram_quantiles(spark, sf_dir).collect()
    assert {r["q"] for r in rows} == set(AP._HQ_QS)
    by_q = {r["q"]: r for r in rows}
    prev_est = None
    for q in sorted(AP._HQ_QS):
        r = by_q[q]
        assert r["merge_exact"] is True
        # the exact rank-target value falls inside the estimated bin
        assert r["est_price"] <= r["exact_price"] < r["est_price"] + AP._HQ_BIN
        assert abs(r["est_err"]) < AP._HQ_BIN
        if prev_est is not None:
            assert r["est_price"] >= prev_est  # quantiles are monotone
        prev_est = r["est_price"]


def test_zonemap_pruning_sound_and_layout_wins(spark, sf_dir):
    rows = AP.layout_zonemap_pruning(spark, sf_dir).collect()
    assert len(rows) == 4
    by = {(r["layout"], r["predicate"]): r for r in rows}
    for r in rows:
        # soundness: pruning never drops a matching row
        assert r["rows_matching"] <= r["rows_scanned"]
        assert 0 <= r["n_pruned"] <= r["n_chunks"]
    ship_sorted = by[("shipdate_sorted", "ship_1995q1")]
    ship_ingest = by[("ingest_order", "ship_1995q1")]
    # matching-row counts are a layout-independent property of the data
    assert ship_sorted["rows_matching"] == ship_ingest["rows_matching"]
    # the sorted layout prunes at least as hard for its sort key's predicate
    assert ship_sorted["frac_pruned"] >= ship_ingest["frac_pruned"]


def test_cms_join_estimate_never_undercounts(spark, sf_dir):
    row = AP.stats_join_cardinality_estimate(spark, sf_dir).collect()[0]
    assert row["cms_est"] >= row["exact_join_rows"] > 0
    assert row["over_ratio"] >= 1.0


def test_cms_inner_product_exact_when_collision_free(spark):
    # Tiny disjoint-free case: keys 0..9 on both sides, width >> keys, so
    # collisions are absent in every hash row and min-over-rows recovers
    # the exact inner product Σ c_a(k)·c_b(k) = 10 · (1·2) = 20.
    a = spark.range(10).select(F.col("id").alias("k"))
    b = spark.range(10).unionAll(spark.range(10)).select(
        F.col("id").alias("k")
    )
    ska = MB.cms_build(a, "k", 4, 8192)
    skb = MB.cms_build(b, "k", 4, 8192)
    est = MB.cms_inner_product(ska, skb).collect()[0]["cms_est"]
    assert est == 20


def test_delta_join_maintenance_is_exact(spark, sf_dir):
    from database_synchronize_tool_spark.plans.sync_ops import (
        j12_delta_join_maintenance,
    )

    rows = j12_delta_join_maintenance(spark, sf_dir).collect()
    assert len(rows) == 5  # one per order priority
    for r in rows:
        assert r["counts_equal"] is True
        assert r["rev_equal"] is True
        assert r["rows_direct"] == r["rows_maintained"]
        assert r["rev_direct"] == r["rev_maintained"]


def test_stratified_sample_per_stratum_invariants(spark, sf_dir):
    rows = AP.sample_weighted_stratified(spark, sf_dir).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    assert len(by_lang) >= 2
    for lang, rs in by_lang.items():
        assert len(rs) == AP._PSS_K
        taus = {r["tau"] for r in rs}
        assert len(taus) == 1
        tau = taus.pop()
        for r in rs:
            assert r["priority"] >= tau
            assert r["ht_contrib"] >= max(float(r["weight"]), tau)
        assert sorted(r["smp_rank"] for r in rs) == list(
            range(1, AP._PSS_K + 1)
        )


def test_bloom_skipping_no_false_negatives(spark, sf_dir):
    rows = AP.layout_bloom_skipping(spark, sf_dir).collect()
    assert len(rows) == AP._BS_PROBES
    for r in rows:
        # Bloom guarantee: every chunk that truly contains the key hits
        assert r["n_true_chunks"] <= r["n_hit_chunks"] <= r["n_chunks"]
        assert r["n_false_pos"] == r["n_hit_chunks"] - r["n_true_chunks"]
        assert 0.0 <= r["frac_skipped"] <= 1.0


def test_streaming_hll_registers_equal_batch_registers(spark, sf_dir):
    # Mergeability in motion: the 4-micro-batch streamed registers must be
    # BIT-IDENTICAL to the single-batch registers (max is the merge monoid,
    # so chunking cannot change the outcome). This is the property the
    # t14 declared query's batch oracle relies on.
    from database_synchronize_tool_spark.catalog import load_table
    from database_synchronize_tool_spark.operators.membership import (
        hll_registers,
    )
    from database_synchronize_tool_spark.plans.windows import (
        t14_stream_hll_distinct,
    )

    streamed = {
        (r["event_type"], r["exact_distinct"]): (
            r["hll_est"],
            r["n_registers_hit"],
        )
        for r in t14_stream_hll_distinct(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    batch_regs = hll_registers(ev, "user_id", ["event_type"])
    from database_synchronize_tool_spark.operators.membership import (
        hll_estimate,
    )

    batch = {
        r["event_type"]: (r["hll_est"], r["n_registers_hit"])
        for r in hll_estimate(batch_regs, ["event_type"]).collect()
    }
    assert len(streamed) == len(batch) > 0
    for (etype, _), (est, nreg) in streamed.items():
        best, bnreg = batch[etype]
        assert est == best  # bit-identical estimate, not approximately
        assert nreg == bnreg


def test_covariance_stats_matrix_properties(spark, sf_dir):
    import math

    rows = AP.embedding_covariance_stats(spark, sf_dir).collect()
    d = AP._COV_D
    assert len(rows) == d * (d + 1) // 2
    cov = {(r["i"], r["j"]): r["cov"] for r in rows}
    n_vals = {r["n"] for r in rows}
    assert len(n_vals) == 1  # every cell saw every vector
    for i in range(d):
        assert cov[(i, i)] >= 0.0  # variances are non-negative
        for j in range(i, d):
            # Cauchy-Schwarz: |cov(i,j)| <= sqrt(var_i * var_j) (+eps)
            bound = math.sqrt(cov[(i, i)] * cov[(j, j)]) + 1e-9
            assert abs(cov[(i, j)]) <= bound


def test_ab_test_zscore_consistency(spark, sf_dir):
    import math

    r = AP.stats_ab_test_proportions(spark, sf_dir).collect()[0]
    assert r["n_a"] > 0 and r["n_b"] > 0
    assert 0.0 <= r["p_a"] <= 1.0 and 0.0 <= r["p_b"] <= 1.0
    # recompute the z from the sufficient statistics
    pp = (r["conv_a"] + r["conv_b"]) / (r["n_a"] + r["n_b"])
    se = math.sqrt(pp * (1 - pp) * (1 / r["n_a"] + 1 / r["n_b"]))
    assert abs(r["z_score"] - (r["p_a"] - r["p_b"]) / se) < 1e-12


def test_streaming_reservoir_equals_batch_topk(spark, sf_dir):
    # Top-(k+1) selection is a merge monoid: the streamed reservoir must
    # equal the batch top-k per event type BIT-FOR-BIT (ids, priorities,
    # tau) — the property t15's batch oracle relies on.
    from database_synchronize_tool_spark.catalog import load_table
    from database_synchronize_tool_spark.operators.membership import (
        seeded_hash60,
    )
    from database_synchronize_tool_spark.plans.windows import (
        _T15_K,
        t15_stream_weighted_sample,
    )
    from pyspark.sql import Window

    streamed = {
        (r["event_type"], r["smp_rank"]): (
            r["event_id"],
            r["priority"],
            r["tau"],
        )
        for r in t15_stream_weighted_sample(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", F.col("value").alias("weight")
    )
    h = seeded_hash60(F.col("event_id"), "tps")
    pri = F.col("weight").cast("double") / (h + F.lit(1)).cast("double")
    w = Window.partitionBy("event_type").orderBy(
        F.col("priority").desc(), F.col("event_id")
    )
    batch = (
        ev.withColumn("priority", pri)
        .withColumn("smp_rank", F.row_number().over(w))
        .filter(F.col("smp_rank") <= _T15_K)
        .collect()
    )
    assert len(batch) == len(streamed) > 0
    for r in batch:
        sid, spri, _tau = streamed[(r["event_type"], r["smp_rank"])]
        assert sid == r["event_id"]
        assert spri == r["priority"]  # exact, not approximate


def test_spearman_matches_pandas(spark, sf_dir):
    out = {r["l_returnflag"]: r for r in AP.stats_spearman_rank(spark, sf_dir).collect()}
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .toPandas()
    )
    for flag, grp in li.groupby("l_returnflag"):
        # spearman = pearson over tie-averaged ranks (pandas' own
        # method="spearman" delegates to scipy, not installed here)
        rx = grp["l_quantity"].rank(method="average")
        ry = grp["l_extendedprice"].rank(method="average")
        ref = rx.corr(ry, method="pearson")
        got = out[flag]["spearman_rho"]
        assert abs(got - ref) < 1e-9, (flag, got, ref)
        assert -1.0 <= got <= 1.0
        assert out[flag]["n"] == len(grp)


def test_auc_matches_pandas_rank_formula(spark, sf_dir):
    out = {r["o_orderpriority"]: r for r in AP.stats_auc_mannwhitney(spark, sf_dir).collect()}
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_orderstatus", "o_totalprice")
        .toPandas()
    )
    for pri, grp in o.groupby("o_orderpriority"):
        pos = grp["o_orderstatus"] == "F"
        ranks = grp["o_totalprice"].rank(method="average")
        npos, nneg = int(pos.sum()), int((~pos).sum())
        ref = (ranks[pos].sum() - npos * (npos + 1) / 2) / (npos * nneg)
        r = out[pri]
        assert r["n_pos"] == npos and r["n_neg"] == nneg
        assert abs(r["auc"] - ref) < 1e-9, (pri, r["auc"], ref)
        assert 0.0 <= r["auc"] <= 1.0


def test_profile_column_stats_invariants(spark, sf_dir):
    rows = {r["column_name"]: r for r in AP.profile_column_stats(spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders")
    n = o.count()
    assert set(rows) == {c for c, _ in AP._PROFILE_COLS}
    for r in rows.values():
        assert r["null_count"] == 0  # generator emits no NULLs in orders
        assert 0 < r["ndv"] <= n
        assert r["min_repr"] is not None and r["max_repr"] is not None
    # o_orderkey is the primary key: NDV must equal the row count
    assert rows["o_orderkey"]["ndv"] == n
    # money column renders with exactly two decimals on both engines
    assert "." in rows["o_totalprice"]["min_repr"]
    assert len(rows["o_totalprice"]["min_repr"].split(".")[1]) == 2


def test_zscore_whiten_standardizes(spark, sf_dir):
    import numpy as np

    out = AP.embedding_zscore_whiten(spark, sf_dir).toPandas()
    assert set(out["pos"]) == set(range(AP._WHITEN_D))
    assert out["vec_id"].max() < AP._WHITEN_VECS
    # the stats were computed over the FULL corpus, so re-standardizing
    # the full corpus (not just the published window) gives mean 0, var 1
    e = load_table(spark, sf_dir, "embeddings").toPandas()
    mat = np.array([v[: AP._WHITEN_D] for v in e["embedding"]], dtype=np.float64)
    mean, std = mat.mean(axis=0), mat.std(axis=0)
    for pos, grp in out.groupby("pos"):
        sub = mat[np.array(sorted(set(out["vec_id"])))][:, pos]
        expect = (sub - mean[pos]) / std[pos]
        got = grp.sort_values("vec_id")["z"].to_numpy()
        # DECIMAL(18,9)-rounded sums vs numpy float sums: tiny drift only
        assert np.allclose(got, expect, atol=1e-6)


def test_weighted_median_matches_pandas(spark, sf_dir):
    out = {r["l_returnflag"]: r for r in AP.stats_weighted_median(spark, sf_dir).collect()}
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .toPandas()
    )
    for flag, grp in li.groupby("l_returnflag"):
        g = grp.sort_values("l_quantity")
        cw = g["l_extendedprice"].cumsum()
        tot = g["l_extendedprice"].sum()
        ref = g.loc[cw >= tot / 2, "l_quantity"].iloc[0]
        assert out[flag]["w_median_qty"] == ref
        assert abs(out[flag]["total_weight"] - tot) < 1e-4


def test_time_weighted_avg_matches_pandas(spark, sf_dir):
    out = {r["user_id"]: r for r in AP.ts_time_weighted_avg(spark, sf_dir).collect()}
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
    )
    import numpy as np

    checked = 0
    for uid, grp in ev.groupby("user_id"):
        g = grp.sort_values(["ts", "event_id"])
        us = g["ts"].astype("int64").to_numpy() // 1000  # ns -> us
        v_mu = np.floor(g["value"].to_numpy() * 1000).astype("int64")
        dt = np.diff(us)
        if dt.sum() <= 0:
            assert uid not in out
            continue
        ref = float((v_mu[:-1] * dt).sum()) / float(dt.sum()) / 1000.0
        r = out[uid]
        assert r["n_intervals"] == len(dt)
        assert r["total_us"] == int(dt.sum())
        assert abs(r["twa"] - ref) < 1e-9
        # TWA is a convex combination: bounded by the signal's range
        lo, hi = g["value"].min(), g["value"].max()
        assert lo - 1e-3 <= r["twa"] <= hi + 1e-3
        checked += 1
    assert checked == len(out)


def test_cusum_changepoint_is_the_argmax(spark, sf_dir):
    rows = {r["event_type"]: r for r in AP.stats_cusum_changepoint(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value").toPandas()
    ev["day"] = ev["ts"].dt.date
    for etype, grp in ev.groupby("event_type"):
        daily = grp.groupby("day")["value"].sum().sort_index()
        n = len(daily)
        run = daily.cumsum().to_numpy()
        tot = daily.sum()
        k = (1.0 + __import__("numpy").arange(n))
        cus = n * run - k * tot
        best = max(range(n), key=lambda i: (abs(cus[i]), -i))
        r = rows[etype]
        assert r["n_days"] == n
        assert r["cp_day"] == daily.index[best]
        assert abs(r["cusum_scaled"] - cus[best]) < max(1e-6 * abs(cus[best]), 1e-3)


def test_calibration_bins_partition_the_table(spark, sf_dir):
    rows = sorted(
        AP.stats_calibration_bins(spark, sf_dir).collect(),
        key=lambda r: r["bin"],
    )
    o = load_table(spark, sf_dir, "orders").toPandas()
    assert [r["bin"] for r in rows] == list(range(1, 11))
    assert sum(r["n"] for r in rows) == len(o)
    assert sum(r["positives"] for r in rows) == int((o["o_orderstatus"] == "F").sum())
    # equal-population deciles: sizes differ by at most 1
    sizes = [r["n"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # mean scores rise monotonically across score-ordered bins
    means = [r["mean_score"] for r in rows]
    assert all(a <= b for a, b in zip(means, means[1:]))
    for r in rows:
        assert 0.0 <= r["pos_rate"] <= 1.0


def test_grouped_doubled_avg_ranks_equals_window_form(spark, sf_dir):
    # the single-shuffle ranking (range repartition + carry-across-batches
    # local tie scan + broadcast offsets) must produce EXACTLY the window
    # form's doubled tie-averaged ranks, independent of where range
    # boundaries land and of Arrow batch boundaries
    from pyspark.sql import Window

    from database_synchronize_tool_spark.caching import cache_scope
    from database_synchronize_tool_spark.operators.ranks import (
        grouped_doubled_avg_ranks,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    want = {
        (r["l_orderkey"], r["l_linenumber"]): r["r2"]
        for r in li.select(
            "l_orderkey",
            "l_linenumber",
            (
                F.lit(2) * F.rank().over(w)
                + F.count(F.lit(1)).over(w.rangeBetween(0, 0))
                - F.lit(1)
            ).alias("r2"),
        ).collect()
    }
    with cache_scope():
        got = {
            (r["l_orderkey"], r["l_linenumber"]): int(r["rx"])
            for r in grouped_doubled_avg_ranks(
                li, "l_returnflag", "l_extendedprice", "rx", n_parts=7
            ).collect()
        }
    assert got == want


def test_grouped_doubled_avg_ranks_tiny_arrow_batches(spark, sf_dir):
    # force tie groups to straddle Arrow batch boundaries: the carry logic
    # must still produce the exact window-form ranks
    from pyspark.sql import Window

    from database_synchronize_tool_spark.caching import cache_scope
    from database_synchronize_tool_spark.operators.ranks import (
        grouped_doubled_avg_ranks,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        # a constant value column -> ONE giant tie group per priority,
        # the adversarial case for batch-boundary carries
        (F.col("o_orderkey") % 2).alias("vval"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("vval")
    want = {
        r["o_orderkey"]: r["r2"]
        for r in o.select(
            "o_orderkey",
            (
                F.lit(2) * F.rank().over(w)
                + F.count(F.lit(1)).over(w.rangeBetween(0, 0))
                - F.lit(1)
            ).alias("r2"),
        ).collect()
    }
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "17")
    try:
        with cache_scope():
            got = {
                r["o_orderkey"]: int(r["rx"])
                for r in grouped_doubled_avg_ranks(
                    o, "o_orderpriority", "vval", "rx", n_parts=5
                ).collect()
            }
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old or "10000"
        )
    assert got == want


def test_gini_matches_direct_formula_and_bounds(spark, sf_dir):
    import numpy as np

    row = AP.stats_gini_concentration(spark, sf_dir).collect()[0]
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .count()
        .toPandas()
    )
    x = np.sort(ev["count"].to_numpy())
    n = len(x)
    i = np.arange(1, n + 1)
    ref = float(((2 * i - n - 1) * x).sum()) / (n * x.sum())
    assert row["n_users"] == n
    assert row["n_events"] == int(x.sum())
    assert abs(row["gini"] - ref) < 1e-12
    assert 0.0 <= row["gini"] < 1.0


def test_lorenz_top_share_brackets_gini_story(spark, sf_dir):
    row = AP.stats_lorenz_top_share(spark, sf_dir).collect()[0]
    import math

    assert row["n_top"] == math.ceil(0.1 * row["n_users"])
    # the top decile holds at least its proportional share
    assert row["top_decile_share"] >= row["n_top"] / row["n_users"] - 1e-12
    assert row["top_events"] <= row["n_events"]
    assert abs(
        row["top_decile_share"] - row["top_events"] / row["n_events"]
    ) < 1e-12


def test_dow_seasonality_accounting(spark, sf_dir):
    from database_synchronize_tool_spark.plans.analytics import (
        orders_dow_seasonality,
    )

    rows = orders_dow_seasonality(spark, sf_dir).collect()
    assert sorted(r["dow"] for r in rows) == list(range(7))
    o = load_table(spark, sf_dir, "orders")
    assert sum(r["n_orders"] for r in rows) == o.count()
    assert abs(sum(r["revenue_share"] for r in rows) - 1.0) < 1e-9
    import datetime as dt

    # dow 0 really is Monday: spot-check via the anchor
    assert dt.date(1990, 1, 1).weekday() == 0


def test_revenue_waterfall_reconciles_exactly(spark, sf_dir):
    from database_synchronize_tool_spark.plans.analytics import (
        lineitem_revenue_waterfall,
    )

    for r in lineitem_revenue_waterfall(spark, sf_dir).collect():
        # DECIMAL stages reconcile bit-for-bit after one double cast each
        assert r["net"] == r["gross"] - r["discount_amt"] or abs(
            r["net"] - (r["gross"] - r["discount_amt"])
        ) < 1e-6
        assert abs(r["charged"] - (r["net"] + r["tax_amt"])) < 1e-6
        assert 0 < r["discount_amt"] < r["gross"]


def test_grouped_doubled_avg_ranks_null_group_spanning_batches(spark):
    # a NULL group whose tie groups span Arrow-batch boundaries must keep
    # its rank counter (r11 self-review: None == None guard reset it)
    from pyspark.sql import Window

    from database_synchronize_tool_spark.caching import cache_scope
    from database_synchronize_tool_spark.operators.ranks import (
        grouped_doubled_avg_ranks,
    )

    df = spark.createDataFrame(
        [(i, None if i % 2 == 0 else "g", i % 5) for i in range(200)],
        "id bigint, grp string, v bigint",
    )
    w = Window.partitionBy("grp").orderBy("v")
    want = {
        r["id"]: r["r2"]
        for r in df.select(
            "id",
            (
                F.lit(2) * F.rank().over(w)
                + F.count(F.lit(1)).over(w.rangeBetween(0, 0))
                - F.lit(1)
            ).alias("r2"),
        ).collect()
    }
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        with cache_scope():
            got = {
                r["id"]: int(r["rx"])
                for r in grouped_doubled_avg_ranks(
                    df, "grp", "v", "rx", n_parts=3
                ).collect()
            }
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old or "10000"
        )
    assert got == want


def test_grouped_doubled_avg_ranks_rejects_null_value(spark):
    # precondition enforcement (r11 advice): a NULL/NaN in value_col would
    # silently become its own tie group under numpy != — fail fast instead
    import pytest

    from database_synchronize_tool_spark.caching import cache_scope
    from database_synchronize_tool_spark.operators.ranks import (
        grouped_doubled_avg_ranks,
    )

    df = spark.createDataFrame(
        [(1, "g", 5.0), (2, "g", None), (3, "g", 5.0)],
        "id bigint, grp string, v double",
    )
    with cache_scope():
        with pytest.raises(Exception, match="NULL/NaN in value column"):
            grouped_doubled_avg_ranks(df, "grp", "v", "rx", n_parts=2).collect()

    nan_df = spark.createDataFrame(
        [(1, "g", 5.0), (2, "g", float("nan")), (3, "g", 5.0)],
        "id bigint, grp string, v double",
    )
    with cache_scope():
        with pytest.raises(Exception, match="NULL/NaN in value column"):
            grouped_doubled_avg_ranks(nan_df, "grp", "v", "rx", n_parts=2).collect()


def test_l_diversity_band_and_homogeneity(spark):
    """The sensitive-attribute band must agree with DuckDB's floor
    division on NEGATIVE balances (Spark `div` truncates toward zero, so
    the +1000 domain shift is what keeps both engines on floor semantics),
    and a k-anonymous-but-homogeneous class must be flagged."""
    import duckdb

    from database_synchronize_tool_spark.plans.approx import _LDIV_L

    vals = [-999.99, -1000.0, -0.01, 0.0, 1999.99, 2000.0, 9999.99]
    sdf = spark.createDataFrame([(v,) for v in vals], "c_acctbal double")
    spark_bands = [
        r[0]
        for r in sdf.select(
            F.expr("(CAST(FLOOR(c_acctbal) AS BIGINT) + 1000) div 2000")
        ).collect()
    ]
    duck_bands = [
        duckdb.sql(
            f"SELECT (CAST(FLOOR(CAST({v!r} AS DOUBLE)) AS BIGINT) + 1000) // 2000"
        ).fetchone()[0]
        for v in vals
    ]
    assert spark_bands == duck_bands
    assert min(spark_bands) >= 0  # the shift keeps the dividend nonnegative

    # 5 rows in one QI class, all in ONE balance band: k-anonymity sees
    # k=5 (fine), l-diversity must report the class as homogeneous
    import tempfile

    rows = [(0, f"name{i}", 1, "BUILDING", 100.0 + i) for i in range(5)]
    cols = "c_custkey bigint, c_name string, c_nationkey int, c_mktsegment string, c_acctbal double"
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(rows, cols).toPandas().to_parquet(
            f"{td}/customer.parquet"
        )
        from database_synchronize_tool_spark.plans.registry import all_queries

        out = all_queries()["privacy_l_diversity"].builder(spark, td).collect()
    assert len(out) == 1
    r = out[0]
    assert r["l_diversity"] == 1
    assert r["n_homogeneous"] == 1
    assert r["groups_below_l"] == 1
    assert r["rows_at_risk"] == 5
    assert _LDIV_L > 1
