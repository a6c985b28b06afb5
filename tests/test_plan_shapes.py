"""Physical-plan regression guards: the optimizations SURVEY §4 claims are
real must stay visible in the executed plan — filter pushdown into the
parquet scan, column pruning in ReadSchema, broadcast joins for dims, and
single-sort window evaluation. A refactor that silently loses one of these
passes value-checks but regresses at scale; these tests pin the plan."""

from __future__ import annotations

from database_synchronize_tool_spark.plans.registry import all_queries


def plan_of(spark, sf_dir, name: str) -> str:
    df = all_queries()[name].builder(spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_delta_scan_pushes_watermark_filter(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "s2_delta_scan_ts")
    assert "PushedFilters" in plan
    assert "GreaterThan(l_shipdate" in plan  # the watermark predicate reached the scan


def test_projection_prunes_read_schema(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "s1_full_scan_projection")
    # ReadSchema carries only the 4 projected columns — not all of customer
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "c_custkey" in read and "c_acctbal" in read
    assert "c_address" not in read and "c_phone" not in read


def test_q5_broadcasts_dimensions(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q5_revenue_by_nation")
    assert "BroadcastHashJoin" in plan  # dims broadcast, no dim-side shuffle


def test_q1_partial_aggregation(spark, sf_dir):
    # map-side combine: two HashAggregate nodes around one Exchange
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan


def test_sessionization_single_sort(spark, sf_dir):
    # both window functions must share one shuffle+sort (the t6 regression)
    plan = plan_of(spark, sf_dir, "t6_sessionization")
    n_sorts = sum(1 for l in plan.splitlines() if l.strip().startswith("(") and ") Sort" in l)
    assert n_sorts <= 1, f"expected a single Sort for both windows, got {n_sorts}"


def test_topk_is_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "o1_sort_limit_topk")
    assert "TakeOrderedAndProject" in plan  # not a full global sort


def test_multiprobe_join_is_broadcast_hash_not_cartesian(spark, sf_dir):
    # the probe explode must stay on the broadcast query side; the candidate
    # join must remain a bucket equi-join (hash), never a cartesian product
    plan = plan_of(spark, sf_dir, "ann_multiprobe_topk")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_neardup_block_join_is_hash_not_cartesian(spark, sf_dir):
    # the embedding near-dup self-join must stay a block equi-join (hash),
    # never a cartesian product (ann_ivf_topk moved to the fused-scan
    # family pinned below, so this guards the remaining join-shaped path)
    plan = plan_of(spark, sf_dir, "dedup_embedding_cosine")
    assert "CartesianProduct" not in plan


def _simple(df) -> str:
    # one line per operator with inline arguments — countable, unlike the
    # formatted mode that repeats each node name in tree + detail sections
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )


def _scd2_frames(spark, tmp_path=None):
    from database_synchronize_tool_spark.catalog import load_table

    target = spark.createDataFrame(
        [
            (1, "a", "2024-01-01 00:00:00", None, True),
            (2, "b", "2024-01-01 00:00:00", None, True),
            (2, "old", "2023-01-01 00:00:00", "2024-01-01 00:00:00", False),
        ],
        "k int, v string, valid_from string, valid_to string, is_current boolean",
    )
    source = spark.createDataFrame(
        [(2, "b2", "2024-06-01 00:00:00"), (3, "c", "2024-06-01 00:00:00")],
        "k int, v string, change_ts string",
    )
    return target, source


def test_scd2_broadcast_source_plan_has_no_shuffle(spark):
    # claim (scd.py docstring): broadcast_source decomposes the full outer
    # into three broadcast joins — the huge current slice is scanned, never
    # shuffled. Pin: only BroadcastHashJoins, zero shuffle Exchanges.
    from database_synchronize_tool_spark.operators.scd import scd2_merge

    target, source = _scd2_frames(spark)
    # collapse=False isolates the merge shape: the source-collapse window
    # shuffles only the (small) delta and is orthogonal to this claim
    plan = _simple(
        scd2_merge(
            target, source, keys=["k"], tracked=["v"],
            broadcast_source=True, collapse=False,
        )
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan  # no key shuffle anywhere


def test_scd2_closed_history_bypasses_the_join(spark):
    # claim: history rows reach the output through the Union branch only —
    # the single key shuffle pair feeds the full-outer join's two inputs,
    # and no other Exchange exists for the history side to pass through
    from database_synchronize_tool_spark.operators.scd import scd2_merge

    target, source = _scd2_frames(spark)
    # collapse=False: this test pins the join/history shape, and the source
    # collapse window would add its own (source-side) Exchange
    plan = _simple(
        scd2_merge(target, source, keys=["k"], tracked=["v"], collapse=False)
    )
    assert "Union" in plan
    n_joins = sum(plan.count(j) for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))
    assert n_joins == 1, plan
    assert plan.count("Exchange hashpartitioning") <= 2  # join inputs only


def test_scd2_is_current_partitioned_target_prunes(spark, tmp_path):
    # claim: with the target partitioned on is_current, the current slice
    # (and the history branch) are partition-pruned scans
    from database_synchronize_tool_spark.operators.scd import scd2_merge

    target, source = _scd2_frames(spark)
    path = str(tmp_path / "scd2_target")
    target.write.partitionBy("is_current").parquet(path)
    # partition-column type inference leaves booleans as strings; read with
    # the explicit schema so is_current keeps its type
    loaded = spark.read.schema(target.schema).parquet(path)
    df = scd2_merge(loaded, source, keys=["k"], tracked=["v"], broadcast_source=True)
    # formatted mode: simple-mode scan lines truncate long filter lists
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    # both branches prune: the current slice keeps is_current=true partitions,
    # the history branch the rest. The predicates are the NULL-safe
    # coalesce(is_current, false) forms (NULL-flag rows are history, not
    # dropped — operators/scd.py) and still evaluate per-partition, so
    # pruning is intact on both branches.
    assert any("is_current" in l and "NOT" not in l for l in pf), plan
    assert any("NOT" in l and "is_current" in l for l in pf), pf


def test_tfidf_vocab_join_no_cartesian(spark, sf_dir):
    # the (doc,term)xvocab join must be a hash equi-join; the only nested
    # loop allowed is the broadcast of the 1-row corpus-count aggregate
    plan = plan_of(spark, sf_dir, "text_tfidf_topk")
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2  # partial/final pairs on both aggs


def test_containment_prefix_posting_join_is_equi(spark, sf_dir):
    # prefix rows join posting lists on the shingle hash — an equi-join,
    # never a cartesian; the per-doc prefix window partitions by doc_id
    plan = plan_of(spark, sf_dir, "dedup_containment_prefix")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pack_streams_window_is_partitioned(spark, sf_dir):
    # the packing prefix-sum must run as K parallel per-stream windows —
    # a missing partitionBy would collapse to one global sorted partition
    # (Spark warns "No Partition Defined for Window operation")
    plan = plan_of(spark, sf_dir, "text_pack_streams")
    win = [l for l in plan.splitlines() if "windowspecdefinition" in l]
    assert win, plan
    # every window spec carries the stream partition key
    assert all("stream" in l for l in win), win
    assert "SinglePartition" not in plan


def test_bucketed_target_merge_skips_big_side_shuffle(spark, sf_dir):
    # SCALE.md / merge.py claim: a target bucketed on the merge key is not
    # re-shuffled by the merge join — its bucketing already satisfies the
    # required distribution, so only the (small) source side pays an
    # Exchange. Pin that: the bucketed plan must carry strictly fewer
    # Exchanges than the identical merge over the unbucketed parquet.
    from database_synchronize_tool_spark.catalog import load_table
    from database_synchronize_tool_spark.operators.merge import merge_upsert

    orders = load_table(spark, sf_dir, "orders")
    delta = orders.limit(500)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        spark.sql("DROP TABLE IF EXISTS bucketed_orders_test")
        (
            orders.write.mode("overwrite")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable("bucketed_orders_test")
        )
        bucketed = spark.table("bucketed_orders_test")

        def exchanges(df) -> int:
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            return plan.count("Exchange")

        # null_safe_keys=False: o_orderkey is a constraint-non-null PK, and
        # the raw-key join is what lets the bucketing satisfy the join's
        # distribution (null-safe keys wrap in coalesce/isnull and force
        # the Exchange back — see merge_upsert's docstring)
        n_bucketed = exchanges(
            merge_upsert(bucketed, delta, ["o_orderkey"], null_safe_keys=False)
        )
        n_plain = exchanges(
            merge_upsert(orders, delta, ["o_orderkey"], null_safe_keys=False)
        )
        assert n_bucketed < n_plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bucketed_orders_test")


def test_fused_pq_scan_has_single_exchange(spark, sf_dir):
    # Round-6 verdict #2 done-criterion, strengthened: the fused PQ/IVF-PQ
    # ADC scan is ONE narrow pass (scan -> MapInPandas) feeding the top-k
    # ranking window — NO join, NO explode (Generate), and exactly ONE
    # Exchange: the window's hashpartitioning(query_id). Spark's
    # WindowGroupLimit additionally prunes each partition to a partial
    # top-k BEFORE that exchange, so only ~k rows per partition per query
    # shuffle — the plan that survives a 100x scale-up.
    for name in (
        "ann_pq_adc_topk",
        "ann_ivf_pq_topk",
        "ann_ivf_pq_residual_topk",
        "ann_bruteforce_topk",
        "ann_ivf_topk",
    ):
        df = all_queries()[name].builder(spark, sf_dir)
        plan = _simple(df)
        assert plan.count("Exchange") == 1, f"{name} has extra exchanges"
        assert "hashpartitioning(query_id" in plan, name
        assert "Join" not in plan, name
        assert "Generate" not in plan, name
        assert "WindowGroupLimit" in plan, name


def test_quality_scan_queries_have_no_exchange(spark, sf_dir):
    # the curation sweep operators are NARROW by design: one codegen scan,
    # zero shuffles — the property that makes a 100 TB filter pass one scan
    for name in (
        "text_repetition_signals",
        "corpus_quality_filter",
        "text_pii_redact",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "Exchange" not in plan, f"{name} grew a shuffle:\n{plan}"


def test_ngram_miner_distincts_in_row_before_explode(spark, sf_dir):
    # the per-doc dedup must happen as array_distinct BEFORE the explode
    # (shuffle carries one row per distinct bigram), and the final top-30
    # must be TakeOrderedAndProject, not a global sort
    plan = plan_of(spark, sf_dir, "corpus_ngram_topk")
    assert "array_distinct" in plan
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2  # map-side partial agg


def test_refine_joins_are_broadcast_never_sortmerge(spark, sf_dir):
    # the shortlist and the query vectors are bounded metadata: both refine
    # joins must broadcast; a SortMergeJoin here would shuffle the corpus
    plan = plan_of(spark, sf_dir, "ann_ivf_pq_refine_topk")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cms_lookup_broadcasts_sketch(spark, sf_dir):
    # the bounded sketch side must broadcast into the probe join; no
    # CartesianProduct anywhere in the pipeline
    plan = plan_of(spark, sf_dir, "sketch_cms_part_freq")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bloom_probe_broadcasts_filter(spark, sf_dir):
    # the <=128-row filter table joins the probe stream as a broadcast
    plan = plan_of(spark, sf_dir, "sketch_bloom_decontam")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_hll_partial_aggregates_registers(spark, sf_dir):
    # register max() must partial-aggregate map-side: the shuffle carries
    # <= 256 register rows per group per partition, never the id stream
    plan = plan_of(spark, sf_dir, "sketch_hll_distinct_orders")
    assert "partial_max" in plan


def test_graph_queries_never_cartesian(spark, sf_dir):
    for q in ("graph_triangle_parts", "graph_pagerank_parts"):
        plan = plan_of(spark, sf_dir, q)
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q


def test_linkage_candidates_are_equi_join(spark, sf_dir):
    # blocking must produce a hash/broadcast equi-join on the block key;
    # levenshtein must be a post-join filter, never a join-free cross
    plan = plan_of(spark, sf_dir, "link_fuzzy_noisy_docs")
    assert "CartesianProduct" not in plan
    assert "levenshtein" in plan


def test_priority_sample_is_take_ordered_not_global_sort(spark, sf_dir):
    # the weighted reservoir must come from per-partition (k+1)-heaps —
    # TakeOrderedAndProject — with the tau join broadcast; a global Sort
    # would be the O(n log n) scale regression
    plan = plan_of(spark, sf_dir, "sample_weighted_reservoir")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_covariance_stats_single_shuffle(spark, sf_dir):
    # cells are generated in-row: exactly one Exchange (the 136-group
    # partial->final aggregate), never a join of exploded tables
    plan = plan_of(spark, sf_dir, "embedding_covariance_stats")
    n_exchange = sum(
        1
        for l in plan.splitlines()
        if l.strip().startswith("(") and ") Exchange" in l
    )
    assert n_exchange == 1, f"expected 1 shuffle, got {n_exchange}"
    assert "partial_" in plan  # map-side combine on the DECIMAL sums
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_join_cardinality_sketch_pairing_is_broadcast(spark, sf_dir):
    # both sketches are bounded (depth x width): their pairing join and the
    # estimate's attachment must broadcast, never shuffle-join
    plan = plan_of(spark, sf_dir, "stats_join_cardinality_estimate")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_delta_join_maintenance_broadcasts_deltas(spark, sf_dir):
    # the delta sides must broadcast into the mixed terms — the base table
    # streams, it is never re-shuffled for an incremental refresh
    plan = plan_of(spark, sf_dir, "j12_delta_join_maintenance")
    assert plan.count("BroadcastHashJoin") >= 3  # dAxB0, A0xdB, dAxdB
    assert "CartesianProduct" not in plan


def test_spearman_has_no_windows_and_one_range_shuffle_per_axis(spark, sf_dir):
    # r11: spearman moved off the 3-group rank window (each group's sort
    # in ONE task) onto ranks.grouped_doubled_avg_ranks — the plan must
    # contain ZERO Window nodes, exactly one range exchange per ranked
    # axis (2 total), and every remaining hash exchange may only feed the
    # tiny (pid, group) offset aggregates / the 3-row final groupBy —
    # never carry the per-row rank columns
    import re

    from database_synchronize_tool_spark.caching import cache_scope

    with cache_scope():
        df = all_queries()["stats_spearman_rank"].builder(spark, sf_dir)
        df.collect()
        # executedPlan, not formatted explain: the persisted rank
        # intermediates print as InMemoryRelation whose INNER exchanges
        # formatted mode hides. Cached subtrees print repeatedly, so
        # dedupe physical exchanges by plan_id.
        plan = df._jdf.queryExecution().executedPlan().toString()
    assert " Window " not in plan and "WindowExec" not in plan
    # a cached subtree prints once per reference with fresh plan_ids, so
    # dedupe range exchanges by their NORMALIZED key expressions — each
    # distinct signature is one materialized shuffle (the persist pins it)
    range_sigs = set()
    for line in plan.splitlines():
        if "Exchange rangepartitioning" in line:
            m = re.search(r"rangepartitioning\(([^)]*)\)", line)
            range_sigs.add(re.sub(r"#\d+L?", "", m.group(1)))
        if "Exchange hashpartitioning" in line:
            assert ("__pid" in line) or (
                "rx2i" not in line and "ry2i" not in line
            ), (
                "a hash exchange is carrying per-row rank data — the "
                f"second full shuffle is back: {line.strip()}"
            )
    assert len(range_sigs) == 2, (
        f"expected one range shuffle per axis, got {sorted(range_sigs)}"
    )
    assert "CartesianProduct" not in plan


def test_profile_is_one_scan_through_expand(spark, sf_dir):
    # the multi-distinct ANALYZE profile must stay a single parquet scan
    # multiplied by Expand — not one scan per column
    plan = plan_of(spark, sf_dir, "profile_column_stats")
    n_scans = sum(
        1
        for l in plan.splitlines()
        if l.strip().startswith("(") and ") Scan" in l
    )
    assert n_scans == 1, f"profile must scan orders once, got {n_scans}"
    assert "Expand" in plan


def test_pit_join_is_hash_equi_join_never_range_explosion(spark, sf_dir):
    # the interval predicate must stay a residual on a key equi-join;
    # a cartesian/BNLJ here would explode at any real dimension size
    plan = plan_of(spark, sf_dir, "j13_point_in_time_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_whiten_broadcasts_stats_back(spark, sf_dir):
    # per-dim stats are 16 rows — they must come back as a broadcast,
    # never a shuffle of the vector table
    plan = plan_of(spark, sf_dir, "embedding_zscore_whiten")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_inverted_index_survivor_joins_are_broadcast(spark, sf_dir):
    # two-phase build: counting pass -> bounded survivor set -> posting
    # pass. The survivor set must come back as broadcasts — a shuffle
    # join here would re-shuffle the exploded token stream a second time
    plan = plan_of(spark, sf_dir, "text_inverted_index")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_freshness_report_is_single_scan(spark, sf_dir):
    # the corpus watermark must come from a window OVER the aggregate —
    # an agg-of-agg + crossJoin silently re-scans events (caught in plan
    # review: Scan x2)
    plan = plan_of(spark, sf_dir, "source_freshness_report")
    n_scans = sum(
        1
        for l in plan.splitlines()
        if l.strip().startswith("(") and ") Scan" in l
    )
    assert n_scans == 1, f"freshness report must scan events once, got {n_scans}"


def test_rfm_is_single_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "events_rfm_scores")
    n_scans = sum(
        1
        for l in plan.splitlines()
        if l.strip().startswith("(") and ") Scan" in l
    )
    assert n_scans == 1, f"RFM must scan events once, got {n_scans}"


# --- global-window sweep (r9 verdict #1) -------------------------------------

# Queries allowed to keep an UNBOUNDED-looking global window: each one's
# window input is domain-bounded by construction (not data-bounded), and
# the window is the one-scan-optimal plan (an agg-of-agg + crossJoin would
# re-scan the base table).
_GLOBAL_WINDOW_ALLOWLIST = {
    # cumulative counts over fixed-width histogram BINS: ~205 rows for the
    # full price domain regardless of data volume (the histogram IS the
    # bounded summary)
    "sketch_histogram_quantiles",
    # corpus watermark over the |event_type|-row aggregate (~5 rows)
    "source_freshness_report",
    # revenue share over the 7-row day-of-week aggregate
    "orders_dow_seasonality",
    # running total over calendar months (~12 rows/year forever)
    "orders_customer_adoption",
}

from database_synchronize_tool_spark.plan_checks import (  # noqa: E402
    STREAMING_PREFIXES as _STREAMING_PREFIXES,
    low_ndv_partition_windows,
    unbounded_global_windows,
)

# Justified low-NDV partition windows (each entry must say why the input
# is bounded in a way plan_checks cannot see). Empty on purpose: the two
# r10 offenders (stats_spearman_rank, stats_auc_mannwhitney) moved to
# ranks.grouped_doubled_avg_ranks; keep it empty unless a query can prove
# its window input is bounded.
_LOW_NDV_WINDOW_ALLOWLIST: dict[str, str] = {}


def test_no_unbounded_global_windows_anywhere(spark, sf_dir):
    # EVERY declared batch query must be free of single-partition global
    # sorts (Window with no partitionBy over unbounded input). topk goes
    # through orderBy().limit(k) + a rank window over the k survivors
    # (bounded, recognized here); global ranks/prefix sums go through the
    # range-partitioned two-pass in operators/ranks.py.
    offenders = {}
    for name, q in all_queries().items():
        if name.startswith(_STREAMING_PREFIXES):
            continue
        n_bad = unbounded_global_windows(q.builder(spark, sf_dir))
        if name in _GLOBAL_WINDOW_ALLOWLIST:
            continue
        if n_bad:
            offenders[name] = n_bad
    assert not offenders, (
        "unbounded global Window (single-partition sort at scale) in: "
        f"{offenders} — use operators/ranks.topk_ranked / "
        "global_row_numbers / global_running_sum, or justify an "
        "allowlist entry"
    )


def test_no_low_ndv_partition_windows_anywhere(spark, sf_dir):
    # the blind spot of the empty-partitionSpec sweep (r10 verdict #2): a
    # rank window partitioned by a 3-value dimension column passes that
    # check but still funnels a third of the table through one sorter at
    # 100x. Windows over aggregated (group-count) input or below a limit
    # are recognized as safe by plan_checks.
    offenders = {}
    for name, q in all_queries().items():
        if name.startswith(_STREAMING_PREFIXES):
            continue
        if name in _LOW_NDV_WINDOW_ALLOWLIST:
            continue
        # a previous builder's scoped_persist can replace this query's
        # Aggregate subtree with an InMemoryRelation, hiding the
        # already-reduced-input exemption from the plan check
        spark.catalog.clearCache()
        n_bad = low_ndv_partition_windows(q.builder(spark, sf_dir))
        if n_bad:
            offenders[name] = n_bad
    assert not offenders, (
        "Window partitioned ONLY by bounded-NDV dimension columns over "
        f"un-reduced input in: {offenders} — use "
        "operators/ranks.grouped_doubled_avg_ranks, aggregate first, or "
        "justify an allowlist entry"
    )


def test_incremental_minhash_shuffles_only_candidate_pairs(spark, sf_dir):
    # r10 flagged the 0.046->0.204 s drift after the r9 array-replication
    # fix; the executed plan documents the exchange budget as the minimum
    # for correctness: exactly ONE non-broadcast exchange, and it carries
    # only (doc_new, doc_old) candidate ids — the cross-band pair dedup.
    # The corpus (signatures, shingles, bands) must NEVER shuffle: the new
    # side broadcasts, survivors broadcast back into the corpus table.
    import re

    from database_synchronize_tool_spark.caching import cache_scope

    with cache_scope():
        df = all_queries()["dedup_minhash_incremental"].builder(
            spark, sf_dir
        )
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
    sigs = set()
    for line in plan.splitlines():
        if "Exchange" in line and "Broadcast" not in line:
            m = re.search(r"Exchange (\w+partitioning\([^)]*\))", line)
            if m:
                sig = re.sub(r"#\d+L?", "", m.group(1))
                sigs.add(re.sub(r", \d+\)$", ")", sig))
    assert sigs == {"hashpartitioning(doc_new, doc_old)"}, (
        "incremental LSH grew a data shuffle beyond the candidate-pair "
        f"dedup: {sorted(sigs)}"
    )


def test_two_pass_ranks_shuffle_data_exactly_once(spark):
    # the r10 review found Window.partitionBy(__pid) silently re-exchanged
    # the whole table by hash on top of the range exchange; the mii /
    # mapInPandas forms must never re-grow that second data shuffle —
    # every hashpartitioning exchange left in the plan may only feed the
    # tiny per-__pid aggregates, never carry the data columns
    from pyspark.sql import functions as F

    from database_synchronize_tool_spark.operators.ranks import (
        global_row_numbers,
        global_running_sum,
    )

    df = spark.range(10000).select(
        F.col("id").alias("i"), (F.col("id") % 7).alias("v")
    )
    for out in (
        global_row_numbers(df, [F.col("v"), F.col("i")], "rn"),
        global_running_sum(df, [F.col("i")], "v", "cum"),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "Exchange hashpartitioning" in line:
                assert "__pid" in line and "i#" not in line, (
                    "a hash exchange is carrying data columns — the "
                    f"second full shuffle is back: {line.strip()}"
                )


def test_ndv_profile_classifier_and_sweep_catch_new_column(spark):
    # r11 verdict #6: the low-NDV list is DERIVED from measured data, not
    # hand-maintained. (a) the classifier flags a synthetic enum column
    # (small NDV, no growth) and clears keys/measures that scale; (b) the
    # sweep catches a window partitioned by a profiled-low column that the
    # OLD hand list never contained (props: 100 event templates).
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from database_synchronize_tool_spark.plan_checks import (
        LOW_NDV_COLUMNS,
        low_ndv_partition_windows,
    )
    from tools.profile_ndv import classify

    lo = {
        "status": {"table": "t", "rows": 1000, "ndv": 7},
        "id": {"table": "t", "rows": 1000, "ndv": 1000},
        "bucket_400": {"table": "t", "rows": 1000, "ndv": 380},
        "semi_key": {"table": "t", "rows": 1000, "ndv": 90},
    }
    hi = {
        "status": {"table": "t", "rows": 10000, "ndv": 7},
        "id": {"table": "t", "rows": 10000, "ndv": 10000},
        "bucket_400": {"table": "t", "rows": 10000, "ndv": 400},
        "semi_key": {"table": "t", "rows": 10000, "ndv": 450},  # scales 5x
    }
    cols = classify(lo, hi)["columns"]
    assert cols["status"]["low_ndv"] is True
    assert cols["bucket_400"]["low_ndv"] is True  # small and stable
    assert cols["id"]["low_ndv"] is False  # exceeds the cap
    assert cols["semi_key"]["low_ndv"] is False  # grows with the data

    # props (100 distinct payload templates) was NOT in the old hand list;
    # the measured profile flags it, and the sweep flags a window over it
    assert "props" in LOW_NDV_COLUMNS and "s_nationkey" in LOW_NDV_COLUMNS
    ev = spark.createDataFrame(
        [(i, f"tmpl{i % 5}", float(i)) for i in range(50)],
        "event_id long, props string, value double",
    )
    bad = ev.withColumn(
        "rk", F.row_number().over(W.partitionBy("props").orderBy("value"))
    )
    assert low_ndv_partition_windows(bad) == 1
    # aggregate-first input stays exempt
    ok = (
        ev.groupBy("props", "value").count()
        .withColumn(
            "rk", F.row_number().over(W.partitionBy("props").orderBy("value"))
        )
    )
    assert low_ndv_partition_windows(ok) == 0


def test_shard_manifest_mapping_join_is_broadcast(spark, sf_dir):
    # r14: the 128-row bin->shard mapping must broadcast onto the corpus —
    # a SortMergeJoin here would shuffle the whole corpus on sub_bin
    plan = plan_of(spark, sf_dir, "curation_shard_manifest")
    assert "BroadcastHashJoin" in plan, plan[:800]
    assert "SortMergeJoin" not in plan


def test_nb_quality_topk_is_take_ordered_with_broadcast_overlap(spark, sf_dir):
    # r14: both top-ks are TakeOrderedAndProject (per-partition heaps, no
    # global sort) and the kxk overlap join broadcasts
    plan = plan_of(spark, sf_dir, "curation_nb_quality_topk")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_semantic_pairs_single_python_crossing(spark, sf_dir):
    # r15: the posexplode over the cell-assignment UDF used to push its
    # size>0 predicate below the projection, duplicating the UDF — every
    # vector crossed the Python boundary twice. The UDF is marked
    # non-deterministic (guide §4.4) precisely so the optimizer may not
    # copy it: exactly ONE Python eval node in the whole plan.
    import re

    plan = plan_of(spark, sf_dir, "dedup_semantic_pairs")
    evals = re.findall(r"\(\d+\) (?:Arrow|Batch)EvalPython", plan)
    assert len(evals) == 1, plan[:1200]


def test_histogram_quantile_rank_probe_is_bin_pruned(spark, sf_dir):
    # r15: the exact-rank window must sort only the <=|qs| target bins
    # (broadcast semi-join below the Window), not every bin of the full
    # table; and the full-table passes are capped at the semantic minimum
    # of 3 (per-flag histogram, direct histogram, pruned rank probe).
    import re

    plan = plan_of(spark, sf_dir, "sketch_histogram_quantiles")
    tree = plan.split("\n\n")[0]
    assert re.search(r"BroadcastHashJoin", plan)
    scans = re.findall(r"\(\d+\) Scan parquet", plan)
    assert len(scans) <= 3, f"{len(scans)} full-table scans"


def test_market_basket_single_shuffle_of_base_data(spark, sf_dir):
    # r15: basket building is ONE ObjectHashAggregate shuffle keyed by
    # order (collect_set), pairs generate in-row — no self-join, no
    # second full-width exchange, no broadcast of a corpus-sized side.
    plan = plan_of(spark, sf_dir, "market_basket_pairs")
    assert "Join" not in plan, plan[:800]
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 2, tree
