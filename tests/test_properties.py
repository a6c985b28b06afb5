"""Property-based invariants (hypothesis) for the merge/watermark algebra.

Each example spins a Spark job, so example counts stay small; the properties
are the ones the sync engine's correctness rests on:

- merge is idempotent (replays converge — the exactly-once effect)
- merged key-set = target keys ∪ source keys; source wins collisions
- the watermark delta partitions the source exactly (no loss, no overlap)
- no-PK merge equals set-union of full rows
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from database_synchronize_tool_spark.operators.merge import dedup_merge, merge_upsert
from database_synchronize_tool_spark.operators.watermark import delta_filter

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

kv_lists = st.lists(
    st.tuples(st.integers(0, 9), st.integers(-100, 100)), max_size=12
)


def df_of(spark, pairs):
    return spark.createDataFrame(pairs or [(None, None)], "k int, v int").filter(
        "k IS NOT NULL OR v IS NOT NULL" if pairs else "false"
    )


def rows(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


@given(t=kv_lists, s=kv_lists)
@settings(**SETTINGS)
def test_merge_idempotent(spark, t, s):
    # collapse in-batch dup keys first (engine contract: single row per key)
    t = list({k: (k, v) for k, v in t}.values())
    s = list({k: (k, v) for k, v in s}.values())
    target, source = df_of(spark, t), df_of(spark, s)
    once = rows(merge_upsert(target, source, ["k"]))
    twice = rows(merge_upsert(merge_upsert(target, source, ["k"]), source, ["k"]))
    assert once == twice


@given(t=kv_lists, s=kv_lists)
@settings(**SETTINGS)
def test_merge_keyset_union_source_wins(spark, t, s):
    t = list({k: (k, v) for k, v in t}.values())
    s = list({k: (k, v) for k, v in s}.values())
    merged = dict(rows(merge_upsert(df_of(spark, t), df_of(spark, s), ["k"])))
    assert set(merged) == {k for k, _ in t} | {k for k, _ in s}
    for k, v in s:
        assert merged[k] == v  # EXCLUDED wins
    for k, v in t:
        if k not in dict(s):
            assert merged[k] == v


@given(t=kv_lists, s=kv_lists)
@settings(**SETTINGS)
def test_merge_output_key_unique_even_with_dup_source(spark, t, s):
    # RAW source batches (dup keys allowed): since round 3 merge_upsert
    # collapses in-batch dups itself, so the output must be key-unique and
    # cover exactly target-keys ∪ source-keys
    t = list({k: (k, v) for k, v in t}.values())  # targets are key-unique
    out = rows(merge_upsert(df_of(spark, t), df_of(spark, s), ["k"]))
    keys = [k for k, _ in out]
    assert len(keys) == len(set(keys))
    assert set(keys) == {k for k, _ in t} | {k for k, _ in s}


@given(t=kv_lists, s=kv_lists)
@settings(**SETTINGS)
def test_merge_collapse_keeps_max_order_col(spark, t, s):
    # with order_col, the greatest-v source row wins its key deterministically
    t = list({k: (k, v) for k, v in t}.values())
    merged = dict(
        rows(merge_upsert(df_of(spark, t), df_of(spark, s), ["k"], order_col="v"))
    )
    src_max = {}
    for k, v in s:
        src_max[k] = max(src_max.get(k, v), v)
    for k, v in src_max.items():
        assert merged[k] == v


@given(vals=st.lists(st.integers(0, 50), min_size=1, max_size=20), wm=st.integers(0, 50))
@settings(**SETTINGS)
def test_delta_filter_partitions_source(spark, vals, wm):
    src = spark.createDataFrame([(v,) for v in vals], "ck int")
    above = [r["ck"] for r in delta_filter(src, "ck", wm, parity=True).collect()]
    assert sorted(above) == sorted(v for v in vals if v > wm)


@given(t=kv_lists, s=kv_lists)
@settings(**SETTINGS)
def test_dedup_merge_is_set_union(spark, t, s):
    got = rows(dedup_merge(df_of(spark, t), df_of(spark, s)))
    assert got == sorted(set(t) | set(s))


# --- containment prefix filter: recall-1.0 theorem on random corpora --------

_words = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
                     "shared", "tokens", "common", "tail"]),
    min_size=3, max_size=12,
)
_corpora = st.lists(_words, min_size=2, max_size=6)


@given(docs=_corpora)
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_containment_prefix_equals_bruteforce(spark, docs):
    """The prefix-filter candidate bound is a theorem: for ANY corpus the
    prefix join must surface exactly the brute-force containment pairs."""
    from pyspark.sql import functions as F

    from database_synchronize_tool_spark.functions.text import containment
    from database_synchronize_tool_spark.operators.dedup import (
        containment_prefix_pairs,
        minhash_features,
    )

    frame = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(docs)],
        "doc_id bigint, text string",
    )
    got = {
        (r["doc_inner"], r["doc_outer"]): r["cont"]
        for r in containment_prefix_pairs(frame, threshold_num=8,
                                          threshold_den=10).collect()
    }
    sh = frame.select("doc_id", minhash_features(F.col("text"))["sh"].alias("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    truth = {
        (r["i"], r["o"]): r["c"]
        for r in a.join(b, F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("i"),
            F.col("b.doc_id").alias("o"),
            containment(F.col("a.sh"), F.col("b.sh")).alias("c"),
        )
        .filter(F.col("c") >= 0.8)
        .collect()
    }
    assert set(got) == set(truth), (set(truth) - set(got), set(got) - set(truth))


# --- round-7 text-signal properties ------------------------------------------


@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Ll", "Lu", "Nd"),
                whitelist_characters=" \t\n\xa0 ",
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_repetition_batch_twin_matches_expressions_on_arbitrary_text(
    spark, texts
):
    # parity must hold beyond the fixture corpus — including Unicode
    # whitespace (NBSP, EM SPACE), where Python's \s is wider than Java's
    # unless pinned to ASCII (the bug class this test exists for)
    from pyspark.sql import functions as F

    from database_synchronize_tool_spark.functions.text import (
        adjacent_repeat_count,
        dup_token_fraction,
        repetition_signals_batches,
        token_count,
        tokens,
        top_token_fraction,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = sorted(
        tuple(r)
        for r in df.mapInPandas(
            repetition_signals_batches("doc_id", "text"),
            "id bigint, n_tokens bigint, n_distinct bigint, dup_frac double,"
            " n_adj_repeats bigint, top_token_frac double",
        ).collect()
    )
    t = F.col("text")
    want = sorted(
        tuple(r)
        for r in df.select(
            "doc_id",
            token_count(t).cast("bigint"),
            F.size(F.array_distinct(tokens(t))).cast("bigint"),
            dup_token_fraction(t),
            adjacent_repeat_count(t),
            top_token_fraction(t),
        ).collect()
    )
    assert got == want


# --- round-8 properties: merkle diff + changelog compaction ---------------

merkle_rows = st.lists(
    st.tuples(st.integers(0, 63), st.integers(-50, 50)), min_size=1, max_size=20
)


@given(rows_=merkle_rows, mutate_idx=st.integers(0, 100), drop_idx=st.integers(0, 100))
@settings(**SETTINGS)
def test_merkle_diff_detects_any_single_mutation_or_delete(
    spark, rows_, mutate_idx, drop_idx
):
    from database_synchronize_tool_spark.operators.diff import merkle_bucket_diff

    base = list({k: (k, v) for k, v in rows_}.values())  # unique keys
    target = spark.createDataFrame(base, "k int, v int")

    mutated = [(k, v + 1) if i == mutate_idx % len(base) else (k, v)
               for i, (k, v) in enumerate(base)]
    changed = mutated != base
    source = spark.createDataFrame(mutated, "k int, v int")
    d = merkle_bucket_diff(target, source, "k", ["k", "v"], bucket_size=8)
    got = d.collect()
    if changed:
        # the mutated key's bucket (and only buckets) must be flagged
        mk = base[mutate_idx % len(base)][0]
        assert mk // 8 in {r.bucket for r in got}
    else:
        assert got == []

    if len(base) > 1:
        dropped = [kv for i, kv in enumerate(base) if i != drop_idx % len(base)]
        source2 = spark.createDataFrame(dropped, "k int, v int")
        d2 = merkle_bucket_diff(target, source2, "k", ["k", "v"], bucket_size=8)
        dk = base[drop_idx % len(base)][0]
        flagged = {r.bucket: r for r in d2.collect()}
        assert dk // 8 in flagged
        b = flagged[dk // 8]
        assert b.target_rows == (b.source_rows or 0) + 1


changelog = st.lists(
    st.tuples(
        st.integers(0, 5),          # key
        st.integers(0, 30),         # version (order_by)
        st.integers(-99, 99),       # payload
        st.booleans(),              # is_delete
    ),
    min_size=1,
    max_size=16,
)


@given(log=changelog)
@settings(**SETTINGS)
def test_changelog_compact_equals_sequential_replay(spark, log):
    from database_synchronize_tool_spark.operators.merge import changelog_compact

    # make (key, version) unique: order_by must be a total order per key
    log = list({(k, ver): (k, ver, p, d) for k, ver, p, d in log}.values())
    df = spark.createDataFrame(
        [(k, ver, p, "D" if d else "U") for k, ver, p, d in log],
        "k int, ver int, payload int, op string",
    )
    got = {
        (r.k, r.ver, r.payload)
        for r in changelog_compact(df, ["k"], ["ver"], op_col="op").collect()
    }
    # reference: newest op per key wins; a tombstone as the newest op
    # erases the key (same contract the unit suite pins against replay)
    expect = set()
    by_key = {}
    for k, ver, p, d in log:
        by_key.setdefault(k, []).append((ver, p, d))
    for k, entries in by_key.items():
        ver, p, d = max(entries)
        if not d:
            expect.add((k, ver, p))
    assert got == expect


# --- round-9 sketch/graph invariants ---------------------------------------


@given(
    st.lists(st.sampled_from("abcdef"), min_size=1, max_size=40),
    st.lists(st.sampled_from("abcdef"), max_size=10),
)
@settings(**SETTINGS)
def test_cms_never_undercounts(spark, items, probes):
    """Count-min's one-sided error: est(x) >= true count(x) for EVERY x,
    on arbitrary multisets (including keys absent from the sketch input —
    their estimate is whatever collisions yield, still >= 0 = truth)."""
    from collections import Counter

    from database_synchronize_tool_spark.operators.membership import (
        cms_build,
        cms_point_estimate,
    )

    truth = Counter(items)
    df = spark.createDataFrame([(x,) for x in items], "k string")
    sketch = cms_build(df, "k", depth=3, width=8)  # tiny width forces collisions
    pr = spark.createDataFrame(
        [(x,) for x in set(probes) | set(items)], "k string"
    )
    for r in cms_point_estimate(sketch, pr, "k", 3, 8).collect():
        assert r["cms_est"] >= truth.get(r["k"], 0), (r, truth)


@given(st.sets(st.integers(0, 500), min_size=1, max_size=60))
@settings(**SETTINGS)
def test_bloom_membership_is_complete(spark, members):
    """No false negatives on arbitrary member sets, even when the filter
    is overloaded (m small relative to n)."""
    from database_synchronize_tool_spark.operators.membership import (
        bloom_build,
        bloom_probe,
    )

    df = spark.createDataFrame([(str(x),) for x in members], "key string")
    bloom = bloom_build(df, "key", m_bits=128, k=3)
    got = bloom_probe(bloom, df, "key", m_bits=128, k=3).collect()
    assert all(r["bloom_hit"] for r in got)


@given(
    st.sets(
        st.tuples(st.integers(1, 9), st.integers(1, 9)).filter(
            lambda p: p[0] != p[1]
        ),
        max_size=16,
    )
)
@settings(**SETTINGS)
def test_triangle_counts_match_bruteforce(spark, pairs):
    """Degree-ordered counting equals the O(n^3) definition on arbitrary
    small graphs (including multi-edges / both orientations in input)."""
    from itertools import combinations

    from database_synchronize_tool_spark.operators.graph import (
        triangle_counts,
        undirected_edges,
    )

    if not pairs:
        return
    edges = {tuple(sorted(p)) for p in pairs}
    nodes = sorted({v for e in edges for v in e})
    want = {}
    for a, b, c in combinations(nodes, 3):
        if (
            (a, b) in edges and (a, c) in edges and (b, c) in edges
        ):
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1
    df = spark.createDataFrame(list(pairs), "a bigint, b bigint")
    got = {
        r["node"]: r["n_tri"]
        for r in triangle_counts(undirected_edges(df)).collect()
    }
    assert got == want


@given(
    st.sets(
        st.tuples(st.integers(1, 8), st.integers(1, 8)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(**SETTINGS)
def test_pagerank_mass_leak_bounded(spark, pairs):
    """Scaled-integer PageRank loses at most deg(u) units per vertex per
    iteration to floor division — total mass stays within that bound and
    never grows."""
    from database_synchronize_tool_spark.operators.graph import (
        PR_SCALE,
        pagerank_scaled,
        undirected_edges,
    )

    e = undirected_edges(
        spark.createDataFrame(list(pairs), "a bigint, b bigint")
    )
    n_edges_directed = e.count()
    iters = 2
    ranks = pagerank_scaled(e, iterations=iters).collect()
    total = sum(r["rank_scaled"] for r in ranks)
    n_nodes = len(ranks)
    # initial floor: N * (SCALE div N) <= SCALE; per iteration each vertex
    # floors its contribution (deg units) and the damp+base floors (2 more)
    bound = n_nodes + iters * (n_edges_directed + 2 * n_nodes) + 2 * n_nodes
    assert 0 <= PR_SCALE - total <= bound, (total, bound)


# --- ranks: the two-pass forms equal the window forms on ANY input -----------

rank_lists = st.lists(st.integers(-50, 50), min_size=1, max_size=40)


@given(vals=rank_lists, n_parts=st.sampled_from([1, 3, 32, 100]))
@settings(**SETTINGS)
def test_global_row_numbers_property(spark, vals, n_parts):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from database_synchronize_tool_spark.operators.ranks import (
        global_row_numbers,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, v long"
    )
    got = sorted(
        (r["i"], r["rn"])
        for r in global_row_numbers(
            df, [F.col("v"), F.col("i")], "rn", n_parts=n_parts
        ).collect()
    )
    want = sorted(
        (r["i"], r["rn"])
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("v", "i"))
        ).collect()
    )
    assert got == want


@given(
    vals=rank_lists,
    buckets=st.sampled_from([2, 4, 10]),
    n_parts=st.sampled_from([1, 7, 32]),
)
@settings(**SETTINGS)
def test_two_pass_ntile_property(spark, vals, buckets, n_parts):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from database_synchronize_tool_spark.operators.ranks import (
        global_row_numbers,
        ntile_from_rn,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, v long"
    )
    rn = global_row_numbers(df, [F.col("v"), F.col("i")], "rn", n_parts)
    got = sorted(
        (r["i"], r["b"])
        for r in rn.select(
            "i", ntile_from_rn(F.col("rn"), F.lit(len(vals)), buckets).alias("b")
        ).collect()
    )
    want = sorted(
        (r["i"], r["b"])
        for r in df.select(
            "i",
            F.ntile(buckets)
            .over(Window.orderBy("v", "i"))
            .cast("int")
            .alias("b"),
        ).collect()
    )
    assert got == want


@given(vals=rank_lists, n_parts=st.sampled_from([1, 5, 32]))
@settings(**SETTINGS)
def test_global_running_sum_property(spark, vals, n_parts):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from database_synchronize_tool_spark.operators.ranks import (
        global_running_sum,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, v long"
    )
    got = sorted(
        (r["i"], r["cum"])
        for r in global_running_sum(
            df, [F.col("i")], "v", "cum", n_parts=n_parts
        ).collect()
    )
    w = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    want = sorted(
        (r["i"], r["cum"])
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    )
    assert got == want
