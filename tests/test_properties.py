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
