"""Unit tests for the text-analysis and vector expression libraries."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from database_synchronize_tool_spark.functions.text import (
    fingerprint,
    jaccard,
    lang_id,
    quality_score,
    shingles,
    token_count,
)
from database_synchronize_tool_spark.functions.vectors import cosine, dot, norm


def one(spark, col_expr, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return [r["out"] for r in df.select(col_expr.alias("out")).collect()]


def test_token_count(spark):
    got = one(
        spark, token_count(F.col("t")), [("a  b c",), ("",), ("  x ",)], "t string"
    )
    assert got == [3, 0, 1]


def test_lang_id(spark):
    got = one(
        spark,
        lang_id(F.col("t")),
        [
            ("the cat and the dog is a pet",),
            ("der Hund und die Katze ist",),
            ("le chat et la maison est",),
            ("zzz qqq www",),
        ],
        "t string",
    )
    assert got == ["en", "de", "fr", "unknown"]


def test_fingerprint_normalizes(spark):
    # case/whitespace/punct-insensitive: both normalize to the same md5
    got = one(
        spark,
        fingerprint(F.col("t")),
        [("Hello,   World!",), ("hello world",)],
        "t string",
    )
    assert got[0] == got[1]


def test_shingles_distinct(spark):
    got = one(spark, shingles(F.col("t")), [("abab",)], "t string")
    # "abab" -> aba, bab (distinct)
    assert sorted(got[0]) == ["aba", "bab"]


def test_jaccard_identical_and_disjoint(spark):
    df = spark.createDataFrame([(["a", "b"], ["a", "b"]), (["a"], ["b"])], "x array<string>, y array<string>")
    got = [r["out"] for r in df.select(jaccard(F.col("x"), F.col("y")).alias("out")).collect()]
    assert got == [1.0, 0.0]


def test_quality_score_bounds(spark):
    text = " ".join(["the word and more of text is here fine okay"] * 2)
    got = one(spark, quality_score(F.col("t")), [(text,), ("x",)], "t string")
    assert 0.0 <= got[0] <= 1.0
    assert got[1] < got[0]  # one-token doc scores below a normal sentence


def test_dot_norm_cosine(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<float>, b array<float>"
    )
    d = df.select(dot(F.col("a"), F.col("b")).alias("out")).collect()[0]["out"]
    assert d == 32.0
    n = df.select(norm(F.col("a")).alias("out")).collect()[0]["out"]
    assert math.isclose(n, math.sqrt(14.0))
    c = df.select(cosine(F.col("a"), F.col("a")).alias("out")).collect()[0]["out"]
    assert math.isclose(c, 1.0)


def test_cosine_orthogonal(spark):
    df = spark.createDataFrame([([1.0, 0.0], [0.0, 1.0])], "a array<float>, b array<float>")
    c = df.select(cosine(F.col("a"), F.col("b")).alias("out")).collect()[0]["out"]
    assert c == 0.0


def test_split_dedup_safe_copies_cotravel(spark):
    """Every copy of a duplicated document must land in the same split —
    the invariant split_dedup_safe exists for (fingerprint-keyed buckets)."""
    from database_synchronize_tool_spark.functions.text import fingerprint

    base = "The Quick   brown FOX jumps over the lazy dog!"
    docs = spark.createDataFrame(
        # 1 and 2 are the same content modulo case/whitespace/punctuation;
        # 3 is distinct
        [(1, base), (2, "the quick brown fox jumps over the lazy dog"),
         (3, "something else entirely")],
        "doc_id bigint, text string",
    )
    fp = fingerprint(F.col("text"))
    b = (
        F.ascii(F.substring(fp, 1, 1)) * 961
        + F.ascii(F.substring(fp, 2, 1)) * 31
        + F.ascii(F.substring(fp, 3, 1))
    ) % 10
    split = F.when(b < 8, "train").when(b < 9, "val").otherwise("test")
    got = {r["doc_id"]: r["s"] for r in docs.select("doc_id", split.alias("s")).collect()}
    assert got[1] == got[2]  # canonical-equal copies co-travel
    # and fingerprint-keyed assignment means NO fp ever spans two splits
    spans = (
        docs.select(fp.alias("fp"), split.alias("s"))
        .groupBy("fp")
        .agg(F.countDistinct("s").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert spans == 0


def test_stratified_rebalance_evens_language_shares(spark, sf_dir):
    """Rebalancing keeps ~min_n docs per language: every stratum's kept
    count is within sampling noise of the smallest stratum's size, and the
    draw is deterministic (re-run gives identical rows)."""
    from database_synchronize_tool_spark.plans.registry import get

    df = get("stratified_rebalance_sample").builder(spark, sf_dir)
    kept = {r["lang"]: r["n"] for r in df.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    from database_synchronize_tool_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    full = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    min_n = min(full.values())
    for lang, n in kept.items():
        # hash draw is Bernoulli(min_n/n_lang) per doc: allow generous noise
        assert n <= full[lang]
        assert abs(n - min_n) <= max(10, int(0.6 * min_n)), (lang, n, min_n)
    a = sorted(tuple(r) for r in df.collect())
    b_ = sorted(tuple(r) for r in get("stratified_rebalance_sample").builder(spark, sf_dir).collect())
    assert a == b_


# --- repetition signals / n-grams / PII (round-7 additions) -----------------


def test_word_ngrams_bigrams_and_short_docs(spark):
    from database_synchronize_tool_spark.functions.text import word_ngrams

    got = one(
        spark,
        word_ngrams(F.col("t"), 2),
        [("a b c",), ("solo",), ("",), ("x  y",)],
        "t string",
    )
    assert got == [["a b", "b c"], [], [], ["x y"]]


def test_adjacent_repeat_count(spark):
    from database_synchronize_tool_spark.functions.text import (
        adjacent_repeat_count,
    )

    got = one(
        spark,
        adjacent_repeat_count(F.col("t")),
        [("a a b b b c",), ("a b a b",), ("x",), ("",)],
        "t string",
    )
    # "a a"=1, "b b"+"b b"=2 -> 3; no adjacent pairs; <2 tokens -> 0
    assert got == [3, 0, 0, 0]


def test_dup_and_top_token_fractions(spark):
    from database_synchronize_tool_spark.functions.text import (
        dup_token_fraction,
        top_token_fraction,
    )

    rows = [("a a a b",), ("a b c d",), ("",)]
    dup = one(spark, dup_token_fraction(F.col("t")), rows, "t string")
    top = one(spark, top_token_fraction(F.col("t")), rows, "t string")
    assert dup == [0.5, 0.0, 0.0]
    assert top == [0.75, 0.25, 0.0]


def test_pii_redact_scrubs_and_counts(spark, sf_dir):
    from database_synchronize_tool_spark.plans.extensions import text_pii_redact

    rows = text_pii_redact(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_emails"] == 1 and r["n_phones"] == 1
        assert "<EMAIL>" in r["redacted"] and "<PHONE>" in r["redacted"]
        assert "@" not in r["redacted"]
        assert "+1-555-" not in r["redacted"]


def test_quality_filter_attributes_first_failing_rule(spark, sf_dir):
    from database_synchronize_tool_spark.plans.extensions import (
        corpus_quality_filter,
    )

    verdicts = {
        r["verdict"]
        for r in corpus_quality_filter(spark, sf_dir).collect()
    }
    # the cascade must actually exercise keep + at least two reject rules
    # on the synthetic corpus (thresholds were probed before pinning)
    assert "keep" in verdicts
    assert len(verdicts - {"keep"}) >= 2


def test_corpus_ngram_topk_doc_frequency_semantics(spark, sf_dir):
    from database_synchronize_tool_spark.plans.extensions import corpus_ngram_topk

    rows = corpus_ngram_topk(spark, sf_dir).collect()
    assert len(rows) == 30
    # document frequency: repeating a bigram inside one doc counts once,
    # so no doc_freq can exceed the corpus size
    from database_synchronize_tool_spark.catalog import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    assert all(0 < r["doc_freq"] <= n_docs for r in rows)
    # ordering: non-increasing frequency, ties broken by ngram ascending
    freqs = [r["doc_freq"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)


def test_repetition_batch_twin_matches_expressions(spark, sf_dir):
    # the Arrow-batch scorer must be bit-identical to the Column forms
    from database_synchronize_tool_spark.catalog import load_table
    from database_synchronize_tool_spark.functions.text import (
        adjacent_repeat_count,
        dup_token_fraction,
        token_count,
        tokens,
        top_token_fraction,
    )
    from database_synchronize_tool_spark.plans.extensions import (
        text_repetition_signals,
    )

    got = sorted(
        tuple(r) for r in text_repetition_signals(spark, sf_dir).collect()
    )
    t = F.col("text")
    want = sorted(
        tuple(r)
        for r in load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            token_count(t).cast("bigint").alias("n_tokens"),
            F.size(F.array_distinct(tokens(t))).cast("bigint").alias("n_distinct"),
            dup_token_fraction(t).alias("dup_frac"),
            adjacent_repeat_count(t).alias("n_adj_repeats"),
            top_token_fraction(t).alias("top_token_frac"),
        )
        .collect()
    )
    assert got == want


def test_repetition_batch_twin_null_text_parity(spark):
    # NULL text: expression forms yield NULL signals (and ELSE-0 adjacent
    # repeats); the batch twin must mirror that instead of crashing
    from database_synchronize_tool_spark.functions.text import (
        adjacent_repeat_count,
        dup_token_fraction,
        repetition_signals_batches,
        token_count,
        tokens,
        top_token_fraction,
    )

    df = spark.createDataFrame(
        [(0, None), (1, "a a b")], "doc_id long, text string"
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


def test_pii_counts_match_oracle_on_overlapping_matches(spark):
    # adversarial edge (round-7 review): an email match that CONSUMES a
    # phone's digits ('+1-555-1234@mail.com'). The oracle counts each
    # pattern independently over the original string, so the Spark side
    # must too — a placeholder-token count for phones would report 1
    # where the oracle reports 2.
    import duckdb
    from database_synchronize_tool_spark.plans.extensions import (
        _EMAIL_RE,
        _PHONE_RE,
    )

    txt = "reach me at +1-555-1234@mail.com thanks"
    d = spark.createDataFrame([(3, txt)], "doc_id long, text string")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com call +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    got = d.select(
        F.regexp_count(aug, F.lit(_EMAIL_RE)).alias("e"),
        F.regexp_count(aug, F.lit(_PHONE_RE)).alias("p"),
    ).first()
    want = duckdb.connect().execute(
        f"""WITH aug AS (SELECT '{txt}'
            || ' contact user3@example.com call +1-555-0003' AS t)
        SELECT len(regexp_extract_all(t, '{_EMAIL_RE}')),
               len(regexp_extract_all(t, '{_PHONE_RE}')) FROM aug"""
    ).fetchone()
    assert (got["e"], got["p"]) == want == (2, 2)


def test_inverted_index_postings_consistent(spark, sf_dir):
    import math

    from database_synchronize_tool_spark.catalog import load_table
    from database_synchronize_tool_spark.plans.extensions import (
        _INV_DF_HI_FRAC,
        _INV_DF_LO_FRAC,
        text_inverted_index,
    )

    n_docs = load_table(spark, sf_dir, "documents").count()
    lo = math.ceil(_INV_DF_LO_FRAC * n_docs)
    hi = math.floor(_INV_DF_HI_FRAC * n_docs)
    out = text_inverted_index(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        ids = r["postings"].split(",")
        # df is exactly the posting-list length, list is sorted+distinct
        assert len(ids) == r["df"]
        assert ids == sorted(set(ids), key=lambda s: int(s))
        assert lo <= r["df"] <= hi
        # a phrase occurs at least once per posting doc
        assert r["tf_total"] >= r["df"]


def test_hybrid_rrf_fuses_leg_ranks_exactly(spark, sf_dir):
    from database_synchronize_tool_spark.catalog import load_table
    from database_synchronize_tool_spark.operators import similarity as SIM
    from database_synchronize_tool_spark.plans.extensions import (
        _RRF_DEPTH,
        _RRF_K,
        _RRF_QVEC,
        _bm25_ranked,
        search_hybrid_rrf,
    )

    out = search_hybrid_rrf(spark, sf_dir).collect()
    assert len(out) == 10
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    lex = {r["doc_id"]: r["rank"] for r in _bm25_ranked(d, _RRF_DEPTH).collect()}
    vec = {
        r["cand_id"]: r["rank"]
        for r in SIM.bruteforce_topk(
            e.filter(e.vec_id == _RRF_QVEC), e, k=_RRF_DEPTH
        ).collect()
    }
    prev = None
    for r in out:
        assert r["r_lex"] == lex.get(r["doc_id"])
        assert r["r_vec"] == vec.get(r["doc_id"])
        expect = (1.0 / (_RRF_K + r["r_lex"]) if r["r_lex"] else 0.0) + (
            1.0 / (_RRF_K + r["r_vec"]) if r["r_vec"] else 0.0
        )
        assert abs(r["rrf"] - expect) < 1e-15
        if prev is not None:
            assert r["rrf"] <= prev + 1e-15  # descending fusion order
        prev = r["rrf"]
    # a doc present in BOTH legs must outrank any single-leg doc whose
    # single rank equals that doc's worse rank (strict dominance)
    both = [r for r in out if r["r_lex"] and r["r_vec"]]
    if both:
        assert out[0]["r_lex"] and out[0]["r_vec"]


def test_bigram_lift_is_monotone_pmi_and_supported(spark, sf_dir):
    from database_synchronize_tool_spark.plans.extensions import (
        _LIFT_MIN_SUPPORT,
        corpus_bigram_lift_topk,
    )

    rows = corpus_bigram_lift_topk(spark, sf_dir).collect()
    assert len(rows) == 25
    prev = None
    for r in rows:
        assert r["c_xy"] >= _LIFT_MIN_SUPPORT
        assert r["lift"] > 0
        if prev is not None:
            assert r["lift"] <= prev + 1e-12  # descending
        prev = r["lift"]


def test_strip_markup_hazards(spark):
    """Extraction edges the fixture can't cover individually: '<' inside
    script payloads, entity double-decode ('&amp;lt;' must yield '&lt;',
    not '<'), header-vs-head pattern ambiguity, missing title, and
    nested whitespace collapse."""
    from database_synchronize_tool_spark.functions.text import (
        markup_link_count,
        markup_title,
        strip_markup,
    )

    rows = spark.createDataFrame(
        [
            (1, "<html><head><title>T</title></head><body>"
                "<script>if (a < b && c > d) { x(); }</script>"
                "<p>keep   this</p></body></html>"),
            (2, "<body><p>literal &amp;lt; stays</p></body>"),
            (3, "<body><header>chrome</header><p>content</p></body>"),
            (4, "<body><p>no title here</p></body>"),
            (5, "<body><a href='/x'>one</a> <A HREF='/y'>two</A></body>"),
        ],
        "id bigint, html string",
    )
    got = {
        r["id"]: (r["clean"], r["title"], r["links"])
        for r in rows.select(
            "id",
            strip_markup(F.col("html")).alias("clean"),
            markup_title(F.col("html")).alias("title"),
            markup_link_count(F.col("html")).alias("links"),
        ).collect()
    }
    assert got[1] == ("keep this", "T", 0)
    assert got[2][0] == "literal &lt; stays"  # &amp; decoded LAST
    assert got[3][0] == "content"  # <header> stripped, content kept
    assert got[4] == ("no title here", "", 0)
    assert got[5] == ("one two", "", 2)  # case-insensitive anchor count


def test_strip_markup_fused_vs_sequential_divergence(spark):
    """r15 advice #2: the Java-side fused backreferenced block drop
    (<(script|style|...)>.*?</\\1>) equals the oracle's seven sequential
    RE2 passes ONLY for non-nested, properly paired blocks — the
    documented input assumption, which synth_html satisfies. This pin
    (a) proves agreement on the fixture class and (b) RECORDS the known
    divergence on interleaved tags, so a fixture/input change that
    introduces interleaving cannot silently break engine/oracle parity."""
    from database_synchronize_tool_spark.functions.text import (
        MARKUP_DROP_BLOCKS,
        MARKUP_ENTITIES,
        WS,
        strip_markup,
        synth_html,
    )

    def sequential(html):
        # the oracle's form: one RE2-compatible pass per tag, in tuple order
        out = html
        for tag in MARKUP_DROP_BLOCKS:
            out = F.regexp_replace(out, f"(?is)<{tag}[^>]*>.*?</{tag}>", " ")
        out = F.regexp_replace(out, r"(?s)<[^>]*>", " ")
        for ent, rep in MARKUP_ENTITIES:
            out = F.replace(out, F.lit(ent), F.lit(rep))
        return F.trim(F.regexp_replace(out, WS + "+", " "))

    paired = spark.range(1, 5).select(
        synth_html(
            F.col("id"),
            F.concat(F.lit("body text "), F.col("id").cast("string")),
        ).alias("html")
    )
    rows = paired.select(
        strip_markup(F.col("html")).alias("a"),
        sequential(F.col("html")).alias("b"),
    ).collect()
    assert all(r["a"] == r["b"] for r in rows)

    # interleaved (improperly nested) tags: the two engines remove
    # DIFFERENT spans — fused drops <nav>...</nav> first ('C D' survives),
    # sequential drops <script>...</script> first ('A D' survives)
    bad = spark.createDataFrame(
        [("<nav>A<script>B</nav>C</script>D",)], "html string"
    )
    r = bad.select(
        strip_markup(F.col("html")).alias("a"),
        sequential(F.col("html")).alias("b"),
    ).collect()[0]
    assert r["a"] == "C D" and r["b"] == "A D"  # divergence, documented


def test_gopher_rules_each_violation_trips_its_own_rule(spark):
    from database_synchronize_tool_spark.functions.text import (
        gopher_quality_flags,
    )

    good = ("the quick brown fox and the lazy dog have gone to be of use "
            "with that other fox ") * 3  # 51 words, all rules pass
    rows = [
        (1, good),
        (2, "the and of to be"),  # too few words
        (3, good.replace("fox", "supercalifragilisticexpialidocious" * 2)),
        (4, good + " " + "# " * 20),  # symbol ratio blown
        (5, good.replace("fox", "123").replace("dog", "456")
            .replace("quick", "789").replace("brown", "000")
            .replace("lazy", "111").replace("other", "222")
            .replace("gone", "333").replace("use", "444")),
        (6, "alpha beta gamma delta epsilon " * 12),  # no stopwords
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    flags = gopher_quality_flags(F.col("text"))
    got = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id", *[v.alias(k) for k, v in flags.items()]
        ).collect()
    }
    assert all(
        got[1][k] for k in got[1].asDict() if k.startswith("r_")
    ), got[1]
    assert not got[2]["r_word_count"]
    assert not got[3]["r_mean_word_len"] and got[3]["r_word_count"]
    assert not got[4]["r_symbol_ratio"] and got[4]["r_stopwords"]
    assert not got[6]["r_stopwords"] and got[6]["r_alpha_words"]
