"""Unit tests for the near-duplicate operator family on crafted corpora:
MinHash-LSH must surface an exact duplicate pair and must not pair disjoint
documents; hamming/simhash basics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from database_synchronize_tool_spark.operators.dedup import (
    minhash_lsh_pairs,
)


def test_minhash_finds_exact_dup_not_disjoint(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
            (3, "completely unrelated words zebra quartz vortex nymph glyph"),
        ],
        "doc_id bigint, text string",
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_minhash_near_dup_above_threshold(spark):
    base = "spark engines shuffle partitions across the cluster nodes quickly"
    docs = spark.createDataFrame(
        [(1, base), (2, base + " now"), (3, "different text entirely here")],
        "doc_id bigint, text string",
    )
    got = {(r["doc_a"], r["doc_b"]): r["jacc"] for r in minhash_lsh_pairs(docs).collect()}
    assert (1, 2) in got and got[(1, 2)] >= 0.8


def _sim_corpus(spark):
    # small corpus with exact dups, near-dups, and unrelated docs
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "the quick brown fox jumps over the lazy dog again and once"),
        (4, "completely unrelated words zebra quartz vortex nymph glyph"),
        (5, "spark engines shuffle partitions across the cluster nodes"),
        (6, "spark engines shuffle partitions across the cluster roads"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_simhash_banded_equals_exhaustive(spark):
    """Pigeonhole guarantee: banding on max_hamming+1 chunks finds EXACTLY
    the pairs the brute-force O(n^2) self-join finds."""
    from pyspark.sql import functions as F

    from database_synchronize_tool_spark.operators.dedup import (
        shingle_hashes,
        simhash,
        simhash_banded_pairs,
    )

    docs = _sim_corpus(spark)
    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_banded_pairs(docs, max_hamming=3).collect()
    }
    sigs = docs.select(
        "doc_id", simhash(shingle_hashes(F.col("text"))).alias("sig")
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    brute = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert banded == brute
    assert (1, 2, 0) in banded  # exact dup pair survives


def test_unblocked_simhash_routes_to_banding_no_cartesian(spark):
    from database_synchronize_tool_spark.operators.dedup import simhash_pairs

    plan = simhash_pairs(_sim_corpus(spark), block_col=None)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_unblocked_cosine_routes_to_lsh_no_cartesian(spark):
    import numpy as np

    from database_synchronize_tool_spark.operators.similarity import (
        cosine_neardup_pairs,
    )

    rng = np.random.default_rng(7)
    base = rng.normal(size=8)
    rows = [
        (1, [float(x) for x in base]),
        (2, [float(x) for x in base * 1.001]),  # near-dup: same bucket
        (3, [float(x) for x in -base]),         # antipodal: opposite bucket
    ]
    e = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    df = cosine_neardup_pairs(e, threshold=0.9, block_col=None)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    pairs = {(r["vec_a"], r["vec_b"]) for r in df.collect()}
    assert (1, 2) in pairs and all(3 not in p for p in pairs)


def test_minhash_hot_bucket_cap_star_links_flood(spark):
    """A boilerplate flood (one template repeated 40x) must not quadratic-blow
    a band bucket: with max_bucket set, oversized buckets emit O(m) star
    candidates (anchor->member), and connected components still recover the
    whole duplicate cluster."""
    from database_synchronize_tool_spark.operators.dedup import (
        dedup_clusters,
        minhash_lsh_pairs,
    )

    template = "click here to unsubscribe from this newsletter mailing list"
    rows = [(i, template) for i in range(1, 41)]
    rows += [(100, "a genuinely unique document about spark partitioning")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    capped = minhash_lsh_pairs(docs, max_bucket=10)
    got = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    # star shape: every flood member links to anchor 1, pair count is linear
    assert got == {(1, i) for i in range(2, 41)}

    uncapped_pairs = 40 * 39 // 2
    assert len(got) == 39 < uncapped_pairs

    # transitive closure recovers the full cluster off the star pairs
    clusters = dedup_clusters(capped.select("doc_a", "doc_b"))
    labels = {r["doc_id"]: r["cluster_id"] for r in clusters.collect()}
    assert len({labels[i] for i in range(1, 41)}) == 1


def test_simhash64_banded_equals_exhaustive_and_differs_from_32(spark):
    """The 64-bit signature keeps the pigeonhole guarantee (banded ==
    brute force) and genuinely uses the second whitening map: upper-group
    bits are populated, so signatures aren't just the 32-bit ones."""
    from pyspark.sql import functions as F

    from database_synchronize_tool_spark.operators.dedup import (
        shingle_hashes,
        simhash,
        simhash_banded_pairs,
    )

    docs = _sim_corpus(spark)
    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_banded_pairs(docs, max_hamming=3, bits=64).collect()
    }
    sigs = docs.select(
        "doc_id", simhash(shingle_hashes(F.col("text")), bits=64).alias("sig")
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    brute = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert banded == brute
    # upper 32 bits carry signal (second affine map really contributes)
    upper = [r["sig"] >> 32 for r in sigs.collect()]
    assert any(u != 0 for u in upper)
    # 64-bit hamming separates docs the 32-bit one may conflate: widths
    # differ, so the signature sets must not be identical modulo 2^32
    sigs32 = {
        r["doc_id"]: r["sig"]
        for r in docs.select(
            "doc_id", simhash(shingle_hashes(F.col("text")), bits=32).alias("sig")
        ).collect()
    }
    sigs64 = {r["doc_id"]: r["sig"] for r in sigs.collect()}
    assert all(sigs64[d] & 0xFFFFFFFF == sigs32[d] for d in sigs32)


def test_containment_directional(spark):
    """A short doc pasted into a long one: high containment inner->outer,
    low outer->inner, and symmetric Jaccard misses the pair entirely."""
    from database_synchronize_tool_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    inner = "the quick brown fox jumps over the lazy dog"
    outer = inner + " " + ("x y z w v u t s r q p o n m l k j i h g " * 20)
    docs = spark.createDataFrame(
        [(1, inner, "en"), (2, outer, "en"), (3, "completely different text", "en")],
        "doc_id bigint, text string, lang string",
    )
    got = {
        (r["doc_inner"], r["doc_outer"]): r["cont"]
        for r in containment_pairs(docs, threshold=0.9).collect()
    }
    assert (1, 2) in got and got[(1, 2)] >= 0.9
    assert (2, 1) not in got  # directional: the container is not contained
    assert (3, 2) not in got
    # symmetric Jaccard on the same pair is diluted far below any useful cutoff
    jacc = {
        (r["doc_a"], r["doc_b"]): r["jacc"]
        for r in ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    assert jacc[(1, 2)] < 0.5


def _brute_containment(spark, docs, threshold, features_udf=None):
    """All-pairs directional containment (test oracle only — O(n²))."""
    from database_synchronize_tool_spark.functions.text import containment
    from database_synchronize_tool_spark.operators.dedup import minhash_features

    feats = features_udf if features_udf is not None else minhash_features
    sh = docs.select(
        "doc_id", feats(F.col("text"))["sh"].alias("sh")
    )
    a, b = sh.alias("a"), sh.alias("b")
    return {
        (r["i"], r["o"]): r["c"]
        for r in a.join(b, F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("i"),
            F.col("b.doc_id").alias("o"),
            containment(F.col("a.sh"), F.col("b.sh")).alias("c"),
        )
        .filter(F.col("c") >= threshold)
        .collect()
    }


def test_containment_banded_sound_and_prefix_exact(spark, sf_dir):
    """Banded containment is SOUND (output ⊆ the brute-force measure, values
    identical) but its recall follows the band-fire probability in JACCARD —
    on this template-heavy corpus that's only a few percent of containment
    pairs (the documented caveat, measured here). The prefix-filter variant
    must reproduce the brute-force measure EXACTLY (recall 1.0 is a theorem,
    not a tuning outcome)."""
    from database_synchronize_tool_spark.catalog import load_table
    from database_synchronize_tool_spark.operators.dedup import (
        containment_banded_pairs,
        containment_prefix_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    truth = _brute_containment(spark, docs, 0.9)
    assert truth, "corpus has no containment pairs — test is vacuous"

    banded = {
        (r["doc_inner"], r["doc_outer"]): r["cont"]
        for r in containment_banded_pairs(docs, threshold=0.9).collect()
    }
    for pair, cont in banded.items():  # soundness
        assert pair in truth and abs(truth[pair] - cont) < 1e-12, pair
    # exact duplicates (Jaccard 1.0) share every band — always recalled
    exact_dups = {p for p, c in truth.items() if truth.get((p[1], p[0])) == 1.0 and c == 1.0}
    assert exact_dups <= set(banded), exact_dups - set(banded)

    prefix = {
        (r["doc_inner"], r["doc_outer"]): r["cont"]
        for r in containment_prefix_pairs(docs).collect()
    }
    assert set(prefix) == set(truth), (
        len(prefix), len(truth), list(set(truth) - set(prefix))[:5]
    )
    for pair, cont in prefix.items():
        assert abs(truth[pair] - cont) < 1e-12, pair


def test_containment_prefix_words_exact_vs_brute(spark, sf_dir):
    """The word-shingle production declaration (r12 verdict #2) reproduces
    the brute-force directional containment measure over 5-word shingle
    sets EXACTLY — recall 1.0 is the same prefix-filter theorem, on a
    universe where the rarest-prefix posting lists are O(1)."""
    from database_synchronize_tool_spark.catalog import load_table
    from database_synchronize_tool_spark.operators.dedup import (
        containment_prefix_pairs,
        word_shingle_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    truth = _brute_containment(
        spark, docs, 0.9, features_udf=word_shingle_features
    )
    assert truth, "corpus has no word-shingle containment pairs — vacuous"
    got = {
        (r["doc_inner"], r["doc_outer"]): r["cont"]
        for r in containment_prefix_pairs(
            docs, features_udf=word_shingle_features
        ).collect()
    }
    assert set(got) == set(truth), (
        len(got), len(truth), list(set(truth) ^ set(got))[:5]
    )
    for pair, cont in got.items():
        assert abs(truth[pair] - cont) < 1e-12, pair


def test_word_shingle_features_hashing_and_edges(spark):
    """Portable word-5-gram hashing: hand-computed Horner values, case/
    separator normalization, and the short-doc empty-set edge."""
    from database_synchronize_tool_spark.operators.dedup import (
        MINHASH_PRIME,
        WORD_COMBINE_BASE,
        WORD_SHINGLE_W,
        word_shingle_features,
    )

    def word_hash(w):
        h = 0
        for c in w:
            h = (h * 31 + ord(c)) % MINHASH_PRIME
        return h

    def shingle_hash(words):
        g = word_hash(words[0])
        for w in words[1:]:
            g = (g * WORD_COMBINE_BASE + word_hash(w)) % MINHASH_PRIME
        return g

    text = "The quick-BROWN fox  jumps, over the lazy dog"
    words = ["the", "quick", "brown", "fox", "jumps", "over", "the", "lazy", "dog"]
    expect = sorted(
        {
            shingle_hash(words[i : i + WORD_SHINGLE_W])
            for i in range(len(words) - WORD_SHINGLE_W + 1)
        }
    )
    rows = (
        spark.createDataFrame(
            [(1, text), (2, "only four words here"), (3, None)],
            "doc_id bigint, text string",
        )
        .select("doc_id", word_shingle_features(F.col("text"))["sh"].alias("sh"))
        .collect()
    )
    got = {r["doc_id"]: sorted(r["sh"]) for r in rows}
    assert got[1] == expect
    assert got[2] == []  # < 5 words -> empty shingle set
    assert got[3] == []  # NULL text -> empty shingle set


def test_containment_banded_finds_swallowed_doc_sharing_signature(spark):
    """An exact duplicate (containment 1.0 both ways) always shares every
    band, so the banded path must find it without any blocking column."""
    from database_synchronize_tool_spark.operators.dedup import (
        containment_banded_pairs,
    )

    text = "the quick brown fox jumps over the lazy dog and keeps running"
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, "completely unrelated content here")],
        "doc_id bigint, text string",
    )
    got = {
        (r["doc_inner"], r["doc_outer"]): r["cont"]
        for r in containment_banded_pairs(docs, threshold=0.9).collect()
    }
    assert got[(1, 2)] == 1.0 and got[(2, 1)] == 1.0
    assert not any(3 in p for p in got)


def test_containment_banded_hot_bucket_cap(spark):
    """A template cluster (one text repeated 12x) lands every member in the
    SAME (band, key) bucket for every band — the m^2 blow-up banding exists
    to avoid. With max_bucket the bucket is star-linked: every member still
    pairs with the min-id anchor in both directions (what boilerplate
    removal acts on), member-member pairs are the documented recall trade,
    and the plan stays a pure equi-join."""
    from database_synchronize_tool_spark.operators.dedup import (
        containment_banded_pairs,
    )

    text = "the same boilerplate template text repeated across the corpus"
    rows = [(i, text) for i in range(1, 13)] + [(99, "totally different words")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    full = {
        (r["doc_inner"], r["doc_outer"])
        for r in containment_banded_pairs(docs, threshold=0.9).collect()
    }
    capped_df = containment_banded_pairs(docs, threshold=0.9, max_bucket=5)
    capped = {(r["doc_inner"], r["doc_outer"]) for r in capped_df.collect()}
    assert capped <= full
    for i in range(2, 13):  # anchor-star keeps every member<->anchor fact
        assert (1, i) in capped and (i, 1) in capped
    assert (2, 3) in full and (2, 3) not in capped  # the m^2 part is gone
    assert all(1 in p for p in capped)  # only anchor pairs survive the cap
    plan = capped_df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "CartesianProduct" not in plan


def test_containment_prefix_length_filter(spark):
    """The sound outer-length bound |sh(outer)| >= ceil(t*|sh(inner)|):
    a long doc whose prefix shares a shingle with a tiny doc no longer
    emits the (long_inner, tiny_outer) candidate — the tiny doc cannot
    possibly contain it — while the final output is EXACTLY the
    brute-force measure either way (the bound is implied by containment
    >= t, so recall stays 1.0)."""
    from database_synchronize_tool_spark.operators.dedup import (
        _containment_prefix_candidates,
        containment_prefix_pairs,
    )

    filler = "abcdefghijklmnopqrstuvwxyz0123456789ABCD"
    rows = [(1, filler + "XYZQW"), (2, filler), (3, filler), (4, "XYZQW")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    _, cand_p = _containment_prefix_candidates(docs, "text", "doc_id", 3, 4)
    _, cand_l = _containment_prefix_candidates(
        docs, "text", "doc_id", 3, 4, positional_filter=False
    )
    _, cand_u = _containment_prefix_candidates(
        docs, "text", "doc_id", 3, 4,
        length_filter=False, positional_filter=False,
    )
    p = {(r["doc_inner"], r["doc_outer"]) for r in cand_p.collect()}
    f = {(r["doc_inner"], r["doc_outer"]) for r in cand_l.collect()}
    u = {(r["doc_inner"], r["doc_outer"]) for r in cand_u.collect()}
    assert p <= f < u, (len(p), len(f), len(u))  # positional subsumes length
    assert (1, 4) in u and (1, 4) not in f  # long-in-tiny fan-out removed
    got = {
        (r["doc_inner"], r["doc_outer"]): r["cont"]
        for r in containment_prefix_pairs(
            docs, threshold_num=3, threshold_den=4
        ).collect()
    }
    truth = _brute_containment(spark, docs, 3 / 4)
    assert set(got) == set(truth)
    for pair, cont in got.items():
        assert abs(truth[pair] - cont) < 1e-12, pair


def test_substring_spans_are_exact_and_cross_document(spark, sf_dir):
    from database_synchronize_tool_spark.plans.extensions import (
        dedup_substring_spans,
    )

    rows = dedup_substring_spans(spark, sf_dir).collect()
    assert rows
    # every surfaced span is a full-length window shared by >= 2 docs,
    # ordered by document frequency (ties on the span itself)
    assert all(len(r["span"]) == 24 and r["n_docs"] >= 2 for r in rows)
    freqs = [r["n_docs"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    # exactness: the top span really occurs verbatim in that many documents
    from database_synchronize_tool_spark.catalog import load_table
    from pyspark.sql import functions as F

    top = rows[0]
    n = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").contains(top["span"]))
        .count()
    )
    assert n == top["n_docs"]


def test_simhash_udf_bit_identical_to_column_form(spark, sf_dir):
    """The Arrow-vectorized simhash (the pair-function fast path) must be
    bit-identical to the Column expression form on real corpus text for
    both widths — the DuckDB oracle derives from the Column loop."""
    from database_synchronize_tool_spark.catalog import load_table
    from database_synchronize_tool_spark.operators.dedup import (
        _simhash_udf,
        shingle_hashes,
        simhash,
    )

    docs = load_table(spark, sf_dir, "documents").limit(200)
    for bits in (32, 64):
        both = docs.select(
            simhash(shingle_hashes(F.col("text")), bits=bits).alias("col_sig"),
            _simhash_udf(bits)(F.col("text")).alias("udf_sig"),
        )
        bad = both.filter(F.col("col_sig") != F.col("udf_sig")).count()
        assert bad == 0, f"{bad} mismatches at bits={bits}"


def test_minhash_bbit_estimate_consistency(spark, sf_dir):
    """The 1-bit sketch surface must agree with the full-width one on the
    pair set and exact Jaccard, and obey the b-bit algebra: full-value
    agreement implies parity agreement (bbit >= sig matches), and the
    estimator is exactly 2A - 1 in power-of-two float arithmetic."""
    from database_synchronize_tool_spark.catalog import load_table
    from database_synchronize_tool_spark.operators.dedup import (
        MINHASH_K,
        minhash_lsh_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    rows = minhash_lsh_pairs(d, threshold=0.5, with_bbit=True).collect()
    assert rows
    base = {
        (r["doc_a"], r["doc_b"]): r["jacc"]
        for r in minhash_lsh_pairs(d, threshold=0.5).collect()
    }
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == set(base)
    for r in rows:
        assert r["jacc"] == base[(r["doc_a"], r["doc_b"])]
        # low bits can only ADD agreements on top of full-value ties
        assert r["sig_matches"] <= r["bbit_matches"] <= MINHASH_K
        assert r["est_jacc_1bit"] == 2.0 * (r["bbit_matches"] / MINHASH_K) - 1.0
        assert r["err_1bit"] == r["est_jacc_1bit"] - r["jacc"]
        assert r["err_full"] == r["est_jacc"] - r["jacc"]


def test_minhash_bbit_star_linking_unsupported(spark, sf_dir):
    from database_synchronize_tool_spark.catalog import load_table
    from database_synchronize_tool_spark.operators.dedup import minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="star"):
        minhash_lsh_pairs(d, threshold=0.5, with_bbit=True, max_bucket=8)


def test_minhash_estimate_error_consistency(spark, sf_dir):
    from database_synchronize_tool_spark.catalog import load_table
    from database_synchronize_tool_spark.operators.dedup import (
        MINHASH_K,
        minhash_lsh_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    rows = minhash_lsh_pairs(d, threshold=0.5, with_estimate=True).collect()
    assert rows
    base = {
        (r["doc_a"], r["doc_b"]): r["jacc"]
        for r in minhash_lsh_pairs(d, threshold=0.5).collect()
    }
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == set(base)
    for r in rows:
        assert r["jacc"] == base[(r["doc_a"], r["doc_b"])]
        assert abs(r["est_jacc"] - r["sig_matches"] / MINHASH_K) < 1e-15
        assert abs(r["est_err"] - (r["est_jacc"] - r["jacc"])) < 1e-15
        assert 0 <= r["sig_matches"] <= MINHASH_K
        # prefilter floor: every surviving pair agreed on >= 12 of 16
        assert r["est_jacc"] >= 0.75 - 1e-15
