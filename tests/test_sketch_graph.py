"""Unit tests for the round-9 sketch / graph / linkage operators on
crafted inputs where the exact answer is known by hand."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_synchronize_tool_spark.operators.graph import (
    pagerank_scaled,
    triangle_counts,
    undirected_edges,
)
from database_synchronize_tool_spark.operators.membership import (
    bloom_build,
    bloom_probe,
    cms_build,
    cms_point_estimate,
    hll_estimate,
    hll_registers,
)


def test_cms_estimate_upper_bounds_exact_counts(spark):
    # 100 occurrences of 'a', 10 of 'b', 1 of 'c'
    rows = [("a",)] * 100 + [("b",)] * 10 + [("c",)]
    items = spark.createDataFrame(rows, "k string")
    sketch = cms_build(items, "k", depth=4, width=64)
    probes = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
    est = {
        r["k"]: r["cms_est"]
        for r in cms_point_estimate(sketch, probes, "k", 4, 64).collect()
    }
    assert est["a"] >= 100 and est["b"] >= 10 and est["c"] >= 1
    # a tiny key space in a 4x64 sketch should not collide at all
    assert est == {"a": 100, "b": 10, "c": 1}


def test_cms_sketch_is_bounded(spark):
    items = spark.createDataFrame(
        [(f"key{i}",) for i in range(5000)], "k string"
    )
    sketch = cms_build(items, "k", depth=4, width=32)
    assert sketch.count() <= 4 * 32


def test_cms_unseen_probe_estimates_zero_and_survives(spark):
    # a probe whose buckets are all empty must come back with est 0, not
    # vanish from the output (r9 advice: the inner join dropped it)
    items = spark.createDataFrame([("a",)] * 5, "k string")
    sketch = cms_build(items, "k", depth=4, width=64)
    probes = spark.createDataFrame([("a",), ("never-seen",)], "k string")
    est = {
        r["k"]: r["cms_est"]
        for r in cms_point_estimate(sketch, probes, "k", 4, 64).collect()
    }
    assert est == {"a": 5, "never-seen": 0}


def test_bloom_duplicate_probe_rows_each_get_a_verdict(spark):
    # duplicate probe rows must NOT collapse into one group whose hit-sum
    # exceeds k (r9 advice: that minted a false negative for duplicates)
    members = spark.createDataFrame([("m",)], "key string")
    bloom = bloom_build(members, "key")
    probes = spark.createDataFrame(
        [("m",), ("m",), ("absent",)], "key string"
    )
    rows = bloom_probe(bloom, probes, "key").collect()
    assert len(rows) == 3, "duplicates must survive with their own verdict"
    verdicts = sorted((r["key"], r["bloom_hit"]) for r in rows)
    assert verdicts[:2] == [("absent", False), ("m", True)]
    assert verdicts[2] == ("m", True), "a duplicated member row flagged false"


def test_bloom_no_false_negatives(spark):
    members = spark.createDataFrame(
        [(f"member-{i}",) for i in range(200)], "key string"
    )
    others = spark.createDataFrame(
        [(f"other-{i}",) for i in range(200)], "key string"
    )
    bloom = bloom_build(members, "key")
    flagged = {
        r["key"]: r["bloom_hit"]
        for r in bloom_probe(bloom, members, "key").collect()
    }
    assert all(flagged.values()), "Bloom filters must never miss a member"
    fp = sum(
        1
        for r in bloom_probe(bloom, others, "key").collect()
        if r["bloom_hit"]
    )
    # 200 keys in 4096 bits / 3 hashes -> expected FP rate ~0.3%
    assert fp <= 10


def test_hll_estimate_within_expected_error(spark):
    items = spark.createDataFrame(
        [(f"v{i}", "g") for i in range(20000)], "k string, g string"
    )
    regs = hll_registers(items, "k", ["g"])
    assert regs.count() <= 256
    est = hll_estimate(regs, ["g"]).collect()[0]["hll_est"]
    # 256 registers -> relative std error ~1.04/sqrt(256) = 6.5%; 3 sigma
    assert abs(est - 20000) / 20000 < 0.20


def test_triangle_counts_on_known_graph(spark):
    # K4 on {1,2,3,4} plus pendant 5: C(4,3)=4 triangles, each K4 vertex
    # in exactly 3, vertex 5 in none.
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        "a bigint, b bigint",
    )
    got = {
        r["node"]: r["n_tri"]
        for r in triangle_counts(undirected_edges(pairs)).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_undirected_edges_dedups_and_drops_self_loops(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (3, 3)], "a bigint, b bigint"
    )
    e = undirected_edges(pairs).collect()
    assert len(e) == 2  # one undirected edge, both directions
    assert {(r["src"], r["dst"]) for r in e} == {(1, 2), (2, 1)}


def test_pagerank_symmetry_and_mass(spark):
    # On a 4-cycle every vertex is symmetric: ranks must all be equal and
    # total mass must stay within the floor-leak bound of SCALE.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "a bigint, b bigint"
    )
    ranks = pagerank_scaled(undirected_edges(pairs), iterations=3).collect()
    vals = {r["rank_scaled"] for r in ranks}
    assert len(vals) == 1, f"symmetric graph must give equal ranks: {ranks}"
    total = sum(r["rank_scaled"] for r in ranks)
    # every division is exact on this graph, so the floor leak is zero
    assert 0 <= 10**12 - total < 4 * 3 * 10


def test_pagerank_star_center_dominates(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5)], "a bigint, b bigint"
    )
    ranks = {
        r["node"]: r["rank_scaled"]
        for r in pagerank_scaled(undirected_edges(pairs), 3).collect()
    }
    assert ranks[1] > max(ranks[k] for k in (2, 3, 4, 5))
    assert len({ranks[k] for k in (2, 3, 4, 5)}) == 1  # leaves symmetric


def test_minhash_incremental_join_matches_self_join_restriction(spark, sf_dir):
    """The bipartite LSH join must find exactly the cross-side pairs the
    self-join finds (restricted to new-vs-old), with identical Jaccard."""
    from database_synchronize_tool_spark.catalog import load_table
    from database_synchronize_tool_spark.operators.dedup import (
        minhash_lsh_join,
        minhash_lsh_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") % 10 == 7)
    old = d.filter(F.col("doc_id") % 10 != 7)
    got = {
        (r["doc_new"], r["doc_old"]): round(r["jacc"], 9)
        for r in minhash_lsh_join(new, old, threshold=0.8).collect()
    }
    want = {}
    for r in minhash_lsh_pairs(d, threshold=0.8).collect():
        a, b = r["doc_a"], r["doc_b"]
        if (a % 10 == 7) != (b % 10 == 7):
            n, o = (a, b) if a % 10 == 7 else (b, a)
            want[(n, o)] = round(r["jacc"], 9)
    assert got == want


def test_streaming_mg_survives_eviction_pressure(spark, tmp_path):
    """With capacity FAR below the distinct-key count, the dominant key
    must still survive the batched Misra-Gries evictions across real
    micro-batches (the recall guarantee under state pressure)."""
    import pandas as pd

    from database_synchronize_tool_spark.streaming.stateful import (
        heavy_hitter_candidates_stateful,
    )

    src = tmp_path / "stream_src"
    src.mkdir()
    # 3 files -> 3 micro-batches; key 999 owns ~40% of every batch,
    # 60 noise keys split the rest
    for b in range(3):
        rows = [{"event_type": "t", "user_id": 999}] * 40 + [
            {"event_type": "t", "user_id": 100 + ((b * 17 + i) % 60)}
            for i in range(60)
        ]
        pd.DataFrame(rows).to_parquet(src / f"b{b}.parquet")
    stream = (
        spark.readStream.schema("event_type string, user_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = heavy_hitter_candidates_stateful(stream, capacity=4)
    q = (
        out.writeStream.format("memory")
        .queryName("mg_evict_tbl")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.table("mg_evict_tbl").toPandas()
    final = emitted.sort_values("n_total").iloc[-1]
    assert final["n_total"] == 300
    assert 999 in list(final["cands"])
    assert len(final["cands"]) <= 4


def test_graph_and_sketch_ops_tolerate_degenerate_inputs(spark):
    """Empty graphs and NULL keys must yield empty/NULL-safe results, not
    crashes — the guard a 100 TB run with an empty partition or dirty
    column hits eventually."""
    from database_synchronize_tool_spark.operators.membership import (
        bloom_build,
        bloom_probe,
        cms_build,
    )

    empty_pairs = spark.createDataFrame([], "a bigint, b bigint")
    assert triangle_counts(undirected_edges(empty_pairs)).count() == 0
    assert pagerank_scaled(undirected_edges(empty_pairs), 3).count() == 0

    nulls = spark.createDataFrame(
        [("x",), (None,), ("y",), (None,)], "key string"
    )
    bloom = bloom_build(nulls, "key")  # NULL hashes to NULL -> dropped bits
    probed = {
        r["key"]: r["bloom_hit"]
        for r in bloom_probe(bloom, nulls, "key").collect()
        if r["key"] is not None
    }
    assert probed == {"x": True, "y": True}
    assert cms_build(nulls, "key", depth=2, width=8).count() <= 2 * 8


def test_hll_intersection_inclusion_exclusion(spark, sf_dir):
    from database_synchronize_tool_spark.plans import sketch_graph as SG

    row = SG.sketch_hll_intersection(spark, sf_dir).collect()[0]
    assert row["est_a"] > 0 and row["est_b"] > 0
    # union can't exceed the sum of the parts (register-wise max <= both)
    assert row["est_union"] <= row["est_a"] + row["est_b"] + 1e-9
    # identity holds exactly: est_intersection = est_a + est_b - est_union
    assert abs(
        row["est_intersection"] - (row["est_a"] + row["est_b"] - row["est_union"])
    ) < 1e-9
    # 256 registers -> ~6.5% typical error per sketch; inclusion-exclusion
    # compounds three of them, so grant a generous-but-meaningful band
    exact = row["exact_intersection"]
    assert exact > 0
    assert abs(row["est_intersection"] - exact) <= 0.5 * exact + 50


def test_cms_duplicate_probe_rows_each_survive(spark):
    # the bloom_probe duplicate fix applied to CMS too (r10 review):
    # duplicate probe rows must not collapse into one output row
    items = spark.createDataFrame([("a",)] * 7, "k string")
    sketch = cms_build(items, "k", depth=3, width=32)
    probes = spark.createDataFrame([("a",), ("a",), ("zz",)], "k string")
    rows = sorted(
        (r["k"], r["cms_est"])
        for r in cms_point_estimate(sketch, probes, "k", 3, 32).collect()
    )
    assert rows == [("a", 7), ("a", 7), ("zz", 0)]


def test_fuzzy_link_banded_recall_on_short_and_varying_keys(spark):
    # The documents testdata only ever produces 40-char keys; this pins the
    # PassJoin pigeonhole on the regimes it never exercises — short keys
    # (down to k+1 chars), DIFFERENT-length pairs (real insert/delete
    # alignments, where the +-k segment shift window earns its keep), and
    # multi-block corpora. Ground truth is a brute-force Wagner-Fischer DP
    # over every same-(lang, lb) pair.
    from pyspark.sql import functions as F

    from database_synchronize_tool_spark.plans.sketch_graph import (
        fuzzy_link_banded_pairs,
    )

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    base = [
        "abcd", "abce", "bcda",          # 4-char keys (minimum length)
        "hello world", "hello wrld",     # deletion pair
        "xhello world", "hello worlds",  # insertion variants
        "the quick brown fox jumps",     # 25 chars
        "the quick brown fox jump",      # deletion
        "athe quick brown fox jumps",    # head insertion (shifts everything)
        "zzzzzzzzzzzzzzzzzzzzzzzzz",     # unrelated same-length
        "a" * 33, "a" * 33 + "bcd",      # straddles the lb=1 boundary
    ]
    rows_c = [(i, "en" if i % 2 else "fr", t, len(t) // 32)
              for i, t in enumerate(base)]
    rows_d = [(1000 + i, "en" if i % 2 else "fr", t, len(t) // 32)
              for i, t in enumerate(base[::-1])]
    schema = "rec_id long, lang string, key string, lb long"
    clean = spark.createDataFrame(rows_c, schema)
    dirty = spark.createDataFrame(rows_d, schema)

    k = 3
    got = sorted(
        (r["doc_clean"], r["doc_noisy"], r["lev_dist"])
        for r in fuzzy_link_banded_pairs(clean, dirty, k).collect()
    )
    want = sorted(
        (ci, di, lev(ck, dk))
        for (ci, cl, ck, cb) in rows_c
        for (di, dl, dk, db) in rows_d
        if cl == dl and cb == db and lev(ck, dk) <= k
    )
    assert got == want and want  # non-degenerate ground truth
