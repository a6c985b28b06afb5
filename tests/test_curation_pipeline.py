"""End-to-end corpus-curation pipeline invariants over
:mod:`database_synchronize_tool_spark.pipeline` — the module
``tools/curate.py`` runs. Each stage is the SAME operator the declared
queries grade individually; these tests pin the cross-stage invariants a
pipeline relies on (monotone shrinkage, no screened contamination among
survivors, determinism across reruns, and the partitioned write
round-trip) rather than any one stage's values — those are oracle-checked
elsewhere.
"""

from __future__ import annotations

import os

import pytest

from database_synchronize_tool_spark.pipeline import curate_corpus


@pytest.fixture(scope="module")
def curated(spark, sf_dir):
    return curate_corpus(spark, sf_dir)


def test_pipeline_stages_shrink_monotonically(curated):
    n = list(curated.counts().values())
    assert n == sorted(n, reverse=True), n
    assert n[-1] > 0  # the pipeline keeps a real corpus, not nothing
    assert n[1] < n[0]  # the quality cascade actually rejects documents


def test_no_contamination_survives(curated):
    bad = {r["doc_id"] for r in curated.contaminated.collect()}
    surviving = {r["doc_id"] for r in curated.sampled.select("doc_id").collect()}
    assert bad  # the screen finds the synthetic held-out mirrors
    assert not (bad & surviving)


def test_pipeline_is_deterministic(spark, sf_dir, curated):
    again = curate_corpus(spark, sf_dir)
    a = sorted(r["doc_id"] for r in curated.sampled.collect())
    b = sorted(r["doc_id"] for r in again.sampled.collect())
    assert a == b


def test_pipeline_writes_partitioned_output(spark, curated, tmp_path):
    from database_synchronize_tool_spark.sources.sinks import (
        write_curated_corpus,
    )

    out = str(tmp_path / "curated")
    write_curated_corpus(
        curated.sampled, out, partition_by=("lang",), sort_within=("doc_id",)
    )
    langs = {
        r["lang"] for r in curated.sampled.select("lang").distinct().collect()
    }
    dirs = {d.split("=")[1] for d in os.listdir(out) if d.startswith("lang=")}
    assert dirs == langs
    assert spark.read.parquet(out).count() == curated.sampled.count()


def test_source_cap_stage_bounds_and_preserves_determinism(spark, sf_dir):
    from database_synchronize_tool_spark.pipeline import curate_corpus

    capped = curate_corpus(spark, sf_dir, source_cap=5)
    per_source = (
        capped.sampled.groupBy("source").count().collect()
    )
    assert all(r["count"] <= 5 for r in per_source)
    # the capped clean pool is a subset of the uncapped clean pool (the
    # guaranteed relation — sem_clean is NOT monotone under capping, since
    # removing a near-dup's partner can let the survivor flip)
    uncapped = curate_corpus(spark, sf_dir)
    a = {r.doc_id for r in capped.clean.select("doc_id").collect()}
    b = {r.doc_id for r in uncapped.clean.select("doc_id").collect()}
    assert a <= b and len(a) <= len(b)


def test_pipeline_accepts_jsonl_corpus_without_embeddings(spark, tmp_path):
    import json

    from database_synchronize_tool_spark.pipeline import curate_corpus
    from database_synchronize_tool_spark.sources.readers import read_jsonl

    lines = []
    for i in range(40):
        lines.append(
            json.dumps(
                {
                    "doc_id": i,
                    "text": f"alpha beta gamma delta epsilon zeta eta theta "
                    f"iota kappa lambda mu document number {i} with enough "
                    f"distinct tokens to pass the quality cascade easily",
                    "lang": "en" if i % 2 == 0 else "fr",
                    "source": f"host{i % 4}",
                }
            )
        )
    # exact duplicate pair (41 duplicates 0's text) + one garbage line
    lines.append(lines[0].replace('"doc_id": 0', '"doc_id": 41'))
    lines.append("not json")
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(lines) + "\n")

    good, bad = read_jsonl(
        spark, str(p), "doc_id BIGINT, text STRING, lang STRING, source STRING"
    )
    assert bad.count() == 1
    result = curate_corpus(spark, docs=good)
    counts = result.counts()
    assert counts["corpus"] == 41
    # the duplicate of doc 0 is removed by exact dedup (min doc_id wins)
    dd_ids = {r.doc_id for r in result.deduped.select("doc_id").collect()}
    assert 0 in dd_ids and 41 not in dd_ids
    # no embeddings => semantic stage is a no-op
    assert counts["semantic_deduped"] == counts["decontaminated"]
    assert counts["sampled"] <= counts["semantic_deduped"]


def test_pipeline_accepts_raw_html_corpus(spark, sf_dir):
    """raw_html=True strips markup before any text stage runs (r12 verdict
    #4): wrapping every document in the deterministic HTML fixture
    (WITHOUT the entity tail, so extraction recovers byte-identical body
    text modulo the h1/anchor content prefix) and curating with
    raw_html=True must keep the pipeline functional and the quality stage
    meaningful — and the recovered text must contain the original, not
    the nav/footer chrome."""
    from pyspark.sql import functions as F

    from database_synchronize_tool_spark.catalog import load_table
    from database_synchronize_tool_spark.functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    html_docs = docs.withColumn(
        "text", TX.synth_html(F.col("doc_id"), F.col("text"), tail=False)
    )
    res = curate_corpus(spark, docs=html_docs, raw_html=True)
    counts = res.counts()
    assert counts["sampled"] > 0
    # extraction happened: no surviving text carries tags or chrome words
    sample = res.sampled.limit(50).collect()
    for r in sample:
        assert "<" not in r["text"] and ">" not in r["text"], r["text"][:80]
        assert "ads ads ads" not in r["text"]  # <aside> stripped
        assert "2024 example" not in r["text"]  # <footer> stripped
    # parity with the clean-text pipeline: the html wrapper adds only the
    # deterministic 'link'*k + 'Doc N' prefix, so the quality-kept set is
    # identical to curating the clean corpus with the same prefix applied
    prefixed = docs.withColumn(
        "text",
        F.concat(
            F.repeat(F.lit("link "), (F.col("doc_id") % 4).cast("int")),
            F.lit("Doc "),
            F.col("doc_id").cast("string"),
            F.lit(" "),
            F.col("text"),
        ),
    )
    res_clean = curate_corpus(spark, docs=prefixed)
    got = sorted(r["doc_id"] for r in res.sampled.select("doc_id").collect())
    want = sorted(
        r["doc_id"] for r in res_clean.sampled.select("doc_id").collect()
    )
    assert got == want


def test_curated_write_emits_layout_stats_that_prune(spark, curated, tmp_path):
    """r12 verdict #7: the curated write path emits per-file zone maps at
    write time, and a range predicate on the sort_within column skips a
    real fraction of files — SOUNDLY (every pruned file is proven to hold
    zero matching rows by re-reading it)."""
    from pyspark.sql import functions as F

    from database_synchronize_tool_spark.sources.sinks import (
        layout_stats_prune_report,
        read_layout_stats,
        write_curated_corpus,
    )

    out = str(tmp_path / "curated")
    write_curated_corpus(
        curated.sampled,
        out,
        partition_by=("lang",),
        sort_within=("doc_id",),
        target_files_per_partition=4,
    )
    stats = read_layout_stats(spark, out)
    assert {"file", "cnt", "doc_id_min", "doc_id_max"} <= set(stats.columns)
    n_rows = curated.sampled.count()
    assert stats.agg(F.sum("cnt")).collect()[0][0] == n_rows

    # a narrow doc_id band: most files' [min, max] cannot intersect it
    ids = sorted(r["doc_id"] for r in curated.sampled.select("doc_id").collect())
    lo, hi = ids[0], ids[len(ids) // 8]  # first ~12.5% of the id range
    rep = layout_stats_prune_report(stats, "doc_id", lo, hi)
    assert rep["n_files"] >= 4  # salting actually fanned files out
    assert rep["frac_pruned"] >= 0.25, rep
    assert rep["rows_scanned"] < rep["rows_total"], rep

    # soundness: every pruned file holds ZERO matching rows
    cmin, cmax = F.col("doc_id_min"), F.col("doc_id_max")
    pruned_files = [
        r["file"]
        for r in stats.filter((cmax < F.lit(lo)) | (cmin >= F.lit(hi)))
        .select("file")
        .collect()
    ]
    if pruned_files:
        back = (
            spark.read.parquet(out)
            .withColumn("__f", F.input_file_name())
            .filter(F.col("__f").isin(pruned_files))
            .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        )
        assert back.count() == 0


def test_dsir_topk_prefers_target_like_documents(spark):
    """The importance direction is right: documents sharing the target
    slice's bigram distribution outrank documents from a disjoint
    vocabulary, and the edge cases (sub-2-word and NULL docs) score 0."""
    from database_synchronize_tool_spark.operators.sampling import dsir_topk

    target_text = "the quick brown fox jumps over the lazy dog again"
    alien_text = "zzz qqq www eee rrr ttt yyy uuu iii ooo"
    rows = []
    # ids divisible by 7 form the target slice (the operator's default)
    for i in range(0, 70, 7):  # 10 target docs, target-like text
        rows.append((i, target_text))
    for i in range(1, 40, 3):  # 13 non-target docs, target-like
        if i % 7 != 0:
            rows.append((i, target_text))
    for i in range(101, 114):  # 13 non-target docs, alien vocabulary
        if i % 7 != 0:
            rows.append((i, alien_text))
    rows.append((200, "one"))  # < 2 words
    rows.append((201, None))  # NULL text
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = dsir_topk(docs, k=len(rows)).collect()
    by_id = {r["doc_id"]: r for r in got}
    target_like = [r for r in got if r["doc_id"] < 100]
    alien = [r for r in got if 100 < r["doc_id"] < 200]
    assert target_like and alien
    worst_target_like = min(r["score_norm"] for r in target_like)
    best_alien = max(r["score_norm"] for r in alien)
    assert worst_target_like > best_alien, (worst_target_like, best_alien)
    assert by_id[200]["score"] == 0 and by_id[200]["n_bigrams"] == 0
    assert by_id[201]["score"] == 0
    # ranks are 1..n, deterministic ordering
    assert sorted(r["rank"] for r in got) == list(range(1, len(rows) + 1))


def test_curated_write_shard_balanced(spark, curated, tmp_path):
    """r13 verdict #7: shard_balanced adds a token-balanced shard=
    partition level whose per-shard token totals stay within a pinned
    max/min bound, with a _shard_manifest artifact matching the data."""
    from pyspark.sql import functions as F

    from database_synchronize_tool_spark.sources.sinks import (
        write_curated_corpus,
    )

    out = str(tmp_path / "sharded")
    write_curated_corpus(
        curated.sampled,
        out,
        partition_by=("lang",),
        sort_within=("doc_id",),
        shard_balanced=True,
    )
    man = {
        r["shard"]: (r["n_docs"], r["total_tokens"])
        for r in spark.read.parquet(out + "/_shard_manifest").collect()
    }
    assert sorted(man) == list(range(8))
    totals = [t for _, t in man.values()]
    # LPT over 128 hash-bins: max-min is bounded by one bin's total; at
    # the test corpus size that is well inside 1.5x (tightens with scale)
    assert max(totals) / min(totals) <= 1.5, man
    back = spark.read.parquet(out)
    assert "shard" in back.columns
    got_docs = {
        r["shard"]: r["n"]
        for r in back.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got_docs == {s: nd for s, (nd, _) in man.items()}
    # the written assignment is the SAME rule the graded
    # curation_shard_manifest query declares: recompute from the data
    from database_synchronize_tool_spark.operators.sampling import (
        shard_manifest,
    )

    want = {
        r["doc_id"]: r["shard"]
        for r in shard_manifest(curated.sampled).collect()
    }
    got = {r["doc_id"]: r["shard"] for r in back.select("doc_id", "shard").collect()}
    assert got == want


def test_knuth_hash32_overflow_safe_and_engine_agreed(spark, duck):
    """r15 advice fix: the portable Knuth draw must not depend on int64
    wraparound — the naive (id*2654435761) product overflows for
    id >= ~3.47e9 (Spark wraps silently, DuckDB raises). The modmul form
    must equal exact big-integer math for ids across the full bigint
    domain, on BOTH engines."""
    from pyspark.sql import functions as F

    from database_synchronize_tool_spark.operators.sampling import (
        HASH_MOD,
        KNUTH_MULT,
        knuth_hash32,
        knuth_hash32_sql,
    )

    ids = [
        0, 1, 7, 65535, 65536, 123456789,
        3_400_000_000, 3_474_000_000,  # naive form wraps past here
        4_294_967_295, 4_294_967_296, 10**15, 2**62, -5, -4_294_967_297,
    ]
    want = {i: ((i % HASH_MOD) * KNUTH_MULT) % HASH_MOD for i in ids}
    df = spark.createDataFrame([(i,) for i in ids], "id bigint")
    got_spark = {
        r["id"]: r["h"]
        for r in df.select("id", knuth_hash32(F.col("id")).alias("h")).collect()
    }
    assert got_spark == want
    for i in ids:
        (h,) = duck.execute(
            f"SELECT {knuth_hash32_sql(f'CAST({i} AS BIGINT)')}"
        ).fetchone()
        assert h == want[i], i


def test_curated_write_shard_balanced_custom_id_col(spark, curated, tmp_path):
    """r15 advice fix: shard_balanced works for a corpus keyed by any id
    column, not just doc_id."""
    from pyspark.sql import functions as F

    from database_synchronize_tool_spark.sources.sinks import (
        write_curated_corpus,
    )

    renamed = curated.sampled.withColumnRenamed("doc_id", "item_id")
    out = str(tmp_path / "sharded_custom_id")
    write_curated_corpus(
        renamed,
        out,
        partition_by=("lang",),
        sort_within=("item_id",),
        shard_balanced=True,
        shard_id_col="item_id",
    )
    back = spark.read.parquet(out)
    assert "shard" in back.columns
    n_shards = back.select("shard").distinct().count()
    assert n_shards == 8
    # same assignment rule as the doc_id-keyed write (hash of the id value)
    from database_synchronize_tool_spark.operators.sampling import (
        shard_manifest,
    )

    want = {
        r["doc_id"]: r["shard"]
        for r in shard_manifest(curated.sampled).collect()
    }
    got = {
        r["item_id"]: r["shard"]
        for r in back.select("item_id", "shard").collect()
    }
    assert got == want


def test_perplexity_prune_stage(spark, sf_dir, curated):
    """r15 (CCNet leg): perplexity_prune='tail' drops exactly the
    tail-bucket survivors of the default run, deterministically."""
    from database_synchronize_tool_spark.operators.sampling import (
        perplexity_buckets,
    )
    from database_synchronize_tool_spark.pipeline import curate_corpus

    pruned = curate_corpus(spark, sf_dir, perplexity_prune="tail")
    base_kept = {r["doc_id"] for r in curated.kept.select("doc_id").collect()}
    pruned_kept = {
        r["doc_id"] for r in pruned.kept.select("doc_id").collect()
    }
    assert pruned_kept < base_kept  # strictly smaller, never larger
    tail = {
        r["doc_id"]
        for r in perplexity_buckets(pruned.corpus)
        .filter("ppl_bucket = 'tail'")
        .collect()
    }
    assert base_kept - pruned_kept == base_kept & tail
    assert not (pruned_kept & tail)
    # rerun is identical (portable hash + deterministic terciles)
    again = curate_corpus(spark, sf_dir, perplexity_prune="tail")
    assert pruned_kept == {
        r["doc_id"] for r in again.kept.select("doc_id").collect()
    }
    with pytest.raises(ValueError):
        curate_corpus(spark, sf_dir, perplexity_prune="bogus")


def test_doremi_mw_trajectory_invariants():
    """r15 (DoReMi leg, Xie et al. 2023): the pure integer MW recursion —
    higher per-step excess must win, per-step smoothed weights stay a
    (floor-slack) partition of unity, the uniform-smoothing floor holds,
    and the recursion is deterministic."""
    import collections

    from database_synchronize_tool_spark.operators.sampling import (
        DOREMI_FP,
        DOREMI_SMOOTH_C,
        mw_trajectory,
    )

    doms = ["a", "b", "c"]
    ex = {}
    for t in range(1, 9):
        ex[(t, "a")] = DOREMI_FP // 100
        ex[(t, "b")] = DOREMI_FP // 10
        ex[(t, "c")] = 0
    traj, fin = mw_trajectory(ex, doms)
    assert fin["b"] > fin["a"] > fin["c"]
    per_step = collections.defaultdict(int)
    for t, _d, _e, ab in traj:
        per_step[t] += ab
    assert set(per_step) == set(range(1, 9))
    for s in per_step.values():
        assert DOREMI_FP - 3 * len(doms) <= s <= DOREMI_FP
    floor = DOREMI_SMOOTH_C * (DOREMI_FP // len(doms)) // DOREMI_FP
    assert all(ab >= floor for _t, _d, _e, ab in traj)
    assert mw_trajectory(ex, doms) == (traj, fin)
    # zero excess everywhere -> exactly uniform at every step
    traj0, fin0 = mw_trajectory(
        {(t, d): 0 for t in range(1, 9) for d in doms}, doms
    )
    assert all(ab == fin0[d] for _t, d, _e, ab in traj0)
    assert len(set(fin0.values())) == 1


def test_doremi_weights_operator(spark, sf_dir):
    """The corpus-level operator: full steps x domains trajectory, final
    weight = mean smoothed weight per domain, deterministic rerun."""
    import os

    from database_synchronize_tool_spark.operators.sampling import (
        DOREMI_STEPS,
        doremi_weights,
    )

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    rows = doremi_weights(d).collect()
    domains = {r["domain"] for r in rows}
    assert len(rows) == DOREMI_STEPS * len(domains)
    by_dom = {}
    for r in rows:
        by_dom.setdefault(r["domain"], []).append(r)
    for dom, rs in by_dom.items():
        assert len(rs) == DOREMI_STEPS
        finals = {r["final_weight_fp"] for r in rs}
        assert len(finals) == 1
        assert finals == {sum(r["weight_fp"] for r in rs) // DOREMI_STEPS}
        assert all(r["batch_excess_fp"] >= 0 for r in rs)
    again = doremi_weights(d).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_doremi_domain_mix_stage(spark, sf_dir, curated):
    """r15 (DoReMi leg): domain_mix='doremi' resamples the survivors to
    the corpus-trained mixture — a subset of the semantic-dedup stage,
    deterministic across reruns, and rejects unknown mixes."""
    from database_synchronize_tool_spark.pipeline import curate_corpus

    mixed = curate_corpus(spark, sf_dir, domain_mix="doremi")
    base = {r["doc_id"] for r in mixed.sem_clean.select("doc_id").collect()}
    got = {r["doc_id"] for r in mixed.sampled.select("doc_id").collect()}
    assert got and got <= base
    again = curate_corpus(spark, sf_dir, domain_mix="doremi")
    assert got == {
        r["doc_id"] for r in again.sampled.select("doc_id").collect()
    }
    with pytest.raises(ValueError):
        curate_corpus(spark, sf_dir, domain_mix="bogus")
