"""End-to-end corpus-curation pipeline: the round-7 operators composed the
way a training-data build actually chains them —

    quality filter → exact dedup → decontamination screen →
    semantic (embedding) dedup → temperature re-sample

Each stage is the SAME operator the declared queries grade individually;
this test pins the cross-stage invariants a pipeline relies on (monotone
shrinkage, no screened contamination among survivors, join-ability of the
text and embedding sides, determinism across reruns) rather than any one
stage's values — those are oracle-checked elsewhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from database_synchronize_tool_spark.catalog import load_table
from database_synchronize_tool_spark.functions import text as TX
from database_synchronize_tool_spark.operators import dedup as DD
from database_synchronize_tool_spark.operators import similarity as SIM


def _curate(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # 1. quality cascade (keep only 'keep' verdicts) — narrow scan
    t = F.col("text")
    kept = docs.filter(
        (TX.token_count(t) >= 12)
        & (TX.lang_id(t) != "unknown")
        & (TX.dup_token_fraction(t) <= 0.6)
        & (TX.adjacent_repeat_count(t) < 5)
    )

    # 2. exact dedup: keep the smallest doc_id per normalized fingerprint
    fp = kept.select("doc_id", TX.fingerprint(t).alias("fp"))
    keep_ids = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    deduped = kept.join(keep_ids.select("doc_id"), "doc_id", "left_semi")

    # 3. decontamination: drop survivors whose shingles contain >= 90% of a
    #    held-out doc's shingles (the decontam_ngram_overlap screen, applied
    #    as a filter instead of a report)
    sh = deduped.select(
        "doc_id", DD.minhash_features(F.col("text"))["sh"].alias("sh")
    )
    held = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 7 == 0)
        .select(
            F.col("doc_id").alias("heldout_id"),
            DD.minhash_features(F.col("text"))["sh"].alias("sh_h"),
        )
    )
    contaminated = (
        sh.crossJoin(F.broadcast(held))
        .withColumn("cont", TX.containment(F.col("sh_h"), F.col("sh")))
        .filter(F.col("cont") >= 0.9)
        .select("doc_id")
        .distinct()
    )
    clean = deduped.join(contaminated, "doc_id", "left_anti")

    # 4. semantic dedup on the embedding side: doc_id joins vec_id 1:1 in
    #    the testdata; drop the higher id of every near-pair
    pairs = SIM.semantic_dedup_pairs(
        emb.join(
            clean.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
        ),
        n_cells=8,
        threshold=0.9,
    )
    sem_dupes = pairs.select(F.col("vec_b").alias("doc_id")).distinct()
    sem_clean = clean.join(sem_dupes, "doc_id", "left_anti")

    # 5. temperature re-sample by language (alpha=0.5, portable hash draw)
    counts = sem_clean.groupBy("lang").agg(F.count(F.lit(1)).alias("n_s"))
    n = sem_clean.agg(F.count(F.lit(1)).alias("n_docs"))
    w = counts.crossJoin(F.broadcast(n)).withColumn(
        "w", F.sqrt(F.col("n_s").cast("double") / F.col("n_docs"))
    )
    z = w.agg(F.sum(F.col("w").cast("decimal(28,12)")).cast("double").alias("z"))
    rate = F.least(
        F.lit(1.0), F.col("n_docs") * F.col("w") / F.col("z") / F.col("n_s")
    )
    bucket = (
        (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    ).cast("double") / F.lit(4294967296.0)
    sampled = (
        sem_clean.join(F.broadcast(w), "lang")
        .crossJoin(F.broadcast(z))
        .filter(bucket < rate)
        .select("doc_id", "lang", "source", "text")
    )
    return docs, kept, deduped, clean, sem_clean, sampled, contaminated


def test_pipeline_stages_shrink_monotonically(spark, sf_dir):
    docs, kept, deduped, clean, sem_clean, sampled, _ = _curate(spark, sf_dir)
    n = [df.count() for df in (docs, kept, deduped, clean, sem_clean, sampled)]
    assert n == sorted(n, reverse=True), n
    assert n[-1] > 0  # the pipeline keeps a real corpus, not nothing
    assert n[1] < n[0]  # the quality cascade actually rejects documents


def test_no_contamination_survives(spark, sf_dir):
    _, _, _, clean, _, sampled, contaminated = _curate(spark, sf_dir)
    bad = {r["doc_id"] for r in contaminated.collect()}
    surviving = {r["doc_id"] for r in sampled.select("doc_id").collect()}
    assert not (bad & surviving)


def test_pipeline_is_deterministic(spark, sf_dir):
    *_, sampled1, _ = _curate(spark, sf_dir)
    *_, sampled2, _ = _curate(spark, sf_dir)
    a = sorted(r["doc_id"] for r in sampled1.collect())
    b = sorted(r["doc_id"] for r in sampled2.collect())
    assert a == b
