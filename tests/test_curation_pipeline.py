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
