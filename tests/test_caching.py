"""cache_scope / scoped_persist: operators that cache lazy intermediates
must not leak CacheManager entries once the consuming harness's scope
closes (VERDICT r8 "what's wrong" #2 / ADVICE r6 #3)."""

from __future__ import annotations

from database_synchronize_tool_spark.caching import cache_scope, scoped_persist
from database_synchronize_tool_spark.catalog import load_table
from database_synchronize_tool_spark.operators import dedup as DD


def _n_persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _persistent_rdd_ids(spark) -> set[int]:
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().keysIterator()
    ids = set()
    while it.hasNext():
        ids.add(it.next())
    return ids


def test_scoped_persist_released_on_scope_exit(spark, sf_dir):
    spark.catalog.clearCache()
    base = _n_persistent_rdds(spark)
    docs = load_table(spark, sf_dir, "documents").limit(50)
    with cache_scope():
        df = scoped_persist(docs.select("doc_id"))
        df.count()  # materialize the cache
        assert _n_persistent_rdds(spark) > base
    assert _n_persistent_rdds(spark) == base


def test_scoped_persist_without_scope_is_plain_persist(spark, sf_dir):
    spark.catalog.clearCache()
    base = _n_persistent_rdds(spark)
    docs = load_table(spark, sf_dir, "documents").limit(50)
    df = scoped_persist(docs.select("doc_id"))
    df.count()
    assert _n_persistent_rdds(spark) > base  # still cached: no scope active
    df.unpersist()
    assert _n_persistent_rdds(spark) == base


def test_nested_scopes_release_only_their_own(spark, sf_dir):
    spark.catalog.clearCache()
    base = _n_persistent_rdds(spark)
    docs = load_table(spark, sf_dir, "documents").limit(50)
    with cache_scope():
        outer = scoped_persist(docs.select("doc_id"))
        outer.count()
        after_outer = _n_persistent_rdds(spark)
        with cache_scope():
            inner = scoped_persist(docs.select("doc_id", "source"))
            inner.count()
            assert _n_persistent_rdds(spark) > after_outer
        # inner scope released its own registration only
        assert _n_persistent_rdds(spark) == after_outer
    assert _n_persistent_rdds(spark) == base


def test_dedup_operators_leak_free_under_scope(spark, sf_dir):
    """The four historical leak sites (minhash_lsh_pairs sigs, the
    hot-bucket sized table, containment_banded sigs, the prefix shingle
    table) all release after a scoped build+collect."""
    # Set-based, not count-based: Spark's async ContextCleaner may drop
    # PRIOR tests' checkpoint RDDs mid-test, so an equality on the count
    # is flaky under the full suite. The leak contract is "no NEW
    # persistent RDD survives the scope".
    spark.catalog.clearCache()
    base = _persistent_rdd_ids(spark)
    docs = load_table(spark, sf_dir, "documents").limit(200)

    with cache_scope():
        DD.minhash_lsh_pairs(docs, threshold=0.8, max_bucket=8).collect()
    assert not _persistent_rdd_ids(spark) - base

    with cache_scope():
        DD.containment_banded_pairs(docs, threshold=0.9, max_bucket=8).collect()
    assert not _persistent_rdd_ids(spark) - base

    with cache_scope():
        DD.containment_prefix_pairs(
            docs, threshold_num=9, threshold_den=10
        ).collect()
    assert not _persistent_rdd_ids(spark) - base
