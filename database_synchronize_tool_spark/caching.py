"""Scoped DataFrame caching.

DataFrame ``persist()`` registers an entry in Spark's CacheManager that
lives until an explicit ``unpersist()`` / ``clearCache()`` — unlike raw
RDD caching it is NOT reclaimed by the ContextCleaner when the Python
object goes out of scope. Operators that return a *lazy* plan referencing
a cached intermediate (the dedup candidate-generation family) cannot
unpersist before returning: the consumer's action hasn't run yet, so an
eager unpersist would defeat the cache entirely. In a long-lived
multi-query process (bench loop, notebook, service) each such call would
leak one cache entry.

The contract here makes release explicit without giving up laziness:

- operators call :func:`scoped_persist` instead of ``df.persist()``;
- harnesses wrap *evaluate-and-collect* of one query in
  :func:`cache_scope`, which unpersists every registered intermediate on
  exit (after the consumer's action has already run — the cache served
  its multi-branch reuse purpose by then).

Outside any scope, ``scoped_persist`` degrades to a plain ``persist()``
with the historical behavior (session-lifetime cache; call
``spark.catalog.clearCache()`` between queries, as tools/check_oracle.py
always has).
"""

from __future__ import annotations

from contextlib import contextmanager
from contextvars import ContextVar

from pyspark.sql import DataFrame

# A stack of open scopes; each scope is the list of DataFrames persisted
# while it was the innermost. ContextVar keeps nested/threaded harnesses
# (e.g. parallel bench workers) independent.
_SCOPES: ContextVar[tuple[list[DataFrame], ...]] = ContextVar(
    "cache_scopes", default=()
)


def scoped_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` that registers with the innermost active
    :func:`cache_scope` (if any) for release on scope exit."""
    df.persist()
    scopes = _SCOPES.get()
    if scopes:
        scopes[-1].append(df)
    return df


@contextmanager
def cache_scope():
    """Release every :func:`scoped_persist` made inside the block on exit.

    Wrap ONE query's build+collect: by exit time the action has consumed
    the cached intermediates, so unpersisting only frees storage. Nested
    scopes release only their own registrations.
    """
    tracked: list[DataFrame] = []
    token = _SCOPES.set(_SCOPES.get() + (tracked,))
    try:
        yield
    finally:
        _SCOPES.reset(token)
        for df in tracked:
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped — nothing to free
