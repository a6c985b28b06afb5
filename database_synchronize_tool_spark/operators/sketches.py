"""Frequency-sketch operators: Misra-Gries heavy-hitter candidates with an
exact verification pass.

The 100 TB problem: "which tokens/n-grams appear in more than 1/den of the
corpus?" cannot be answered by ``groupBy(token).count()`` alone when the
token-level cardinality explodes (n-grams over web text reach billions of
distinct keys — the aggregation state itself becomes the bottleneck). The
classic streaming answer is a bounded-memory summary per partition followed
by an exact count of ONLY the surviving candidates:

1. **Candidate generation** (one ``mapInPandas`` pass, O(capacity) state per
   partition): Misra-Gries with ``capacity`` counters. MG guarantees every
   item whose partition-local count exceeds ``n_p / (capacity + 1)`` survives
   in that partition's summary. By the averaging argument, any item with
   GLOBAL count ≥ N/den must exceed the local threshold in at least one
   partition whenever ``capacity + 1 > den`` — so the union of partition
   summaries has **recall 1.0** for the final predicate (undercounts are
   possible, false *negatives* are not).
2. **Exact verify**: broadcast-semi-join the token stream to the candidate
   set (bounded by capacity × partitions, always broadcastable) and count
   exactly — the full-cardinality aggregation never happens; only candidate
   rows reach the groupBy.

The final output is EXACT (integer threshold compare ``cnt * den >= N``), so
it has a plain GROUP BY / HAVING DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(
    items: DataFrame, col: str, capacity: int
) -> DataFrame:
    """Per-partition Misra-Gries summaries, unioned and distinct-ed.

    Returns a 1-column DataFrame (``col``) of candidate values. Every value
    whose global frequency exceeds ``N / (capacity + 1)`` is guaranteed
    present; values below that may or may not appear (they are filtered by
    the exact pass in :func:`heavy_hitters_exact`).
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    schema = items.select(col).schema

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for v in pdf[col]:
                if v is None:
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < capacity:
                    counters[v] = 1
                else:
                    # Decrement-all step: amortized O(1) per input item
                    # (each decrement pays back one prior increment).
                    dead = []
                    for k in counters:
                        counters[k] -= 1
                        if counters[k] == 0:
                            dead.append(k)
                    for k in dead:
                        del counters[k]
        yield pd.DataFrame({col: list(counters.keys())})

    return items.select(col).mapInPandas(summarize, schema=schema).distinct()


def heavy_hitters_exact(
    items: DataFrame, col: str, den: int, capacity: int | None = None
) -> DataFrame:
    """Exact heavy hitters: values with count * den >= N (frequency >= 1/den).

    Two-phase at scale: MG candidates (recall 1.0 requires capacity >= den;
    the default capacity = 2 * den halves the undercount noise), then an
    exact count of candidate rows only. The broadcast candidate join keeps
    the big-side aggregation state bounded by the candidate count instead of
    the full key cardinality.

    Output: (col, cnt BIGINT, n_total BIGINT) — exact values, so the whole
    pipeline is verifiable against a plain GROUP BY / HAVING oracle.
    """
    if capacity is None:
        capacity = 2 * den
    if capacity < den:
        raise ValueError(
            f"capacity {capacity} < den {den} breaks the MG recall guarantee"
        )
    cands = misra_gries_candidates(items, col, capacity)
    n = items.agg(F.count(col).alias("n_total"))
    return (
        items.join(F.broadcast(cands), col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(n))
        .filter(F.col("cnt") * den >= F.col("n_total"))
    )
