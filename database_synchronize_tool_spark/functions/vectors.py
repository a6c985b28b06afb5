"""Vector (embedding) expressions — built-in higher-order functions only.

Embeddings live as ``array<float>`` columns; all arithmetic happens JVM-side
via ``zip_with``/``aggregate`` (no Python). Arrays are cast to double first so
both Spark and the DuckDB oracle accumulate doubles left-to-right — keeps the
differential check deterministic (then rounded where surfaced).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ — left-fold (deterministic accumulation order)."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
