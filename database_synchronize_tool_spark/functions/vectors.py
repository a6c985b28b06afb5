"""Vector (embedding) expressions — built-in higher-order functions only.

Embeddings live as ``array<float>`` columns; all arithmetic happens JVM-side
via ``zip_with``/``aggregate`` (no Python). Arrays are cast to double first so
both Spark and the DuckDB oracle accumulate doubles left-to-right — keeps the
differential check deterministic (then rounded where surfaced).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


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


def _foldsum(m: np.ndarray) -> np.ndarray:
    """Row-wise strict left-fold sum starting from 0.0 — the exact IEEE
    accumulation order of ``F.aggregate(…, lit(0.0), acc+x)`` and DuckDB's
    ``list_reduce``; ``np.add.accumulate`` applies adds sequentially, and the
    prepended zero column reproduces the fold's initial element."""
    z = np.zeros((m.shape[0], 1))
    return np.add.accumulate(np.hstack([z, m]), axis=1)[:, -1]


@F.pandas_udf(DoubleType())
def cosine_pairs(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized twin of ``cosine`` for pair-scoring hot paths.

    The higher-order-function form evaluates ~3·dim interpreted lambdas per
    pair (dot + both norms), which dominates cross-join scoring; this Arrow
    path is ~10× faster and bit-identical (same left-fold order), so the
    DuckDB oracle still matches exactly.
    """
    n = len(a)
    out = np.empty(n)
    if n == 0:
        return pd.Series(out)
    lens_a = a.map(len).to_numpy()
    lens_b = b.map(len).to_numpy()
    if (lens_a == lens_a[0]).all() and (lens_b == lens_a[0]).all():
        x = np.array(a.tolist(), dtype=np.float64)
        y = np.array(b.tolist(), dtype=np.float64)
        out = _foldsum(x * y) / (np.sqrt(_foldsum(x * x)) * np.sqrt(_foldsum(y * y)))
    else:  # ragged fallback, same math per row
        for i in range(n):
            x = np.asarray(a.iloc[i], dtype=np.float64)[None, :]
            y = np.asarray(b.iloc[i], dtype=np.float64)[None, :]
            out[i] = (
                _foldsum(x * y)[0]
                / (np.sqrt(_foldsum(x * x)[0]) * np.sqrt(_foldsum(y * y)[0]))
            )
    return pd.Series(out)


def l2_sq(a: Column, b: Column) -> Column:
    """Σ (aᵢ-bᵢ)² — left-fold squared L2 distance (PQ's metric)."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


@F.pandas_udf(DoubleType())
def l2_sq_pairs(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized twin of ``l2_sq`` — same left-fold order, bit-identical to
    the higher-order-function form and DuckDB's ``list_reduce``."""
    n = len(a)
    out = np.empty(n)
    if n == 0:
        return pd.Series(out)
    lens_a = a.map(len).to_numpy()
    lens_b = b.map(len).to_numpy()
    if (lens_a == lens_a[0]).all() and (lens_b == lens_a[0]).all():
        x = np.array(a.tolist(), dtype=np.float64)
        y = np.array(b.tolist(), dtype=np.float64)
        d = x - y
        out = _foldsum(d * d)
    else:  # ragged fallback, same math per row
        for i in range(n):
            x = np.asarray(a.iloc[i], dtype=np.float64)[None, :]
            y = np.asarray(b.iloc[i], dtype=np.float64)[None, :]
            d = x - y
            out[i] = _foldsum(d * d)[0]
    return pd.Series(out)
