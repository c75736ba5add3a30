"""Embedding-vector (array<float/double>) math as pure Column expressions.

``F.zip_with`` + ``F.aggregate`` keep dot products and norms JVM-side —
no Python UDF in the similarity-search hot path. For very wide vectors or
batch-heavy workloads a vectorized Pandas-UDF path exists in
``operators/similarity.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def array_dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two numeric array columns."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def array_norm(a: Column | str) -> Column:
    """L2 norm of a numeric array column."""
    return F.sqrt(
        F.aggregate(
            _c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def array_cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two numeric array columns (null-safe on zero norm)."""
    denom = array_norm(a) * array_norm(b)
    return F.when(denom == 0, F.lit(None).cast("double")).otherwise(array_dot(a, b) / denom)
