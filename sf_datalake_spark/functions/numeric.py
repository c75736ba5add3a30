"""Numeric / null-handling column helpers.

Reference behavior replaced:
- ``clip`` via chained ``F.when`` (``utils.py:75-98``) — here with
  ``F.greatest``/``F.least`` (single codegen'd expression).
- per-column missing/NaN counters (``utils.py:244-273``) — one pass,
  never one ``count()`` per column.
- driver-side numpy sigmoid (``__main__.py:234-243``) — a Column expr.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, FloatType


def clip(col: Column | str, lower: float | None = None, upper: float | None = None) -> Column:
    """Clamp a column into [lower, upper] (either bound optional)."""
    c = F.col(col) if isinstance(col, str) else col
    if lower is not None:
        c = F.greatest(c, F.lit(lower))
    if upper is not None:
        c = F.least(c, F.lit(upper))
    return c


def sigmoid(col: Column | str) -> Column:
    """1 / (1 + exp(-x)) — log-odds → probability."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-c))


def count_missing_values(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One-row DataFrame of per-column null counts, computed in ONE pass."""
    cols = columns or df.columns
    return df.select(
        [F.count(F.when(F.isnull(c), c)).alias(c) for c in cols]
    )


def count_nan_values(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One-row DataFrame of per-column NaN counts (float/double cols only)."""
    float_cols = {
        f.name for f in df.schema.fields if isinstance(f.dataType, (DoubleType, FloatType))
    }
    cols = [c for c in (columns or df.columns) if c in float_cols]
    return df.select([F.count(F.when(F.isnan(c), c)).alias(c) for c in cols])


def equidepth_bucketize(
    df,
    value_col: str,
    n_buckets: int,
    exact: bool = True,
    round_at: int = 6,
    bucket_col: str = "bucket",
):
    """Value-based equi-depth binning: assign each row the bucket of
    its value relative to the column's interior quantile boundaries.

    Unlike positional ``ntile`` (a single-partition global sort at
    scale — see the rfm_segments note in SCALE.md), this is the
    distributed form: boundaries come from ONE aggregate (exact
    ``percentile`` when ``exact``, ``approx_percentile`` for the
    100 TB path), broadcast back, and assignment is a scan-stage
    array comparison — no global sort anywhere.  Equal values land in
    the same bucket (ntile splits positional ties across buckets), so
    bucket populations are near-equal, not exactly equal, on tied
    data — that is the documented trade.

    Boundaries are rounded at ``round_at`` before assignment so the
    bucket edges are engine-exact (the tf_idf_topk ULP discipline).
    """
    probs = [i / n_buckets for i in range(1, n_buckets)]
    fn = "percentile" if exact else "approx_percentile"
    bounds = df.agg(
        F.expr(
            f"transform({fn}({value_col}, "
            f"array({', '.join(map(str, probs))})), "
            f"b -> round(b, {round_at}))"
        ).alias("__bounds")
    )
    x = F.col(value_col)
    assign = (
        F.size(F.filter(F.col("__bounds"), lambda b: x > b)) + F.lit(1)
    ).alias(bucket_col)
    return df.crossJoin(F.broadcast(bounds)).select(
        *df.columns, assign
    )
