"""Slowly-changing-dimension (type 2) construction from a change log.

Lakehouse table maintenance, beyond the reference's surface (its closest
analog is the pandas-side monthly snapshot stacking in
``/root/reference/src/sf_datalake/utils.py`` — a driver-memory pattern
this replaces with two window passes).  Given an append-only change log
``(key, seq, attrs...)``, produce the classic SCD2 dimension: one row
per (key, attribute-version) with ``valid_from`` / ``valid_to`` /
``version_n`` / ``is_current``, consecutive identical attribute rows
compressed away.

Scale design:
- Exactly ONE shuffle: both window passes (the lag-based change
  detector and the lead-based validity close) share the same
  ``partitionBy(key) orderBy(seq)`` spec, so Catalyst plans a single
  exchange + sort and runs both Window operators over it.
- The compression filter runs BEFORE the second window, so the lead
  pass only carries version rows (bounded by the number of true
  changes, not the log length).
- No driver-side state; ties on ``seq`` are broken by the caller's
  tiebreak column to keep the build deterministic under duplicates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    log: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    attr_cols: Sequence[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Compress a change log into SCD2 validity intervals.

    Returns ``key_cols + attr_cols + [valid_from, valid_to, version_n,
    is_current]`` where ``valid_to`` is NULL on the open (current)
    version and ``version_n`` counts versions per key from 1.
    """
    order: list[Column] = [F.col(seq_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(*key_cols).orderBy(*order)

    attrs = F.struct(*[F.col(c) for c in attr_cols])
    # Null-safe in one expression: the first row's lag is NULL and
    # eqNullSafe(NULL, x) is false, so it is marked changed; NULL attr
    # fields compare equal rather than poisoning the filter.
    changed = ~F.lag(attrs).over(w).eqNullSafe(attrs)

    versions = (
        log.withColumn("__chg", changed)
        .filter(F.col("__chg"))
        .drop("__chg")
    )

    # Same partition/order spec as above: one exchange feeds both sorts.
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return versions.select(
        *key_cols,
        *attr_cols,
        F.col(seq_col).alias("valid_from"),
        F.lead(seq_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version_n"),
        F.lead(seq_col).over(w2).isNull().alias("is_current"),
    )


def scd2_snapshot(
    dim: DataFrame, as_of: Column, seq_col_from: str = "valid_from"
) -> DataFrame:
    """Rows valid at ``as_of``: valid_from <= t < coalesce(valid_to, inf)."""
    return dim.filter(
        (F.col(seq_col_from) <= as_of)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > as_of))
    )
