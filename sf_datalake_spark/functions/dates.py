"""Calendar helpers for the (entity, period) monthly-panel data model.

Reference behavior replaced:
- month truncation (``altares_preprocessing.py:74``,
  ``extract_ap_data.py:189-191``)
- month index via ``F.months_between`` against a reference date
  (``transform.py:659-672``, ``transform.py:749-751``)
- pandas ``pd.date_range`` → Spark round-trips for monthly/daily date
  dimensions (``extract_cotisation_urssaf.py:67-71``,
  ``extract_ap_data.py:132-137``) — replaced with pure-projection
  ``sequence()`` + ``explode`` (no driver round-trip, no join needed;
  SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: Reference epoch for month indexing; any fixed month-start works.
MONTH_INDEX_EPOCH = "1970-01-01"


def month_trunc(col: Column | str) -> Column:
    """Truncate a date/timestamp column to the first day of its month."""
    return F.trunc(F.col(col) if isinstance(col, str) else col, "month")


def month_index(col: Column | str, epoch: str = MONTH_INDEX_EPOCH) -> Column:
    """Integer month index (months since ``epoch``), calendar-aware.

    Used as the ``orderBy`` key for range-frame windows so that moving
    averages/lags are robust to missing months (reference
    ``transform.py:659-672``).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.months_between(month_trunc(c), F.lit(epoch).cast("date")).cast("int")


def month_sequence(start: Column, end: Column) -> Column:
    """Array of month-start dates from ``start`` to ``end`` inclusive."""
    return F.sequence(month_trunc(start), month_trunc(end), F.expr("interval 1 month"))


def monthly_date_dim(
    spark: SparkSession, start: str, end: str, col_name: str = "période"
) -> DataFrame:
    """Tiny one-column monthly date dimension — always broadcastable.

    Pure projection over a single literal row: no driver-side pandas
    round-trip (contrast reference ``extract_cotisation_urssaf.py:67-71``).
    """
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"), F.lit(end).cast("date"), F.expr("interval 1 month")
            )
        ).alias(col_name)
    )


def spread_over_months(
    df: DataFrame,
    start_col: str,
    end_col: str,
    period_col: str = "période",
    end_exclusive: bool = False,
) -> DataFrame:
    """Spread interval rows onto a monthly index — one row per covered month.

    Replaces the reference's range join of intervals against a generated
    date dimension (``extract_financial_DGFiP.py:206-212``,
    ``extract_cotisation_urssaf.py:94-100``) with ``sequence()`` +
    ``explode`` — a pure projection: no join, no shuffle, no broadcast,
    scales linearly with input rows regardless of cluster size.
    """
    end = F.col(end_col)
    if end_exclusive:
        end = F.date_sub(end, 1)
    m0, m1 = month_trunc(F.col(start_col)), month_trunc(end)
    # empty interval (end-exclusive start == end): sequence() with a
    # positive step and start > stop throws — emit zero months instead
    months = F.when(m1 >= m0, F.sequence(m0, m1, F.expr("interval 1 month"))).otherwise(
        F.array().cast("array<date>")
    )
    return df.withColumn(period_col, F.explode(months))
