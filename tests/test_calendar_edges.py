"""Calendar edge cases pinned: leap days, month-end clamping, year
boundaries — the panel's month arithmetic must be stable across all of
them (the reference's data spans leap years 2016/2020)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sf_datalake_spark.functions.dates import month_index, month_trunc, spread_over_months
from sf_datalake_spark.operators.windows import with_lag, with_moving_average

from tests.conftest import d


def test_month_index_monotonic_across_year_boundary(spark):
    df = spark.createDataFrame(
        [(d("2019-12-31"),), (d("2020-01-01"),), (d("2020-02-29"),), (d("2020-12-01"),)],
        "x date",
    )
    rows = df.select("x", month_index("x").alias("i")).orderBy("x").collect()
    idx = [r["i"] for r in rows]
    assert idx == [(2019 - 1970) * 12 + 11, (2020 - 1970) * 12,
                   (2020 - 1970) * 12 + 1, (2020 - 1970) * 12 + 11]


def test_month_trunc_leap_day(spark):
    df = spark.createDataFrame([(d("2020-02-29"),)], "x date")
    assert df.select(month_trunc("x").alias("m")).first()["m"] == d("2020-02-01")


def test_spread_over_leap_february(spark):
    df = spark.createDataFrame(
        [(d("2020-01-15"), d("2020-03-15"))], "s date, e date"
    )
    months = [r["p"] for r in spread_over_months(df, "s", "e", "p").collect()]
    assert months == [d("2020-01-01"), d("2020-02-01"), d("2020-03-01")]


def test_lag_across_year_boundary(spark):
    df = spark.createDataFrame(
        [("a", d("2019-12-01"), 1.0), ("a", d("2020-01-01"), 2.0)],
        "siren string, `période` date, ca double",
    )
    got = {r["période"]: r["ca_lag1m"] for r in with_lag(df, "ca", 1).collect()}
    assert got[d("2020-01-01")] == 1.0


def test_moving_average_range_frame_across_year_boundary(spark):
    """Dec→Jan is one month apart in index space: a 2-month RANGE frame
    at 2020-01 must include 2019-12."""
    df = spark.createDataFrame(
        [("a", d("2019-12-01"), 10.0), ("a", d("2020-01-01"), 30.0)],
        "siren string, `période` date, ca double",
    )
    got = {r["période"]: r["ca_mean2m"]
           for r in with_moving_average(df, "ca", 2).collect()}
    assert got[d("2020-01-01")] == 20.0


def test_add_months_month_end_clamp(spark):
    """Spark's add_months clamps to month end (Jan 31 + 1m = Feb 29 in a
    leap year) — the TargetVariable horizon semantics depend on it."""
    df = spark.createDataFrame([(d("2020-01-31"),)], "x date")
    row = df.select(
        F.add_months("x", 1).alias("m1"), F.add_months("x", 13).alias("m13")
    ).first()
    assert row["m1"] == d("2020-02-29")
    assert row["m13"] == d("2021-02-28")
