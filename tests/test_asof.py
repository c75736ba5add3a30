"""Golden tests for merge_asof — modeled on the reference's golden data
(``tests/test_utils.py:9-129``): yearly right values attached to a
monthly left index, backward/forward with 365-day tolerance, PLUS the
``nearest`` direction the reference documents but never implemented
(``utils.py:126`` vs ``:190-193``).
"""

from __future__ import annotations

import pandas as pd
import pytest

from sf_datalake_spark.operators.asof import merge_asof

from tests.conftest import d, ts


@pytest.fixture()
def left(spark):
    rows = [
        ("a", d("2022-01-01")),
        ("a", d("2022-06-01")),
        ("a", d("2023-02-01")),
        ("b", d("2022-03-01")),
        ("b", d("2024-06-01")),
    ]
    return spark.createDataFrame(rows, "siren string, `période` date")


@pytest.fixture()
def right(spark):
    rows = [
        ("a", d("2021-12-31"), 1.0),
        ("a", d("2022-12-31"), 2.0),
        ("b", d("2022-06-30"), 10.0),
    ]
    return spark.createDataFrame(rows, "siren string, `période` date, ebe double")


def collect(df):
    return {(r["siren"], r["période"]): r["ebe"] for r in df.collect()}


def test_backward_with_tolerance(left, right):
    out = collect(
        merge_asof(left, right, on="période", by=["siren"], direction="backward",
                   tolerance=365)
    )
    assert out[("a", d("2022-01-01"))] == 1.0
    assert out[("a", d("2022-06-01"))] == 1.0
    assert out[("a", d("2023-02-01"))] == 2.0
    assert out[("b", d("2022-03-01"))] is None      # no earlier right row
    assert out[("b", d("2024-06-01"))] is None      # 10.0 beyond 365d back


def test_forward_with_tolerance(left, right):
    out = collect(
        merge_asof(left, right, on="période", by=["siren"], direction="forward",
                   tolerance=365)
    )
    assert out[("a", d("2022-01-01"))] == 2.0       # 2022-12-31 within 365d
    assert out[("a", d("2023-02-01"))] is None      # nothing after
    assert out[("b", d("2022-03-01"))] == 10.0


def test_nearest(left, right):
    out = collect(
        merge_asof(left, right, on="période", by=["siren"], direction="nearest")
    )
    assert out[("a", d("2022-01-01"))] == 1.0       # 1 day back vs 364 forward
    assert out[("a", d("2022-06-01"))] == 1.0       # 152 back vs 213 forward
    assert out[("a", d("2023-02-01"))] == 2.0
    assert out[("b", d("2024-06-01"))] == 10.0      # only candidate, no tolerance


def test_exact_time_match_is_inclusive(spark):
    left = spark.createDataFrame([("a", d("2022-06-30"))], "siren string, `période` date")
    right = spark.createDataFrame(
        [("a", d("2022-06-30"), 7.0)], "siren string, `période` date, ebe double"
    )
    for direction in ("backward", "forward", "nearest"):
        out = collect(merge_asof(left, right, on="période", by=["siren"],
                                 direction=direction))
        assert out[("a", d("2022-06-30"))] == 7.0, direction


def test_right_null_value_still_matches(spark):
    """A right row whose value is NULL is a real match (struct packing);
    the naive last(col, ignorenulls) trick would skip past it."""
    left = spark.createDataFrame([("a", d("2022-06-01"))], "siren string, `période` date")
    right = spark.createDataFrame(
        [("a", d("2022-05-01"), None), ("a", d("2022-01-01"), 1.0)],
        "siren string, `période` date, ebe double",
    )
    out = collect(merge_asof(left, right, on="période", by=["siren"],
                             direction="backward"))
    assert out[("a", d("2022-06-01"))] is None


def test_matches_pandas_merge_asof_on_timestamps(spark):
    """Cross-check against pandas.merge_asof on a randomized-ish fixture."""
    lrows = [("u1", ts(f"2023-01-01 00:{m:02d}:00")) for m in range(0, 50, 7)]
    rrows = [("u1", ts(f"2023-01-01 00:{m:02d}:30"), float(m)) for m in range(0, 45, 5)]
    left = spark.createDataFrame(lrows, "uid string, t timestamp")
    right = spark.createDataFrame(rrows, "uid string, t timestamp, v double")
    got = merge_asof(left, right, on="t", by=["uid"], direction="backward",
                     tolerance=600).orderBy("t").toPandas()
    lp = pd.DataFrame(lrows, columns=["uid", "t"]).sort_values("t")
    rp = pd.DataFrame(rrows, columns=["uid", "t", "v"]).sort_values("t")
    exp = pd.merge_asof(lp, rp, on="t", by="uid", direction="backward",
                        tolerance=pd.Timedelta(seconds=600))
    assert list(got["v"].fillna(-1)) == list(exp["v"].fillna(-1))
