"""Golden tests for the windowed panel operators (SURVEY.md §2.5).

Pattern follows the reference's golden-column tests
(``tests/test_transform.py:62-98``): tiny fixture, expected values
asserted row-by-row after collect().
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sf_datalake_spark.operators.windows import (
    dedup_by_rank,
    with_bfill,
    with_diff,
    with_ffill,
    with_lag,
    with_linear_interpolation,
    with_moving_average,
)

from tests.conftest import d


def by_key(rows, *cols):
    return {(r["siren"], r["période"]): tuple(r[c] for c in cols) for r in rows}


def test_lag_is_row_based(panel):
    """Reference LagOperator is ROW-based over the month index: b's
    missing 2023-02 means lag1 of 2023-03 is the January value."""
    out = with_lag(panel, "ca", 1).collect()
    got = by_key(out, "ca_lag1m")
    assert got[("a", d("2023-02-01"))] == (10.0,)
    assert got[("a", d("2023-01-01"))] == (None,)
    # row-based across the gap:
    assert got[("b", d("2023-03-01"))] == (100.0,)


def test_lag_multiple_horizons(panel):
    out = with_lag(panel, "ca", [1, 2]).collect()
    got = by_key(out, "ca_lag1m", "ca_lag2m")
    assert got[("a", d("2023-03-01"))] == (20.0, 10.0)
    assert got[("a", d("2023-02-01"))] == (10.0, None)


def test_diff(panel):
    out = with_diff(panel, "ca", 1).collect()
    got = by_key(out, "ca_diff1m")
    assert got[("a", d("2023-02-01"))] == (10.0,)
    assert got[("a", d("2023-01-01"))] == (None,)


def test_moving_average_is_calendar_aware(panel):
    """RANGE frame on month index: b's 3-month mean at 2023-03 covers
    Jan..Mar calendar months, i.e. rows {Jan, Mar} → (100+300)/2."""
    out = with_moving_average(panel, "ca", 3).collect()
    got = by_key(out, "ca_mean3m")
    assert got[("a", d("2023-03-01"))] == (20.0,)
    assert got[("b", d("2023-03-01"))] == (200.0,)
    # at 2023-04 the frame is Feb..Apr → rows {Mar, Apr} → 350
    assert got[("b", d("2023-04-01"))] == (350.0,)


def test_ffill_bfill(spark):
    df = spark.createDataFrame(
        [
            ("a", d("2023-01-01"), None),
            ("a", d("2023-02-01"), 2.0),
            ("a", d("2023-03-01"), None),
            ("a", d("2023-04-01"), 4.0),
        ],
        "siren string, `période` date, v double",
    )
    f = {r["période"]: r["vf"] for r in with_ffill(df, "v", out_fmt="vf").collect()}
    assert [f[d(x)] for x in ("2023-01-01", "2023-02-01", "2023-03-01", "2023-04-01")] == [
        None, 2.0, 2.0, 4.0,
    ]
    b = {r["période"]: r["vb"] for r in with_bfill(df, "v", out_fmt="vb").collect()}
    assert [b[d(x)] for x in ("2023-01-01", "2023-02-01", "2023-03-01", "2023-04-01")] == [
        2.0, 2.0, 4.0, 4.0,
    ]


def test_linear_interpolation(spark):
    df = spark.createDataFrame(
        [
            ("a", d("2023-01-01"), None),   # leading null stays
            ("a", d("2023-02-01"), 10.0),
            ("a", d("2023-03-01"), None),   # interior gap → 20
            ("a", d("2023-04-01"), 30.0),
            ("a", d("2023-05-01"), None),   # two-row gap → 40, 50
            ("a", d("2023-06-01"), None),
            ("a", d("2023-07-01"), 60.0),
            ("a", d("2023-08-01"), None),   # trailing null stays
        ],
        "siren string, `période` date, v double",
    )
    out = {r["période"]: r["vi"] for r in with_linear_interpolation(df, "v", out_fmt="vi").collect()}
    assert out[d("2023-01-01")] is None
    assert out[d("2023-03-01")] == 20.0
    assert out[d("2023-05-01")] == 40.0
    assert out[d("2023-06-01")] == 50.0
    assert out[d("2023-08-01")] is None
    assert out[d("2023-02-01")] == 10.0  # non-null rows untouched


def test_dedup_by_rank_deterministic(spark):
    df = spark.createDataFrame(
        [("k1", 1, 5.0), ("k1", 2, 9.0), ("k1", 3, 9.0), ("k2", 4, 1.0)],
        "k string, id int, v double",
    )
    out = dedup_by_rank(df, ["k"], [F.col("v").desc(), F.col("id").asc()]).collect()
    got = {r["k"]: (r["id"], r["v"]) for r in out}
    assert got == {"k1": (2, 9.0), "k2": (4, 1.0)}


def test_ewma_matches_pandas(spark):
    """with_ewma (closed-form running sums) equals pandas
    ``ewm(halflife=1, adjust=True).mean()`` per entity, including
    across a month gap (the index is row-positional, like the lag
    family)."""
    import pandas as pd

    from sf_datalake_spark.operators.windows import with_ewma

    rows = [
        ("a", d("2023-01-01"), 10.0),
        ("a", d("2023-02-01"), 20.0),
        ("a", d("2023-04-01"), 40.0),  # gap
        ("b", d("2023-01-01"), 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, `période` date, v double")
    out = {
        (r["k"], r["période"]): r["v_ewma"]
        for r in with_ewma(df, "v", keys=["k"]).collect()
    }
    for k, grp in pd.DataFrame(rows, columns=["k", "p", "v"]).groupby("k"):
        want = grp["v"].ewm(halflife=1, adjust=True).mean()
        for (_, row), w in zip(grp.iterrows(), want):
            assert abs(out[(k, row["p"])] - w) < 1e-9


def test_ewma_weights_restart_per_entity(spark):
    """Weights are row_number-based per entity, so a long panel in one
    entity cannot overflow/poison another's weights."""
    from sf_datalake_spark.operators.windows import with_ewma

    rows = [("long", d(f"20{10 + y:02d}-{m:02d}-01"), 1.0)
            for y in range(8) for m in range(1, 13)] + [("short", d("2023-01-01"), 7.0)]
    df = spark.createDataFrame(rows, "k string, `période` date, v double")
    out = with_ewma(df, "v", keys=["k"]).collect()
    by_k = {}
    for r in out:
        by_k.setdefault(r["k"], []).append(r["v_ewma"])
    assert all(abs(v - 1.0) < 1e-12 for v in by_k["long"])  # constant series
    assert by_k["short"] == [7.0]


def test_ewma_deep_panel_stays_finite(spark):
    """Regression: the naive 2^row_number weight overflows to inf past
    row 1023 and poisons the tail with NaN; the max-anchored weights
    must stay finite at any depth."""
    import math

    from sf_datalake_spark.operators.windows import with_ewma

    rows = [("a", d(f"{1900 + i // 12}-{i % 12 + 1:02d}-01"), 1.0)
            for i in range(1100)]
    df = spark.createDataFrame(rows, "k string, `période` date, v double")
    vals = [r["v_ewma"] for r in with_ewma(df, "v", keys=["k"]).collect()]
    assert len(vals) == 1100
    assert all(v is not None and math.isfinite(v) for v in vals)
    assert all(abs(v - 1.0) < 1e-12 for v in vals)  # constant series


def test_global_rank_two_pass_matches_single_sort(spark):
    from pyspark.sql import Window, functions as F

    from sf_datalake_spark.operators.windows import global_rank_two_pass

    df = spark.range(0, 500).select(
        F.col("id"),
        (F.col("id") * 37 % 101).alias("v"),  # ties + scrambled order
    )
    got = {
        r["id"]: r["global_rank"]
        for r in global_rank_two_pass(
            df, ["v", "id"], num_partitions=7
        ).collect()
    }
    ref = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == ref
    assert sorted(got.values()) == list(range(1, 501))  # dense, complete
