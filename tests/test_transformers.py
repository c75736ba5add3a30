"""Golden tests for the Transformer extension API — including Pipeline
composition (the reference's whole preprocessing runs as one
PipelineModel, ``post_join_processing.py:164-166``)."""

from __future__ import annotations

import pytest
from pyspark.ml import Pipeline
from pyspark.sql import functions as F

from sf_datalake_spark.transformers import (
    BinsOrdinalEncoder,
    ColumnSelector,
    DateParser,
    DateRangeFilter,
    DiffTransformer,
    IdentifierNormalizer,
    IsInFilter,
    KeyAggregator,
    LagTransformer,
    LinearInterpolationTransformer,
    MissingValuesDropper,
    MissingValuesHandler,
    MovingAverageTransformer,
    NotNullFilter,
    SiretToSiren,
    SqlExprFilter,
    TargetVariable,
    TimeNormalizer,
)

from tests.conftest import d


def test_identifier_normalizer(spark):
    df = spark.createDataFrame([(123,), (987654321,)], "siren int")
    out = [r["siren"] for r in IdentifierNormalizer(inputCol="siren", n_pad=9)
           .transform(df).collect()]
    assert out == ["000000123", "987654321"]


def test_siret_to_siren(spark):
    df = spark.createDataFrame([("12345678901234",)], "siret string")
    assert SiretToSiren().transform(df).first()["siren"] == "123456789"


def test_date_parser(spark):
    df = spark.createDataFrame([("20230115",)], "raw string")
    out = DateParser(inputCol="raw", outputCol="date").transform(df).first()
    assert out["date"] == d("2023-01-15")


def test_target_variable(spark):
    df = spark.createDataFrame(
        [
            ("a", d("2023-01-01"), d("2024-01-01")),   # 12m away → 1
            ("b", d("2023-01-01"), d("2024-12-01")),   # 23m away → 0
            ("c", d("2023-01-01"), None),              # unknown → 0
        ],
        "siren string, `période` date, date_jugement date",
    )
    out = {r["siren"]: r["failure"] for r in
           TargetVariable(n_months=18).transform(df).collect()}
    assert out == {"a": 1, "b": 0, "c": 0}


def test_filters(spark):
    df = spark.createDataFrame(
        [("1", "O", 1.0, d("2023-01-01")), ("2", "C", None, d("2023-06-01")),
         ("3", "C", 3.0, d("2024-01-01"))],
        "siren string, code_naf string, paydex double, `période` date",
    )
    assert SqlExprFilter(expr="code_naf NOT IN ('O', 'P')").transform(df).count() == 2
    assert NotNullFilter(inputCols=["paydex"]).transform(df).count() == 2
    assert IsInFilter(inputCol="siren", values=["1", "3"]).transform(df).count() == 2
    got = DateRangeFilter(start="2023-03-01", end="2023-12-31").transform(df).collect()
    assert [r["siren"] for r in got] == ["2"]


def test_missing_values_handler_value_and_ffill(spark):
    df = spark.createDataFrame(
        [("a", d("2023-01-01"), 1.0), ("a", d("2023-02-01"), None)],
        "siren string, `période` date, ca double",
    )
    filled = MissingValuesHandler(strategy="value", value={"ca": 0.0}).transform(df)
    assert {r["ca"] for r in filled.collect()} == {1.0, 0.0}
    ffilled = MissingValuesHandler(strategy="ffill", inputCols=["ca"]).transform(df)
    assert sorted(r["ca"] for r in ffilled.collect()) == [1.0, 1.0]


def test_missing_values_dropper(spark):
    df = spark.createDataFrame([(1.0, 2.0), (None, 5.0)], "x double, y double")
    assert MissingValuesDropper(inputCols=["x"]).transform(df).count() == 1


def test_time_normalizer(spark):
    df = spark.createDataFrame(
        [(100.0, d("2023-01-01"), d("2023-01-11"))], "v double, s date, e date"
    )
    out = TimeNormalizer(inputCols=["v"], start="s", end="e").transform(df).first()
    assert out["v"] == 10.0


def test_key_aggregator(spark):
    df = spark.createDataFrame(
        [("a", d("2023-01-01"), 1.0), ("a", d("2023-01-01"), 2.0)],
        "siren string, `période` date, cotisation double",
    )
    out = KeyAggregator(agg={"cotisation": "sum"}).transform(df).first()
    assert out["cotisation"] == 3.0


def test_bins_ordinal_encoder_inf_endpoints(spark):
    df = spark.createDataFrame([(-5.0,), (0.5,), (99.0,)], "x double")
    out = BinsOrdinalEncoder(inputCol="x", bins=["-inf", 0.0, 1.0, "inf"]) \
        .transform(df).collect()
    assert [r["x_bin"] for r in out] == [0.0, 1.0, 2.0]


def test_pipeline_composition_single_shuffle(spark):
    """The reference's post-join shape: label + lag/diff/ma stack + fill,
    composed as ONE Pipeline; all window stages share one exchange."""
    df = spark.createDataFrame(
        [
            ("a", d("2023-01-01"), 10.0, d("2023-09-01")),
            ("a", d("2023-02-01"), 20.0, d("2023-09-01")),
            ("a", d("2023-03-01"), 30.0, d("2023-09-01")),
        ],
        "siren string, `période` date, ca double, date_jugement date",
    )
    pipe = Pipeline(stages=[
        TargetVariable(n_months=18),
        LagTransformer(inputCols=["ca"], nMonths=[1]),
        DiffTransformer(inputCols=["ca"], nMonths=[1]),
        MovingAverageTransformer(inputCols=["ca"], nMonths=[2]),
        MissingValuesHandler(strategy="value", value={"ca_lag1m": 0.0}),
    ])
    out = pipe.fit(df).transform(df)
    rows = {r["période"]: r for r in out.collect()}
    assert rows[d("2023-02-01")]["ca_lag1m"] == 10.0
    assert rows[d("2023-01-01")]["ca_lag1m"] == 0.0          # filled
    assert rows[d("2023-03-01")]["ca_diff1m"] == 10.0
    assert rows[d("2023-03-01")]["ca_mean2m"] == 25.0
    assert all(r["failure"] == 1 for r in rows.values())
    # one Exchange for the whole window stack (count the AQE final plan
    # only — toString repeats it in the "Initial Plan" section)
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1


def test_linear_interpolation_transformer(spark):
    df = spark.createDataFrame(
        [("a", d("2023-01-01"), 1.0), ("a", d("2023-02-01"), None),
         ("a", d("2023-03-01"), 3.0)],
        "siren string, `période` date, v double",
    )
    out = LinearInterpolationTransformer(inputCols=["v"]).transform(df)
    assert {r["v"] for r in out.collect()} == {1.0, 2.0, 3.0}


def test_column_selector(spark):
    df = spark.createDataFrame([(1, "x", 2.0)], "a int, b string, c double")
    assert ColumnSelector(inputCols=["a", "c"]).transform(df).columns == ["a", "c"]
