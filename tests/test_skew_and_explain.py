"""Tests for skew mitigation, statistical imputation, topic rollups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sf_datalake_spark.operators.skew import salted_aggregate, salted_join
from sf_datalake_spark.ml.explain import topic_contributions
from sf_datalake_spark.transformers import MissingValuesHandler


@pytest.fixture()
def skewed(spark):
    # one hot key (90% of rows) + a tail
    rows = [("hot", float(i % 10)) for i in range(900)]
    rows += [(f"k{i}", float(i)) for i in range(100)]
    return spark.createDataFrame(rows, "k string, v double")


def test_salted_aggregate_matches_plain(skewed):
    plain = {
        r["k"]: (r["s"], r["n"], r["mn"], r["mx"], r["a"])
        for r in skewed.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("n"),
             F.min("v").alias("mn"), F.max("v").alias("mx"),
             F.avg("v").alias("a"))
        .collect()
    }
    salted = {
        r["k"]: (r["v_sum"], r["v_cnt"], r["v_min"], r["v_max"], r["v_avg"])
        for r in salted_aggregate(
            skewed.select("k", F.col("v").alias("v_sum"),
                          F.col("v").alias("v_cnt"), F.col("v").alias("v_min"),
                          F.col("v").alias("v_max"), F.col("v").alias("v_avg")),
            ["k"],
            {"v_sum": "sum", "v_cnt": "count", "v_min": "min",
             "v_max": "max", "v_avg": "avg"},
        ).collect()
    }
    assert plain.keys() == salted.keys()
    for k in plain:
        for p, s in zip(plain[k], salted[k]):
            assert abs(p - s) < 1e-9, k


def test_salted_aggregate_rejects_non_algebraic(skewed):
    with pytest.raises(ValueError, match="not algebraic"):
        salted_aggregate(skewed, ["k"], {"v": "stddev"})


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "K1"), ("k2", "K2")], "k string, label string"
    )
    plain = skewed.join(dim, "k").groupBy("k", "label").count()
    salted = salted_join(skewed, dim, ["k"]).groupBy("k", "label").count()
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salted_left_join_keeps_unmatched(spark, skewed):
    dim = spark.createDataFrame([("hot", "HOT")], "k string, label string")
    out = salted_join(skewed, dim, ["k"], how="left")
    assert out.count() == 1000
    assert out.filter(F.col("label").isNull()).count() == 100


def test_median_imputation(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (9.0,), (None,)], "x double"
    )
    out = MissingValuesHandler(strategy="median", inputCols=["x"]).transform(df)
    assert sorted(r["x"] for r in out.collect()) == [1.0, 2.0, 2.0, 9.0]


def test_topic_contributions(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 2.0, 4.0)],
        "siren string, contrib_ca double, contrib_ca_lag1m double, contrib_dette double",
    )
    out = topic_contributions(
        df,
        {"activity": ["ca", "ca_lag1m"], "debt": ["dette", "missing_feature"]},
        keep=["siren"],
    ).first()
    assert out["topic_activity"] == 3.0
    assert out["topic_debt"] == 4.0
