"""Saabas tree-path contributions: the additivity invariant
``base + Σ contrib_i == model output`` must hold row-exactly for every
supported ensemble (reference parity target:
``/root/reference/src/sf_datalake/explain.py:63-107`` TreeExplainer).
"""

from __future__ import annotations

import math

import pytest
from pyspark.ml.classification import GBTClassifier, RandomForestClassifier
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.functions import vector_to_array
from pyspark.ml.regression import DecisionTreeRegressor, RandomForestRegressor
from pyspark.sql import functions as F

from sf_datalake_spark.ml.explain import topic_contributions, tree_contributions


@pytest.fixture(scope="module")
def assembled(spark):
    # Nonlinear label so trees actually split on both features.
    rows = [
        (i, float(i % 17), float((i * 7) % 23), 1.0 if ((i % 17) * ((i * 7) % 23)) > 80 else 0.0)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id int, x1 double, x2 double, failure double")
    return VectorAssembler(inputCols=["x1", "x2"], outputCol="features").transform(df)


def _contrib_rows(preds, model, extra_col):
    out = tree_contributions(preds, model, keep=["id"])
    joined = out.join(preds.select("id", extra_col), "id")
    return joined.collect()


def test_rf_classifier_sums_to_probability(assembled):
    model = RandomForestClassifier(
        labelCol="failure", numTrees=7, maxDepth=4, seed=11
    ).fit(assembled)
    preds = model.transform(assembled).withColumn(
        "p1", F.element_at(vector_to_array("probability"), 2)
    )
    for r in _contrib_rows(preds, model, "p1"):
        total = r["base"] + r["contrib_x1"] + r["contrib_x2"]
        assert abs(total - r["p1"]) < 1e-9, r


def test_rf_regressor_sums_to_prediction(assembled):
    model = RandomForestRegressor(
        labelCol="failure", numTrees=5, maxDepth=4, seed=3
    ).fit(assembled)
    preds = model.transform(assembled)
    for r in _contrib_rows(preds, model, "prediction"):
        total = r["base"] + r["contrib_x1"] + r["contrib_x2"]
        assert abs(total - r["prediction"]) < 1e-9, r


def test_single_tree_regressor(assembled):
    model = DecisionTreeRegressor(labelCol="failure", maxDepth=3, seed=5).fit(assembled)
    preds = model.transform(assembled)
    for r in _contrib_rows(preds, model, "prediction"):
        total = r["base"] + r["contrib_x1"] + r["contrib_x2"]
        assert abs(total - r["prediction"]) < 1e-9, r


def test_gbt_classifier_sums_to_margin(assembled):
    model = GBTClassifier(labelCol="failure", maxIter=5, maxDepth=3, seed=9).fit(assembled)
    preds = model.transform(assembled).withColumn(
        "p1", F.element_at(vector_to_array("probability"), 2)
    )
    for r in _contrib_rows(preds, model, "p1"):
        margin = r["base"] + r["contrib_x1"] + r["contrib_x2"]
        # Spark GBT: P(1) = sigmoid(2 * margin)
        assert abs(1.0 / (1.0 + math.exp(-2.0 * margin)) - r["p1"]) < 1e-9, r


def test_tree_contribs_feed_topic_layer(assembled):
    model = RandomForestClassifier(
        labelCol="failure", numTrees=3, maxDepth=3, seed=2
    ).fit(assembled)
    out = tree_contributions(model.transform(assembled), model, keep=["id"])
    topics = topic_contributions(out, {"all": ["x1", "x2"]}, keep=["id"]).first()
    row = out.filter(F.col("id") == topics["id"]).first()
    assert abs(topics["topic_all"] - (row["contrib_x1"] + row["contrib_x2"])) < 1e-12


def test_shap_explanations_dispatches_by_model_type(assembled):
    """The shap-named parity entry point routes linear models to exact
    coef·x contributions (plus intercept base) and tree ensembles to
    Saabas contributions — no shap package involved."""
    from pyspark.ml.classification import LogisticRegression

    from sf_datalake_spark.ml.explain import shap_explanations

    lr = LogisticRegression(labelCol="failure", maxIter=10).fit(assembled)
    lin = shap_explanations(lr.transform(assembled), lr, keep=["id"])
    assert {"id", "base", "contrib_x1", "contrib_x2"} == set(lin.columns)
    row = lin.filter(F.col("id") == 3).collect()[0]
    assert abs(row["base"] - lr.intercept) < 1e-12

    rf = RandomForestRegressor(labelCol="failure", numTrees=3, seed=5).fit(assembled)
    preds = rf.transform(assembled)
    tree = shap_explanations(preds, rf, keep=["id"]).join(
        preds.select("id", "prediction"), "id"
    )
    for r in tree.collect():
        assert abs(r["base"] + r["contrib_x1"] + r["contrib_x2"] - r["prediction"]) < 1e-9

    with pytest.raises(ValueError, match="unsupported model"):
        shap_explanations(assembled, object())
