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


# ---------------------------------------------------------------------------
# Exact path-dependent TreeSHAP (Lundberg 2018 recursion)
# ---------------------------------------------------------------------------

def _hand_tree():
    """Depth-2 regression tree, hand-flattened:

        root: x0 <= 0.5 ?            cover 4
          L:  leaf value 0           cover 2
          R:  x1 <= 0.5 ?            cover 2
            RL: leaf value 10        cover 1
            RR: leaf value 20        cover 1

    Node values are cover-weighted subtree means (what Spark stores).
    """
    import numpy as np

    return {
        "feat": np.array([0, -1, 1, -1, -1]),
        "thr": np.array([0.5, 0.0, 0.5, 0.0, 0.0]),
        "left": np.array([1, -1, 3, -1, -1]),
        "right": np.array([2, -1, 4, -1, -1]),
        "val": np.array([7.5, 0.0, 15.0, 10.0, 20.0]),
        "cover": np.array([4.0, 2.0, 2.0, 1.0, 1.0]),
        "cats": {},
    }


def test_tree_shap_hand_computed_depth2():
    """x = (1, 1) on the hand tree: the four subset expectations are
    E(∅)=7.5, E({0})=15, E({1})=10, E({0,1})=20, so
    φ0 = ½(15−7.5)+½(20−10) = 8.75 and φ1 = ½(10−7.5)+½(20−15) = 3.75.
    Saabas on the same row gives (7.5, 5.0) — the depth-2 divergence
    TreeSHAP exists to fix."""
    import numpy as np

    from sf_datalake_spark.ml.explain import (
        _tree_path_contribs,
        _tree_shap_contribs,
    )

    tree = _hand_tree()
    X = np.array([[1.0, 1.0]])
    phi, base = _tree_shap_contribs(tree, X)
    assert base == 7.5
    assert abs(phi[0, 0] - 8.75) < 1e-12
    assert abs(phi[0, 1] - 3.75) < 1e-12
    saabas, _ = _tree_path_contribs(tree, X)
    assert abs(saabas[0, 0] - 7.5) < 1e-12 and abs(saabas[0, 1] - 5.0) < 1e-12


def _brute_force_shap(tree, x):
    """Exponential-time path-dependent SHAP (EXPVALUE of Lundberg 2018
    Algorithm 1 + the Shapley sum over all subsets) — the definition
    the polynomial recursion must reproduce."""
    import itertools
    import math as m

    feat, thr, left, right, val, cover, cats = (
        tree["feat"], tree["thr"], tree["left"], tree["right"],
        tree["val"], tree["cover"], tree["cats"],
    )

    def go_left(n):
        f = feat[n]
        if m.isnan(thr[n]):
            return x[f] in cats[n]
        return x[f] <= thr[n]

    def expvalue(n, S):
        if feat[n] < 0:
            return val[n]
        if feat[n] in S:
            return expvalue(left[n] if go_left(n) else right[n], S)
        return (
            expvalue(left[n], S) * cover[left[n]]
            + expvalue(right[n], S) * cover[right[n]]
        ) / cover[n]

    M = len(x)
    phi = [0.0] * M
    feats = list(range(M))
    for i in feats:
        others = [f for f in feats if f != i]
        for k in range(len(others) + 1):
            for S in itertools.combinations(others, k):
                w = m.factorial(k) * m.factorial(M - k - 1) / m.factorial(M)
                phi[i] += w * (expvalue(0, set(S) | {i}) - expvalue(0, set(S)))
    return phi


def test_tree_shap_matches_brute_force_on_random_trees():
    """Property check: on randomly-built trees (including repeated
    features along a path, which exercises the UNWIND merge) the
    polynomial recursion equals the exponential subset enumeration."""
    import numpy as np

    from sf_datalake_spark.ml.explain import _tree_shap_contribs

    rng = np.random.RandomState(7)
    for trial in range(6):
        # random binary tree of depth 3 over 3 features
        feat, thr, left, right, val, cover = [], [], [], [], [], []

        def build(depth, cov):
            idx = len(feat)
            if depth == 0 or (depth < 3 and rng.rand() < 0.3):
                feat.append(-1); thr.append(0.0)
                left.append(-1); right.append(-1)
                val.append(float(rng.randn() * 10)); cover.append(cov)
                return idx, val[idx] * cov
            feat.append(int(rng.randint(0, 3)))
            thr.append(float(rng.rand()))
            left.append(-1); right.append(-1)
            val.append(0.0); cover.append(cov)
            cl = float(cov) * float(rng.uniform(0.25, 0.75))
            l_idx, l_sum = build(depth - 1, cl)
            r_idx, r_sum = build(depth - 1, cov - cl)
            left[idx], right[idx] = l_idx, r_idx
            val[idx] = (l_sum + r_sum) / cov
            return idx, l_sum + r_sum

        build(3, 16.0)
        tree = {
            "feat": np.array(feat), "thr": np.array(thr),
            "left": np.array(left), "right": np.array(right),
            "val": np.array(val), "cover": np.array(cover), "cats": {},
        }
        for _ in range(4):
            x = rng.rand(3)
            phi, base = _tree_shap_contribs(tree, x.reshape(1, -1))
            expected = _brute_force_shap(tree, x)
            for i in range(3):
                assert abs(phi[0, i] - expected[i]) < 1e-9, (trial, i)
            # additivity: base + Σφ = leaf value of the observed path
            node = 0
            while tree["feat"][node] >= 0:
                node = (
                    tree["left"][node]
                    if x[tree["feat"][node]] <= tree["thr"][node]
                    else tree["right"][node]
                )
            assert abs(base + phi.sum() - tree["val"][node]) < 1e-9


def test_tree_shap_equals_saabas_on_depth1(assembled):
    """On stumps the two attributions coincide (single split: the only
    subset expectation IS the observed path)."""
    model = RandomForestRegressor(
        labelCol="failure", numTrees=4, maxDepth=1, seed=13
    ).fit(assembled)
    preds = model.transform(assembled)
    sa = tree_contributions(preds, model, keep=["id"], method="saabas")
    ts = tree_contributions(preds, model, keep=["id"], method="tree_shap")
    joined = sa.select(
        "id", F.col("contrib_x1").alias("s1"), F.col("contrib_x2").alias("s2")
    ).join(ts, "id")
    for r in joined.collect():
        assert abs(r["s1"] - r["contrib_x1"]) < 1e-9
        assert abs(r["s2"] - r["contrib_x2"]) < 1e-9


def test_tree_shap_additivity_rf_classifier(assembled):
    """End-to-end on a fitted depth-4 forest: base + Σφ = P(class 1)
    row-exactly, while differing from Saabas per-feature (depth > 1)."""
    model = RandomForestClassifier(
        labelCol="failure", numTrees=5, maxDepth=4, seed=11
    ).fit(assembled)
    preds = model.transform(assembled).withColumn(
        "p1", F.element_at(vector_to_array("probability"), 2)
    )
    out = tree_contributions(preds, model, keep=["id"], method="tree_shap")
    joined = out.join(preds.select("id", "p1"), "id")
    rows = joined.collect()
    for r in rows:
        assert abs(r["base"] + r["contrib_x1"] + r["contrib_x2"] - r["p1"]) < 1e-9
    sa = {
        r["id"]: r["contrib_x1"]
        for r in tree_contributions(preds, model, keep=["id"]).collect()
    }
    assert any(abs(sa[r["id"]] - r["contrib_x1"]) > 1e-6 for r in rows)


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


def test_tree_contributions_both_matches_individual_methods(assembled):
    """method="both" (one Arrow pass) must reproduce the tree_shap and
    saabas outputs exactly, column for column."""
    model = RandomForestClassifier(
        labelCol="failure", numTrees=5, maxDepth=4, seed=11
    ).fit(assembled)
    preds = model.transform(assembled)
    fused = {
        r["id"]: r
        for r in tree_contributions(preds, model, keep=["id"],
                                    method="both").collect()
    }
    shap = {
        r["id"]: r
        for r in tree_contributions(preds, model, keep=["id"],
                                    method="tree_shap").collect()
    }
    sa = {
        r["id"]: r
        for r in tree_contributions(preds, model, keep=["id"],
                                    method="saabas").collect()
    }
    assert set(fused) == set(shap) == set(sa)
    for i, row in fused.items():
        for c in ("x1", "x2"):
            assert row[f"contrib_{c}"] == shap[i][f"contrib_{c}"]
            assert row[f"saabas_{c}"] == sa[i][f"contrib_{c}"]
        assert row["base"] == shap[i]["base"] == sa[i]["base"]
