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


# ---------------------------------------------------------------------------
# Correlation-dependent linear SHAP (reference explain.py:45-62 semantics)
# ---------------------------------------------------------------------------

def _shapley_conditional_reference(x, mu, cov, w):
    """Independent oracle: brute-force enumeration of all M! orderings
    using the Gaussian conditional-expectation value function — the
    definition linear_conditional_contributions' transform matrix must
    reproduce."""
    import itertools
    import math

    import numpy as np

    x, mu, w = np.asarray(x, float), np.asarray(mu, float), np.asarray(w, float)
    M = len(w)

    def v(S):
        if not S:
            return float(w @ mu)
        S = list(S)
        ex = mu.copy()
        A = cov[:, S] @ np.linalg.pinv(cov[np.ix_(S, S)])
        ex = mu + A @ (x[S] - mu[S])
        ex[S] = x[S]
        return float(w @ ex)

    phi = np.zeros(M)
    for perm in itertools.permutations(range(M)):
        S = []
        for i in perm:
            phi[i] += v(S + [i]) - v(S)
            S.append(i)
    return phi / math.factorial(M)


def _lin_model(coefs, intercept):
    from types import SimpleNamespace

    return SimpleNamespace(coefficients=list(coefs), intercept=intercept)


def _vec_df(spark, rows):
    from pyspark.ml.linalg import Vectors

    return spark.createDataFrame(
        [(i, Vectors.dense(r)) for i, r in enumerate(rows)],
        ["id", "features"],
    )


def test_conditional_contributions_match_bruteforce_3_features(spark):
    """Hand-checkable 3-feature case: the distributed cov-agg + transform
    matrix reproduces the M!-enumeration Shapley values row by row."""
    import numpy as np

    from sf_datalake_spark.ml.explain import linear_conditional_contributions

    rows = [
        [1.0, 2.0, 0.0],
        [2.0, 4.5, 1.0],
        [3.0, 5.5, 1.0],
        [4.0, 8.0, 0.0],
        [0.0, 1.0, 5.0],
        [2.5, 5.0, 2.0],
    ]
    w, b = [0.5, -0.25, 1.0], 0.1
    X = np.array(rows)
    mu, cov = X.mean(axis=0), np.cov(X.T, ddof=0)

    out = linear_conditional_contributions(
        _vec_df(spark, rows), _lin_model(w, b),
        keep=["id"], feature_names=["f0", "f1", "f2"],
    ).orderBy("id").collect()

    for r, x in zip(out, rows):
        expected = _shapley_conditional_reference(x, mu, cov, w)
        got = np.array([r["contrib_f0"], r["contrib_f1"], r["contrib_f2"]])
        assert np.allclose(got, expected, atol=1e-9), (x, got, expected)
        # additivity: base + sum(phi) == w.x + b
        assert abs(r["base"] + got.sum() - (np.dot(w, x) + b)) < 1e-9


def test_conditional_equals_interventional_when_uncorrelated(spark):
    """Full-factorial design -> diagonal empirical covariance -> the
    conditional attribution collapses to coef_i * (x_i - mu_i)."""
    import numpy as np

    from sf_datalake_spark.ml.explain import linear_conditional_contributions

    rows = [[-1.0, -1.0], [-1.0, 1.0], [1.0, -1.0], [1.0, 1.0]]
    w = [2.0, -3.0]
    out = linear_conditional_contributions(
        _vec_df(spark, rows), _lin_model(w, 0.0),
        keep=["id"], feature_names=["a", "b"],
    ).orderBy("id").collect()
    for r, x in zip(out, rows):
        assert abs(r["contrib_a"] - w[0] * x[0]) < 1e-9  # mu = 0
        assert abs(r["contrib_b"] - w[1] * x[1]) < 1e-9


def test_conditional_splits_credit_between_collinear_features(spark):
    """Two perfectly collinear features split their shared effect
    ~evenly — the signature difference from interventional coef.x,
    where each would get its full own-coefficient credit."""
    from sf_datalake_spark.ml.explain import linear_conditional_contributions

    rows = [[float(i), float(i)] for i in range(6)]
    out = linear_conditional_contributions(
        _vec_df(spark, rows), _lin_model([1.0, 3.0], 0.0),
        keep=["id"], feature_names=["a", "b"],
    ).orderBy("id").collect()
    for r, x in zip(out, rows):
        centered = x[0] - 2.5
        assert abs(r["contrib_a"] - 2.0 * centered) < 1e-9  # (1+3)/2
        assert abs(r["contrib_b"] - 2.0 * centered) < 1e-9


def test_conditional_sampled_path_additivity(spark):
    """Forcing the seeded permutation-sampling estimator (exact_max=1):
    each sampled ordering telescopes, so additivity is still exact, and
    the seed makes the output deterministic across calls."""
    import numpy as np

    from sf_datalake_spark.ml.explain import linear_conditional_contributions

    rows = [
        [1.0, 2.0, 0.0],
        [2.0, 4.5, 1.0],
        [3.0, 5.5, 1.0],
        [0.0, 1.0, 5.0],
    ]
    w, b = [0.5, -0.25, 1.0], -0.2
    kw = dict(keep=["id"], feature_names=["f0", "f1", "f2"],
              exact_max=1, n_perms=64, seed=7)
    df = _vec_df(spark, rows)
    model = _lin_model(w, b)
    out1 = linear_conditional_contributions(df, model, **kw).orderBy("id").collect()
    out2 = linear_conditional_contributions(df, model, **kw).orderBy("id").collect()
    for r1, r2, x in zip(out1, out2, rows):
        total = r1["base"] + r1["contrib_f0"] + r1["contrib_f1"] + r1["contrib_f2"]
        assert abs(total - (np.dot(w, x) + b)) < 1e-9
        for c in ("contrib_f0", "contrib_f1", "contrib_f2"):
            assert r1[c] == r2[c]
