"""Learning layer: stage synthesis, model factory, evaluation, explain."""

from sf_datalake_spark.ml.evaluation import (
    binary_metrics,
    confusion_matrix,
    confusion_matrix_df,
    optimal_fbeta_thresholds,
    threshold_histogram_df,
    with_alert_levels,
)
from sf_datalake_spark.ml.explain import (
    feature_names_from_metadata,
    linear_contributions,
    shap_explanations,
    tree_contributions,
    vector_disassembler,
)
from sf_datalake_spark.ml.models import fit_ready, make_classifier
from sf_datalake_spark.ml.stages import encoding_scaling_stages

__all__ = [
    "binary_metrics",
    "confusion_matrix",
    "confusion_matrix_df",
    "encoding_scaling_stages",
    "threshold_histogram_df",
    "feature_names_from_metadata",
    "linear_contributions",
    "shap_explanations",
    "fit_ready",
    "make_classifier",
    "optimal_fbeta_thresholds",
    "tree_contributions",
    "vector_disassembler",
    "with_alert_levels",
]
