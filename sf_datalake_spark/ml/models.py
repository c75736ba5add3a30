"""Classifier factory.

Reference behavior replaced: the model zoo + hyperparameter defaults of
``configuration/__init__.py:85-121`` (LogisticRegression /
RandomForestClassifier / GBTClassifier with config-driven params).
"""

from __future__ import annotations

from pyspark.ml.classification import (
    GBTClassifier,
    LogisticRegression,
    RandomForestClassifier,
)

_MODELS = {
    "LogisticRegression": LogisticRegression,
    "RandomForestClassifier": RandomForestClassifier,
    "GBTClassifier": GBTClassifier,
}


def make_classifier(
    name: str,
    features_col: str = "features",
    label_col: str = "failure",
    **params,
):
    """Instantiate a classifier by name with keyword hyperparameters.

    Example::

        make_classifier("LogisticRegression", regParam=0.1, maxIter=50)
    """
    if name not in _MODELS:
        raise ValueError(f"Unknown model: {name}; choose from {sorted(_MODELS)}")
    return _MODELS[name](featuresCol=features_col, labelCol=label_col, **params)


_MODEL_CLASSES = {
    "LogisticRegression": "pyspark.ml.classification.LogisticRegressionModel",
    "RandomForestClassifier": "pyspark.ml.classification.RandomForestClassificationModel",
    "GBTClassifier": "pyspark.ml.classification.GBTClassificationModel",
}


def load_classifier(name: str, path: str):
    """Load a previously saved fitted classifier by estimator name."""
    import importlib

    if name not in _MODEL_CLASSES:
        raise ValueError(f"Unknown model: {name}; choose from {sorted(_MODEL_CLASSES)}")
    module, cls = _MODEL_CLASSES[name].rsplit(".", 1)
    return getattr(importlib.import_module(module), cls).load(path)
