"""Configuration precedence + time-aggregate expansion tests."""

from __future__ import annotations

import json

import pytest

from sf_datalake_spark.config import Configuration


def test_defaults():
    cfg = Configuration()
    assert cfg.learning.model_name == "LogisticRegression"
    assert cfg.preprocessing.identifiers == ["siren", "période"]
    assert cfg.io.random_seed == 42


def test_precedence_file_then_cli(tmp_path):
    p = tmp_path / "run.json"
    p.write_text(json.dumps({"model_name": "GBTClassifier", "sample_ratio": 0.5}))
    cfg = Configuration(config_file=str(p), cli_args={"sample_ratio": 0.1})
    assert cfg.learning.model_name == "GBTClassifier"   # file beats default
    assert cfg.io.sample_ratio == 0.1                    # cli beats file


def test_unknown_key_rejected():
    with pytest.raises(ValueError, match="nonexistent_knob"):
        Configuration(cli_args={"nonexistent_knob": 1})


def test_time_aggregate_expansion_excludes_diff():
    cfg = Configuration(
        cli_args={
            "features_transformers": {"ca": ["standard_scaler"]},
            "time_aggregation": {
                "lag": {"ca": [1, 12]},
                "mean": {"ca": [3]},
                "diff": {"ca": [6]},         # deliberately NOT expanded
                "lag2": {"other": [1]},      # var absent from transformers
            },
        }
    )
    ft = cfg.preprocessing.features_transformers
    assert ft["ca_lag1m"] == ["standard_scaler"]
    assert ft["ca_lag12m"] == ["standard_scaler"]
    assert ft["ca_mean3m"] == ["standard_scaler"]
    assert "ca_diff6m" not in ft
    assert "other_lag21m" not in ft


def test_dump_roundtrip(spark, tmp_path):
    cfg = Configuration(cli_args={"model_name": "RandomForestClassifier"})
    out = str(tmp_path / "cfg_out")
    cfg.dump(spark, out)
    text = spark.read.text(out).first()["value"]
    assert json.loads(text)["learning"]["model_name"] == "RandomForestClassifier"
