"""Front-end document generation tests (rescaling + JSON sink)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sf_datalake_spark.ml.frontend import (
    build_alert_documents,
    rescale_contributions,
    rescale_micro_to_topics,
)


def test_rescale_micro_to_topics(spark):
    """Per-topic reconciliation: member contributions rescale to sum to
    their topic's score, topic by topic."""
    df = spark.createDataFrame(
        [("a", 1.0, 3.0, 5.0, 0.8, 2.0)],
        "siren string, contrib_ca double, contrib_ca_lag1m double, "
        "contrib_dette double, topic_activity double, topic_debt double",
    )
    out = rescale_micro_to_topics(
        df, {"activity": ["ca", "ca_lag1m"], "debt": ["dette"]}, keep=["siren"]
    ).first()
    assert abs(out["contrib_ca"] + out["contrib_ca_lag1m"] - 0.8) < 1e-12
    assert abs(out["contrib_ca"] - 0.2) < 1e-12          # 1:3 shares kept
    assert out["contrib_dette"] == 2.0                    # rescaled to topic


def test_rescale_contributions_sums_to_score(spark):
    df = spark.createDataFrame(
        [("a", 0.8, 1.0, 3.0), ("b", 0.5, 0.0, 0.0)],
        "siren string, probability double, c1 double, c2 double",
    )
    out = {r["siren"]: r for r in
           rescale_contributions(df, ["c1", "c2"], keep=["siren"]).collect()}
    assert abs(out["a"]["c1"] + out["a"]["c2"] - 0.8) < 1e-12
    assert abs(out["a"]["c1"] - 0.2) < 1e-12      # shares preserved 1:3
    assert out["b"]["c1"] == 0.0                   # zero-total guard


def test_build_alert_documents_json_roundtrip(spark, tmp_path):
    preds = spark.createDataFrame(
        [("000000001", 0.9, 0.7), ("000000002", 0.4, 0.1), ("000000003", 0.05, 0.02)],
        "siren string, probability double, topic_debt double",
    )
    docs = build_alert_documents(
        preds, {0.5: 0.8, 2.0: 0.3}, topic_cols=["topic_debt"]
    )
    got = {r["siren"]: r for r in docs.collect()}
    assert got["000000001"]["alert"] == "Alerte seuil F1/2"
    assert got["000000002"]["alert"] == "Alerte seuil F2"
    assert got["000000003"]["alert"] == "Pas d'alerte"
    assert got["000000001"]["scores"]["debt"] == 0.7

    out = str(tmp_path / "docs_json")
    docs.write.json(out)
    lines = [json.loads(l) for p in __import__("pathlib").Path(out).glob("*.json")
             for l in p.read_text().splitlines()]
    assert len(lines) == 3
    assert {l["siren"] for l in lines} == {"000000001", "000000002", "000000003"}
