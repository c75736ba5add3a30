"""Front-end document generation.

Reference behavior replaced:
``postprocessing/generate_frontend_document.py`` (§3.3 of SURVEY.md):
threshold-based alert levels, waterfall rescaling of explanation scores,
and the merged per-entity JSON alert document. The reference does all of
this in driver pandas after collecting; here every step is a DataFrame
transformation and the sink is ``df.write.json`` — the driver never
holds the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sf_datalake_spark.ml.evaluation import with_alert_levels


def rescale_contributions(
    df: DataFrame,
    contrib_cols: list[str],
    target_col: str = "probability",
    keep: list[str] | None = None,
) -> DataFrame:
    """Waterfall rescaling (reference
    ``generate_frontend_document.py:169-185``): scale each row's
    contribution columns by a common factor so they sum exactly to the
    row's final score — keeps per-feature shares while matching the
    displayed probability."""
    if not contrib_cols:
        raise ValueError("contrib_cols must not be empty")
    # null-safe total (pandas .sum skips NaN): one NULL contribution must
    # not null the whole row's factor
    total = None
    for c in contrib_cols:
        term = F.coalesce(F.col(c), F.lit(0.0))
        total = term if total is None else total + term
    factor = F.when(total != 0, F.col(target_col) / total).otherwise(F.lit(0.0))
    return df.select(
        *(keep or []),
        target_col,
        *[(F.col(c) * factor).alias(c) for c in contrib_cols],
    )


def rescale_micro_to_topics(
    df: DataFrame,
    topic_groups: dict[str, list[str]],
    prefix: str = "contrib_",
    topic_prefix: str = "topic_",
    keep: list[str] | None = None,
) -> DataFrame:
    """Micro/macro reconciliation (reference
    ``postprocessing/micro_macro_link.py:13-44``): within each topic,
    scale the member features' contributions by a common per-row factor
    so they sum exactly to the topic's score — the drill-down waterfall
    stays consistent with the topic chart. Distributed Column arithmetic
    (the reference loops dicts on the driver)."""
    all_members = [f for fs in topic_groups.values() for f in fs]
    dupes = {f for f in all_members if all_members.count(f) > 1}
    if dupes:
        raise ValueError(
            f"Feature(s) {sorted(dupes)} appear in multiple topics — the "
            "rescaled output would carry duplicate column names"
        )
    cols = set(df.columns)
    out_cols = []
    for topic, features in topic_groups.items():
        members = [f"{prefix}{f}" for f in features if f"{prefix}{f}" in cols]
        topic_col = f"{topic_prefix}{topic}"
        if not members or topic_col not in cols:
            continue
        total = F.col(members[0])
        for m in members[1:]:
            total = total + F.col(m)
        factor = F.when(total != 0, F.col(topic_col) / total).otherwise(F.lit(0.0))
        out_cols += [(F.col(m) * factor).alias(m) for m in members]
    return df.select(*(keep or []), *out_cols)


def build_alert_documents(
    predictions: DataFrame,
    thresholds: dict[float, float],
    entity_col: str = "siren",
    score_col: str = "probability",
    topic_cols: list[str] | None = None,
    period_col: str | None = None,
) -> DataFrame:
    """One JSON-ready row per (entity, period): id, score, alert level,
    and a ``scores`` map of topic explanations (reference
    ``generate_frontend_document.py:243-271``; the reference REJECTS
    duplicate entities — pass ``period_col`` when predictions are a
    panel so each document is unambiguous, or pre-reduce to one row per
    entity first). Write with ``df.write.json(path)`` — distributed, no
    driver collect."""
    with_levels = with_alert_levels(predictions, thresholds, score_col=score_col)
    # exact reference category strings (generate_frontend_document.py:226)
    alert_label = (
        F.when(F.col("alert_level") == 2, "Alerte seuil F1/2")
        .when(F.col("alert_level") == 1, "Alerte seuil F2")
        .otherwise("Pas d'alerte")
    )
    topic_cols = topic_cols or []
    scores = (
        F.create_map(
            *[x for c in topic_cols for x in (F.lit(c.removeprefix("topic_")), F.col(c))]
        )
        if topic_cols
        else F.create_map()
    )
    period_fields = (
        [F.col(period_col).cast("string").alias("periode")] if period_col else []
    )
    return with_levels.select(
        F.col(entity_col).alias("siren"),
        *period_fields,
        F.round(F.col(score_col), 6).alias("score"),
        F.col("alert_level"),
        alert_label.alias("alert"),
        scores.alias("scores"),
    )
