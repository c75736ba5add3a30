"""Fellegi–Sunter record linkage scoring — blocked candidate pairs,
integer log-likelihood weights, three-way link decision.

Training-data-pipeline operator (beyond the reference's surface):
joining two sources that share no reliable key (CRM vs billing,
scraped vs canonical) is a probabilistic decision, not an equi-join.
The Fellegi–Sunter model (JASA 1969 — public domain methodology)
scores each candidate pair by summing per-field agreement weights
log(m/u) (agreement) or log((1-m)/(1-u)) (disagreement), where m is
the agreement probability among true matches and u among non-matches;
the total log-likelihood ratio is thresholded into
link / possible-link / non-link.

Exact-arithmetic contract: weights enter as integers scaled ×1e6
(micro-nats, pre-computed from the m/u estimates offline), so a
pair's score is a BIGINT sum — bit-exact across engines, hashable by
the strict oracle gate.  Estimating m/u (EM over the comparison-vector
histogram) is an offline calibration step, not part of the scoring
scan.

Scale design: this operator scores CANDIDATES — the caller blocks
first (equi-join on a coarse key: postcode, name prefix, nation — or
the LSH/phonetic blockers from ``operators/dedup.py``/``fuzzy.py``),
so the cross product never materializes. Scoring itself is a pure
projection over the candidate frame: zero extra shuffles, fully
codegen'd, pushdown-transparent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fellegi_sunter_score(
    candidates: DataFrame,
    comparisons: Sequence[tuple[Column, int, int]],
    link_threshold: int,
    possible_threshold: int,
    score_col: str = "fs_score_micro",
    class_col: str = "match_class",
) -> DataFrame:
    """Score blocked candidate pairs and attach the three-way decision.

    ``comparisons``: one ``(agrees, w_agree_micro, w_disagree_micro)``
    per compared field — ``agrees`` is any boolean Column over the pair
    row; the weights are the (scaled ×1e6) log-likelihood contributions
    for agreement / disagreement. A NULL comparison (missing field)
    contributes 0 — the FS convention for unobserved comparisons.

    Decision: score ≥ ``link_threshold`` → ``link``; ≥
    ``possible_threshold`` → ``possible``; else ``non_link``.
    """
    score = None
    for agrees, w_a, w_d in comparisons:
        term = (
            F.when(agrees.isNull(), F.lit(0))
            .when(agrees, F.lit(int(w_a)))
            .otherwise(F.lit(int(w_d)))
            .cast("bigint")
        )
        score = term if score is None else (score + term)
    out = candidates.withColumn(score_col, score)
    return out.withColumn(
        class_col,
        F.when(F.col(score_col) >= link_threshold, F.lit("link"))
        .when(F.col(score_col) >= possible_threshold, F.lit("possible"))
        .otherwise(F.lit("non_link")),
    )
