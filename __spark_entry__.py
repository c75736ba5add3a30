"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship panel query on sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the training-data-pipeline layer, each with a DuckDB
oracle. Implementation lives in ``sf_datalake_spark/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sf_datalake_spark.queries import ORACLES, QUERIES  # noqa: E402
from sf_datalake_spark.queries_corpus import ORACLES_CORPUS, QUERIES_CORPUS  # noqa: E402
from sf_datalake_spark.queries_ext import ORACLES_EXT, QUERIES_EXT  # noqa: E402
from sf_datalake_spark.queries_rel import ORACLES_REL, QUERIES_REL  # noqa: E402
from sf_datalake_spark.queries_sketch import ORACLES_SKETCH, QUERIES_SKETCH  # noqa: E402
from sf_datalake_spark.queries_tpch import ORACLES_TPCH, QUERIES_TPCH  # noqa: E402

# queries_sketch/queries_tpch are merged LAST so their (post-r02)
# entries append after the fresh-oracled block and cannot displace any
# of the 50 queries the r03 rotation puts in front of the driver's
# snapshot cap.
QUERIES = {**QUERIES, **QUERIES_EXT, **QUERIES_REL, **QUERIES_CORPUS,
           **QUERIES_SKETCH, **QUERIES_TPCH}
ORACLES = {**ORACLES, **ORACLES_EXT, **ORACLES_REL, **ORACLES_CORPUS,
           **ORACLES_SKETCH, **ORACLES_TPCH}

# Names the driver's 50-entry CORRECTNESS_r02 snapshot already attested.
# The driver caps correctness snapshots at the first 50 registry entries,
# so we rotate: queries it has never checked go first (oracled ones ahead
# of rows-only ones), previously-attested ones last.  The union of
# CORRECTNESS_r02 + r03 then covers essentially the whole registry.
_R02_ATTESTED = frozenset({
    "pricing_summary", "revenue_by_nation", "monthly_panel", "panel_lag",
    "panel_diff", "panel_moving_avg", "target_variable", "semi_join_active",
    "anti_join_inactive", "range_join_months", "spread_over_months",
    "key_aggregate", "clip_values", "null_counts", "dedup_keep_best",
    "json_extract", "hash_split", "daily_ffill", "asof_backward",
    "sessionize", "interval_union", "token_stats", "quality_score",
    "language_id", "exact_dedup", "fingerprint", "minhash_signature",
    "minhash_lsh_pairs", "ngram_jaccard", "ngram_jaccard_capped",
    "embedding_topk", "embedding_topk_sharded", "set_ops",
    "outer_join_activity", "rollup_revenue", "pivot_priority",
    "cumulative_revenue", "supplier_stats", "date_arithmetic",
    "daily_interpolation", "simhash", "simhash_pairs", "multimodal_meta",
    "asof_forward", "anova_f", "quantile_summary", "pca_projection",
    "top_unshipped_orders", "forecast_revenue_change", "asof_nearest",
})


def _rotated(allq: dict) -> dict:
    """Order the registry so the driver's 50-entry snapshot attests the
    queries CORRECTNESS_r02 never saw: unattested+oracled first, then
    unattested rows-only, then the already-attested tail."""
    fresh_oracled = [k for k in allq if k not in _R02_ATTESTED and k in ORACLES]
    fresh_rows_only = [k for k in allq if k not in _R02_ATTESTED and k not in ORACLES]
    attested = [k for k in allq if k in _R02_ATTESTED]
    return {k: allq[k] for k in fresh_oracled + fresh_rows_only + attested}


QUERIES = _rotated(QUERIES)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the (entity, period) monthly panel with lagged /
    moving-average revenue features and the 18-month failure label — the
    reference's core pipeline shape (panel → window features → target)
    re-expressed on the TPC-H-ish tables."""
    from pyspark.sql import functions as F

    from sf_datalake_spark.queries import customer_monthly_panel, q_target_variable
    from sf_datalake_spark.operators.windows import with_lag, with_moving_average

    sf_dir = "/root/testdata/sf0.001"
    panel = customer_monthly_panel(spark, sf_dir)
    panel = with_lag(panel, "revenue", [1, 3], keys=["custkey"], period_col="periode",
                     suffix_fmt="revenue_lag{n}m")
    panel = with_moving_average(panel, "revenue", [3], keys=["custkey"],
                                period_col="periode", suffix_fmt="revenue_mean{n}m")
    labels = q_target_variable(spark, sf_dir)
    return panel.join(labels, ["custkey", "periode"], "inner")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + training-data
    pipeline ops). Each callable takes (spark, sf_dir) → DataFrame."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    return dict(ORACLES)
