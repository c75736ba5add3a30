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
from sf_datalake_spark.queries_ext import ORACLES_EXT, QUERIES_EXT  # noqa: E402
from sf_datalake_spark.queries_rel import ORACLES_REL, QUERIES_REL  # noqa: E402

QUERIES = {**QUERIES, **QUERIES_EXT, **QUERIES_REL}
ORACLES = {**ORACLES, **ORACLES_EXT, **ORACLES_REL}


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
