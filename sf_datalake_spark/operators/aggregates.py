"""Configurable key aggregation.

Reference behavior replaced: ``SirenAggregator`` (reference
``transform.py:471-539``) — groupBy the canonical keys, aggregate the
configured columns, carry the non-aggregated columns along. The reference
re-attaches carry columns via ``distinct()`` + an extra join
(``transform.py:532-534``) — two shuffles; here carry columns ride in the
SAME aggregation (one shuffle) using ``min`` by default (deterministic,
unlike ``F.first`` whose result depends on partition order — SURVEY.md
§4's non-determinism warning).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_by_keys(
    df: DataFrame,
    keys: Sequence[str],
    agg: dict[str, str],
    carry: Sequence[str] = (),
    carry_func: str = "min",
) -> DataFrame:
    """GroupBy ``keys``; apply ``{column: function}`` aggregations (output
    column keeps the input name, like the reference's post-agg rename);
    carry non-aggregated columns with a deterministic reducer.

    Example (the reference's siren-level rollup,
    ``configuration/__init__.py:151-159``)::

        aggregate_by_keys(df, ["siren", "période"],
                          {"cotisation": "sum", "effectif": "sum"})
    """
    exprs = [getattr(F, fn)(c).alias(c) for c, fn in agg.items()]
    exprs += [getattr(F, carry_func)(c).alias(c) for c in carry]
    return df.groupBy(*keys).agg(*exprs)
