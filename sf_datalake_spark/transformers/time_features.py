"""Time-feature transformers: Pipeline-composable wrappers over the
window operators (SURVEY.md §2.5).

Reference behaviors replaced: LagOperator (``transform.py:683-764``),
DiffOperator (``transform.py:767-843``), MovingAverage
(``transform.py:601-680``), LinearInterpolationOperator
(``transform.py:939-1054``).

A whole stack of these in one ``pyspark.ml.Pipeline`` shares a single
hash-exchange: every stage windows over the same (keys, month-index)
spec and Catalyst collapses identical window specs — the reference's
post-join stack (lags 1/2/3/6/12 + diffs + moving averages,
``post_join_processing.py:108-161``) costs ONE shuffle here too.
"""

from __future__ import annotations

from sf_datalake_spark.operators.windows import (
    with_diff,
    with_lag,
    with_linear_interpolation,
    with_moving_average,
)
from sf_datalake_spark.transformers.core import _ParamsMixin


class LagTransformer(_ParamsMixin):
    """Row-based lag(s) of the input columns over the month index."""

    _params = {
        "inputCols": [],
        "nMonths": [1],
        "keys": ["siren"],
        "periodCol": "période",
    }

    def _transform(self, dataset):
        return with_lag(
            dataset,
            self.get("inputCols"),
            self.get("nMonths"),
            keys=self.get("keys"),
            period_col=self.get("periodCol"),
        )


class DiffTransformer(_ParamsMixin):
    """col − lag_n(col) for each input column and horizon."""

    _params = {
        "inputCols": [],
        "nMonths": [1],
        "keys": ["siren"],
        "periodCol": "période",
    }

    def _transform(self, dataset):
        return with_diff(
            dataset,
            self.get("inputCols"),
            self.get("nMonths"),
            keys=self.get("keys"),
            period_col=self.get("periodCol"),
        )


class MovingAverageTransformer(_ParamsMixin):
    """Calendar-aware moving average (RANGE frame on month index)."""

    _params = {
        "inputCols": [],
        "nMonths": [12],
        "keys": ["siren"],
        "periodCol": "période",
    }

    def _transform(self, dataset):
        return with_moving_average(
            dataset,
            self.get("inputCols"),
            self.get("nMonths"),
            keys=self.get("keys"),
            period_col=self.get("periodCol"),
        )


class LinearInterpolationTransformer(_ParamsMixin):
    """Interpolate interior null gaps per entity, in period order."""

    _params = {"inputCols": [], "keys": ["siren"], "orderCol": "période"}

    def _transform(self, dataset):
        return with_linear_interpolation(
            dataset,
            self.get("inputCols"),
            keys=self.get("keys"),
            order_col=self.get("orderCol"),
        )
