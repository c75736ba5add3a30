"""Core pipeline transformers: identifiers, dates, filters, target,
missing values, key aggregation.

Reference behaviors replaced (all in ``src/sf_datalake/transform.py``
unless noted; SURVEY.md §2):

- IdentifierNormalizer  — ``transform.py:416-443`` (lpad zero-fill)
- SiretToSiren          — ``transform.py:446-468`` (14→9-digit prefix)
- DateParser            — ``transform.py:63-112``  (to_date with format)
- TargetVariable        — ``transform.py:846-894`` (failure within n months)
- PrivateCompanyFilter / HasPaydexFilter — ``transform.py:897-936``
  (generalized here to SqlExprFilter / NotNullFilter — the reference's
  versions are these with hardcoded predicates)
- MissingValuesHandler/Dropper — ``transform.py:171-355``
- SirenAggregator       — ``transform.py:471-539`` (KeyAggregator; one
  shuffle instead of the reference's agg + distinct + join)
- TimeNormalizer        — ``transform.py:542-598`` (divide by day span)
"""

from __future__ import annotations

from pyspark import keyword_only
from pyspark.ml import Transformer
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sf_datalake_spark.operators.aggregates import aggregate_by_keys
from sf_datalake_spark.operators.windows import with_bfill, with_ffill


class _ParamsMixin(Transformer, DefaultParamsReadable, DefaultParamsWritable):
    """Boilerplate shared by all transformers: declare params as a dict
    of name → default in ``_params``; get kwargs via keyword_only.
    DefaultParams persistence makes every transformer usable inside a
    saved PipelineModel (all param values are JSON-serializable)."""

    _params: dict[str, object] = {}

    @keyword_only
    def __init__(self, **kwargs):
        super().__init__()
        for name in type(self)._params:
            setattr(
                self, name, Param(self, name, f"{name} parameter")
            )
        self._setDefault(**{k: v for k, v in type(self)._params.items()})
        self._set(**kwargs)

    def get(self, name: str):
        return self.getOrDefault(getattr(self, name))


class IdentifierNormalizer(_ParamsMixin):
    """Zero-pad an identifier column to a fixed width (SIREN=9, SIRET=14)."""

    _params = {"inputCol": "siren", "n_pad": 9}

    def _transform(self, dataset: DataFrame) -> DataFrame:
        col = self.get("inputCol")
        return dataset.withColumn(
            col, F.lpad(F.col(col).cast("string"), self.get("n_pad"), "0")
        )


class SiretToSiren(_ParamsMixin):
    """Project an establishment id (SIRET, 14 digits) to its legal unit
    (SIREN = first 9 digits)."""

    _params = {"inputCol": "siret", "outputCol": "siren"}

    def _transform(self, dataset: DataFrame) -> DataFrame:
        siret = F.lpad(F.col(self.get("inputCol")).cast("string"), 14, "0")
        return dataset.withColumn(self.get("outputCol"), siret.substr(1, 9))


class DateParser(_ParamsMixin):
    """Parse a string column into DateType with an explicit format."""

    _params = {"inputCol": None, "outputCol": None, "format": "yyyyMMdd"}

    def _transform(self, dataset: DataFrame) -> DataFrame:
        out = self.get("outputCol") or self.get("inputCol")
        return dataset.withColumn(
            out, F.to_date(F.col(self.get("inputCol")), self.get("format"))
        )


class TargetVariable(_ParamsMixin):
    """label = 1 when the failure date falls within ``n_months`` after the
    panel period; unknown failure date → 0 (reference ``transform.py:846-894``)."""

    _params = {
        "inputCol": "date_jugement",
        "outputCol": "failure",
        "n_months": 18,
        "periodCol": "période",
    }

    def _transform(self, dataset: DataFrame) -> DataFrame:
        out = self.get("outputCol")
        return dataset.withColumn(
            out,
            (
                F.add_months(F.col(self.get("periodCol")), self.get("n_months"))
                >= F.col(self.get("inputCol"))
            ).cast("int"),
        ).fillna({out: 0})


class SqlExprFilter(_ParamsMixin):
    """Filter rows by a SQL boolean expression (generalizes the
    reference's PrivateCompanyFilter ``code_naf NOT IN ('O','P')``)."""

    _params = {"expr": None}

    def _transform(self, dataset: DataFrame) -> DataFrame:
        return dataset.filter(self.get("expr"))


class NotNullFilter(_ParamsMixin):
    """Keep rows where every listed column is non-null (generalizes the
    reference's HasPaydexFilter)."""

    _params = {"inputCols": []}

    def _transform(self, dataset: DataFrame) -> DataFrame:
        out = dataset
        for c in self.get("inputCols"):
            out = out.filter(F.col(c).isNotNull())
        return out


class IsInFilter(_ParamsMixin):
    """Keep rows whose column value is in a whitelist (reference judgment
    code filter, ``extract_judgment_DGFiP_data.py:61-65``)."""

    _params = {"inputCol": None, "values": []}

    def _transform(self, dataset: DataFrame) -> DataFrame:
        return dataset.filter(F.col(self.get("inputCol")).isin(self.get("values")))


class DateRangeFilter(_ParamsMixin):
    """Keep rows where a date column lies in [start, end] (reference
    ``__main__.py:159-168``, ``extract_judgment_URSSAF_data.py:46-48``)."""

    _params = {"inputCol": "période", "start": None, "end": None}

    def _transform(self, dataset: DataFrame) -> DataFrame:
        c = F.col(self.get("inputCol"))
        out = dataset
        if self.get("start") is not None:
            out = out.filter(c >= F.lit(self.get("start")).cast("date"))
        if self.get("end") is not None:
            out = out.filter(c <= F.lit(self.get("end")).cast("date"))
        return out


class ColumnSelector(_ParamsMixin):
    """Project to a fixed column list (early pruning so the parquet scan
    reads only what downstream needs)."""

    _params = {"inputCols": []}

    def _transform(self, dataset: DataFrame) -> DataFrame:
        return dataset.select(*self.get("inputCols"))


class MissingValuesHandler(_ParamsMixin):
    """Fill nulls: strategy 'value' (dict or scalar+subset), 'bfill' /
    'ffill' (per-entity directional fill over the period order).

    Reference ``transform.py:171-269``. Statistical strategies
    (mean/median/mode) belong to ``pyspark.ml.feature.Imputer`` — use it
    directly in pipelines; this transformer covers the non-fit paths.
    """

    _params = {
        "strategy": "value",
        "value": None,           # dict {col: fill} or scalar
        "inputCols": [],         # subset for scalar fill / fill direction
        "keys": ["siren"],
        "orderCol": "période",
    }

    def _transform(self, dataset: DataFrame) -> DataFrame:
        strategy = self.get("strategy")
        if strategy == "value":
            v = self.get("value")
            if isinstance(v, dict):
                return dataset.fillna(v)
            return dataset.fillna(v, subset=self.get("inputCols") or None)
        if strategy in ("bfill", "ffill"):
            fill = with_ffill if strategy == "ffill" else with_bfill
            return fill(
                dataset,
                self.get("inputCols"),
                keys=self.get("keys"),
                order_col=self.get("orderCol"),
            )
        if strategy in ("mean", "median", "mode"):
            # Statistical strategies delegate to pyspark.ml Imputer
            # (reference ``transform.py:271-292``; mode needs Spark ≥3.1).
            from pyspark.ml.feature import Imputer

            cols = list(self.get("inputCols"))
            return (
                Imputer(strategy=strategy, inputCols=cols, outputCols=cols)
                .fit(dataset)
                .transform(dataset)
            )
        raise ValueError(f"Unknown strategy: {strategy}")


class MissingValuesDropper(_ParamsMixin):
    """Drop rows with nulls in the listed columns (reference
    ``transform.py:295-355``; its per-column count() validation pass is
    deliberately NOT replicated — SURVEY.md §4 flags it as a
    materialization anti-pattern)."""

    _params = {"inputCols": [], "how": "any"}

    def _transform(self, dataset: DataFrame) -> DataFrame:
        return dataset.dropna(how=self.get("how"), subset=self.get("inputCols") or None)


class TimeNormalizer(_ParamsMixin):
    """Divide columns by the day span of [start, end] — per-day
    normalization of interval-valued quantities (reference
    ``transform.py:542-598``)."""

    _params = {"inputCols": [], "start": None, "end": None}

    def _transform(self, dataset: DataFrame) -> DataFrame:
        span = F.datediff(F.col(self.get("end")), F.col(self.get("start")))
        out = dataset
        for c in self.get("inputCols"):
            out = out.withColumn(c, F.col(c) / span)
        return out


class KeyAggregator(_ParamsMixin):
    """GroupBy the canonical keys and apply configured aggregations —
    the SirenAggregator (reference ``transform.py:471-539``) in ONE
    shuffle, with deterministic carry columns."""

    _params = {"keys": ["siren", "période"], "agg": {}, "carry": []}

    def _transform(self, dataset: DataFrame) -> DataFrame:
        return aggregate_by_keys(
            dataset, keys=self.get("keys"), agg=self.get("agg"), carry=self.get("carry")
        )
