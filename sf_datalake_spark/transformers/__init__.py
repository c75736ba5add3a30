"""The engine's extension API: ``pyspark.ml.Transformer`` subclasses.

This mirrors the reference's extension mechanism (18 Transformer
subclasses in ``src/sf_datalake/transform.py`` using the
Param/keyword_only machinery — SURVEY.md §2.11): every preprocessing
step is a Pipeline-composable transformer, so whole feature stacks are
declared once and executed as ONE Catalyst plan
(``post_join_processing.py:164-166`` runs the reference's entire
time-feature stack as a single PipelineModel.transform).
"""

from sf_datalake_spark.transformers.core import (
    ColumnSelector,
    DateParser,
    DateRangeFilter,
    IdentifierNormalizer,
    IsInFilter,
    KeyAggregator,
    MissingValuesDropper,
    MissingValuesHandler,
    NotNullFilter,
    SiretToSiren,
    SqlExprFilter,
    TargetVariable,
    TimeNormalizer,
)
from sf_datalake_spark.transformers.encoders import BinsOrdinalEncoder
from sf_datalake_spark.transformers.time_features import (
    DiffTransformer,
    LagTransformer,
    LinearInterpolationTransformer,
    MovingAverageTransformer,
)

__all__ = [
    "BinsOrdinalEncoder",
    "ColumnSelector",
    "DateParser",
    "DateRangeFilter",
    "DiffTransformer",
    "IdentifierNormalizer",
    "IsInFilter",
    "KeyAggregator",
    "LagTransformer",
    "LinearInterpolationTransformer",
    "MissingValuesDropper",
    "MissingValuesHandler",
    "MovingAverageTransformer",
    "NotNullFilter",
    "SiretToSiren",
    "SqlExprFilter",
    "TargetVariable",
    "TimeNormalizer",
]
