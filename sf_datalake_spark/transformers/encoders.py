"""Encoding transformers.

BinsOrdinalEncoder — reference ``transform.py:115-168``: a Bucketizer
wrapper whose bins come from config (including ``[-inf, …, inf]``
endpoint conventions encoded as strings in JSON).
"""

from __future__ import annotations

import math

from pyspark.ml.feature import Bucketizer
from pyspark.sql import DataFrame

from sf_datalake_spark.transformers.core import _ParamsMixin


def _to_float(x) -> float:
    if isinstance(x, str):
        s = x.strip().lower()
        if s in ("-inf", "-infinity"):
            return -math.inf
        if s in ("inf", "+inf", "infinity"):
            return math.inf
    return float(x)


class BinsOrdinalEncoder(_ParamsMixin):
    """Bucketize a numeric column into ordinal bins.

    ``bins`` accepts JSON-friendly endpoints ("-inf"/"inf" strings), as
    the reference's config files do (``configuration/standard.json:108-135``).
    """

    _params = {"inputCol": None, "outputCol": None, "bins": []}

    def _transform(self, dataset: DataFrame) -> DataFrame:
        splits = [_to_float(b) for b in self.get("bins")]
        out = self.get("outputCol") or f"{self.get('inputCol')}_bin"
        return Bucketizer(
            splits=splits, inputCol=self.get("inputCol"), outputCol=out,
            handleInvalid="keep",
        ).transform(dataset)
