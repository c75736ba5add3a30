"""Table profiling: the one-pass data-quality report a training-data
pipeline runs before trusting a new source (extends the reference's
per-column null counters, ``utils.py:244-273``, to a full profile).

Everything is computed in a SINGLE aggregation pass over the table —
n_columns × 5 aggregate expressions, no per-column jobs — and returned
in long format (one row per column) so the report itself is queryable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One row per column: n_rows, n_nulls, n_distinct (exact),
    min/max (numeric columns; null otherwise).

    Exact distinct per column uses Spark's grouping-sets expansion of
    multiple count-distincts — still one logical pass. For the
    100 TB interactive path swap ``countDistinct`` for
    ``approx_count_distinct``.
    """
    cols = columns or df.columns
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.when(F.isnull(c), 1)).alias(f"__nulls_{c}"))
        aggs.append(F.countDistinct(c).alias(f"__distinct_{c}"))
        if c in numeric:
            aggs.append(F.min(c).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nulls_{c}").alias("n_nulls"),
            F.col(f"__distinct_{c}").alias("n_distinct"),
            (F.col(f"__min_{c}") if c in numeric else F.lit(None).cast("double")).alias(
                "min_value"
            ),
            (F.col(f"__max_{c}") if c in numeric else F.lit(None).cast("double")).alias(
                "max_value"
            ),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")
