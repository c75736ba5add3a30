"""Table profiling: the one-pass data-quality report a training-data
pipeline runs before trusting a new source (extends the reference's
per-column null counters, ``utils.py:244-273``, to a full profile).

Everything is computed in a SINGLE aggregation pass over the table —
n_columns × 5 aggregate expressions, no per-column jobs — and returned
in long format (one row per column) so the report itself is queryable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, NumericType


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
    maps = {f.name for f in df.schema.fields if isinstance(f.dataType, MapType)}
    # positional internal aliases + df[c] references keep dotted /
    # special-character column names intact
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.count(F.when(df[c].isNull(), 1)).alias(f"__nulls_{i}"))
        # map columns are not groupable -> no exact distinct for them
        aggs.append(
            (F.lit(None).cast("bigint") if c in maps else F.countDistinct(df[c]))
            .alias(f"__distinct_{i}")
        )
        if c in numeric:
            aggs.append(F.min(df[c]).cast("double").alias(f"__min_{i}"))
            aggs.append(F.max(df[c]).cast("double").alias(f"__max_{i}"))
    wide = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nulls_{i}").alias("n_nulls"),
            F.col(f"__distinct_{i}").alias("n_distinct"),
            (F.col(f"__min_{i}") if c in numeric else F.lit(None).cast("double")).alias(
                "min_value"
            ),
            (F.col(f"__max_{i}") if c in numeric else F.lit(None).cast("double")).alias(
                "max_value"
            ),
        )
        for i, c in enumerate(cols)
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")


def check_constraints(
    df: DataFrame,
    row_checks: dict[str, Column] | None = None,
    unique_keys: Sequence[Sequence[str] | str] = (),
) -> DataFrame:
    """Declarative data-quality verification (deequ-style) in ONE
    aggregation pass — the gate a training-data pipeline runs before
    admitting a new source (extends :func:`profile_table` from metrics
    to assertions).

    ``row_checks`` maps a constraint name to a boolean Column; a row
    where the predicate is not TRUE (FALSE **or** NULL) counts as a
    violation. ``unique_keys`` lists columns (or column tuples) that
    must be unique; violations = ``n_rows − exact distinct`` (rows with
    a NULL key component are excluded from the distinct count, so NULL
    keys surface as violations too).

    Output: one row per constraint — (constraint, n_rows,
    n_violations, satisfied). All checks share a single wide
    aggregation (map-side combined, one shuffle to 1 row), so the cost
    is one table scan regardless of how many constraints are declared.
    """
    row_checks = dict(row_checks or {})
    uniq = [[u] if isinstance(u, str) else list(u) for u in unique_keys]
    if not row_checks and not uniq:
        # explode(array()) of zero structs is an unexpandable Catalyst
        # plan — fail with the real reason instead
        raise ValueError("no constraints declared (row_checks and "
                         "unique_keys are both empty)")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, pred in enumerate(row_checks.values()):
        aggs.append(
            F.count(F.when(~F.coalesce(pred, F.lit(False)), 1)).alias(f"__v_{i}")
        )
    for j, cols in enumerate(uniq):
        aggs.append(F.countDistinct(*[df[c] for c in cols]).alias(f"__d_{j}"))
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(name).alias("constraint"),
            F.col("__n").alias("n_rows"),
            F.col(f"__v_{i}").alias("n_violations"),
        )
        for i, name in enumerate(row_checks)
    ] + [
        F.struct(
            F.lit("unique(" + ", ".join(cols) + ")").alias("constraint"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__d_{j}")).alias("n_violations"),
        )
        for j, cols in enumerate(uniq)
    ]
    return (
        wide.select(F.explode(F.array(*rows)).alias("c"))
        .select("c.*")
        .withColumn("satisfied", (F.col("n_violations") == 0).cast("int"))
    )
