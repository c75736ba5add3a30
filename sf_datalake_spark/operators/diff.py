"""Snapshot diff (change-data-capture between two table versions).

Lakehouse maintenance, beyond the reference's surface: given two
versions of a keyed table, emit each row's change type — ``insert``
(key only in new), ``delete`` (key only in old), ``update`` (key in
both, any non-key column differs null-safely).  Unchanged rows are
dropped, so the output is the change feed a downstream incremental
consumer (``operators/merge.py`` / ``operators/aggregates.py``) can
apply.

Scale design: ONE full-outer shuffle join on the key; the non-key
comparison is a null-safe struct equality evaluated in the join's
projection (codegen, no second pass).  Column pruning applies — pass
only the columns whose changes matter.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame, new: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Change feed new-vs-old: ``keys... , change_type`` plus the NEW
    row's non-key values for insert/update and the OLD row's for
    delete (the convention a MERGE consumer wants)."""
    keys = list(keys)
    val_cols = [c for c in new.columns if c not in keys]
    if set(old.columns) != set(new.columns):
        raise ValueError("old and new must share one schema")

    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        F.struct(*[F.col(c) for c in val_cols]).alias("__ov"),
    )
    n = new.select(
        *keys, F.struct(*[F.col(c) for c in val_cols]).alias("__nv")
    )
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"__ok_{k}"))
        cond = c if cond is None else (cond & c)
    joined = n.join(o, on=cond, how="full_outer")

    new_present = F.col("__nv").isNotNull()
    old_present = F.col("__ov").isNotNull()
    change = (
        F.when(new_present & ~old_present, F.lit("insert"))
        .when(old_present & ~new_present, F.lit("delete"))
        .when(~F.col("__nv").eqNullSafe(F.col("__ov")), F.lit("update"))
    )
    side = F.when(new_present, F.col("__nv")).otherwise(F.col("__ov"))
    out_keys = [
        F.coalesce(F.col(k), F.col(f"__ok_{k}")).alias(k) for k in keys
    ]
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *out_keys,
            "change_type",
            *[side[c].alias(c) for c in val_cols],
        )
    )
