"""Table maintenance: MERGE-style upsert and SCD2 interval versioning.

The reference maintains its panel by full rebuild; a production lake
needs in-place maintenance primitives. Both operators here are pure
DataFrame plans (no table-format dependency — the result is written
with the ordinary writers, or swapped in via dynamic partition
overwrite like ``pipelines.write_panel_increment``):

- :func:`merge_upsert` — ``MERGE WHEN MATCHED UPDATE / WHEN NOT
  MATCHED INSERT`` as ONE union + ONE keyed window (single shuffle),
  not the naive full-outer join + coalesce-per-column.
- :func:`scd2_apply` — slowly-changing-dimension type 2: one change
  batch closes the affected current rows and opens their successors,
  preserving full history as ``[start, end)`` validity intervals — the
  same interval convention as the reference's ``(date_début,
  date_fin)`` activity spans (SURVEY.md §1.1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Upsert ``source`` rows into ``target`` by ``keys``: a source row
    replaces the target row with the same key; source rows with no
    match are inserted; unmatched target rows pass through.

    Plan shape: union (cheap, no shuffle) + one ``row_number`` window
    over the keys — a single hash exchange on the merge keys, which a
    target bucketed on those keys satisfies without shuffling its
    (large) side. The full-outer-join formulation shuffles both sides
    AND needs per-column coalesce; this is the same result in one
    exchange with column-count-independent code.

    Both inputs must share a schema. If ``source`` carries several rows
    per key, the merge is made deterministic by preferring the larger
    row (struct comparison) — pre-deduplicate the source when another
    policy is wanted. Duplicate-key TARGET rows pass through untouched
    when no source row matches their key; when one does, the key's
    rows collapse to the single winning source row (every duplicate
    "updates" to the same full-row image, so one row remains).
    """
    keys = list(keys)
    cols = target.columns
    if set(cols) != set(source.columns):
        raise ValueError(
            f"schema mismatch: target {cols} vs source {source.columns}"
        )
    tagged = target.select(*cols).withColumn("__src", F.lit(0)).unionByName(
        source.select(*cols).withColumn("__src", F.lit(1))
    )
    w_key = Window.partitionBy(*keys)
    w = w_key.orderBy(
        F.col("__src").desc(),
        # deterministic among duplicate source rows: max struct wins
        F.struct(*[F.col(c) for c in cols if c not in keys]).desc(),
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .withColumn("__matched", F.max("__src").over(w_key))
        # matched key → exactly the winning source row; unmatched key →
        # every target row passes through (duplicates included)
        .filter((F.col("__matched") == 0) | (F.col("__rn") == 1))
        .select(*cols)
    )


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str],
    effective_col: str = "effective_date",
    start_col: str = "date_debut",
    end_col: str = "date_fin",
) -> DataFrame:
    """Apply one batch of changes to an SCD2 dimension.

    ``dim`` rows are ``keys + value_cols + [start_col, end_col]`` with
    ``end_col IS NULL`` marking the current version. ``changes`` rows
    are ``keys + value_cols + [effective_col]`` (at most one row per
    key per batch — enforce upstream). Semantics per changed key:

    - the current row whose values DIFFER from the change is closed
      (``end_col = effective date`` — ``[start, end)`` intervals,
      matching the reference's activity spans);
    - a new current row opens at the effective date;
    - a change equal to the current values is a no-op (no empty
      interval is created);
    - a key unknown to ``dim`` simply inserts its first version;
    - historical (already closed) rows pass through untouched;
    - a BACKDATED change (effective before the current row's start) is
      clamped to that start, so intervals never invert: the current
      row degenerates to the empty ``[start, start)`` and the
      successor replaces it from ``start`` on — late-arriving batches
      keep the per-key interval partition well-formed.

    Plan shape: one left join of the current slice against the (small,
    broadcastable) change batch + a union of three branches — no
    window, no iteration; history grows append-only.
    """
    keys = list(keys)
    value_cols = list(value_cols)
    out_cols = keys + value_cols + [start_col, end_col]

    history = dim.filter(F.col(end_col).isNotNull()).select(*out_cols)
    current = dim.filter(F.col(end_col).isNull())

    chg = changes.select(
        *keys,
        *[F.col(v).alias(f"__new_{v}") for v in value_cols],
        F.col(effective_col).alias("__eff"),
    )
    joined = current.join(F.broadcast(chg), keys, "left").withColumn(
        # backdated-change clamp (see docstring); only for real matches —
        # greatest() skips NULLs, so an unconditional clamp would turn an
        # unmatched row's NULL __eff into a phantom change at start_col
        "__eff",
        F.when(
            F.col("__eff").isNotNull(),
            F.greatest("__eff", F.col(start_col)),
        ),
    )
    # Struct comparison follows ORDERING semantics (a null field sorts
    # first rather than nulling the whole comparison), so an unmatched
    # row's all-null change struct would compare as "different" — gate
    # on the join hit explicitly. The ordering semantics are exactly
    # right for real value changes: value→NULL differs, NULL→NULL not.
    differs = F.col("__eff").isNotNull() & (
        F.struct(*[F.col(v) for v in value_cols])
        != F.struct(*[F.col(f"__new_{v}") for v in value_cols])
    )
    # current rows: closed at the effective date when a differing
    # change arrives, untouched otherwise
    kept_current = joined.select(
        *keys,
        *value_cols,
        F.col(start_col),
        F.when(differs, F.col("__eff")).otherwise(F.col(end_col)).alias(end_col),
    )
    # successor rows for differing changes
    openers = joined.filter(differs).select(
        *keys,
        *[F.col(f"__new_{v}").alias(v) for v in value_cols],
        F.col("__eff").alias(start_col),
        F.lit(None).cast(dict(dim.dtypes)[end_col]).alias(end_col),
    )
    # first versions for keys the dimension has never seen
    first_versions = chg.join(current.select(*keys), keys, "left_anti").select(
        *keys,
        *[F.col(f"__new_{v}").alias(v) for v in value_cols],
        F.col("__eff").alias(start_col),
        F.lit(None).cast(dict(dim.dtypes)[end_col]).alias(end_col),
    )
    return (
        history.unionByName(kept_current)
        .unionByName(openers)
        .unionByName(first_versions)
    )
