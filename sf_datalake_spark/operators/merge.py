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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Reconcile two snapshots of a keyed table: one row per changed
    key with ``change ∈ {'insert', 'update', 'delete'}`` plus the NEW
    side's non-key columns (nulls for deletes) — the engine-side
    change-data-capture a lakehouse uses to audit a replication, diff a
    backfill against production, or derive a changelog between two
    versions when the storage layer kept no CDF.

    Plan: ONE full outer join on the keys (both sides hash-partition —
    bucketed tables make it exchange-free) with change classification
    and update detection as Column arithmetic.  Update detection
    hashes the non-key columns null-safely (``xxhash64`` over the
    struct — 64-bit, so a masked update needs a 2⁻⁶⁴ collision)
    instead of N pairwise null-safe comparisons, so the OLD side
    shuffles keys + 8 bytes regardless of column count.
    Unchanged keys are filtered out before anything downstream sees
    them — the output is proportional to the CHANGE volume, not the
    table.
    """
    keys = list(keys)
    val_cols = [c for c in new.columns if c not in keys]
    if [c for c in old.columns if c not in keys] != val_cols:
        raise ValueError("snapshot_diff: old/new schemas must match")
    # distinct column names + DataFrame aliases: old/new often share
    # lineage (a snapshot perturbed from the other), which trips the
    # ambiguous-self-join check if attributes are referenced directly
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        F.xxhash64(F.struct(*val_cols)).alias("__oh"),
    ).alias("__sd_o")
    n = new.select(
        *keys,
        *val_cols,
        F.xxhash64(F.struct(*val_cols)).alias("__nh"),
    ).alias("__sd_n")
    cond = None
    for k in keys:
        c = F.col(f"__sd_o.__ok_{k}").eqNullSafe(F.col(f"__sd_n.{k}"))
        cond = c if cond is None else (cond & c)
    joined = o.join(n, cond, "full_outer")
    oh, nh = F.col("__sd_o.__oh"), F.col("__sd_n.__nh")
    change = (
        F.when(oh.isNull(), F.lit("insert"))
        .when(nh.isNull(), F.lit("delete"))
        .when(oh != nh, F.lit("update"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"__sd_n.{k}"), F.col(f"__sd_o.__ok_{k}")).alias(k)
                for k in keys
            ],
            "change",
            *[F.col(f"__sd_n.{c}").alias(c) for c in val_cols],
        )
    )


def incremental_join_view(
    old_view: DataFrame,
    left_old: DataFrame,
    delta_left: DataFrame,
    right_old: DataFrame,
    delta_right: DataFrame,
    on: Sequence[str],
) -> DataFrame:
    """Incremental maintenance of a JOIN view — the join analog of
    ``operators.aggregates.incremental_aggregate``.

    Insert-only delta-join algebra::

        V' = V ∪ (ΔL ⋈ R') ∪ (L ⋈ ΔR)      with R' = R ∪ ΔR

    (folding the ΔL⋈ΔR cross term into the first union arm via R').
    The maintenance cost is |ΔL|·|R'| + |L|·|ΔR| join work — each arm
    shuffles ONE delta against one stored side, never L⋈R again; at
    100 TB with daily deltas that is orders of magnitude below a view
    rebuild, and bucketing the stored sides by ``on`` makes the delta
    joins exchange-free on the big side.  Retractions follow the same
    algebra with negated delta multiplicities — compose with the
    signed-count contract of ``incremental_aggregate`` when the view
    feeds a rollup.
    """
    on = list(on)
    right_new = right_old.unionByName(delta_right)
    arm_left = delta_left.join(right_new, on)
    arm_right = left_old.join(delta_right, on)
    cols = old_view.columns
    return (
        old_view
        .unionByName(arm_left.select(*cols))
        .unionByName(arm_right.select(*cols))
    )
