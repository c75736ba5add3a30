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

from pyspark.sql import DataFrame, Window
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


def incremental_aggregate(
    old: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    count_col: str | None = "n_rows",
) -> DataFrame:
    """Maintain a keyed sum/count aggregate table INCREMENTALLY: fold a
    delta batch's aggregates into the stored table instead of
    re-aggregating history — the incremental-view-maintenance core of
    every cheap ETL rollup (daily partitions folded into a running
    table, late batches applied without a backfill).

    ``old`` holds ``keys + sum_cols + [count_col]`` (the stored rollup);
    ``delta`` holds RAW rows (``keys + sum_cols``).  The delta is
    aggregated (one map-side-combined shuffle over the BATCH, not
    history) and outer-merged additively: sums add, counts add, keys
    new to either side pass through.  Works because sum/count form a
    commutative monoid — averages and other ratios must be stored as
    (sum, count) pairs and derived at read time; non-decomposable
    aggregates (exact median/distinct) need their own structures
    (see the sketch layer for mergeable distinct/quantiles).

    Retractions: a late CORRECTION batch is a delta with negated
    measure values.  For the count there are two contracts, selected by
    the delta's schema: when ``count_col`` is ABSENT from the delta,
    each delta row counts +1 (the plain insert batch); when the delta
    CARRIES a ``count_col`` column, it is summed as a signed
    per-row count contribution (−1 per retracted row, +1 per inserted
    row), so one batch can mix inserts and retractions.

    Cost: aggregate(delta) + one outer join on keys against the stored
    table — at 100 TB the stored side is orders of magnitude smaller
    than history, and bucketing it by the keys makes the fold
    exchange-free on that side.
    """
    keys = list(keys)
    sum_cols = list(sum_cols)
    aggs = [F.sum(c).alias(c) for c in sum_cols]
    if count_col:
        if count_col in delta.columns:
            # Signed count contributions (retraction contract): the
            # delta pre-declares ±1 (or pre-aggregated n) per row.
            aggs.append(F.sum(count_col).alias(count_col))
        else:
            aggs.append(F.count("*").alias(count_col))
    d = delta.groupBy(*keys).agg(*aggs).alias("__ia_d")
    o = old.alias("__ia_o")
    cond = None
    for k in keys:
        c = F.col(f"__ia_o.{k}").eqNullSafe(F.col(f"__ia_d.{k}"))
        cond = c if cond is None else (cond & c)
    merged = o.join(d, cond, "full_outer")
    val_cols = sum_cols + ([count_col] if count_col else [])
    return merged.select(
        *[
            F.coalesce(F.col(f"__ia_o.{k}"), F.col(f"__ia_d.{k}")).alias(k)
            for k in keys
        ],
        *[
            # SQL SUM of an all-NULL group is NULL, not 0 — preserve
            # that (NULL = "no measurable data" ≠ 0) so the fold stays
            # exactly equivalent to a from-scratch re-aggregation:
            # NULL⊕NULL = NULL, NULL⊕x = x, x⊕y = x+y
            F.when(
                F.col(f"__ia_o.{c}").isNull()
                & F.col(f"__ia_d.{c}").isNull(),
                F.lit(None),
            )
            .otherwise(
                F.coalesce(F.col(f"__ia_o.{c}"), F.lit(0))
                + F.coalesce(F.col(f"__ia_d.{c}"), F.lit(0))
            )
            .alias(c)
            for c in val_cols
        ],
    )


def weighted_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    weight_col: str,
    quantiles: Sequence[tuple[int, int]] = ((1, 4), (1, 2), (3, 4)),
) -> DataFrame:
    """Exact weighted quantiles per key, engine-exact by construction.

    The weighted q-quantile (q = num/den) is the smallest value whose
    cumulative weight reaches ``q·W``; the reach test is kept in
    integer cross-multiplied form (``den·cum ≥ num·W``) so no float
    division ever happens — value and weight columns must be integral
    (cents, counts).  Returns one row per key: total weight plus one
    ``q_<num>_<den>`` column per requested quantile.

    Spark-first, two shuffles total: (1) pre-aggregate weight per
    (key, value) — this also makes the cumulative window's ROWS frame
    deterministic, since values are unique after the group — then
    (2) one window + groupBy on ``keys`` sharing a single exchange.
    At 100 TB the (key, value) pre-aggregation is the map-side-combine
    workhorse; per-key distinct-value count bounds the window state.
    """
    from pyspark.sql import Window

    keys = list(keys)
    per_value = df.groupBy(*keys, value_col).agg(
        F.sum(F.col(weight_col).cast("bigint")).alias("__w")
    )
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_key = Window.partitionBy(*keys)
    cum = per_value.select(
        *keys,
        F.col(value_col).alias("__v"),
        F.sum("__w").over(w_cum).alias("__cum"),
        F.sum("__w").over(w_key).alias("__tot"),
    )
    aggs = [F.max("__tot").alias("total_weight")]
    for num, den in quantiles:
        aggs.append(
            F.min(
                F.when(
                    F.col("__cum") * F.lit(den) >= F.col("__tot") * F.lit(num),
                    F.col("__v"),
                )
            ).alias(f"q_{num}_{den}")
        )
    return cum.groupBy(*keys).agg(*aggs)


def quantile_normalize(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    tiebreak_col: str,
    out_col: str = "norm_value",
) -> DataFrame:
    """Quantile normalization: map each row's value onto the POOLED
    distribution at the same quantile position (nearest-rank) — the
    rank-transform used to make per-group feature distributions
    comparable (the microarray-normalization classic, Bolstad 2003).

    target global rank p = ceil(r_g · N / n_g) where r_g is the row's
    rank within its group (ordered by value, then ``tiebreak_col`` for
    a total order), n_g the group size, N the pooled count; the output
    value is the p-th smallest pooled value. All-integer rank
    arithmetic — engine-exact.

    Scale design: the pooled ranking is NOT a global row sort. The
    pooled (value → rank interval) table comes from the per-value
    histogram (one aggregation, |distinct values| rows) + one
    cumulative window over those values; each value's interval
    [cum−w+1, cum] is then exploded into its per-rank rows — a
    data-linear 2-column table joined back by EQUI-join on p.
    The only unpartitioned window runs over the distinct-value
    histogram (state = |distinct values|, not rows); at extreme value
    cardinality swap it for the two-pass range-partitioned rank the
    repo documents for quantile_summary.
    """
    group_cols = list(group_cols)
    w_g = Window.partitionBy(*group_cols).orderBy(value_col, tiebreak_col)
    w_n = Window.partitionBy(*group_cols)
    ranked = df.select(
        *group_cols,
        value_col,
        tiebreak_col,
        F.row_number().over(w_g).alias("__rg"),
        F.count("*").over(w_n).alias("__ng"),
    )
    hist = df.groupBy(value_col).agg(F.count("*").alias("__w"))
    w_cum = Window.orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pooled = (
        hist.select(
            F.col(value_col).alias(out_col),
            F.sum("__w").over(w_cum).alias("__cum"),
            F.col("__w"),
        )
        .select(
            out_col,
            F.explode(
                F.sequence(F.col("__cum") - F.col("__w") + 1, F.col("__cum"))
            ).alias("__p"),
        )
    )
    # pooled N as a broadcast 1-row cross join (no driver action, no
    # second scan — derived from the histogram already in the plan)
    total = hist.agg(F.sum("__w").alias("__N"))
    # rg·N reaches N² — past ~3e9 rows that product overflows bigint
    # while the docstring promises billion-row design (ADVICE r4), so
    # the product runs in DECIMAL(38,0): 9.2e18² ≈ 8.5e37 still fits
    # precision 38. Integral division (`div`), not `/`+floor: decimal
    # `/` rounds the quotient HALF_UP to scale 6 before floor, so exact
    # multiples at group sizes ≥ ~2M came back rank+1 and the group's
    # top row mapped to p = N+1, missing the pooled join (ADVICE r5).
    # `div` is exact on decimals and returns bigint directly.
    target = ranked.crossJoin(F.broadcast(total)).withColumn(
        "__p",
        F.expr(
            "(cast(__rg as decimal(38,0)) * __N + __ng - 1) div __ng"
        ),
    )
    return target.join(pooled, "__p").select(
        *group_cols, value_col, tiebreak_col, out_col
    )
