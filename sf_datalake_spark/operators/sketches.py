"""Mergeable Datasketches operators — the pre-aggregation layer for
interactive analytics at 100 TB.

The scale pattern all four families share: build ONE small sketch per
partition (day / month / source / file) in the ingest pass with an
ordinary ``groupBy().agg()`` (map-side combined, one shuffle of
kilobyte-sized binaries), STORE the sketches next to the data, and
answer later queries by merging sketches — never rescanning rows.  A
distinct-count over an arbitrary date range becomes a union of a few
hundred 16 KB HLL sketches; a quantile over a quarter is a merge of
daily KLL sketches; audience overlap between two segments is a theta
intersection.  That is the difference between an interactive dashboard
and a 100 TB rescan.

Families (all JVM-side Spark 4 built-ins, whole-stage codegen'd):

- HyperLogLog (``hll_sketch_agg`` / ``hll_union_agg``): distinct
  counts, rsd ≈ 1.04/√2^lgK (lgK=14 → ~0.8 %).
- KLL (``kll_sketch_agg_double`` + pairwise ``kll_sketch_merge_*``):
  quantiles with a RANK-error guarantee (k=200 → ~1.65 % rank error) —
  the right contract for monitoring latency/price distributions.
- Theta (``theta_sketch_agg`` + ``theta_union/intersection/
  difference``): full distinct-set ALGEBRA — the only family here that
  can answer "how many ids are in A but not B" from pre-aggregates.
- Count-Min (``count_min_sketch``): frequency estimation with a
  one-sided error bound (est ≥ true, est ≤ true + eps·N w.h.p.) —
  heavy-hitter screening over token/url streams.

Unlike ``approx_count_distinct`` (whose HLL++ state is internal to one
aggregation), these sketches are first-class binary COLUMNS: they
survive a parquet write, union across tables, and merge across engines
that speak the Apache Datasketches format.

The reference engine has no sketch surface (its quantiles are exact,
``exploration.py:392-401``); this layer is the beyond-reference scale
path, oracled through exact-twin invariants (each query emits its own
accuracy flag checked against the exact answer computed in BOTH
engines — see ``queries_sketch.py``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_partition_sketches(
    df: DataFrame,
    keys: Sequence[str],
    partition_cols: Sequence[str],
    value_col: str,
    lg_k: int = 14,
) -> DataFrame:
    """Per-(key, partition) HLL sketches of distinct ``value_col`` —
    the ingest-time pass whose output is stored, not rescanned.

    One shuffle on (keys + partition_cols) with map-side combine; the
    shuffled payload is the 2^lg_k-byte sketch, never the values.
    """
    return df.groupBy(*keys, *partition_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("hll")
    )


def hll_merge(sketches: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Query-time rollup: union the stored partition sketches per key
    and estimate — cost proportional to the number of SKETCHES, not the
    number of rows they summarize."""
    return sketches.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("distinct_est")
    )


def kll_merged_quantiles(
    df: DataFrame,
    partition_cols: Sequence[str],
    value_col: str,
    quantiles: Sequence[float],
    k: int = 200,
) -> DataFrame:
    """Quantile estimates from per-partition KLL sketches merged at
    query time: one row, one ``q_est_{i}`` column per requested
    quantile.

    Spark exposes KLL merge as a BINARY scalar
    (``kll_sketch_merge_double``), not an aggregate — the rollup is the
    higher-order ``aggregate`` over the collected sketch list.  The
    collected list is one ~(3 KB · n_partitions) array on one reducer:
    fine for the calendar-partition counts this targets (hundreds);
    for millions of partitions, merge in two levels (sub-aggregate by a
    partition prefix first).
    """
    per_part = df.groupBy(*partition_cols).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k)).alias(
            "kll"
        )
    )
    # Empty-input guard: with zero sketches, slice(..., 2, -1) throws
    # and [0] would be NULL anyway — return a NULL sketch (each
    # quantile below null-propagates to a NULL estimate) instead of a
    # runtime error.
    merged = F.expr(
        "CASE WHEN size(collect_list(kll)) = 0 THEN NULL ELSE "
        "aggregate(slice(collect_list(kll), 2, "
        "              greatest(size(collect_list(kll)) - 1, 0)), "
        "collect_list(kll)[0], (a, x) -> kll_sketch_merge_double(a, x)) END"
    )
    return per_part.agg(merged.alias("__m")).select(
        *[
            F.expr(
                f"kll_sketch_get_quantile_double(__m, cast({float(q)} as double))"
            ).alias(f"q_est_{i}")
            for i, q in enumerate(quantiles)
        ]
    )


def theta_set_estimates(
    df: DataFrame,
    value_col: str,
    cond_a: Column,
    cond_b: Column,
    lg_k: int = 12,
) -> DataFrame:
    """Distinct-set algebra from two theta sketches built in ONE scan:
    |A∪B|, |A∩B|, |A\\B| estimates as a single row.

    ``theta_sketch_agg`` ignores NULLs, so each side sketches the
    values where its condition holds — one pass, no self-join.  Below
    2^lg_k distinct values the theta sketch is in exact mode, so small
    partitions cost nothing in accuracy.
    """
    a = F.theta_sketch_agg(F.when(cond_a, F.col(value_col)), F.lit(lg_k))
    b = F.theta_sketch_agg(F.when(cond_b, F.col(value_col)), F.lit(lg_k))
    sk = df.agg(a.alias("ska"), b.alias("skb"))
    return sk.select(
        F.expr("theta_sketch_estimate(theta_union(ska, skb))").alias("union_est"),
        F.expr("theta_sketch_estimate(theta_intersection(ska, skb))").alias(
            "intersect_est"
        ),
        F.expr("theta_sketch_estimate(theta_difference(ska, skb))").alias(
            "diff_est"
        ),
    )


def cms_estimate_counts(
    df: DataFrame,
    value_col: str,
    items: Sequence[str],
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> dict[str, int]:
    """Count-Min frequency estimates for ``items``: build the sketch
    distributed (one aggregation, width=⌈2/eps⌉ × depth=⌈ln(1/(1−conf))⌉
    integer matrix shuffled once), then read the estimates from the
    single returned sketch via the JVM ``CountMinSketch`` reader.

    The driver-side step handles one ~2/eps·depth·4-byte binary —
    bounded by construction, independent of row count.  Guarantee per
    item: ``true ≤ est ≤ true + eps·N`` with probability ``confidence``
    (N = total items added), deterministic given ``seed``.
    """
    row = df.agg(
        F.expr(
            f"count_min_sketch(`{value_col}`, {eps}d, {confidence}d, {seed})"
        ).alias("cms")
    ).collect()[0]
    jvm = df.sparkSession.sparkContext._jvm
    sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(row["cms"])
    )
    return {item: int(sketch.estimateCount(item)) for item in items}


def bitmap_distinct(
    df: DataFrame,
    fine_keys: Sequence[str],
    coarse_expr: Column,
    id_col: str,
) -> DataFrame:
    """EXACT distinct-count rollup via mergeable 64-bit bitmap words —
    the exact counterpart of the HLL rollup above for dense integer id
    universes (user ids, customer keys).

    Level 1 groups by ``fine_keys`` and packs ids into ``(word, bits)``
    pairs (``word = id div 64``, ``bits = bit_or(1 << id mod 64)``);
    level 2 re-groups the *words* under ``coarse_expr`` and ORs them —
    the coarse distinct count is ``sum(bit_count(bits))`` with NO
    second scan of the fact table, and unlike HLL the answer is exact.
    Returns one row per coarse group: ``(group, n_distinct, n_words)``.

    Scale: state per group is ``universe/64`` words at worst (dense
    ids) and ``≤ n_distinct`` words always — a 10⁹-id universe is ≤
    125 MB per group spread across the word-hash shuffle, never a
    single-task hotspot because ``word`` is part of the grouping key
    until the final per-group popcount sum.  Sparse/skewed universes
    want roaring-style containers; this operator documents the dense
    case the synthetic keys exercise.
    """
    fine = list(fine_keys)
    level1 = (
        df.select(
            *fine,
            # `div`, not `/`: integer floor, matching DuckDB's `//`
            F.expr(f"`{id_col}` div 64").alias("__word"),
            F.expr(
                f"shiftleft(1L, cast(`{id_col}` % 64 as int))"
            ).alias("__bit"),
        )
        .groupBy(*fine, "__word")
        .agg(F.expr("bit_or(__bit)").alias("__bits"))
    )
    level2 = (
        level1.select(coarse_expr.alias("grp"), "__word", "__bits")
        .groupBy("grp", "__word")
        .agg(F.expr("bit_or(__bits)").alias("__bits"))
    )
    return level2.groupBy("grp").agg(
        F.sum(F.expr("bit_count(__bits)")).cast("bigint").alias("n_distinct"),
        F.count("*").cast("bigint").alias("n_words"),
    )


def sliding_bitmap_distinct(
    df: DataFrame,
    day_col: Column | str,
    id_col: str,
    window_days: int = 7,
) -> DataFrame:
    """EXACT distinct ids per trailing ``window_days``-day window, one
    row per day present in the data — the sliding twin of
    :func:`bitmap_distinct`.

    The naive formulation is a range self-join (day d ⋈ events in
    (d-6..d]) that rescans the fact table per window. This one never
    re-reads a row: level 1 packs each (day, word) into 64-bit bitmap
    words; each day's words are then REPLICATED to the ``window_days``
    windows they fall into (a projection — sequence+explode on the
    kilobyte-scale word table, not on rows); level 2 ORs words per
    (window, word) and popcounts.  Exactly the mergeable-summary
    discipline: rows are touched once, windows merge summaries.

    Windows anchored on days absent from the data are dropped (a
    window row exists only for days that themselves have events),
    matching the natural SQL twin.

    Scale: level-1 state is ≤ min(rows, days × universe/64) words;
    replication multiplies the WORD table by ``window_days``, not the
    data. Dense integer ids assumed (same contract as
    :func:`bitmap_distinct`).
    """
    day = F.col(day_col) if isinstance(day_col, str) else day_col
    level1 = (
        df.select(
            day.alias("__day"),
            F.expr(f"`{id_col}` div 64").alias("__word"),
            F.expr(f"shiftleft(1L, cast(`{id_col}` % 64 as int))").alias(
                "__bit"
            ),
        )
        .groupBy("__day", "__word")
        .agg(F.expr("bit_or(__bit)").alias("__bits"))
    )
    days = level1.select(F.col("__day").alias("window_day")).distinct()
    spread = level1.select(
        F.explode(
            F.sequence(
                F.col("__day"),
                F.date_add(F.col("__day"), window_days - 1),
            )
        ).alias("window_day"),
        "__word",
        "__bits",
    )
    merged = (
        spread.join(days, "window_day")  # only anchor days with events
        .groupBy("window_day", "__word")
        .agg(F.expr("bit_or(__bits)").alias("__bits"))
    )
    return merged.groupBy("window_day").agg(
        F.sum(F.expr("bit_count(__bits)")).cast("bigint").alias("n_distinct"),
        F.count("*").cast("bigint").alias("n_words"),
    )
