"""Interval algebra: union of overlapping spans, sessionization.

Reference behavior replaced: the gaps-and-islands interval union of
``extract_ap_data.py:159-180`` (overlapping activité-partielle
authorization spans merged per establishment). Sessionization is the same
algorithm on point events with a gap threshold — the batch equivalent of
a streaming session window (SURVEY.md §2.10).

Both are single-shuffle window compositions: cumulative max of the end
bound over preceding rows → flag a new island when the next start clears
it → running sum of flags = island id.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_interval_ids(
    df: DataFrame,
    keys: Sequence[str],
    start_col: str,
    end_col: str,
    id_col: str = "interval_id",
) -> DataFrame:
    """Tag each row with the id of the merged (unioned) interval it
    belongs to. Overlapping or touching spans share an id.

    Reference algorithm (``extract_ap_data.py:159-180``): new interval
    when this row's start exceeds the running max of all previous ends.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(start_col), F.col(end_col))
    prev_max_end = F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, -1))
    is_new = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    return df.withColumn(
        id_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def union_intervals(
    df: DataFrame,
    keys: Sequence[str],
    start_col: str,
    end_col: str,
    agg: dict[str, str] | None = None,
) -> DataFrame:
    """Merge overlapping [start, end] spans per key group.

    Returns one row per merged interval: keys, min(start) AS ``start_col``,
    max(end) AS ``end_col``, plus optional extra ``{col: func}`` aggs
    (e.g. summed authorized hours, reference ``extract_ap_data.py:185-207``).
    """
    tagged = with_interval_ids(df, keys, start_col, end_col, "__island")
    aggs = [
        F.min(start_col).alias(start_col),
        F.max(end_col).alias(end_col),
    ] + [getattr(F, fn)(c).alias(f"{fn}_{c}") for c, fn in (agg or {}).items()]
    return tagged.groupBy(*keys, "__island").agg(*aggs).drop("__island")


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap_seconds: float,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign batch session ids: a new session starts when the time since
    the previous event (per key) exceeds ``gap_seconds``.

    The streaming twin is ``F.session_window`` (see ``streaming/``); this
    batch form exists because the reference's temporal logic is all batch.
    Microsecond-precision arithmetic (``unix_micros``) keeps boundary
    decisions exact.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col))
    gap_us = int(gap_seconds * 1_000_000)
    prev_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)) > gap_us),
        1,
    ).otherwise(0)
    return df.withColumn(
        session_col, F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
    chunk_seconds: int = 3600,
) -> DataFrame:
    """Join interval rows that OVERLAP (``l.start ≤ r.end AND r.start ≤
    l.end``), with both sides arbitrarily large — the interval-interval
    analog of the as-of join.

    A naive overlap join is a range (theta) predicate: Spark can only
    execute it as a broadcast nested loop (dead when neither side fits)
    or, with equi-keys, as a hash join whose per-key group pairs are
    still quadratic.  The scale form here is CHUNK BUCKETING — the
    standard interval-index trick (used by every genomic/temporal range
    joiner): each interval explodes into the fixed-width time chunks it
    touches (``sequence(floor(start/w), floor(end/w))``), candidates
    meet in an EQUI-join on (keys…, chunk), the exact overlap predicate
    verifies, and ``dropDuplicates`` collapses multi-chunk matches.
    Recall is exact: overlapping intervals necessarily share a chunk.

    Cost: explode factor = interval length / ``chunk_seconds`` (pick a
    width near the typical interval length: too small explodes rows,
    too wide degrades candidates toward per-key quadratic); shuffle is
    one hash exchange on (keys…, chunk) — no broadcast, no nested loop,
    skew bounded by intervals-per-chunk.  Timestamps are compared at
    second resolution for chunking but the verify predicate uses the
    original values, so sub-second overlaps are preserved.

    A pair whose overlap spans several chunks would match in each of
    them; instead of a ``distinct()`` (which would ALSO collapse
    legitimately duplicate input rows and cost an extra shuffle), each
    pair is emitted only from its canonical WITNESS chunk — the chunk
    containing ``greatest(l.start, r.start)``, which every overlapping
    pair shares by construction.  Input-row multiplicity is therefore
    preserved exactly, matching the naive theta join on ANY input.

    Output: ``keys…`` + the non-key columns of both sides (callers
    alias to avoid collisions) for every overlapping pair.
    """
    ls, le = left_bounds
    rs, re_ = right_bounds
    keys = list(keys)

    def chunked(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "__chunk",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp(F.col(s)) / chunk_seconds),
                    F.floor(F.unix_timestamp(F.col(e)) / chunk_seconds),
                )
            ),
        )
    lc = chunked(left, ls, le)
    rc = chunked(right, rs, re_)
    cond = [lc["__chunk"] == rc["__chunk"]] + [
        lc[k] == rc[k] for k in keys
    ]
    witness = F.floor(
        F.unix_timestamp(F.greatest(lc[ls], rc[rs])) / chunk_seconds
    )
    joined = (
        lc.join(rc, cond)
        .filter(
            (lc[ls] <= rc[re_])
            & (rc[rs] <= lc[le])
            & (lc["__chunk"] == witness)
        )
        .drop(lc["__chunk"])
        .drop(rc["__chunk"])
    )
    for k in keys:
        joined = joined.drop(rc[k])
    return joined
