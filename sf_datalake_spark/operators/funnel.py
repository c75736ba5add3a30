"""Ordered-sequence funnel analysis over an event stream.

The classic product-analytics operator the reference's panel machinery
stops short of (its closest shape is the target-variable join,
``/root/reference/src/sf_datalake/transform.py`` TargetVariable):
given an ordered list of stage event types, count how many users
reached each stage IN ORDER — a user counts for stage *k* only if an
event of stage *k*'s type occurred strictly after the time they first
completed stage *k−1* (and, optionally, within a conversion window of
the stage-1 entry).

Spark-first design (no MATCH_RECOGNIZE, no per-user sort): stage *k*
is one filtered aggregation ``min(ts) WHERE type = stage_k AND ts >
t_{k-1}`` joined back on the user key — *len(stages)* key-partitioned
aggregations, each with map-side partial min, chained by equi-joins on
the user id.  Every join key is the user id, so all stages reuse ONE
shuffle partitioning (Exchange reuse), and each stage's input is
pre-filtered to a single event type before the shuffle.  At 100 TB the
per-stage frames shrink monotonically (stage k+1 joins against only
stage-k completers), so the chain gets cheaper as it deepens; the
funnel table (one row per completer per stage) is bounded by
|users| · |stages|, never by |events|.

The driver-checkable oracle is the textbook correlated form (nested
``min(..) WHERE ts > (SELECT min ..)`` subqueries) — the decorrelated
plan must reproduce it exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_stage_times(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: Column | None = None,
) -> DataFrame:
    """Per-user first-completion time of each funnel stage, in order.

    Returns one row per user that completed stage 1, with columns
    ``(user_col, t_1, t_2, ..., t_n)`` — ``t_k`` is the timestamp of
    the user's first stage-*k* event strictly after ``t_{k-1}``
    (NULL from the first unreached stage onward).  ``within``, when
    given, is an interval expression (e.g. ``F.expr("INTERVAL 7
    DAYS")``) bounding every later stage to ``t_1 + within``.
    """
    if not stages:
        raise ValueError("funnel needs at least one stage")
    first = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_1"))
    )
    out = first
    for k, stage in enumerate(stages[1:], start=2):
        prev = f"t_{k - 1}"
        cand = events.filter(F.col(type_col) == stage).select(
            user_col, F.col(ts_col).alias("__ts")
        )
        cond = F.col("__ts") > F.col(prev)
        if within is not None:
            cond = cond & (F.col("__ts") <= F.col("t_1") + within)
        prev_cols = [user_col, "t_1"] if prev == "t_1" else [user_col, "t_1", prev]
        nxt = (
            cand.join(out.select(*prev_cols), user_col)
            .filter(cond)
            .groupBy(user_col)
            .agg(F.min("__ts").alias(f"t_{k}"))
        )
        out = out.join(nxt, user_col, "left")
    return out


def funnel_counts(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: Column | None = None,
) -> DataFrame:
    """Stage-by-stage funnel summary.

    Returns ``(stage_idx, stage, n_users, conversion)`` — one row per
    stage, ``n_users`` the users whose ordered journey reached the
    stage, ``conversion`` the fraction of stage-1 users (rounded at 6,
    so the single float division is oracle-stable).
    """
    times = funnel_stage_times(
        events, stages, user_col, ts_col, type_col, within
    )
    counts = times.agg(
        *[
            F.count(f"t_{k}").alias(f"n_{k}")
            for k in range(1, len(stages) + 1)
        ]
    )
    # |stages| is tiny (a funnel is 3-6 steps): unpivot the one-row
    # aggregate with a literal stack, no extra shuffle.
    stack_args = ", ".join(
        f"{k}, '{stages[k - 1]}', n_{k}" for k in range(1, len(stages) + 1)
    )
    wide = counts.selectExpr(
        f"stack({len(stages)}, {stack_args}) AS (stage_idx, stage, n_users)"
    )
    # The |stages|-row frame fits one partition by construction; the
    # unbounded-preceding first() is the stage-1 denominator.
    w = Window.orderBy("stage_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    base = F.first("n_users").over(w)
    return wide.select(
        F.col("stage_idx").cast("int"),
        "stage",
        F.col("n_users").cast("long"),
        # An empty funnel (zero stage-1 users) has no defined
        # conversion — NULL, not a divide-by-zero (ANSI mode throws).
        F.when(base == 0, F.lit(None))
        .otherwise(F.round(F.col("n_users") / base, 6))
        .alias("conversion"),
    )
