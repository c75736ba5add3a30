"""As-of join (pandas ``merge_asof`` semantics) — backward / forward /
nearest, per-group, with tolerance.

Reference behavior replaced: ``sf_datalake.utils.merge_asof``
(reference ``src/sf_datalake/utils.py:101-241``, ~140 LoC — its largest
hand-rolled operator). The reference builds a full OUTER join of left and
right key sets before windowing (``utils.py:168-183``) — an avoidable
blowup — and its docstring advertises ``direction='nearest'``
(``utils.py:126``) without implementing it (``utils.py:190-193``).

This implementation uses **union-tag + window** instead (SURVEY.md §7.4):

1. Pack every right row's payload into one non-null struct
   (``__r = struct(right_time, value...)``) — so a right row whose value
   column is legitimately NULL still matches (the reference's
   last/first-ignorenulls-on-the-raw-column trick silently skips it).
2. Union left and right by name (right payload columns never collide
   with left columns).
3. One window per direction over ``(by..., time, side)``:
   ``last(__r, ignorenulls)`` over the preceding frame (backward) /
   ``first(__r, ignorenulls)`` over the following frame (forward). Side
   ordering makes exact-time matches inclusive, like pandas.
4. Filter back to left rows, unpack the struct, null out matches beyond
   ``tolerance``; ``nearest`` picks the closer of the two candidates
   (tie → backward, matching pandas).

Cost at scale: ONE shuffle of |left| + |right| rows on the group keys,
no join, no blowup — strictly better than the reference's outer-join plan
and than a naive theta join (which Spark would execute as a nested-loop).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DateType

_RTIME = "__asof_rtime"


def merge_asof(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
    suffix: str = "",
) -> DataFrame:
    """Attach, to each left row, the nearest right row's values.

    Parameters mirror ``pandas.merge_asof``: ``on`` is the ordered time
    column present in both frames; ``by`` the equality group keys;
    ``direction`` one of backward / forward / nearest; ``tolerance`` the
    maximum allowed distance — in DAYS when ``on`` is a date column,
    in SECONDS when it is a timestamp.

    Determinism note: if ``right`` holds several rows with the SAME
    (by, on) key, which one wins is partition-order-dependent (pandas
    picks input order, which has no distributed equivalent). For fully
    deterministic output pre-reduce the right side, e.g.
    ``dedup_by_rank(right, [*by, on], [tiebreaker])``.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"Unknown direction: {direction}")
    by = list(by)
    vals = list(value_cols) if value_cols is not None else [
        c for c in right.columns if c not in (*by, on)
    ]
    clashes = [f"{v}{suffix}" for v in vals if f"{v}{suffix}" in left.columns]
    if clashes:
        raise ValueError(
            f"Right value column(s) {clashes} collide with left columns — "
            "pass suffix=... (pandas would auto-disambiguate; here the "
            "duplicate names would poison every downstream by-name reference)"
        )

    packed = right.select(
        *by,
        F.col(on),
        F.struct(F.col(on).alias(_RTIME), *[F.col(c) for c in vals]).alias("__r"),
    )
    tagged = left.withColumn("__is_left", F.lit(1)).unionByName(
        packed.withColumn("__is_left", F.lit(0)), allowMissingColumns=True
    )

    is_date = isinstance(left.schema[on].dataType, DateType)

    def dist(a, b):  # non-negative distance from a (earlier) to b (later)
        return F.datediff(b, a) if is_date else (b.cast("double") - a.cast("double"))

    out = tagged
    picks = []
    if direction in ("backward", "nearest"):
        # right rows (side=0) sort before left rows at equal time → inclusive
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out = out.withColumn("__b", F.last("__r", ignorenulls=True).over(w))
        picks.append(("__b", dist(F.col(f"__b.{_RTIME}"), F.col(on))))
    if direction in ("forward", "nearest"):
        # left rows (side=1) sort before right rows at equal time → inclusive
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("__is_left").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        out = out.withColumn("__f", F.first("__r", ignorenulls=True).over(w))
        picks.append(("__f", dist(F.col(on), F.col(f"__f.{_RTIME}"))))

    out = out.filter(F.col("__is_left") == 1)

    # Null out candidates beyond tolerance, then pick the survivor
    # (nearest: smaller distance wins, tie → backward like pandas).
    cands = []
    for name, d in picks:
        valid = F.col(name).isNotNull()
        if tolerance is not None:
            valid = valid & (d <= F.lit(tolerance))
        cands.append((F.when(valid, F.col(name)), F.when(valid, d)))
    if len(cands) == 1:
        chosen = cands[0][0]
    else:
        (b, db), (f, df_) = cands
        chosen = (
            F.when(db.isNotNull() & (df_.isNull() | (db <= df_)), b)
            .when(df_.isNotNull(), f)
        )

    keep = [c for c in left.columns]
    result = out.select(
        *keep,
        *[chosen.getField(v).alias(f"{v}{suffix}") for v in vals],
    )
    return result
