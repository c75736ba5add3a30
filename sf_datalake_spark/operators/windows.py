"""Windowed time-series operators over the (entity, period) panel.

Reference behaviors replaced (SURVEY.md §2.5):
- LagOperator       — ``transform.py:683-764``  (row-frame lag on month index)
- DiffOperator      — ``transform.py:767-843``  (value minus its own lag)
- MovingAverage     — ``transform.py:601-680``  (RANGE frame on month index —
                      calendar-aware, robust to missing months)
- bfill/ffill       — ``transform.py:251-269``  (first/last ignorenulls over
                      directional unbounded frames)
- LinearInterpolation — ``transform.py:939-1054`` (gap interpolation)
- Dedup-by-rank     — ``extract_financial_DGFiP.py:213-222`` /
                      ``extract_debit_urssaf.py:107-135`` (row_number keep-1;
                      deterministic replacement for the reference's
                      order-through-shuffle ``F.last`` idiom, which SURVEY.md
                      §4 flags as undefined behavior)

All are single-window, single-shuffle ops: one hash-exchange on the
partition keys, then sort within partitions. Stacked features over the
same keys (lags 1/2/3/6/12 + diffs + moving averages) reuse ONE exchange
— Catalyst collapses identical window specs — so the whole post-join
feature stack costs one shuffle at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sf_datalake_spark.functions.dates import month_index


def with_lag(
    df: DataFrame,
    cols: str | Sequence[str],
    n_months: int | Sequence[int] = 1,
    keys: Sequence[str] = ("siren",),
    period_col: str = "période",
    suffix_fmt: str = "{col}_lag{n}m",
) -> DataFrame:
    """Row-based lag over the month-indexed panel (reference LagOperator).

    Matches reference semantics (``transform.py:744-758``): order by
    calendar month index, but the lag itself is ROW-based — a missing
    month shifts the lag (golden tests ``tests/test_transform.py:62-98``
    encode this). Use :func:`with_moving_average`-style RANGE frames when
    gap-robust semantics are wanted.
    """
    cols = [cols] if isinstance(cols, str) else list(cols)
    lags = [n_months] if isinstance(n_months, int) else list(n_months)
    w = Window.partitionBy(*keys).orderBy(month_index(period_col))
    out = df
    for c in cols:
        for n in lags:
            out = out.withColumn(suffix_fmt.format(col=c, n=n), F.lag(c, n).over(w))
    return out


def with_diff(
    df: DataFrame,
    cols: str | Sequence[str],
    n_months: int | Sequence[int] = 1,
    keys: Sequence[str] = ("siren",),
    period_col: str = "période",
    suffix_fmt: str = "{col}_diff{n}m",
) -> DataFrame:
    """col − lag_n(col) (reference DiffOperator, ``transform.py:767-843``)."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    lags = [n_months] if isinstance(n_months, int) else list(n_months)
    w = Window.partitionBy(*keys).orderBy(month_index(period_col))
    out = df
    for c in cols:
        for n in lags:
            out = out.withColumn(
                suffix_fmt.format(col=c, n=n), F.col(c) - F.lag(c, n).over(w)
            )
    return out


def with_moving_average(
    df: DataFrame,
    cols: str | Sequence[str],
    n_months: int | Sequence[int] = 12,
    keys: Sequence[str] = ("siren",),
    period_col: str = "période",
    suffix_fmt: str = "{col}_mean{n}m",
) -> DataFrame:
    """Calendar-aware moving average (reference MovingAverage).

    RANGE frame over the integer month index (``transform.py:659-672``):
    the window covers the last ``n`` calendar months *including* the
    current one, regardless of how many panel rows exist in that span.
    """
    cols = [cols] if isinstance(cols, str) else list(cols)
    spans = [n_months] if isinstance(n_months, int) else list(n_months)
    out = df
    for n in spans:
        w = (
            Window.partitionBy(*keys)
            .orderBy(month_index(period_col))
            .rangeBetween(-(n - 1), 0)
        )
        for c in cols:
            out = out.withColumn(suffix_fmt.format(col=c, n=n), F.avg(c).over(w))
    return out


def with_ewma(
    df: DataFrame,
    cols: str | Sequence[str],
    keys: Sequence[str] = ("siren",),
    period_col: str = "période",
    half_life_months: int = 1,
    suffix_fmt: str = "{col}_ewma",
) -> DataFrame:
    """Exponentially-weighted moving average over the panel (extends the
    reference's MovingAverage family with recency weighting).

    Closed form over a cumulative frame — no recursion, no Python:
    ``ewma_t = Σᵢ xᵢ·d^(t−i) / Σᵢ d^(t−i)`` with ``d = 0.5^(1/h)``;
    dividing numerator and denominator by ``d^t`` gives two ordinary
    running sums of ``xᵢ·d^(−i)`` — one shuffle on the entity keys,
    whole-stage codegen'd, identical plan shape to the other window ops.

    ``half_life_months=1`` (d=½) keeps the weights EXACT in binary
    floating point (scaling by powers of two only touches the
    exponent), so results are bit-reproducible across engines — the
    property the DuckDB oracle relies on.

    Overflow-safety: weights are anchored to the per-entity MAX row
    index, ``w_i = d^(m−i) ∈ (0, 1]`` — dividing numerator and
    denominator by the same ``d^(−m)`` leaves every ratio bit-identical
    to the naive ``d^(−i)`` form (for d=½ the rescale is exact), while
    the naive form's ``2^i`` weight overflows to inf past row 1023 and
    poisons the rest of the series with inf/inf = NaN.  With the
    anchor, terms older than ~1075 half-lives UNDERFLOW to 0.0 instead
    — below one double ulp of the result, i.e. exactly the terms EWMA
    is designed to forget — so arbitrarily deep panels stay finite.
    The anchored form is trusted only while its dominant weight is a
    NORMAL double (within 1022 half-lives of the entity's last row —
    subnormal weights would silently shed mantissa bits); earlier rows
    fall back to the naive ascending form, exact up to row 1023.
    Together the two forms cover any entity to ~2045 rows deep; beyond
    that the uncovered middle rows return NULL — loud-by-absence
    instead of silently-NaN or silently-imprecise. Two extra running
    sums over the SAME window partition: still a single shuffle.
    """
    cols = [cols] if isinstance(cols, str) else list(cols)
    d_inv = 2.0 ** (1.0 / half_life_months)  # 1/d; exact when h=1
    w_ord = Window.partitionBy(*keys).orderBy(month_index(period_col))
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_all = w_ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    idx = F.row_number().over(w_ord)
    out = (
        df.withColumn("__ewma_i", idx)
        .withColumn(
            "__ewma_wb",
            F.pow(F.lit(d_inv), F.col("__ewma_i") - F.max("__ewma_i").over(w_all)),
        )
        .withColumn("__ewma_wa", F.pow(F.lit(d_inv), F.col("__ewma_i")))
    )
    dist_from_end = F.max("__ewma_i").over(w_all) - F.col("__ewma_i")
    for c in cols:
        anchored = F.try_divide(
            F.sum(F.col(c) * F.col("__ewma_wb")).over(w_cum),
            F.sum("__ewma_wb").over(w_cum),
        )
        naive = F.try_divide(
            F.sum(F.col(c) * F.col("__ewma_wa")).over(w_cum),
            F.sum("__ewma_wa").over(w_cum),
        )
        out = out.withColumn(
            suffix_fmt.format(col=c),
            F.when(dist_from_end * (1.0 / half_life_months) <= 1022, anchored)
            .when(F.col("__ewma_i") <= 1023, naive),
        )
    return out.drop("__ewma_i", "__ewma_wa", "__ewma_wb")


def with_ffill(
    df: DataFrame,
    cols: str | Sequence[str],
    keys: Sequence[str] = ("siren",),
    order_col: str = "période",
    out_fmt: str = "{col}",
) -> DataFrame:
    """Forward-fill nulls with the last non-null value per entity.

    Reference MissingValuesHandler bfill/ffill (``transform.py:251-269``):
    ``F.last(ignorenulls=True)`` over (unboundedPreceding, currentRow).
    """
    cols = [cols] if isinstance(cols, str) else list(cols)
    w = Window.partitionBy(*keys).orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    out = df
    for c in cols:
        out = out.withColumn(out_fmt.format(col=c), F.last(c, ignorenulls=True).over(w))
    return out


def with_bfill(
    df: DataFrame,
    cols: str | Sequence[str],
    keys: Sequence[str] = ("siren",),
    order_col: str = "période",
    out_fmt: str = "{col}",
) -> DataFrame:
    """Backward-fill nulls with the next non-null value per entity."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    w = Window.partitionBy(*keys).orderBy(order_col).rowsBetween(0, Window.unboundedFollowing)
    out = df
    for c in cols:
        out = out.withColumn(out_fmt.format(col=c), F.first(c, ignorenulls=True).over(w))
    return out


def with_linear_interpolation(
    df: DataFrame,
    cols: str | Sequence[str],
    keys: Sequence[str] = ("siren",),
    order_col: str = "période",
    out_fmt: str = "{col}",
) -> DataFrame:
    """Linearly interpolate interior null gaps per entity (reference
    LinearInterpolationOperator, ``transform.py:939-1054``).

    For each null row between two non-null anchors at row offsets
    (i_prev, i_next) with values (v_prev, v_next):
        v = v_prev + (v_next − v_prev) × (i − i_prev) / (i_next − i_prev)
    Leading/trailing nulls stay null (the reference chains bfill/ffill
    after when full filling is wanted). Single window spec → one shuffle.
    """
    cols = [cols] if isinstance(cols, str) else list(cols)
    w = Window.partitionBy(*keys).orderBy(order_col)
    w_prev = w.rowsBetween(Window.unboundedPreceding, 0)
    w_next = w.rowsBetween(0, Window.unboundedFollowing)
    out = df.withColumn("__rn", F.row_number().over(w))
    for c in cols:
        v_prev = F.last(c, ignorenulls=True).over(w_prev)
        v_next = F.first(c, ignorenulls=True).over(w_next)
        i_prev = F.last(F.when(F.col(c).isNotNull(), F.col("__rn")), ignorenulls=True).over(w_prev)
        i_next = F.first(F.when(F.col(c).isNotNull(), F.col("__rn")), ignorenulls=True).over(w_next)
        interp = v_prev + (v_next - v_prev) * (F.col("__rn") - i_prev) / (i_next - i_prev)
        out = out.withColumn(
            out_fmt.format(col=c),
            F.when(F.col(c).isNotNull(), F.col(c)).otherwise(
                F.when(i_prev.isNotNull() & i_next.isNotNull(), interp)
            ),
        )
    return out.drop("__rn")


def dedup_by_rank(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """Keep exactly one row per key group, ranked by ``order_by``.

    Deterministic replacement for every "keep last/best row" pattern in
    the reference (``extract_financial_DGFiP.py:213-222``,
    ``extract_debit_urssaf.py:107-135``, ``altares_preprocessing.py:74-76``).
    Callers must make ``order_by`` a total order (include a unique
    tiebreaker) for fully deterministic output.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") == 1)
        .drop("__rank")
    )


def global_rank_two_pass(
    df: DataFrame,
    order_cols: Sequence[str],
    rank_col: str = "global_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT dense global row-number over ``order_cols`` (a total
    order — include a tiebreak key) WITHOUT a single-partition sort:
    the classic two-pass range-partitioned rank.

    Pass 1: ``repartitionByRange`` on the order columns (Spark samples
    range boundaries), then count rows per physical partition — a
    ``spark_partition_id`` groupBy whose result is ONE ROW PER
    PARTITION, collected to the driver (hundreds of scalars at any
    scale).  Pass 2: each partition sorts locally (the window below
    partitions BY the physical partition id, so its state is one
    range slice) and adds its precomputed offset.

    This is the operator the exact-percentile / quantile_summary notes
    point to for the 10⁹+-row path: wall-clock is one range exchange +
    local sorts, vs the unpartitionable ``row_number() OVER ()`` whose
    single reducer owns the entire table.

    The range boundaries Spark samples are NOT deterministic across
    runs — but the OUTPUT is: ranks depend only on the total order,
    not where the cuts fall (asserted by the oracle gate against
    ``row_number() OVER ()``).
    """
    from pyspark.sql import Window

    parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    ranged = (
        df.repartitionByRange(int(parts), *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        # PIN the partitioning: repartitionByRange RE-SAMPLES its
        # boundaries on every action, so without severing lineage the
        # offset pass and the rank pass could see DIFFERENT cuts and
        # silently mis-rank (caught by the oracle gate at sf0.01).
        # On a cluster use reliable checkpoint()/persist-to-disk.
        .localCheckpoint(eager=True)
    )
    # tiny: one row per partition
    counts = {
        r["__pid"]: r["n"]
        for r in ranged.groupBy("__pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(p, o) for p, o in offsets.items()], "__pid int, __off bigint"
        )
    )
    w_local = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        ranged.join(off_df, "__pid")
        .withColumn(
            rank_col,
            (F.row_number().over(w_local) + F.col("__off")).cast("bigint"),
        )
        .drop("__pid", "__off")
    )
