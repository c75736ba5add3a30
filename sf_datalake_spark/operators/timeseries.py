"""Per-key time-series smoothing as scan-stage HOF arithmetic.

Holt's linear-trend double exponential smoothing — the iterative
recurrence the reference's single-step forecast heuristic
(`/root/reference/src/sf_datalake/predictions.py` forecast delta)
stops short of.  Spark-first: the recurrence is NOT a driver loop and
NOT a UDF — each key's series is assembled with one groupBy
(collect_list of (order, value) structs, array_sort for a
deterministic order), and the level/trend pair is folded in a single
JVM ``F.aggregate`` higher-order function with a struct accumulator.
One shuffle on the key, state per key = two doubles, arbitrary many
keys in parallel — at 100 TB the cost is the groupBy, not the
recurrence.

Per-key series length is the bound to watch: collect_list holds one
key's full series in executor memory (fine for monthly/daily panels —
thousands of points; for tick-level series, pre-aggregate to the
forecast granularity first, which a forecaster needs anyway).

Cross-engine determinism: alpha/beta default to 0.5 (exactly
representable), the fold is a fixed left-to-right operation sequence
over exact 2-decimal inputs, so both engines execute the identical
IEEE operation stream — the DuckDB oracle replays the recurrence as a
recursive CTE and must match bit-for-bit before the final round(6).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def holt_smoothing(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.5,
) -> DataFrame:
    """Holt linear-trend smoothing per key.

    Standard init ``l_2 = x_2, b_2 = x_2 − x_1`` then for t = 3..n::

        l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}

    Keys with fewer than 2 observations are dropped (no trend is
    defined).  Returns ``(keys..., n_obs, level, trend,
    forecast_next)`` with the floats rounded at 6 —
    ``forecast_next = level + trend`` is the 1-step-ahead forecast.
    """
    a, b = F.lit(float(alpha)), F.lit(float(beta))
    series = df.groupBy(*keys).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(order_col, value_col))),
            lambda s: s[value_col].cast("double"),
        ).alias("__v")
    )
    v = F.col("__v")
    n = F.size(v)
    init = F.struct(
        F.element_at(v, 2).alias("l"),
        (F.element_at(v, 2) - F.element_at(v, 1)).alias("b"),
    )
    # x_3..x_n; greatest() keeps the slice length legal when n == 2.
    rest = F.slice(v, 3, F.greatest(n - 2, F.lit(0)))

    def step(acc, x):
        l_new = a * x + (F.lit(1.0) - a) * (acc["l"] + acc["b"])
        # l_new is repeated rather than bound: Column lambdas have no
        # lets, and re-evaluating the identical expression yields the
        # identical IEEE result (the oracle computes it once — same
        # bits either way).
        b_new = b * (l_new - acc["l"]) + (F.lit(1.0) - b) * acc["b"]
        return F.struct(l_new.alias("l"), b_new.alias("b"))

    fitted = series.filter(n >= 2).select(
        *keys,
        n.cast("int").alias("n_obs"),
        F.aggregate(rest, init, step).alias("__st"),
    )
    # Deliberately UNROUNDED: the fold is bit-exact across engines, and
    # with dyadic α/β the smoothed values land exactly on decimal
    # half-boundaries (…5625), where Spark's HALF_UP and a C library's
    # rounding disagree — rounding would INTRODUCE the only
    # cross-engine divergence. The raw doubles hash identically.
    return fitted.select(
        *keys,
        "n_obs",
        F.col("__st.l").alias("level"),
        F.col("__st.b").alias("trend"),
        (F.col("__st.l") + F.col("__st.b")).alias("forecast_next"),
    )


def cusum_alarms(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    mean_col,
    slack_col,
    threshold_col,
) -> DataFrame:
    """Two-sided CUSUM changepoint detection per key.

    Page's cumulative-sum statistic over each key's ordered series::

        s⁺_t = max(0, s⁺_{t−1} + (x_t − μ − κ))
        s⁻_t = max(0, s⁻_{t−1} + (μ − κ − x_t))

    with an alarm whenever ``max(s⁺_t, s⁻_t) > h`` — the standard
    sequential drift detector (μ = in-control mean, κ = slack,
    h = decision threshold; all three are Column expressions so they
    can be per-key statistics).  Same execution shape as
    :func:`holt_smoothing`: one groupBy, the whole recurrence in a
    single JVM ``F.aggregate`` fold (state: s⁺, s⁻, alarm count,
    running max), no driver loop, no UDF.

    Returns ``(keys..., n_obs, n_alarms, max_cusum, s_pos, s_neg)``,
    floats unrounded (the fold is a fixed IEEE operation sequence —
    deterministic across engines for identical inputs; see the Holt
    note on why rounding would be the riskier choice).
    """
    series = df.groupBy(*keys).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(order_col, value_col))),
            lambda s: s[value_col].cast("double"),
        ).alias("__v"),
        mean_col.alias("__mu"),
        slack_col.alias("__k"),
        threshold_col.alias("__h"),
    )
    v = F.col("__v")
    zero = F.lit(0.0)
    init = F.struct(
        zero.alias("sp"),
        zero.alias("sn"),
        F.lit(0).cast("long").alias("alarms"),
        zero.alias("mx"),
    )

    def step(acc, x):
        sp = F.greatest(zero, acc["sp"] + (x - F.col("__mu") - F.col("__k")))
        sn = F.greatest(zero, acc["sn"] + (F.col("__mu") - F.col("__k") - x))
        peak = F.greatest(sp, sn)
        return F.struct(
            sp.alias("sp"),
            sn.alias("sn"),
            (acc["alarms"] + F.when(peak > F.col("__h"), 1).otherwise(0))
            .alias("alarms"),
            F.greatest(acc["mx"], peak).alias("mx"),
        )

    folded = series.select(
        *keys,
        F.size(v).cast("int").alias("n_obs"),
        F.aggregate(v, init, step).alias("__st"),
    )
    return folded.select(
        *keys,
        "n_obs",
        F.col("__st.alarms").alias("n_alarms"),
        F.col("__st.mx").alias("max_cusum"),
        F.col("__st.sp").alias("s_pos"),
        F.col("__st.sn").alias("s_neg"),
    )


def autocorrelation(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    lags: Sequence[int] = (1, 2, 3),
) -> DataFrame:
    """Sample autocorrelation per key at the given lags.

    ACF_k = Σ_{t=1..n−k} (x_t − μ)(x_{t+k} − μ) / Σ_t (x_t − μ)²,
    the standard biased estimator (constant denominator, undefined for
    a constant series → NULL).  Same execution shape as
    :func:`holt_smoothing`: one groupBy assembles each key's ordered
    series, every sum is a JVM ``F.aggregate`` fold in ascending-t
    order — no driver loop, no UDF, arbitrarily many keys in parallel.

    Cross-engine determinism: pass exact-integer values (e.g. revenue
    in cents) so the series sum is exact; μ = S/n is then one double
    division and every fold replays the identical IEEE operation
    sequence in both engines (the oracle mirrors it with a recursive
    CTE iterating t ascending).  Outputs are deliberately unrounded —
    see the Holt note above.

    Returns ``(keys..., n_obs, acf_<k>...)``.
    """
    series = df.groupBy(*keys).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(order_col, value_col))),
            lambda s: s[value_col].cast("double"),
        ).alias("__v"),
        # exact when value_col is integral — the caller's contract
        F.sum(value_col).alias("__s"),
    )
    v = F.col("__v")
    n = F.size(v)
    mu = (F.col("__s").cast("double") / n).alias("__mu")
    base = series.select(*keys, "__v", mu)
    m = F.col("__mu")

    def dev(i):
        return F.element_at(v, i) - m

    den = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0.0),
        lambda acc, i: acc + dev(i) * dev(i),
    )
    out = [F.size(v).cast("int").alias("n_obs")]
    for k in lags:
        # sequence(1, 0) would DESCEND ([1, 0]) and index out of
        # bounds under ANSI — short series get an empty fold instead.
        idx = F.when(n > k, F.sequence(F.lit(1), n - k)).otherwise(
            F.array().cast("array<int>")
        )
        # bind k via a closure, not a default arg — PySpark derives the
        # HOF arity from the Python signature, so a default parameter
        # would turn this into an (invalid) 3-argument lambda
        def make_step(_k):
            return lambda acc, i: acc + dev(i) * dev(i + _k)

        num = F.aggregate(idx, F.lit(0.0), make_step(k))
        out.append(
            F.when((n > k) & (den != F.lit(0.0)), num / den).alias(f"acf_{k}")
        )
    # den appears once per acf column; Catalyst's common-subexpression
    # elimination shares the fold, and re-evaluation would be
    # bit-identical anyway.
    return base.select(*keys, *out)


def pettitt_test(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Pettitt's nonparametric changepoint test per key (Pettitt 1979).

    For a series x_1..x_n the statistic is ``U_t = 2·S_t − t·(n+1)``
    where ``S_t`` is the running sum of the series' midranks; the test
    reports ``K = max_t |U_t|`` (t = 1..n−1) and the order value at the
    argmax (earliest on ties) as the most likely changepoint, plus the
    standard significance approximation ``p ≈ 2·exp(−6K²/(n³+n²))``.

    Exactness: midranks are carried doubled (``2·midrank = 2·rank_min
    + ties − 1``, always an integer), so ``U_t = S2_t − t·(n+1)`` is
    pure BIGINT arithmetic — K and the changepoint are engine-exact;
    the only float is the rounded p-value.

    Spark-first: no fold and no UDF — two window passes over each
    key's series (one ordered by value for ranks, one ordered by time
    for the running sum) and a final groupBy.  Shuffle count is one
    exchange on ``keys`` (all three windows and the aggregation share
    the partitioning).  Per-key series length is the memory bound, as
    with any rank test — pre-aggregate tick data to the test
    granularity first.
    """
    from pyspark.sql import Window

    keys = list(keys)
    w_val = Window.partitionBy(*keys).orderBy(value_col)
    w_tie = Window.partitionBy(*keys, value_col)
    w_key = Window.partitionBy(*keys)
    # ordered by the RENAMED __ord: the windows below run on `ranked`,
    # where order_col no longer exists under its original name
    w_ord = (
        Window.partitionBy(*keys)
        .orderBy("__ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = df.select(
        *keys,
        F.col(order_col).alias("__ord"),
        (
            F.rank().over(w_val) * F.lit(2)
            + F.count("*").over(w_tie)
            - F.lit(1)
        )
        .cast("bigint")
        .alias("__r2"),
        F.count("*").over(w_key).alias("__n"),
    )
    u = ranked.select(
        *keys,
        "__ord",
        "__n",
        F.row_number()
        .over(Window.partitionBy(*keys).orderBy("__ord"))
        .alias("__t"),
        F.sum("__r2").over(w_ord).alias("__s2"),
    ).withColumn(
        "__absu",
        F.abs(F.col("__s2") - F.col("__t") * (F.col("__n") + F.lit(1))),
    )
    best = (
        u.filter(F.col("__t") < F.col("__n"))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(*keys).orderBy(
                    F.col("__absu").desc(), F.col("__ord").asc()
                )
            ),
        )
        .filter(F.col("__rn") == 1)
    )
    n = F.col("__n").cast("double")
    return best.select(
        *keys,
        F.col("__n").cast("int").alias("n_obs"),
        F.col("__absu").alias("k_stat"),
        F.col("__ord").alias("changepoint"),
        F.round(
            F.lit(2.0)
            * F.exp(
                F.lit(-6.0)
                * F.col("__absu").cast("double")
                * F.col("__absu").cast("double")
                / (n * n * n + n * n)
            ),
            6,
        ).alias("p_approx"),
    )


def classical_decomposition(
    df: DataFrame,
    keys: Sequence[str],
    idx_col: str,
    value_col: str,
    period: int = 12,
) -> DataFrame:
    """Classical additive seasonal decomposition per key, in exact
    integer arithmetic scaled by ``2·period``.

    The textbook 2×p centered moving average (for even p):
    ``trend_t = (x_{t−p/2} + 2·Σ_{t−p/2+1..t+p/2−1} x + x_{t+p/2}) /
    2p`` — carried UNdivided as ``trend2p`` so trend, detrended
    (``detr2p = 2p·x − trend2p``), per-phase seasonal means
    (``seasonal2p = Σ detr2p div count``, truncating div) and residual
    (``resid2p = detr2p − seasonal2p``) are all BIGINTs; callers
    divide by 2p for display.  Rows whose ±p/2 window is incomplete
    get NULL trend/detrended/residual (seasonal means use interior
    rows only).

    ``idx_col`` must be a consecutive integer time index per key
    (e.g. year·12+month): the MA frame is ROW-based, so a GAP in the
    series shifts the window to the nearest observed rows — same
    documented row-based-calendar quirk as the reference's lag
    (operators/windows.with_lag).  Phase = idx mod period.

    Spark-first: one exchange on ``keys`` shared by the MA window and
    a second on (keys, phase) for the seasonal means — no joins, no
    folds, no floats.  Per-key series length bounds window state.
    """
    from pyspark.sql import Window

    keys = list(keys)
    half = period // 2
    w_ma = (
        Window.partitionBy(*keys)
        .orderBy(idx_col)
        .rowsBetween(-(half - 1), half - 1)
    )
    w_full = (
        Window.partitionBy(*keys).orderBy(idx_col).rowsBetween(-half, half)
    )
    w_key = Window.partitionBy(*keys).orderBy(idx_col)
    x = F.col(value_col).cast("bigint")
    with_trend = df.select(
        *keys,
        F.col(idx_col).alias("idx"),
        x.alias("value"),
        (F.col(idx_col) % period).cast("int").alias("phase"),
        F.when(
            F.count("*").over(w_full) == 2 * half + 1,
            F.lag(x, half).over(w_key)
            + F.lit(2) * F.sum(x).over(w_ma)
            + F.lead(x, half).over(w_key),
        ).alias("trend2p"),
    ).withColumn(
        "detr2p",
        F.lit(2 * period) * F.col("value") - F.col("trend2p"),
    )
    w_phase = Window.partitionBy(*keys, "phase")
    out = with_trend.withColumn(
        "seasonal2p",
        F.expr(
            "sum(detr2p) over (partition by {p}, phase)"
            " div count(detr2p) over (partition by {p}, phase)".format(
                p=", ".join(keys)
            )
        ),
    ).withColumn("resid2p", F.col("detr2p") - F.col("seasonal2p"))
    return out.select(
        *keys, "idx", "value", "phase",
        "trend2p", "detr2p", "seasonal2p", "resid2p",
    )


def time_weighted_average(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_cents: "Column | str",
    order_tiebreak: "Column | str | None" = None,
) -> DataFrame:
    """Exact time-weighted average of a piecewise-constant signal: each
    observation's value holds from its timestamp until the NEXT
    observation (last-observation-carried-forward), weighted by that
    holding duration in whole seconds.

    The TWAP/TWAB primitive of tick pipelines: a value sampled at
    irregular times must be averaged by HOW LONG it held, not by how
    often it was sampled — the row-mean over-weights bursty periods.

    Exact-arithmetic contract: values enter as integer cents, durations
    as integer epoch-second differences; the weighted sum is one BIGINT
    Σ cents·seconds per key.  Only the final ratio is a float — a
    single IEEE division of two exactly-agreed integers, bit-identical
    in any engine.  The window's ordering is totalized with
    ``order_tiebreak`` (pass the event id) so duplicate timestamps
    cannot make the lead() pairing — and hence the durations —
    engine-dependent.

    One window (lead) + one aggregation, both keyed/partitioned by
    ``keys``: a single shuffle when the input is not already
    distributed by key.  The last observation per key has no successor
    and contributes zero duration (the observation window closes at the
    last event).

    Returns ``keys + (weighted_cents_seconds, span_seconds, twap)``.
    """
    val = F.col(value_cents) if isinstance(value_cents, str) else value_cents
    order = [F.col(ts_col)]
    if order_tiebreak is not None:
        order.append(
            F.col(order_tiebreak)
            if isinstance(order_tiebreak, str)
            else order_tiebreak
        )
    w = Window.partitionBy(*keys).orderBy(*order)
    epoch = F.unix_timestamp(F.col(ts_col))
    dur = (F.lead(epoch).over(w) - epoch).cast("bigint")
    stepped = df.select(
        *keys,
        (val.cast("bigint") * F.coalesce(dur, F.lit(0))).alias("__wv"),
        F.coalesce(dur, F.lit(0)).alias("__d"),
    )
    return stepped.groupBy(*keys).agg(
        F.sum("__wv").alias("weighted_cents_seconds"),
        F.sum("__d").alias("span_seconds"),
        F.when(
            F.sum("__d") > 0,
            F.sum("__wv").cast("double") / F.sum("__d").cast("double"),
        ).alias("twap"),
    )
