"""Model evaluation — Spark-native, no sklearn.

Reference behavior replaced: ``sf_datalake.evaluation`` (reference
``src/sf_datalake/evaluation.py:17-101``) which collected scores to the
driver and looped sklearn's ``fbeta_score`` over 101 thresholds — a
driver-side O(n_thresholds × n_rows) pass. Here threshold tuning is
distributed AND single-pass: scores are bucketed to the candidate
threshold grid (one groupBy over ≤ n_thr groups), cumulated on the
driver over the tiny bucket histogram, and every F-beta / precision /
recall at every threshold falls out exactly. Alert levels
(``generate_frontend_document.py:214-230``) are a Column expression.
"""

from __future__ import annotations

from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def threshold_histogram_df(
    predictions: DataFrame, score_col: str, label_col: str, n_thr: int = 101
) -> DataFrame:
    """(bucket, n_pos, n_neg) histogram with bucket = floor(score·(n_thr−1)).

    Exact for thresholds on the even grid k/(n_thr−1): score ≥ t ⇔
    bucket ≥ k, where t is the ACTUAL double k/g the threshold loop and
    downstream ``score ≥ t`` comparisons use. ONE aggregation of ≤ n_thr
    rows regardless of input size.

    Two steps make it exact rather than merely close:

    1. ``floor(score·g + 1e-9)`` — the guard repairs scores equal to
       grid values like 0.29 whose score·g computes as k−1e-14 (they
       would floor into bucket k−1, counting a score EQUAL to a
       threshold as below it).
    2. The guard alone can over-promote a score genuinely (but
       sub-guard) below the grid point, e.g. 0.29−1e-12: score·g+1e-9
       crosses 29 though score < double(0.29). So the candidate bucket
       is checked against the actual double threshold k0/g — IEEE
       division of the same integers the threshold loop divides — and
       stepped down one bucket when score < k0/g. floor+guard is never
       LOW by more than representation error, so a single downward
       correction suffices and the result is bit-exact against the grid.
    """
    g = n_thr - 1
    s = F.col(score_col)
    k0 = F.least(F.greatest(F.floor(s * g + F.lit(1e-9)), F.lit(0)), F.lit(g))
    bucket = (
        F.when(s < k0.cast("double") / F.lit(float(g)), k0 - 1).otherwise(k0).cast("int")
    )
    return predictions.groupBy(bucket.alias("b")).agg(
        F.count(F.when(F.col(label_col) == 1, 1)).alias("pos"),
        F.count(F.when(F.col(label_col) == 0, 1)).alias("neg"),
    )


def _threshold_histogram(
    predictions: DataFrame, score_col: str, label_col: str, n_thr: int
) -> list[tuple[int, int, int]]:
    """Collected form of :func:`threshold_histogram_df` (≤ n_thr rows)."""
    rows = threshold_histogram_df(predictions, score_col, label_col, n_thr).collect()
    return [(r["b"], r["pos"], r["neg"]) for r in rows]


def optimal_fbeta_thresholds(
    predictions: DataFrame,
    score_col: str = "probability",
    label_col: str = "failure",
    betas: tuple[float, ...] = (0.5, 2.0),
    n_thr: int = 101,
) -> dict[float, float]:
    """Thresholds maximizing F-beta for each beta (reference
    ``evaluation.py:17-54``), distributed single-pass.

    Ties resolve to the LOWEST maximizing threshold, matching
    ``np.argmax`` over an ascending threshold grid.
    """
    hist = {b: (p, n) for b, p, n in _threshold_histogram(
        predictions, score_col, label_col, n_thr)}
    g = n_thr - 1
    total_pos = sum(p for p, _ in hist.values())
    best: dict[float, tuple[float, float]] = {beta: (-1.0, 0.0) for beta in betas}
    # suffix sums: tp(k) = positives with bucket ≥ k, fp(k) likewise
    tp, fp = 0, 0
    scores: dict[int, tuple[int, int]] = {}
    for k in range(g, -1, -1):
        p, n = hist.get(k, (0, 0))
        tp, fp = tp + p, fp + n
        scores[k] = (tp, fp)
    for beta in betas:
        b2 = beta * beta
        for k in range(0, n_thr):
            tp, fp = scores[k]
            fn = total_pos - tp
            denom = (1 + b2) * tp + fp + b2 * fn
            f = (1 + b2) * tp / denom if denom else 0.0
            if f > best[beta][0]:
                best[beta] = (f, k / g)
    return {beta: thr for beta, (_, thr) in best.items()}


def with_alert_levels(
    predictions: DataFrame,
    thresholds: dict[float, float],
    score_col: str = "probability",
    output_col: str = "alert_level",
) -> DataFrame:
    """Alert level = 2 − (p < t_precision) − (p < t_recall) ∈ {0,1,2}
    (reference ``generate_frontend_document.py:214-230``)."""
    t_hi = max(thresholds.values())
    t_lo = min(thresholds.values())
    p = F.col(score_col)
    level = (
        F.lit(2)
        - F.when(p < t_hi, 1).otherwise(0)
        - F.when(p < t_lo, 1).otherwise(0)
    )
    return predictions.withColumn(output_col, level)


def binary_metrics(
    predictions: DataFrame,
    raw_col: str = "rawPrediction",
    label_col: str = "failure",
) -> dict[str, float]:
    """AUC-ROC and AUC-PR via MLlib evaluators (reference used sklearn
    on collected arrays, ``evaluation.py:57-101``)."""
    out = {}
    for name, metric in (("auc_roc", "areaUnderROC"), ("auc_pr", "areaUnderPR")):
        out[name] = BinaryClassificationEvaluator(
            rawPredictionCol=raw_col, labelCol=label_col, metricName=metric
        ).evaluate(predictions)
    return out


def confusion_matrix_df(
    predictions: DataFrame,
    threshold: float = 0.5,
    score_col: str = "probability",
    label_col: str = "failure",
) -> DataFrame:
    """One-row (tp, fp, tn, fn) DataFrame at a threshold — the lazy
    plan behind :func:`confusion_matrix`, usable as a query result."""
    pred = (F.col(score_col) >= threshold).cast("int")
    lab = F.col(label_col)
    return predictions.agg(
        F.count(F.when((pred == 1) & (lab == 1), 1)).alias("tp"),
        F.count(F.when((pred == 1) & (lab == 0), 1)).alias("fp"),
        F.count(F.when((pred == 0) & (lab == 0), 1)).alias("tn"),
        F.count(F.when((pred == 0) & (lab == 1), 1)).alias("fn"),
    )


def confusion_matrix(
    predictions: DataFrame,
    threshold: float = 0.5,
    score_col: str = "probability",
    label_col: str = "failure",
) -> dict[str, int]:
    """{tp, fp, tn, fn} at a threshold — one aggregation."""
    row = confusion_matrix_df(predictions, threshold, score_col, label_col).first()
    return {k: row[k] for k in ("tp", "fp", "tn", "fn")}


def calibration_buckets(
    predictions: DataFrame,
    n_bins: int = 10,
    score_col: str = "probability",
    label_col: str = "failure",
) -> DataFrame:
    """Reliability-diagram buckets: scores binned into ``n_bins`` equal
    widths over [0, 1], each with its count, mean predicted score, and
    observed positive rate — a well-calibrated model has
    ``mean_score ≈ frac_positive`` per bucket.  One grouped aggregation
    (the bin id is integer arithmetic, score 1.0 clamped into the top
    bin); emits the per-bucket Brier contribution so the summed score
    decomposes over buckets.
    """
    s = F.col(score_col)
    bin_id = F.least(
        F.floor(s * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    lab = F.col(label_col).cast("double")
    return (
        predictions.select(bin_id.alias("bin"), s.alias("__s"), lab.alias("__y"))
        .groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.avg("__s"), 6).alias("mean_score"),
            F.round(F.avg("__y"), 6).alias("frac_positive"),
            F.round(F.sum((F.col("__s") - F.col("__y")) ** 2), 6).alias(
                "brier_sum"
            ),
        )
    )


def population_stability(
    df: DataFrame,
    value_col: str,
    group_col: str,
    base_group: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
    smoothing: float = 0.5,
) -> DataFrame:
    """Population stability index of ``value_col``'s distribution in
    every group against ``base_group`` — the standard drift monitor
    between a model's training population and live traffic
    (rule of thumb: PSI < 0.1 stable, > 0.25 investigate).

    ``PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i)`` over ``n_bins`` fixed
    equal-width bins spanning [lo, hi] (outliers clamp into the edge
    bins — explicit edges keep the binning engine-portable, unlike
    quantile edges); ``smoothing`` pseudo-counts per bin keep empty
    bins finite, deterministically.

    Plan: one groupBy(group, bin) count + a broadcast join of the base
    group's (tiny, ≤ n_bins rows) distribution onto every other
    group's, + one groupBy(group) sum — nothing scans twice.
    """
    v = F.col(value_col).cast("double")
    width = (hi - lo) / n_bins
    bin_id = F.least(
        F.greatest(F.floor((v - lo) / width), F.lit(0)).cast("int"),
        F.lit(n_bins - 1),
    )
    counts = (
        df.select(F.col(group_col).alias("grp"), bin_id.alias("bin"))
        .groupBy("grp", "bin")
        .agg(F.count("*").alias("c"))
    )
    totals = counts.groupBy("grp").agg(F.sum("c").alias("t"))
    # densify: every (grp, bin) pair exists so empty bins get the
    # smoothed floor instead of silently dropping out of the sum
    grps = totals.select("grp", "t")
    bins = df.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    full = (
        grps.crossJoin(F.broadcast(bins))
        .join(counts, ["grp", "bin"], "left")
        .select(
            "grp",
            "bin",
            (
                (F.coalesce(F.col("c"), F.lit(0)) + smoothing)
                / (F.col("t") + smoothing * n_bins)
            ).alias("p"),
        )
    )
    base = full.filter(F.col("grp") == base_group).select(
        "bin", F.col("p").alias("q")
    )
    return (
        full.filter(F.col("grp") != base_group)
        .join(F.broadcast(base), "bin")
        .groupBy("grp")
        .agg(
            F.round(
                F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))),
                6,
            ).alias("psi")
        )
        .select(F.col("grp").alias(group_col), "psi")
    )


def split_conformal_intervals(
    df: DataFrame,
    group_col: str,
    value_cents: str,
    split_bucket: Column,
    alpha_ppm: int = 100_000,
) -> DataFrame:
    """Split-conformal prediction intervals per group, all-integer
    (Vovk/Papadopoulos split-conformal, the distribution-free coverage
    recipe): a train fold fits the point predictor (here the per-group
    lower median), a calibration fold takes the ceil((n+1)·(1−α))-th
    smallest absolute residual as the interval half-width q̂, and a
    test fold measures realized coverage.

    ``split_bucket`` is a deterministic 0–9999 bucket column (use
    ``operators.split.hash_bucket`` — reproducible splits are what
    makes the whole procedure oracle-checkable): train <6000,
    calibration 6000–7999, test ≥8000.

    Exact-arithmetic contract: values are integer cents; the median is
    nearest-rank (lower); q̂'s rank is ceil in integer arithmetic with
    the conformal +1; ranks beyond n_cal clamp to the max residual (the
    finite-sample ∞ case, documented); coverage is exact ppm.  Three
    groupBy/window passes over the fold frames, all partitioned by the
    group — no driver math.

    Returns one row per group: ``(group, n_train, n_cal, n_test,
    med_cents, q_hat_cents, coverage_ppm)``.
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(group_col).alias("g"),
        F.col(value_cents).cast("bigint").alias("v"),
        split_bucket.alias("b"),
    )
    train = base.filter(F.col("b") < 6000)
    cal = base.filter((F.col("b") >= 6000) & (F.col("b") < 8000))
    test = base.filter(F.col("b") >= 8000)

    w_med = Window.partitionBy("g").orderBy("v")
    med = (
        train.select(
            "g",
            "v",
            F.row_number().over(w_med).alias("rn"),
            F.count("*").over(Window.partitionBy("g")).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("g", F.col("v").alias("med_cents"), F.col("n").alias("n_train"))
    )

    w_res = Window.partitionBy("g").orderBy("r")
    resid = cal.join(med, "g").select(
        "g",
        "med_cents",
        "n_train",
        F.abs(F.col("v") - F.col("med_cents")).alias("r"),
    )
    qhat = (
        resid.select(
            "g",
            "med_cents",
            "n_train",
            "r",
            F.row_number().over(w_res).alias("rn"),
            F.count("*").over(Window.partitionBy("g")).alias("n_cal"),
        )
        .filter(
            F.col("rn")
            == F.least(
                # integer ceil((n+1)·(1−α)): no float ever touches the rank
                F.expr(
                    f"((n_cal + 1) * {1_000_000 - alpha_ppm}L + 999999L) "
                    "div 1000000"
                ),
                F.col("n_cal"),
            )
        )
        .select("g", "med_cents", "n_train", "n_cal",
                F.col("r").alias("q_hat_cents"))
    )
    cov = (
        test.join(qhat, "g")
        .groupBy("g", "med_cents", "n_train", "n_cal", "q_hat_cents")
        .agg(
            F.count("*").cast("bigint").alias("n_test"),
            F.expr(
                "sum(case when abs(v - med_cents) <= q_hat_cents "
                "then 1 else 0 end) * 1000000L div count(*)"
            ).alias("coverage_ppm"),
        )
    )
    return cov.select(
        F.col("g").alias(group_col),
        F.col("n_train").cast("bigint"),
        F.col("n_cal").cast("bigint"),
        "n_test",
        "med_cents",
        "q_hat_cents",
        "coverage_ppm",
    )


def calibration_buckets_ppm(
    predictions: DataFrame,
    n_bins: int = 10,
    score_ppm_col: str = "p_ppm",
    label_col: str = "failure",
) -> DataFrame:
    """Reliability-diagram buckets over a MICRO-UNIT integer score
    (round-9: the exact-cents twin of :func:`calibration_buckets`, for
    scores produced by the fixed-point model family —
    ``ml/grouped.irls_logistic_groups_ppm``).

    Everything is engine-exact: ``bin = min(p_ppm div 1e5, n_bins-1)``
    is integer arithmetic; ``mean_score``/``frac_positive`` divide an
    exact DECIMAL(38,0)/HUGEINT integer sum by the count (NOT ``avg``,
    whose double accumulator goes order-dependent once a bucket's sum
    passes 2^53 ≈ 9e9 rows at p_ppm ≤ 1e6 — r09 advice #2); the
    per-bucket Brier contribution sums ``(p_ppm − 1e6·y)²`` (exact
    int64 per row) before ONE division by 1e12 — so a DuckDB twin
    hashes identically, which the float form's order-dependent
    ``avg``/``sum`` of doubles cannot guarantee.
    """
    p = F.col(score_ppm_col).cast("bigint")
    y = F.col(label_col).cast("bigint")
    width = 1_000_000 // n_bins
    return (
        predictions.select(
            F.expr(f"least({score_ppm_col} div {width}, {n_bins - 1})")
            .cast("int").alias("bin"),
            p.alias("__p"),
            y.alias("__y"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(
                F.expr("CAST(sum(CAST(__p AS DECIMAL(38,0))) AS DOUBLE)")
                / F.expr("CAST(count(*) AS DOUBLE)") / 1e6,
                6,
            ).alias("mean_score"),
            F.round(
                F.expr("CAST(sum(CAST(__y AS DECIMAL(38,0))) AS DOUBLE)")
                / F.expr("CAST(count(*) AS DOUBLE)"),
                6,
            ).alias("frac_positive"),
            F.round(
                F.expr(
                    "CAST(sum(CAST((__p - 1000000 * __y) * (__p - 1000000 * __y)"
                    " AS DECIMAL(38,0))) AS DOUBLE)"
                ) / 1e12,
                6,
            ).alias("brier_sum"),
        )
    )
