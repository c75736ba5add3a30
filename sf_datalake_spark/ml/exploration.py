"""Data exploration: PCA projection, one-way ANOVA, quantile summaries.

Reference behaviors replaced (``src/sf_datalake/exploration.py``):

- SVD/PCA over an RDD RowMatrix (``exploration.py:155-177,234-284``) →
  DataFrame-native ``pyspark.ml.feature.PCA`` (no RDD round-trip);
- one-way ANOVA with two Python UDFs for the squared terms
  (``exploration.py:103-152``) → pure Column arithmetic (the UDFs were
  flagged replaceable in SURVEY.md §2.11); F statistic computed
  distributed, p-value always emitted via the scipy-free regularized
  incomplete beta (:func:`f_sf`);
- quantile summaries (``exploration.py:392-401``) → exact
  ``F.percentile`` (distributed) instead of ``df.summary`` strings.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.ml.feature import PCA, VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_project(
    df: DataFrame,
    input_cols: Sequence[str],
    k: int = 2,
    output_col: str = "pca_features",
) -> tuple[DataFrame, list[float]]:
    """Project numeric columns onto the top-k principal components.

    Returns (projected df, explained variance ratios).
    """
    assembled = VectorAssembler(
        inputCols=list(input_cols), outputCol="__pca_input"
    ).transform(df)
    model = PCA(k=k, inputCol="__pca_input", outputCol=output_col).fit(assembled)
    return (
        model.transform(assembled).drop("__pca_input"),
        list(model.explainedVariance),
    )


def pca_trajectories(
    df: DataFrame,
    features: Sequence[str],
    start: str,
    end: str,
    entity_col: str = "siren",
    period_col: str = "période",
    k: int = 2,
) -> DataFrame:
    """Entity trajectories through a FIXED eigenspace over time
    (reference ``exploration.py:234-284``): fit the PCA basis on the
    FIRST period inside ``[start, end)``, then project EVERY period's
    observations through that one basis, yielding per-entity
    ``(cp1..cpk)`` coordinates per period — how each entity drifts in
    the first period's principal plane.

    The reference filters per period in a driver loop and unions one
    DataFrame per period (linear in #periods, all plans serialized
    through the driver).  Here the loop disappears: ONE fit on the
    first-period slice, then ONE distributed ``model.transform`` over
    the whole range — the projection is a per-row matrix multiply, so
    no groupBy, no union, no driver data path; scales to any number of
    periods and rows.
    """
    from pyspark.ml.functions import vector_to_array

    # df[...] resolution (not F.col): period columns like "période"
    # contain non-ASCII chars the SQL identifier parser rejects unquoted
    sliced = df.filter(
        (df[period_col] >= F.lit(start)) & (df[period_col] < F.lit(end))
    )
    first = sliced.agg(F.min(sliced[period_col]).alias("p0")).first()["p0"]
    if first is None:
        raise ValueError(f"pca_trajectories: no rows in [{start}, {end})")
    assembled = VectorAssembler(
        inputCols=list(features), outputCol="__pca_input"
    ).transform(sliced)
    model = PCA(k=k, inputCol="__pca_input", outputCol="__pca_out").fit(
        assembled.filter(assembled[period_col] == F.lit(first))
    )
    arr = vector_to_array(F.col("__pca_out"))
    return model.transform(assembled).select(
        entity_col,
        period_col,
        *[arr.getItem(i).alias(f"cp{i + 1}") for i in range(k)],
    )


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (modified Lentz) —
    the standard public-numerics evaluation (Numerical Recipes §6.4 /
    DLMF 8.17.22); converges in O(√(max(a,b))) iterations for
    x < (a+1)/(a+b+2)."""
    max_it, eps, fpmin = 500, 3e-16, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < fpmin:
        d = fpmin
    d = 1.0 / d
    h = d
    for m in range(1, max_it + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < fpmin:
            d = fpmin
        c = 1.0 + aa / c
        if abs(c) < fpmin:
            c = fpmin
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < fpmin:
            d = fpmin
        c = 1.0 + aa / c
        if abs(c) < fpmin:
            c = fpmin
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < eps:
            break
    return h


def reg_inc_beta(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b), pure stdlib math — no
    scipy.  Continued fraction on the rapidly-convergent side of the
    mean, symmetry I_x(a,b) = 1 − I_{1−x}(b,a) on the other."""
    import math

    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log1p(-x)
    )
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def f_sf(f_stat: float, df1: float, df2: float) -> float:
    """Survival function (1 − CDF) of the F distribution:
    ``P(F > f) = I_{d2/(d2 + d1·f)}(d2/2, d1/2)`` — the p-value of an
    ANOVA F test, computable without scipy (the reference's
    ``exploration.py:103-152`` always emits it via driver scipy)."""
    if f_stat <= 0.0:
        return 1.0
    x = df2 / (df2 + df1 * f_stat)
    return reg_inc_beta(df2 / 2.0, df1 / 2.0, x)


def one_way_anova(
    df: DataFrame, group_col: str, value_col: str
) -> dict[str, float]:
    """One-way ANOVA F statistic across groups, fully distributed.

    Two aggregations (per-group stats, then the scalar combine on ≤
    n_groups rows).  Always emits ``p_value`` — via :func:`f_sf`'s
    pure-python regularized incomplete beta, matching the reference's
    scipy-based output (``exploration.py:103-152``) without the scipy
    dependency.
    """
    stats = (
        df.groupBy(group_col)
        .agg(
            F.count(value_col).alias("n"),
            F.avg(value_col).alias("mean"),
            F.var_samp(value_col).alias("var"),
        )
        .collect()
    )
    # all-null groups contribute nothing (mean is NULL); singleton groups
    # have NULL var_samp — zero within-group SS, not a crash
    stats = [r for r in stats if r["n"] > 0 and r["mean"] is not None]
    if len(stats) < 2:
        raise ValueError("one_way_anova needs at least two non-empty groups")
    n_total = sum(r["n"] for r in stats)
    k = len(stats)
    grand_mean = sum(r["n"] * r["mean"] for r in stats) / n_total
    ss_between = sum(r["n"] * (r["mean"] - grand_mean) ** 2 for r in stats)
    ss_within = sum((r["n"] - 1) * (r["var"] or 0.0) for r in stats)
    df_between, df_within = k - 1, n_total - k
    f_stat = (ss_between / df_between) / (ss_within / df_within)
    return {
        "f_stat": f_stat,
        "df_between": float(df_between),
        "df_within": float(df_within),
        "p_value": f_sf(f_stat, float(df_between), float(df_within)),
    }


def quantile_summary(
    df: DataFrame,
    cols: Sequence[str],
    quantiles: Sequence[float] = (0.05, 0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """Exact quantiles per column (long format: column, quantile, value).

    ``F.percentile`` is exact (full sort per group) — right for
    analysis-time summaries; switch to ``approx_percentile`` for the
    100 TB interactive path.

    All columns are aggregated in ONE scan (a single multi-aggregate
    select), then pivoted to long format by exploding the 1-row result
    — a per-column union of separate scans would read the table
    len(cols) times.
    """
    qlist = ", ".join(str(float(q)) for q in quantiles)
    qarr = F.array(*[F.lit(float(q)) for q in quantiles])
    row = df.agg(
        *[
            F.expr(f"percentile(`{c}`, array({qlist}))").alias(f"__q{i}")
            for i, c in enumerate(cols)
        ]
    )
    stacked = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"__q{i}").alias("__vals"),
                    )
                    for i, c in enumerate(cols)
                ]
            )
        ).alias("__s")
    )
    return stacked.select(
        F.col("__s.column").alias("column"),
        F.posexplode("__s.__vals").alias("__i", "value"),
    ).select(
        "column",
        F.element_at(qarr, F.col("__i") + 1).alias("quantile"),
        "value",
    )
