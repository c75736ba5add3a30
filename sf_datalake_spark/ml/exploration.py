"""Data exploration: PCA projection, one-way ANOVA, quantile summaries.

Reference behaviors replaced (``src/sf_datalake/exploration.py``):

- SVD/PCA over an RDD RowMatrix (``exploration.py:155-177,234-284``) →
  DataFrame-native ``pyspark.ml.feature.PCA`` (no RDD round-trip);
- one-way ANOVA with two Python UDFs for the squared terms
  (``exploration.py:103-152``) → pure Column arithmetic (the UDFs were
  flagged replaceable in SURVEY.md §2.11); F statistic computed
  distributed, p-value gated behind scipy (not in the pinned env);
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


def one_way_anova(
    df: DataFrame, group_col: str, value_col: str
) -> dict[str, float]:
    """One-way ANOVA F statistic across groups, fully distributed.

    Two aggregations (per-group stats, then the scalar combine on ≤
    n_groups rows); p-value only if scipy is importable.
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
    out = {
        "f_stat": f_stat,
        "df_between": float(df_between),
        "df_within": float(df_within),
    }
    try:  # pragma: no cover - scipy not in the pinned environment
        from scipy.stats import f as f_dist

        out["p_value"] = float(f_dist.sf(f_stat, df_between, df_within))
    except ImportError:
        pass
    return out


def quantile_summary(
    df: DataFrame,
    cols: Sequence[str],
    quantiles: Sequence[float] = (0.05, 0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """Exact quantiles per column (long format: column, quantile, value).

    ``F.percentile`` is exact (full sort per group) — right for
    analysis-time summaries; switch to ``approx_percentile`` for the
    100 TB interactive path.
    """
    qarr = F.array(*[F.lit(float(q)) for q in quantiles])
    per_col = [
        df.select(
            F.lit(c).alias("column"),
            F.posexplode(F.expr(
                f"percentile(`{c}`, array({', '.join(str(float(q)) for q in quantiles)}))"
            )).alias("__i", "value"),
        ).select(
            "column",
            F.element_at(qarr, F.col("__i") + 1).alias("quantile"),
            "value",
        )
        for c in cols
    ]
    out = per_col[0]
    for p in per_col[1:]:
        out = out.unionByName(p)
    return out
