"""Per-group model fitting — the "many small models" pattern.

MLlib fits ONE distributed model over all rows; a segmented business
(one risk model per sector, one demand model per store, one forecast
per SKU) instead needs thousands of INDEPENDENT small fits.  The scale
shape for that is the opposite of MLlib's: ship each group's rows to
one task (``applyInPandas`` — a single hash shuffle on the group key)
and fit in-process with numpy, embarrassingly parallel across groups.
At 100 TB the constraint is the LARGEST group (document skew: a group
must fit one executor's memory; pre-aggregate or sample oversized
groups), never the group count — 10 M tiny models cost one shuffle.

The solver is plain IRLS (Newton) on L2-regularized logistic
regression — closed-form-ish, deterministic, no sklearn dependency —
and the test suite cross-checks coefficients against MLlib's
LogisticRegression on a single group to pin the semantics
(reference = same model family the engine's global path uses,
``ml/models.py``).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame


def _irls_logistic(
    X: np.ndarray,
    y: np.ndarray,
    reg: float = 0.0,
    max_iter: int = 50,
    tol: float = 1e-10,
) -> tuple[np.ndarray, float, int]:
    """L2-regularized logistic regression by IRLS.  Returns
    (coefficients, intercept, iterations).  ``reg`` matches MLlib's
    ``regParam`` with ``standardization=False``: the penalty is
    ``reg · n · ½‖w‖²`` in the summed-loss form (MLlib regularizes the
    MEAN loss, so its regParam scales by n here), intercept
    unpenalized.
    """
    n, d = X.shape
    Xb = np.hstack([X, np.ones((n, 1))])
    w = np.zeros(d + 1)
    pen = np.full(d + 1, reg * n)
    pen[-1] = 0.0  # intercept unpenalized
    for it in range(1, max_iter + 1):
        z = Xb @ w
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -35, 35)))
        g = Xb.T @ (p - y) + pen * w
        s = np.maximum(p * (1 - p), 1e-12)
        H = (Xb * s[:, None]).T @ Xb + np.diag(pen)
        step = np.linalg.solve(H, g)
        w -= step
        if float(np.abs(step).max()) < tol:
            break
    return w[:-1], float(w[-1]), it


def fit_predict_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    feature_cols: Sequence[str],
    label_col: str,
    reg: float = 1e-6,
    min_rows: int = 8,
    sort_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Fit one logistic model PER GROUP and score the group's own rows.

    Output: group cols + feature cols + ``label`` + ``p1`` (the group
    model's probability) + ``group_n`` + ``converged_iter``.  Groups
    with fewer than ``min_rows`` rows or a single label class emit
    ``p1 = base rate`` (a degenerate-but-safe model) with
    ``converged_iter = 0``.

    One shuffle on the group key; each fit is local numpy (Arrow
    batch in, Arrow batch out).  IRLS from zeros has no random state,
    but numpy's float reductions depend on ROW ORDER, which the
    shuffle does not fix — pass ``sort_cols`` (a per-group unique key)
    whenever bit-reproducible output matters.
    """
    import pandas as pd

    group_cols = list(group_cols)
    feature_cols = list(feature_cols)
    schema = ", ".join(
        [f"`{c}` {t}" for c, t in df.select(*group_cols).dtypes]
        + [f"`{c}` double" for c in feature_cols]
        + ["label double", "p1 double", "group_n bigint", "converged_iter int"]
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        if sort_cols:
            pdf = pdf.sort_values(list(sort_cols), kind="mergesort")
        X = pdf[feature_cols].to_numpy(dtype=float)
        y = pdf[label_col].to_numpy(dtype=float)
        n = len(pdf)
        out = pdf[group_cols].copy()
        for c in feature_cols:
            out[c] = X[:, feature_cols.index(c)]
        out["label"] = y
        out["group_n"] = n
        if n < min_rows or y.min() == y.max():
            out["p1"] = float(y.mean())
            out["converged_iter"] = 0
            return out[
                group_cols + feature_cols
                + ["label", "p1", "group_n", "converged_iter"]
            ]
        coef, intercept, it = _irls_logistic(X, y, reg=reg)
        z = X @ coef + intercept
        out["p1"] = 1.0 / (1.0 + np.exp(-np.clip(z, -35, 35)))
        out["converged_iter"] = it
        return out[
            group_cols + feature_cols
            + ["label", "p1", "group_n", "converged_iter"]
        ]

    return (
        df.select(
            *dict.fromkeys(
                [*group_cols, *feature_cols, label_col, *(sort_cols or [])]
            )
        )
        .groupBy(*group_cols)
        .applyInPandas(fit, schema=schema)
    )
