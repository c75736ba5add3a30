"""Per-key isotonic regression via pool-adjacent-violators (PAVA).

Monotone (non-decreasing) least-squares fit of an ordered series —
the classic calibration / trend-shape primitive (Barlow et al. 1972,
public literature; complements ``ml/evaluation.py``'s calibration
curve with a binning-free monotone fit).

Execution shape: one ``applyInPandas`` per key group — the PAVA stack
recursion is data-dependent (pool merges cascade backwards), which a
Catalyst HOF fold cannot express; the Python pass is O(n) per key and
Arrow-batched.  Keys run in parallel; per-key state is the pool stack
(≤ n pairs of int64).

Cross-engine exactness: pools are kept as EXACT INTEGER (sum, count)
pairs — merge decisions compare ``sum_a·cnt_b > sum_b·cnt_a`` (no
float ties) and the fitted value is emitted as the single division
``pool_sum / pool_count``.  By the classical minimax identity

    fit[i] = max_{j<=i} min_{k>=i} avg(y[j..k])

the same value is computable in SQL from integer prefix sums with the
identical final division, so the DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def pava_fit_int(values: Sequence[int], counts: Sequence[int] | None = None):
    """Driver/worker-side PAVA over exact integer sums.

    ``values[i]`` is the i-th point's integer SUM (e.g. cents) and
    ``counts[i]`` its weight (default 1).  Returns the fitted value per
    point as floats ``pool_sum / pool_count``."""
    if counts is None:
        counts = [1] * len(values)
    psum: list[int] = []
    pcnt: list[int] = []
    npts: list[int] = []
    for s, c in zip(values, counts):
        psum.append(int(s))
        pcnt.append(int(c))
        npts.append(1)
        # merge while the previous pool's mean exceeds the new one's
        # (integer cross-multiplication: no float-tie ambiguity)
        while len(psum) > 1 and psum[-2] * pcnt[-1] > psum[-1] * pcnt[-2]:
            psum[-2] += psum[-1]
            pcnt[-2] += pcnt[-1]
            npts[-2] += npts[-1]
            psum.pop()
            pcnt.pop()
            npts.pop()
    out: list[float] = []
    for s, c, n in zip(psum, pcnt, npts):
        out.extend([s / c] * n)
    return out


def isotonic_fit(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Non-decreasing isotonic fit of ``value_col`` (exact integers,
    e.g. cents) over ``order_col`` per key.  Returns the input columns
    plus ``fitted`` (double)."""
    keys = list(keys)
    schema = StructType(
        df.select(*keys, order_col, value_col).schema.fields
    ).add("fitted", "double")

    def fit(pdf) -> Iterator:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(
            drop=True
        )
        pdf["fitted"] = pava_fit_int(pdf[value_col].tolist())
        return pdf

    return (
        df.select(*keys, order_col, value_col)
        .groupBy(*keys)
        .applyInPandas(fit, schema=schema)
    )
