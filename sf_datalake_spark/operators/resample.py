"""Class rebalancing by over/under-sampling.

Reference behavior replaced: ``RandomResampler`` (reference
``transform.py:1057-1161``, ~105 LoC): bring the minority class up to
``min_class_ratio`` of the majority (oversampling with replacement) or the
majority down (undersampling), via per-class ``sample`` + ``union``.

Scale notes: class counts come from ONE ``groupBy().count()`` collected
as a 2-row map (the reference used ``.rdd.collectAsMap()`` — we stay on
the DataFrame API); the resample itself is a narrow per-partition
transformation (no shuffle). Ratios are approximate (Bernoulli/Poisson
sampling), matching the reference's ±tolerance test contract
(``tests/test_transform.py:161-170``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resample_classes(
    df: DataFrame,
    label_col: str = "failure",
    target_ratio: float = 0.35,
    method: str = "undersampling",
    seed: int | None = None,
) -> DataFrame:
    """Rebalance a binary-labeled DataFrame to ``target_ratio`` =
    minority / majority.

    method="oversampling": replicate minority rows (with replacement).
    method="undersampling": subsample majority rows (without replacement).
    """
    counts = {
        r[label_col]: r["count"]
        for r in df.groupBy(label_col).count().collect()
    }
    if len(counts) != 2:
        raise ValueError(f"Expected binary label, got classes: {sorted(counts)}")
    (minor, n_minor), (major, n_major) = sorted(counts.items(), key=lambda kv: kv[1])
    current = n_minor / n_major
    if current >= target_ratio:
        # Already at least as balanced as requested — resampling would
        # either crash (undersample fraction > 1) or silently SHRINK the
        # minority (oversample fraction < 1). No-op is the only correct
        # answer.
        return df
    minority = df.filter(F.col(label_col) == minor)
    majority = df.filter(F.col(label_col) == major)
    if method == "oversampling":
        factor = target_ratio / current
        return majority.union(
            minority.sample(withReplacement=True, fraction=factor, seed=seed)
        )
    if method == "undersampling":
        factor = current / target_ratio
        return minority.union(
            majority.sample(withReplacement=False, fraction=factor, seed=seed)
        )
    raise ValueError(f"Unknown method: {method}")
