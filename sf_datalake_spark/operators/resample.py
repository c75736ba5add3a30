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
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Rebalance a binary-labeled DataFrame to ``target_ratio`` =
    minority / majority.

    method="oversampling": replicate minority rows (with replacement).
    method="undersampling": subsample majority rows (without replacement).
    method="undersampling_hash": deterministic undersampling — majority
    rows are kept when their md5 bucket over ``key_cols`` (required)
    falls under the exact integer threshold ``⌊factor·10⁶⌋``.  Unlike
    ``sample``'s partition-seeded RNG this is reproducible bit-for-bit
    across engines, partitionings, and re-runs (the idiom external
    systems — and the DuckDB oracle — can replay), at the cost of the
    kept count being Bernoulli-by-hash around the target rather than
    exact.
    """
    # Pin the labeled input once (r11, guide §5): the class-count
    # collect below is an ACTION, and without the pin the caller's full
    # feature pipeline executed twice — once for the counts, again for
    # the returned filtered/sampled frame.  A labeled training panel is
    # orders of magnitude smaller than the raw tables it came from, so
    # the checkpoint is cheap at any scale; blocks are
    # ContextCleaner-managed (no persisted-frame leak).
    df = df.localCheckpoint(eager=True)
    counts = {
        r[label_col]: r["count"]
        for r in df.groupBy(label_col).count().collect()
    }
    if len(counts) != 2:
        raise ValueError(f"Expected binary label, got classes: {sorted(counts)}")
    # tie-break on the label too (ADVICE r5): with equal class counts a
    # count-only sort is arbitrary while the DuckDB oracle orders by
    # (n, label) — the engines could disagree on which class gets the
    # hash filter. (label, count) keys here replay ORDER BY n, <label>.
    (minor, n_minor), (major, n_major) = sorted(
        counts.items(), key=lambda kv: (kv[1], kv[0])
    )
    if method == "undersampling_hash":
        if not key_cols:
            raise ValueError("undersampling_hash needs key_cols")
        from fractions import Fraction

        from sf_datalake_spark.operators.split import hash_bucket

        # integer threshold: factor = (n_minor/n_major)/target, scaled
        # to ppm — exact rational arithmetic so the oracle's replay of
        # the same formula can never disagree on the boundary.  When
        # the data is already at least as balanced as requested the
        # threshold is >= 1e6 and the filter keeps everything (the
        # no-op the other methods special-case).
        r = Fraction(target_ratio).limit_denominator(1_000_000)
        thr = (n_minor * r.denominator * 1_000_000) // (r.numerator * n_major)
        key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
        bucket = hash_bucket(key, 1_000_000, salt=f"resample{seed}")
        return df.filter((F.col(label_col) == minor) | (bucket < thr))
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
