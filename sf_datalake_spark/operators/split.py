"""Grouped train/test splitting — no entity leakage across splits.

Reference behavior replaced: ``sf_datalake.model_selection
.train_test_split`` (reference ``src/sf_datalake/model_selection.py:8-69``):
split the DISTINCT group values (not rows), then membership-filter rows
with left-semi joins so every row of an entity lands in exactly one split.

Two implementations:

- :func:`train_test_split_grouped` — faithful randomized variant
  (``randomSplit`` on distinct groups + two left-semi joins).
- :func:`hash_split` — deterministic, scale-preferred variant: bucket by
  a stable hash of the group key. NO distinct(), NO join, NO shuffle —
  a pure filter that composes with pushdown. At 100 TB the semi-join
  variant shuffles the full table twice; the hash variant is free. It is
  also reproducible across runs/engines, which makes it oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(col: Column | str, n_buckets: int = 10_000, salt: str = "") -> Column:
    """Stable bucket in [0, n_buckets) from md5 of the key (+ salt).

    md5 (not ``F.hash``) so external systems can reproduce the bucketing
    bit-for-bit: bucket = first 8 hex digits of md5, mod n_buckets.
    NULL keys hash as the literal ``"__null__"`` — they land in a bucket
    instead of silently vanishing from every filter.
    """
    c = F.col(col) if isinstance(col, str) else col
    key = F.coalesce(c.cast("string"), F.lit("__null__"))
    h = F.conv(F.substring(F.md5(F.concat(key, F.lit(salt))), 1, 8), 16, 10)
    return (h.cast("bigint") % n_buckets).cast("int")


def hash_split(
    df: DataFrame,
    group_col: str,
    test_fraction: float = 0.2,
    salt: str = "",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic grouped split: (train, test).

    Every row whose ``group_col`` hashes below the cut goes to test; an
    entity is never split across sets. Basis-point resolution (cut =
    fraction × 10 000) so e.g. 0.125 or 0.004 are honored, not rounded
    to whole percent.
    """
    cut = int(round(test_fraction * 10_000))
    bucket = hash_bucket(group_col, 10_000, salt)
    return df.filter(bucket >= cut), df.filter(bucket < cut)


def train_test_split_grouped(
    df: DataFrame,
    group_col: str = "siren",
    train_size: float = 0.8,
    seed: int | None = None,
    deterministic: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Randomized grouped split (reference semantics): randomSplit over
    distinct group values, then left-semi membership joins.

    Kept for API parity/randomized workflows; prefer :func:`hash_split`
    in pipelines (deterministic, join-free).

    ``deterministic=True`` swaps randomSplit for an md5-bucket
    assignment over the distinct group values (salt derived from
    ``seed``) while keeping the same distinct → assign → left-semi
    structure: every row of a group lands on one side, and the
    assignment is reproducible bit-for-bit across engines — the
    variant the DuckDB oracle replays.
    """
    groups = df.select(group_col).distinct()
    if deterministic:
        cut = int(round(train_size * 10_000))
        bucket = hash_bucket(group_col, 10_000, salt=f"gsplit{seed}")
        train_g = groups.filter(bucket < cut)
        test_g = groups.filter(bucket >= cut)
        return (
            df.join(train_g, on=group_col, how="left_semi"),
            df.join(test_g, on=group_col, how="left_semi"),
        )
    train_g, test_g = groups.randomSplit([train_size, 1.0 - train_size], seed=seed)
    return (
        df.join(train_g, on=group_col, how="left_semi"),
        df.join(test_g, on=group_col, how="left_semi"),
    )


def split_by_cluster(
    labeled: DataFrame,
    cluster_col: str = "cluster_id",
    test_fraction: float = 0.2,
    salt: str = "",
) -> DataFrame:
    """Contamination-safe train/test assignment: hash-split on the
    near-dup CLUSTER label, so near-duplicate documents can never
    straddle the boundary (a plain per-document split leaks test
    content into training through its duplicates — the exact failure
    benchmark decontamination exists to prevent).

    Input is the output of ``dedup_clusters`` (or anything carrying a
    cluster label); output adds ``is_test``.  A pure md5-bucket filter
    column — zero shuffle on top of the labeling, deterministic across
    engines and re-runs.
    """
    cut = int(round(test_fraction * 10_000))
    return labeled.withColumn(
        "is_test", (hash_bucket(cluster_col, 10_000, salt) < cut).cast("int")
    )
