"""Privacy-preserving release operators: k-anonymity auditing and
deterministic Laplace-noised counts.

Training-data-pipeline operators (beyond the reference's surface):
corpora and panels that leave the trust boundary need (a) an audit of
how identifiable the quasi-identifier combinations are (k-anonymity,
Sweeney 2002) and (b) noise on released aggregates (the Laplace
mechanism of Dwork et al. 2006). Both are public-domain methodology.

Determinism note: production DP draws fresh randomness per release —
that is the privacy guarantee, and it is inherently NOT
oracle-checkable. This operator keeps the exact Laplace inverse-CDF
shape but derives the uniform from an md5 of (group key, salt), which
makes the release a pure function of (data, salt): reproducible,
cross-engine testable, and honest about what it is — a MECHANISM
DEMONSTRATION whose noise source must be swapped for a CSPRNG (and
the salt never reused) before any real privacy claim. The swap is one
column expression.

Scale: both operators are one aggregation over the grouping keys —
map-side combinable, no joins, no per-row state beyond the group
counters.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_audit(
    df: DataFrame,
    qi_cols: Sequence[Column | str],
    k: int,
    by: Sequence[str] = (),
) -> DataFrame:
    """Audit quasi-identifier classes against a k-anonymity floor.

    Groups rows by the quasi-identifier columns ``qi_cols`` (the
    attacker's assumed linkage keys), then reports per ``by`` group
    (or globally when ``by`` is empty):

    - ``n_classes`` — QI equivalence classes seen
    - ``n_unsafe_classes`` — classes with fewer than ``k`` rows
    - ``rows_unsafe`` — rows in those classes (what suppression or
      generalization would have to touch)
    - ``suppress_ppm`` — exact parts-per-million of rows unsafe
      (truncating integer division)

    Two aggregations (QI classes, then the rollup) — the first is the
    only one that sees the data; its key cardinality IS the number of
    QI classes, which a sane QI choice keeps far below the row count.
    """
    qi = [F.col(c) if isinstance(c, str) else c for c in qi_cols]
    by = list(by)
    classes = df.groupBy(
        *by, *[q.alias(f"__qi{i}") for i, q in enumerate(qi)]
    ).agg(F.count("*").alias("__n"))
    agg = classes.groupBy(*by).agg(
        F.count("*").cast("bigint").alias("n_classes"),
        F.sum((F.col("__n") < k).cast("bigint")).alias("n_unsafe_classes"),
        F.sum(F.when(F.col("__n") < k, F.col("__n")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("rows_unsafe"),
        F.sum("__n").cast("bigint").alias("__total"),
    )
    return agg.select(
        *by,
        "n_classes",
        "n_unsafe_classes",
        "rows_unsafe",
        F.expr("rows_unsafe * 1000000L div __total").alias("suppress_ppm"),
    )


def laplace_noisy_counts(
    df: DataFrame,
    keys: Sequence[str],
    scale_b: float,
    salt: str,
) -> DataFrame:
    """Per-key counts released through the Laplace mechanism with
    deterministic md5-derived noise (see module docstring for why).

    noise = -b · sign(u - 1/2) · ln(1 - 2|u - 1/2|), the standard
    Laplace inverse CDF, with u = (md5_32(key ‖ salt) mod 10⁶ + 0.5) /
    10⁶ ∈ (0, 1). For a count query (sensitivity 1), ``scale_b`` = 1/ε.
    The released value is rounded at 6 decimals — the single ln is the
    only float, and both engines' libm agree far beyond that.

    Returns ``keys + (true_n, noisy_n)`` — ``true_n`` is kept for
    audit/test parity and must obviously be DROPPED from any actual
    release.
    """
    keys = list(keys)
    agg = df.groupBy(*keys).agg(F.count("*").alias("true_n"))
    key_str = F.concat_ws(
        "", *[F.col(c).cast("string") for c in keys]
    )
    u32 = F.conv(
        F.substring(F.md5(F.concat(key_str, F.lit(salt))), 1, 8), 16, 10
    ).cast("bigint")
    u = (u32 % 1_000_000 + F.lit(0.5)) / F.lit(1_000_000.0)
    centered = u - F.lit(0.5)
    noise = (
        -F.lit(float(scale_b))
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    return agg.select(
        *keys,
        F.col("true_n").cast("bigint").alias("true_n"),
        F.round(F.col("true_n") + noise, 6).alias("noisy_n"),
    )
