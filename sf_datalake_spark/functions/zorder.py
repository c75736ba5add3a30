"""Z-order (Morton) interleaving — multi-dimensional clustering keys.

Storage-layout operator beyond the reference's surface: sorting (or
range-partitioning) a table by the bit-interleaved Z-value of two scan
dimensions keeps rows close in BOTH dimensions physically co-located,
so parquet row-group min/max statistics prune scans for predicates on
EITHER column — the standard lakehouse answer to "partition by one key,
filter by two".

The interleave is the overflow-free per-bit form ``Σᵢ bitᵢ(a)·4^i +
2·Σᵢ bitᵢ(b)·4^i`` — plain shifts/ands on small values, no wrapping
64-bit magic-mask tricks, so the SAME arithmetic runs as Spark Column
expressions and as the DuckDB oracle SQL with identical results.
Expressions are generated once per call (``2·n_bits`` terms) and fully
whole-stage-codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(a: Column | str, b: Column | str, n_bits: int = 16) -> Column:
    """Morton Z-value of two non-negative ints, ``n_bits`` bits each
    (values are masked to the low ``n_bits`` first; 16 bits × 2 → a
    32-bit Z — plenty for file-layout clustering, where only relative
    order matters)."""
    ca = (F.col(a) if isinstance(a, str) else a).cast("long")
    cb = (F.col(b) if isinstance(b, str) else b).cast("long")
    z = F.lit(0).cast("long")
    for i in range(n_bits):
        z = z + F.shiftleft(F.shiftright(ca, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def z_value_sql(a: str, b: str, n_bits: int = 16) -> str:
    """The identical interleave as an ANSI SQL expression string (used
    by the DuckDB oracle; also valid Spark SQL)."""
    terms = []
    for i in range(n_bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    n_bits: int = 16,
    n_files: int | None = None,
    file_format: str = "parquet",
    mode: str = "overwrite",
    validate: bool = True,
) -> None:
    """Write ``df`` clustered by the Z-order of two columns:
    range-partition on the Z-value (contiguous Z-ranges per file), sort
    within partitions, drop the helper column. Each output file then
    covers a tight min/max box in BOTH dimensions — predicates on
    either column prune files via footer statistics.

    ``n_files`` bounds the layout (default: current shuffle
    parallelism). The range exchange samples the Z distribution, so
    skewed dimensions still yield balanced files.

    ``validate`` (default on) runs a column-pruned max() probe and
    RAISES when either column exceeds ``2^n_bits - 1``: the interleave
    masks to the low ``n_bits``, so out-of-range ids (e.g. TPC-H
    custkey at sf >= 1 with the 16-bit default) would alias across the
    key space and per-file min/max boxes would quietly stop being tight
    — clustering quality degrades with no signal.  The error message
    names the n_bits that fits.  Pass ``validate=False`` only when the
    domain is known to fit (the probe is one footer-stat-friendly
    two-column scan, cheap next to the full rewrite that follows).
    """
    if validate:
        hi = df.select(
            F.max(F.col(cols[0]).cast("long")).alias("a"),
            F.max(F.col(cols[1]).cast("long")).alias("b"),
        ).first()
        observed = max(hi["a"] or 0, hi["b"] or 0)
        if observed >= (1 << n_bits):
            needed = max(observed, 1).bit_length()
            raise ValueError(
                f"write_zordered: max({cols[0]},{cols[1]}) = {observed} "
                f"exceeds 2^{n_bits}-1; keys would alias after the "
                f"n_bits mask and destroy clustering. Use "
                f"n_bits={min(needed, 31)} (Z fits in {2 * min(needed, 31)} "
                "bits) or pre-scale the columns."
            )
    zed = df.withColumn("__z", z_value(cols[0], cols[1], n_bits))
    parts = n_files or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    (
        zed.repartitionByRange(parts, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.format(file_format)
        .mode(mode)
        .save(path)
    )
