"""Z-order (Morton) interleaving — multi-dimensional clustering keys.

Storage-layout operator beyond the reference's surface: sorting (or
range-partitioning) a table by the bit-interleaved Z-value of its scan
dimensions keeps rows close in EVERY interleaved dimension physically
co-located, so parquet row-group min/max statistics prune scans for
predicates on ANY of the columns — the standard lakehouse answer to
"partition by one key, filter by several".

The interleave is the overflow-free per-bit form (bit i of column j
lands at position ``i·k + j`` for k columns) — plain shifts/ands on
small values, no wrapping 64-bit magic-mask tricks, so the SAME
arithmetic runs as Spark Column expressions and as the DuckDB oracle
SQL with identical results.  Expressions are generated once per call
(``k·n_bits`` terms) and fully whole-stage-codegen'd.

Dimensionality guidance: Z-order quality degrades as dimensions are
added (each extra column halves the bits per column within the 63-bit
budget and dilutes per-file min/max tightness per dimension) — two to
four columns is the useful range, which is also the guidance every
lakehouse engine publishes for its Z-order/clustering keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value_n(
    cols: Sequence[Column | str], n_bits: int = 16
) -> Column:
    """Morton Z-value of k non-negative int columns, ``n_bits`` bits
    each (values are masked to the low ``n_bits`` first).  Bit ``i`` of
    column ``j`` lands at Z position ``i·k + j``; the result needs
    ``k·n_bits`` bits and must fit a signed 64-bit long."""
    k = len(cols)
    if k < 2:
        raise ValueError("z_value_n needs at least 2 columns")
    if k * n_bits > 63:
        raise ValueError(
            f"{k} columns × {n_bits} bits = {k * n_bits} Z bits > 63; "
            "lower n_bits or drop a dimension"
        )
    cs = [
        (F.col(c) if isinstance(c, str) else c).cast("long") for c in cols
    ]
    z = F.lit(0).cast("long")
    for i in range(n_bits):
        for j, c in enumerate(cs):
            z = z + F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j
            )
    return z


def z_value(a: Column | str, b: Column | str, n_bits: int = 16) -> Column:
    """Two-column Morton Z-value (16 bits × 2 → a 32-bit Z — plenty for
    file-layout clustering, where only relative order matters).  The
    common case of :func:`z_value_n`."""
    return z_value_n([a, b], n_bits)


def z_value_sql_n(cols: Sequence[str], n_bits: int = 16) -> str:
    """The identical k-column interleave as an ANSI SQL expression
    string (used by the DuckDB oracle; also valid Spark SQL)."""
    k = len(cols)
    if k < 2 or k * n_bits > 63:
        raise ValueError("bad dimensions for z_value_sql_n")
    terms = []
    for i in range(n_bits):
        for j, c in enumerate(cols):
            terms.append(f"((({c} >> {i}) & 1) << {i * k + j})")
    return "(" + " + ".join(terms) + ")"


def z_value_sql(a: str, b: str, n_bits: int = 16) -> str:
    """Two-column form of :func:`z_value_sql_n`."""
    return z_value_sql_n([a, b], n_bits)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_bits: int = 16,
    n_files: int | None = None,
    file_format: str = "parquet",
    mode: str = "overwrite",
    validate: bool = True,
) -> None:
    """Write ``df`` clustered by the Z-order of two or more columns:
    range-partition on the Z-value (contiguous Z-ranges per file), sort
    within partitions, drop the helper column. Each output file then
    covers a tight min/max box in EVERY interleaved dimension —
    predicates on any of the columns prune files via footer statistics.

    ``n_files`` bounds the layout (default: current shuffle
    parallelism). The range exchange samples the Z distribution, so
    skewed dimensions still yield balanced files.

    ``validate`` (default on) runs a column-pruned max() probe and
    RAISES when any column exceeds ``2^n_bits - 1``: the interleave
    masks to the low ``n_bits``, so out-of-range ids (e.g. TPC-H
    custkey at sf >= 1 with the 16-bit default) would alias across the
    key space and per-file min/max boxes would quietly stop being tight
    — clustering quality degrades with no signal.  The error message
    names the n_bits that fits.  Pass ``validate=False`` only when the
    domain is known to fit (the probe is one footer-stat-friendly
    scan of the key columns, cheap next to the full rewrite that
    follows).
    """
    cols = list(cols)
    if validate:
        hi = df.select(
            *[
                F.max(F.col(c).cast("long")).alias(f"m{i}")
                for i, c in enumerate(cols)
            ]
        ).first()
        observed = max((hi[f"m{i}"] or 0) for i in range(len(cols)))
        if observed >= (1 << n_bits):
            needed = max(observed, 1).bit_length()
            budget = 63 // len(cols)
            if needed <= budget:
                advice = (
                    f"Use n_bits={needed} (Z fits in "
                    f"{len(cols) * needed} bits)."
                )
            else:
                # no n_bits can represent these keys within the 63-bit
                # Z budget — recommending a smaller mask would just
                # alias again; only changing the data can work
                advice = (
                    f"No n_bits fits: the keys need {needed} bits each "
                    f"but {len(cols)} interleaved columns allow at most "
                    f"{budget}; pre-scale the columns (e.g. divide "
                    "monotone ids by a constant) or drop a dimension."
                )
            raise ValueError(
                f"write_zordered: max({', '.join(cols)}) = {observed} "
                f"exceeds 2^{n_bits}-1; keys would alias after the "
                f"n_bits mask and destroy clustering. {advice}"
            )
    zed = df.withColumn("__z", z_value_n(cols, n_bits))
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
