"""File-level data skipping over plain parquet — DIY lakehouse pruning.

Storage-layout operator beyond the reference's surface, and the piece
that makes :mod:`functions.zorder` actionable: after Z-ordered (or any
clustered) writes, each file covers a tight [min, max] box per
clustering dimension.  A small driver-side STATS TABLE (one row per
file) then lets a reader enumerate exactly the files a predicate can
touch and scan only those — the same mechanism Delta/Iceberg data
skipping uses, built from two public Spark primitives:

- ``input_file_name()`` + one groupBy → per-file min/max/count stats
  (one scan of the layout, run once per write);
- ``spark.read.parquet(*files)`` → a scan restricted to the pruned
  file list (Spark still applies row-group pushdown WITHIN each file,
  so file-level skipping composes with parquet's own statistics).

Scale shape: the stats table has one row per FILE (a 100 TB table at
512 MB/file is ~200k rows — driver-trivial), collected once and reused
by every query.  Pruning is a pure metadata operation; no data is read
for files whose box misses the predicate.  The stats build is one
map-side-combined aggregation over the scan — no extra shuffle beyond
the groupBy on file name, whose cardinality is the file count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def collect_file_stats(
    spark: SparkSession, path: str, cols: Sequence[str]
) -> DataFrame:
    """Per-file min/max/null-count statistics for ``cols`` over a
    parquet layout: ``(file, n_rows, <c>_min, <c>_max, <c>_nulls …)``.

    One scan, one groupBy(file) with map-side partial aggregation —
    run it after each (re)write of a clustered table and store the
    result next to the data; it IS the skipping index.
    """
    df = spark.read.parquet(path)
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}_nulls"),
        ]
    return (
        df.withColumn("file", F.input_file_name())
        .groupBy("file")
        .agg(*aggs)
    )


def prune_files(
    stats: DataFrame, ranges: dict[str, tuple[object, object]]
) -> list[str]:
    """Files whose per-column [min, max] box intersects every queried
    range — the candidate set for ``ranges`` (col → (lo, hi), either
    bound None for open-ended).  Interval-overlap test per column:
    ``col_min <= hi AND col_max >= lo``; a file with an all-NULL column
    (NULL min/max) cannot satisfy a range predicate on it and is
    pruned.  Driver-side by design: the stats frame is file-count-sized.
    """
    cond = None
    for c, (lo, hi) in ranges.items():
        # cast bounds to the stats column's own type: a python datetime
        # otherwise lits as TIMESTAMP and silently never matches a
        # timestamp_ntz stats column (no implicit coercion)
        ctype = stats.schema[f"{c}_min"].dataType
        tests = []
        if hi is not None:
            tests.append(F.col(f"{c}_min") <= F.lit(hi).cast(ctype))
        if lo is not None:
            tests.append(F.col(f"{c}_max") >= F.lit(lo).cast(ctype))
        for t in tests:
            cond = t if cond is None else (cond & t)
    out = stats.select("file") if cond is None else stats.filter(cond).select("file")
    return [r["file"] for r in out.collect()]


def pruned_read(
    spark: SparkSession,
    stats: DataFrame,
    ranges: dict[str, tuple[object, object]],
) -> DataFrame:
    """Read ONLY the files a range predicate can touch, then re-apply
    the predicate exactly (file skipping is a superset filter — rows
    inside a candidate file can still miss the range; parquet row-group
    pushdown inside each kept file handles most of them).

    Returns an empty frame with the layout's schema when every file is
    pruned.  The re-applied predicate keeps results IDENTICAL to a full
    scan + filter — skipping is purely a cost optimization, which the
    tests assert both ways (fewer files read, same rows back).
    """
    files = prune_files(stats, ranges)
    any_file = [r["file"] for r in stats.select("file").limit(1).collect()]
    if not files:
        empty = spark.read.parquet(*any_file).limit(0) if any_file else None
        if empty is None:
            raise ValueError("stats table is empty - no layout to read")
        return empty
    df = spark.read.parquet(*files)
    for c, (lo, hi) in ranges.items():
        ctype = df.schema[c].dataType
        if lo is not None:
            df = df.filter(F.col(c) >= F.lit(lo).cast(ctype))
        if hi is not None:
            df = df.filter(F.col(c) <= F.lit(hi).cast(ctype))
    return df
