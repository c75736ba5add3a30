"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003).

The local fingerprinting algorithm behind MOSS: hash every k-gram, then
in each sliding window of ``w`` consecutive k-gram hashes select the
minimum (rightmost occurrence on ties).  The guarantee: any verbatim
run of at least ``w + k - 1`` tokens shared by two documents shares at
least one selected fingerprint, while only ~2/(w+1) of all k-gram
hashes are kept — a principled, density-bounded sparsification that
plain "every n-th hash" sampling cannot give.

This complements the repo's dedup stack: MinHash/SimHash estimate
whole-document similarity, ExactSubstr (operators/substrings.py) finds
every duplicated run at full cost, winnowing is the cheap screen whose
fingerprint join localizes WHERE documents overlap at a fraction of the
index size.

Implementation is pure JVM window arithmetic — no UDFs, no quadratic
lambdas:

- k-gram hashes come from the arrays_zip shingle builder (O(tokens))
  folded to 32 bits so the (hash, position) pair packs into one BIGINT:
  ``h32 * 2^24 + (2^24 - 1 - pos)``.  ``min`` over that key IS the
  winnowing rule — smallest hash, rightmost position — so each window's
  selection is a single framed ``min`` any engine reproduces with exact
  integer arithmetic (the DuckDB oracle replays it bit-for-bit).
- One window function per document (single shuffle by doc), then a
  distinct over selected (doc, pos) — output size is the fingerprint
  density, ~2n/(w+1).

Documents with fewer than ``w`` k-grams yield their single global
minimum (the w-or-shorter prefix frame acts as the only full window).
Position bound: pos < 2^24 tokens per document (16M — generous for any
training corpus; asserted nowhere hot, documented here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sf_datalake_spark.functions.text import word_shingles
from sf_datalake_spark.operators.skew import spread_narrow_scan

#: pos packs into the low 24 bits of the selection key
_POS_BITS = 24
_POS_CAP = (1 << _POS_BITS) - 1


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Selected fingerprints ``(id, pos, h32)`` per document.

    ``pos`` is the 1-based start position of the selected k-gram;
    ``h32`` its 32-bit md5-derived hash.  Selection: minimum hash in
    every window of ``w`` consecutive k-gram hashes, rightmost on ties.
    """
    grams = spread_narrow_scan(df.select(id_col, text_col)).select(
        F.col(id_col),
        F.posexplode(word_shingles(F.col(text_col), k)).alias("pos0", "gram"),
    ).select(
        id_col,
        (F.col("pos0") + 1).alias("pos"),
        F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h32"),
    )
    # pack (h asc, pos desc) into one integer key: min == winnowing rule
    keyed = grams.select(
        id_col,
        "pos",
        "h32",
        (
            F.col("h32") * (_POS_CAP + 1) + (F.lit(_POS_CAP) - F.col("pos"))
        ).alias("sel_key"),
    )
    by_doc = Window.partitionBy(id_col).orderBy("pos")
    frame = by_doc.rowsBetween(-(w - 1), 0)
    windows = keyed.select(
        id_col,
        "pos",
        F.min("sel_key").over(frame).alias("win_min"),
        F.count("*").over(
            by_doc.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n_grams"),
    ).filter(F.col("pos") >= F.least(F.lit(w), F.col("n_grams")))
    return (
        windows.select(
            id_col,
            # integer div, NOT floor(a / b): the packed key exceeds 2^53,
            # so double division drops low bits and corrupts the hash
            F.expr(f"win_min div {_POS_CAP + 1}").alias("h32"),
            (F.lit(_POS_CAP) - F.col("win_min") % (_POS_CAP + 1))
            .cast("int")
            .alias("pos"),
        )
        .distinct()
        .select(id_col, "pos", F.col("h32").cast("bigint").alias("h32"))
    )


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` selected fingerprints.

    Candidate generation is an equi-join on ``h32`` fingerprint buckets
    (never all-pairs); by the winnowing guarantee every pair sharing a
    run of >= w + k - 1 tokens appears.  Output: ``id_a, id_b,
    n_shared`` with id_a < id_b.
    """
    fp = winnow_fingerprints(df, id_col, text_col, k, w).select(
        F.col(id_col).alias("_id"), F.col("h32").alias("h")
    ).distinct()
    a = fp.select(F.col("_id").alias("id_a"), "h")
    b = fp.select(F.col("_id").alias("id_b"), "h")
    return (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("int").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def winnow_pairs_against(
    batch: DataFrame,
    stored_fps: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
) -> DataFrame:
    """Incremental overlap screen: new batch vs a STORED fingerprint index.

    ``stored_fps`` is a previously-written ``winnow_fingerprints``
    output (columns ``id, pos, h32``) — the persisted artifact a
    pipeline maintains instead of re-fingerprinting the corpus.  The
    batch is fingerprinted fresh; candidates meet in an equi-join on
    ``h32`` against the stored index (per-batch cost ∝ batch, never
    corpus²; at 100 TB the stored index is bucketed by h32 so the join
    is exchange-free on the corpus side — the same layout contract as
    ``lsh_pairs_against``).  Output: ``batch_id, stored_id, n_shared``.
    """
    fresh = (
        winnow_fingerprints(batch, id_col, text_col, k, w)
        .select(F.col(id_col).alias("batch_id"), F.col("h32").alias("h"))
        .distinct()
    )
    stored = stored_fps.select(
        F.col(id_col).alias("stored_id"), F.col("h32").alias("h")
    ).distinct()
    return (
        fresh.join(stored, "h")
        .groupBy("batch_id", "stored_id")
        .agg(F.count("*").cast("int").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
