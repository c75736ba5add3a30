"""Exact repeated-substring span detection and removal.

The corpus-dedup operator of Lee et al. 2022 ("Deduplicating Training
Data Makes Language Models Better", ExactSubstr): find runs of >= W
consecutive tokens that occur verbatim in more than one document, and
optionally remove every occurrence but one canonical copy.  The paper
builds a suffix array on one giant machine; this is the distributed
hash-based equivalent — every W-token window is hashed, windows whose
hash appears in >= ``min_docs`` distinct documents mark their token
range as duplicated, and adjacent/overlapping duplicated ranges merge
into maximal spans (so a shared run of L >= W tokens is reported as ONE
span of exactly L tokens, not L - W + 1 windows).

Scale design (100 TB corpus):
- The shuffle after windowing carries ``(md5 32B, doc_id, pos)`` —
  never document text.  Window count is ~token count, so the exchange
  is a constant factor over the tokenize scan.
- The duplicated-hash set comes from one ``groupBy(h)`` with map-side
  partial aggregation; the join back is a plain equi-join (AQE
  broadcasts it when the duplicated set is small, the common case).
- Span merging is one window function per document (single shuffle by
  doc_id) — the gaps-and-islands pattern, O(dup positions).
- Nothing is quadratic in document length: windows come from
  ``word_shingles`` (arrays_zip of W shifted slices — O(tokens) per
  row, see functions/text.py:67).

The reference engine has no corpus-dedup surface at all; this extends
the repo's MinHash/SimHash family (operators/dedup.py) with the exact-
match complement the near-dup methods cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sf_datalake_spark.functions.text import tokenize, word_shingles
from sf_datalake_spark.operators.skew import spread_narrow_scan


def duplicated_windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """(id, pos) start positions (1-based) of W-token windows whose md5
    occurs in >= ``min_docs`` distinct documents, plus the window hash
    ``h`` (for canonical-occurrence selection downstream)."""
    grams = spread_narrow_scan(df.select(id_col, text_col)).select(
        F.col(id_col),
        F.posexplode(word_shingles(F.col(text_col), window)).alias("pos0", "gram"),
    ).select(
        id_col,
        (F.col("pos0") + 1).alias("pos"),
        F.md5(F.col("gram")).alias("h"),
    )
    shared = (
        grams.groupBy("h")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("h")
    )
    return grams.join(shared, "h")


def duplicated_span_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document maximal duplicated-span statistics.

    Output (docs with >= 1 span): ``id, n_tokens, n_spans, dup_tokens,
    max_span, dup_frac`` where ``dup_tokens`` is the UNION length of
    the duplicated token intervals (overlapping/adjacent windows merged
    — no double counting) and ``max_span`` the longest merged run.
    """
    dup = duplicated_windows(df, id_col, text_col, window, min_docs).select(
        id_col, "pos", (F.col("pos") + window - 1).alias("end")
    )
    ordered = Window.partitionBy(id_col).orderBy("pos")
    prev_max = (
        F.max("end")
        .over(ordered.rowsBetween(Window.unboundedPreceding, -1))
        .alias("prev_max")
    )
    islands = dup.select(id_col, "pos", "end", prev_max).select(
        id_col,
        "pos",
        "end",
        F.sum(
            F.when(
                F.col("prev_max").isNull() | (F.col("pos") > F.col("prev_max") + 1),
                1,
            ).otherwise(0)
        )
        .over(ordered)
        .alias("island"),
    )
    spans = islands.groupBy(id_col, "island").agg(
        F.min("pos").alias("s"), F.max("end").alias("e")
    )
    sized = df.select(id_col, F.size(tokenize(F.col(text_col))).alias("n_tokens"))
    return (
        spans.groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_spans"),
            F.sum(F.col("e") - F.col("s") + 1).cast("int").alias("dup_tokens"),
            F.max(F.col("e") - F.col("s") + 1).cast("int").alias("max_span"),
        )
        .join(sized, id_col)
        .select(
            id_col,
            F.col("n_tokens").cast("int").alias("n_tokens"),
            "n_spans",
            "dup_tokens",
            "max_span",
            F.round(F.col("dup_tokens") / F.col("n_tokens"), 6).alias("dup_frac"),
        )
    )


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Rebuild each document with non-canonical duplicated spans removed.

    For every shared window hash, the occurrence with the smallest
    ``(id, pos)`` is canonical and keeps its tokens; tokens covered
    ONLY by non-canonical occurrences are dropped (Lee et al. keep one
    arbitrary copy; smallest-key is the deterministic choice both
    engines can reproduce).  Output: ``id, clean_text, n_kept`` for
    every input document (unchanged docs pass through verbatim).
    """
    dup = duplicated_windows(df, id_col, text_col, window, min_docs)
    canon = Window.partitionBy("h").orderBy(id_col, "pos")
    drop_pos = (
        dup.withColumn("rk", F.row_number().over(canon))
        .filter(F.col("rk") > 1)
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + window - 1)
            ).alias("p"),
        )
        .distinct()
    )
    toks = df.select(
        F.col(id_col),
        F.posexplode(tokenize(F.col(text_col))).alias("p0", "tok"),
    ).select(id_col, (F.col("p0") + 1).alias("p"), "tok")
    kept = toks.join(drop_pos, [id_col, "p"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").cast("int").alias("n_kept"),
    )
    base = df.select(id_col)
    return base.join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("n_kept", F.lit(0)).cast("int").alias("n_kept"),
    )
