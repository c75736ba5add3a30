"""Distributed Bloom filter — mergeable membership sketch.

Completes the mergeable-sketch family (operators/sketches.py: HLL
distinct counts, KLL quantiles, theta set algebra, CMS frequencies)
with the MEMBERSHIP primitive: "might this key be in the stored
corpus?" answered from a kilobyte-scale pre-aggregate with zero false
negatives and a bounded false-positive rate (1 - e^{-kn/m})^k.

The pipeline use is the incremental-dedup admission gate
(``bloom_prefilter``): before joining a new batch against a 100 TB
stored corpus, probe each batch fingerprint against the corpus Bloom
sketch — definitely-new documents (the overwhelming majority in steady
state) skip the corpus join entirely; only maybe-members pay the exact
verification join.  The sketch is ~m/8 bytes regardless of corpus
size, so it broadcasts where the corpus never could.

Representation: SPARSE bitset as rows ``(word_idx int, word bigint)``
holding 32 bits per word (32, not 64, so ``1 << bit`` stays positive
in every engine — a 1<<63 long flips sign and some engines raise on
it).  Build is pure JVM whole-stage codegen: explode k positions per
key → groupBy(word_idx).agg(bit_or) — one shuffle of (int, long)
pairs with map-side partial OR.  Merging sketches is the same bit_or
groupBy over their union.  Probe joins probe positions to sketch words
(broadcast — the sketch is tiny) and requires all k bits set.

All k hash positions derive from md5 (dedup.md5_hash64), so any engine
reproduces the exact filter — the DuckDB oracle replays build AND
probe bit-for-bit (queries_corpus.q_bloom_prefilter).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sf_datalake_spark.operators.dedup import md5_hash64

#: bits per sketch word (32 keeps 1 << bit positive in a signed 64 lane)
WORD_BITS = 32


def _positions(col: Column, m_bits: int, num_hashes: int) -> Column:
    """Array of ``num_hashes`` bit positions in [0, m_bits) for a key."""
    return F.array(
        *[
            F.pmod(md5_hash64(col, seed=f"bloom{j}"), F.lit(m_bits))
            for j in range(num_hashes)
        ]
    )


def bloom_sketch(
    df: DataFrame,
    col: str,
    m_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Build the sparse Bloom bitset ``(word_idx, word)`` over a key column."""
    pos = df.select(
        F.explode(_positions(F.col(col), m_bits, num_hashes)).alias("pos")
    )
    return (
        pos.select(
            (F.col("pos") / WORD_BITS).cast("int").alias("word_idx"),
            F.expr(f"shiftleft(1L, cast(pos % {WORD_BITS} as int))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def bloom_merge(*sketches: DataFrame) -> DataFrame:
    """OR-merge sketches built with identical (m_bits, num_hashes)."""
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("word_idx").agg(F.bit_or("word").alias("word"))


def bloom_maybe_contains(
    df: DataFrame,
    col: str,
    sketch: DataFrame,
    m_bits: int = 1 << 20,
    num_hashes: int = 5,
    result_col: str = "maybe_member",
) -> DataFrame:
    """Append ``result_col``: true iff ALL k probe bits are set.

    One broadcast join (the sketch is <= m/32 rows of 12 bytes) plus
    one groupBy back onto the probe frame — no corpus access at all.
    """
    probes = df.select(
        col, F.posexplode(_positions(F.col(col), m_bits, num_hashes)).alias("j", "pos")
    ).select(
        col,
        "j",
        (F.col("pos") / WORD_BITS).cast("int").alias("word_idx"),
        F.expr(f"shiftleft(1L, cast(pos % {WORD_BITS} as int))").alias("bit"),
    )
    hit = probes.join(F.broadcast(sketch), "word_idx", "left").select(
        col,
        "j",
        (F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("bit")) != 0).alias(
            "set"
        ),
    )
    verdict = hit.groupBy(col).agg(
        (F.sum(F.col("set").cast("int")) == num_hashes).alias(result_col)
    )
    return df.join(verdict, col)


def bloom_prefilter(
    batch: DataFrame,
    corpus_keys: DataFrame,
    col: str,
    m_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Incremental-dedup admission gate: classify each batch key.

    Returns ``batch`` plus ``maybe_member`` (Bloom verdict — false means
    PROVABLY new, skip the corpus join) and ``is_member`` (exact, via
    the verification join only the maybe-members need).  At scale the
    exact join's left side is just the maybe-member slice; here both
    verdicts are computed for every row so callers (and the oracle) can
    certify zero false negatives.
    """
    sketch = bloom_sketch(corpus_keys, col, m_bits, num_hashes)
    gated = bloom_maybe_contains(batch, col, sketch, m_bits, num_hashes)
    exact = corpus_keys.select(F.col(col)).distinct().withColumn(
        "is_member", F.lit(True)
    )
    return gated.join(exact, col, "left").withColumn(
        "is_member", F.coalesce("is_member", F.lit(False))
    )
