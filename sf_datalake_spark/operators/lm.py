"""Bigram language-model quality scoring (the CCNet filter).

Wenzek et al. 2020 (CCNet) rank web documents by the perplexity of a
KenLM model trained on a clean reference corpus and keep the
low-perplexity tail.  This is that operator with a transparent bigram
model: train add-k-smoothed bigram statistics on a reference slice
(one distributed count pass), then score every document JVM-side with
two broadcast joins — no model file, no Python in the hot path.

Model: P(w | v) = (c(v, w) + k) / (c(v) + k * (V + 1)) over the
reference vocabulary; out-of-vocabulary tokens collapse to ``<unk>``
(the +1).  Scores are reported as average negative log2 probability
(monotone in perplexity = 2^avg_nll — the power step adds nothing but
float risk).

Engine-exactness: each bigram's -log2 P is rounded to integer
MICRO-units (round(x * 1e6) as bigint) before summation — the repo's
exact-cents discipline (COVERAGE.md) — so the per-document sum is
associative and the final division of two exact integers yields the
identical double in any engine.

Scale: training is two map-side-combined groupBys over the reference
slice; scoring joins the exploded corpus bigram stream against the
bigram/unigram tables — broadcast when the model fits (the usual case:
a cleaned reference vocabulary is millions of rows, not billions),
shuffle hash join otherwise.  Nothing is per-pair or quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sf_datalake_spark.functions.text import tokenize

UNK = "<unk>"


def train_bigram_lm(
    reference: DataFrame, text_col: str, k: float = 0.5
) -> tuple[DataFrame, DataFrame, int]:
    """(bigram_counts, unigram_counts, vocab_size) from a reference corpus.

    ``bigram_counts``: (v, w, c_vw); ``unigram_counts``: (v, c_v).
    ``vocab_size`` counts distinct reference tokens (excl. <unk>).
    """
    # Pin the tokenized reference ONCE (r11, guide §2.4/§5): the
    # scan+regex-tokenize subtree used to execute four times — the
    # bigram-count build, the unigram-count build, the vocab scalar,
    # and again inside each downstream broadcast build.  The reference
    # slice is a curated sample (bounded at any corpus scale), so the
    # checkpoint is small; note the vocab count runs over the
    # UNFILTERED arrays (a 1-token document still contributes its
    # token) exactly as before.
    base = reference.select(
        tokenize(F.col(text_col)).alias("t")
    ).localCheckpoint(eager=True)
    toks = base.filter(F.size("t") >= 2)
    bigrams = toks.select(
        F.explode(
            F.expr("transform(sequence(1, size(t) - 1),"
                   " i -> struct(t[i - 1] AS v, t[i] AS w))")
        ).alias("b")
    ).select("b.v", "b.w")
    bigram_counts = bigrams.groupBy("v", "w").agg(F.count("*").alias("c_vw"))
    unigram_counts = bigrams.groupBy("v").agg(F.count("*").alias("c_v"))
    vocab_size = (
        base.select(F.explode("t").alias("w"))
        .agg(F.countDistinct("w"))
        .first()[0]
    )
    return bigram_counts, unigram_counts, int(vocab_size)


def score_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bigram_counts: DataFrame,
    unigram_counts: DataFrame,
    vocab_size: int,
    k: float = 0.5,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document (id, n_bigrams, nll_micro, avg_nll).

    ``nll_micro`` is the exact integer sum of round(-log2 P * 1e6) per
    bigram; ``avg_nll`` its mean in bits (lower = more reference-like).
    Unknown context/word fall back to <unk> (c = 0 paths still smooth).
    """
    vocab = unigram_counts.select(F.col("v").alias("w")).distinct()
    maybe_b = F.broadcast if broadcast_model else (lambda d: d)
    toks = df.select(F.col(id_col), tokenize(F.col(text_col)).alias("t")).filter(
        F.size("t") >= 2
    )
    pairs = toks.select(
        id_col,
        F.explode(
            F.expr("transform(sequence(1, size(t) - 1),"
                   " i -> struct(t[i - 1] AS v, t[i] AS w))")
        ).alias("b"),
    ).select(id_col, "b.v", "b.w")
    # OOV collapse: any token outside the reference vocab becomes <unk>
    known_w = maybe_b(vocab)
    known_v = maybe_b(vocab.select(F.col("w").alias("v")))
    pairs = (
        pairs.join(known_v.withColumn("__kv", F.lit(1)), "v", "left")
        .join(known_w.withColumn("__kw", F.lit(1)), "w", "left")
        .select(
            id_col,
            F.when(F.col("__kv").isNotNull(), F.col("v"))
            .otherwise(F.lit(UNK))
            .alias("v"),
            F.when(F.col("__kw").isNotNull(), F.col("w"))
            .otherwise(F.lit(UNK))
            .alias("w"),
        )
    )
    scored = (
        pairs.join(maybe_b(bigram_counts), ["v", "w"], "left")
        .join(maybe_b(unigram_counts), "v", "left")
        .select(
            id_col,
            F.round(
                -F.log2(
                    (F.coalesce("c_vw", F.lit(0)) + F.lit(k))
                    / (F.coalesce("c_v", F.lit(0)) + F.lit(k * (vocab_size + 1)))
                )
                * 1e6
            )
            .cast("bigint")
            .alias("nll_mu"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("int").alias("n_bigrams"),
        F.sum("nll_mu").alias("nll_micro"),
        F.round(F.sum("nll_mu") / F.count("*") / 1e6, 6).alias("avg_nll"),
    )
