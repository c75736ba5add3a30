"""Empty- and degenerate-input behavior for the round-4 operators:
no crashes, sane empty results (the failure class the round-3 advisor
flagged in kll_merged_quantiles)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_substring_ops_on_duplicate_free_and_empty_corpora(spark):
    from sf_datalake_spark.operators.substrings import (
        duplicated_span_stats,
        remove_duplicated_spans,
    )

    no_dups = _docs(spark, [(1, "a b c d e f"), (2, "u v w x y z")])
    assert duplicated_span_stats(no_dups, "doc_id", "text", window=5).count() == 0
    # removal must pass every doc through verbatim
    out = {r["doc_id"]: r["clean_text"]
           for r in remove_duplicated_spans(no_dups, "doc_id", "text",
                                            window=5).collect()}
    assert out == {1: "a b c d e f", 2: "u v w x y z"}

    empty = _docs(spark, []).filter("doc_id IS NOT NULL")
    assert duplicated_span_stats(empty, "doc_id", "text", window=5).count() == 0
    assert remove_duplicated_spans(empty, "doc_id", "text", window=5).count() == 0


def test_winnow_short_and_empty_documents(spark):
    from sf_datalake_spark.operators.winnow import winnow_fingerprints

    df = _docs(spark, [(1, "a b"), (2, ""), (3, "x")])  # all below k=5
    assert winnow_fingerprints(df, "doc_id", "text", k=5, w=4).count() == 0


def test_bpe_empty_corpus_returns_empty_table(spark):
    from sf_datalake_spark.operators.bpe import train_bpe

    empty = _docs(spark, []).filter("doc_id IS NOT NULL")
    out = train_bpe(empty, "text", num_merges=4)
    assert out.count() == 0
    assert out.columns == ["rank", "left", "right", "merged", "freq"]


def test_lm_empty_reference_scores_everything_as_unk(spark):
    from sf_datalake_spark.operators.lm import score_documents, train_bigram_lm

    ref = _docs(spark, []).filter("doc_id IS NOT NULL")
    docs = _docs(spark, [(1, "hello world again")])
    bc, uc, v = train_bigram_lm(ref, "text")
    assert v == 0
    got = score_documents(docs, "doc_id", "text", bc, uc, v).collect()
    # every bigram is <unk>|<unk>: P = 0.5 / 0.5 = 1 -> nll 0
    assert len(got) == 1
    assert got[0]["n_bigrams"] == 2 and got[0]["nll_micro"] == 0


def test_bloom_empty_corpus_rejects_nothing_falsely(spark):
    from sf_datalake_spark.operators.bloom import bloom_maybe_contains, bloom_sketch

    empty = spark.range(0).select(F.col("id").cast("string").alias("key"))
    probe = spark.range(5).select(F.col("id").cast("string").alias("key"))
    sketch = bloom_sketch(empty, "key", 1024, 3)
    assert sketch.count() == 0
    out = bloom_maybe_contains(probe, "key", sketch, 1024, 3)
    assert out.filter(F.col("maybe_member")).count() == 0


def test_nearest_centroid_single_label(spark):
    from sf_datalake_spark.operators.similarity import nearest_centroid_exact

    df = spark.createDataFrame(
        [(1, [0.1, 0.2], "only"), (2, [0.3, 0.1], "only")],
        "vec_id int, embedding array<float>, label string",
    )
    got = nearest_centroid_exact(df, "vec_id", "embedding", "label").collect()
    assert all(r["assigned"] == "only" and r["correct"] == 1 for r in got)
