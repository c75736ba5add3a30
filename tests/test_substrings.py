"""Exact repeated-substring span detection/removal (operators/substrings.py).

Hand-built corpus with known shared runs so island merging, union
lengths, canonical-occurrence selection, and reassembly are asserted
exactly (the ExactSubstr semantics of Lee et al. 2022)."""

from __future__ import annotations

import pytest

from sf_datalake_spark.operators.substrings import (
    duplicated_span_stats,
    duplicated_windows,
    remove_duplicated_spans,
)

# Docs 1 and 2 share the 7-token run "a b c d e f g" (W=5 → 3 window
# starts, ONE merged span of 7 tokens).  Doc 3 shares nothing long
# enough.  Doc 4 repeats doc 1's run too, making a 3-way duplicate.
_CORPUS = [
    (1, "a b c d e f g x y z"),
    (2, "p q a b c d e f g r"),
    (3, "a b c d q q q q q q"),
    (4, "a b c d e f g"),
    (5, "short"),
]


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(_CORPUS, "doc_id int, text string")


def test_duplicated_windows_positions(corpus):
    got = {
        (r["doc_id"], r["pos"])
        for r in duplicated_windows(corpus, "doc_id", "text", window=5).collect()
    }
    # 5-token windows inside "a b c d e f g": starts at offsets 0,1,2
    # of the run → doc1 pos 1..3, doc2 pos 3..5, doc4 pos 1..3.
    assert got == {
        (1, 1), (1, 2), (1, 3),
        (2, 3), (2, 4), (2, 5),
        (4, 1), (4, 2), (4, 3),
    }


def test_span_stats_merges_overlapping_windows(corpus):
    out = {
        r["doc_id"]: r
        for r in duplicated_span_stats(
            corpus, "doc_id", "text", window=5
        ).collect()
    }
    assert set(out) == {1, 2, 4}
    # one merged span of exactly 7 tokens in each doc — not 3 windows
    for doc_id, start in [(1, 1), (2, 3), (4, 1)]:
        r = out[doc_id]
        assert r["n_spans"] == 1
        assert r["dup_tokens"] == 7
        assert r["max_span"] == 7
    assert out[4]["n_tokens"] == 7 and out[4]["dup_frac"] == 1.0


def test_span_stats_separate_islands(spark):
    # Two shared runs separated by a unique gap → two spans.
    df = spark.createDataFrame(
        [
            (1, "a b c d e GAP1 v w x y z"),
            (2, "a b c d e GAP2 v w x y z"),
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in
           duplicated_span_stats(df, "doc_id", "text", window=5).collect()}
    assert out[1]["n_spans"] == 2
    assert out[1]["dup_tokens"] == 10
    assert out[1]["max_span"] == 5


def test_removal_keeps_canonical_occurrence(corpus):
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"])
        for r in remove_duplicated_spans(
            corpus, "doc_id", "text", window=5
        ).collect()
    }
    # doc 1 holds the smallest (doc, pos) for every shared window →
    # canonical, untouched; docs 2 and 4 lose the whole run.
    assert got[1] == ("a b c d e f g x y z", 10)
    assert got[2] == ("p q r", 3)
    assert got[4] == ("", 0)
    # untouched docs pass through verbatim
    assert got[3] == ("a b c d q q q q q q", 10)
    assert got[5] == ("short", 1)


def test_removal_conserves_tokens(spark, corpus):
    from pyspark.sql import functions as F

    from sf_datalake_spark.functions.text import token_count

    cleaned = remove_duplicated_spans(corpus, "doc_id", "text", window=5)
    kept = cleaned.agg(F.sum("n_kept")).first()[0]
    total = corpus.select(F.sum(token_count("text"))).first()[0]
    dropped = (
        duplicated_span_stats(corpus, "doc_id", "text", window=5)
        .agg(F.sum("dup_tokens"))
        .first()[0]
    )
    # every dropped token was part of some duplicated span; the
    # canonical copies stay, so kept > total - dropped
    assert kept < total
    assert kept >= total - dropped
