"""Bigram LM quality scoring (operators/lm.py) vs a driver-side
reference model: smoothing, OOV collapse, and the discrimination
property the CCNet filter depends on."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sf_datalake_spark.operators.lm import score_documents, train_bigram_lm

_REF = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the rug"),
    (2, "the cat ate the fish"),
]


def _reference_score(ref_texts, doc_tokens, k=0.5):
    from collections import Counter

    bi, uni = Counter(), Counter()
    vocab = set()
    for t in ref_texts:
        ts = t.split()
        vocab.update(ts)
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] += 1
            uni[a] += 1
    ctx = set(uni)
    v_size = len(vocab)
    total = 0
    n = 0
    for a, b in zip(doc_tokens, doc_tokens[1:]):
        a = a if a in ctx else "<unk>"
        b = b if b in ctx else "<unk>"
        p = (bi.get((a, b), 0) + k) / (uni.get(a, 0) + k * (v_size + 1))
        total += round(-math.log2(p) * 1e6)
        n += 1
    return n, total, round(total / n / 1e6, 6)


def test_scores_match_reference(spark):
    ref = spark.createDataFrame(_REF, "doc_id int, text string")
    docs = spark.createDataFrame(
        _REF + [(3, "the cat sat on the rug"), (4, "zebra quux flurble grok")],
        "doc_id int, text string",
    )
    bc, uc, v = train_bigram_lm(ref, "text")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll_micro"], r["avg_nll"])
        for r in score_documents(docs, "doc_id", "text", bc, uc, v).collect()
    }
    ref_texts = [t for _, t in _REF]
    for doc_id, text in [(3, "the cat sat on the rug"),
                         (4, "zebra quux flurble grok"),
                         (0, _REF[0][1])]:
        assert got[doc_id] == _reference_score(ref_texts, text.split())


def test_in_domain_scores_below_oov(spark):
    # the filter property: reference-like text scores lower avg_nll
    # than out-of-vocabulary noise
    ref = spark.createDataFrame(_REF, "doc_id int, text string")
    docs = spark.createDataFrame(
        [(10, "the cat sat on the mat"), (11, "xyzzy plugh waldo fnord")],
        "doc_id int, text string",
    )
    bc, uc, v = train_bigram_lm(ref, "text")
    got = {
        r["doc_id"]: r["avg_nll"]
        for r in score_documents(docs, "doc_id", "text", bc, uc, v).collect()
    }
    assert got[10] < got[11]


def test_short_docs_are_skipped(spark):
    ref = spark.createDataFrame(_REF, "doc_id int, text string")
    docs = spark.createDataFrame(
        [(20, "single"), (21, ""), (22, "the cat")], "doc_id int, text string"
    )
    bc, uc, v = train_bigram_lm(ref, "text")
    out = score_documents(docs, "doc_id", "text", bc, uc, v)
    assert {r["doc_id"] for r in out.collect()} == {22}
