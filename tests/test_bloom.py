"""Bloom membership sketch (operators/bloom.py): zero false negatives,
deterministic false positives, sparse-bitset merge algebra."""

from __future__ import annotations

from pyspark.sql import functions as F

from sf_datalake_spark.operators.bloom import (
    bloom_maybe_contains,
    bloom_merge,
    bloom_prefilter,
    bloom_sketch,
)


def _keys(spark, lo, hi, tag="k"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(tag), F.col("id").cast("string")).alias("key")
    )


def test_no_false_negatives(spark):
    corpus = _keys(spark, 0, 300)
    sketch = bloom_sketch(corpus, "key", m_bits=2048, num_hashes=3)
    probed = bloom_maybe_contains(corpus, "key", sketch, 2048, 3)
    # every inserted key must probe positive — the Bloom guarantee
    assert probed.filter(~F.col("maybe_member")).count() == 0


def test_false_positive_rate_bounded(spark):
    corpus = _keys(spark, 0, 300)
    fresh = _keys(spark, 0, 500, tag="new")
    sketch = bloom_sketch(corpus, "key", m_bits=8192, num_hashes=4)
    probed = bloom_maybe_contains(fresh, "key", sketch, 8192, 4)
    fp = probed.filter(F.col("maybe_member")).count()
    # kn/m = 0.146 -> theoretical FPR ~ (1-e^-0.146)^4 ~ 3.4e-4;
    # allow a generous margin over 500 probes
    assert fp <= 5


def test_merge_equals_combined_build(spark):
    a, b = _keys(spark, 0, 100), _keys(spark, 100, 200)
    merged = bloom_merge(
        bloom_sketch(a, "key", 1024, 3), bloom_sketch(b, "key", 1024, 3)
    )
    combined = bloom_sketch(a.unionByName(b), "key", 1024, 3)
    diff = merged.exceptAll(combined).count() + combined.exceptAll(merged).count()
    assert diff == 0


def test_prefilter_verdicts(spark):
    corpus = _keys(spark, 0, 200)
    batch = _keys(spark, 150, 350)  # 50 members, 150 new
    out = bloom_prefilter(batch, corpus, "key", m_bits=1 << 16, num_hashes=5)
    rows = out.collect()
    members = {r["key"] for r in rows if r["is_member"]}
    assert members == {f"k{i}" for i in range(150, 200)}
    for r in rows:
        if r["is_member"]:
            assert r["maybe_member"], "false negative — Bloom guarantee broken"


def test_sketch_is_sparse_and_small(spark):
    sketch = bloom_sketch(_keys(spark, 0, 50), "key", m_bits=1 << 20, num_hashes=5)
    n = sketch.count()
    # <= k*n words touched, far below the 2^20/32 dense size
    assert n <= 250
