"""Winnowing fingerprints (operators/winnow.py): selection rule,
density bound, and the Schleimer et al. detection guarantee."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sf_datalake_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_overlap_pairs,
)


def _h32(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)


def _reference_winnow(tokens: list[str], k: int, w: int) -> set[tuple[int, int]]:
    """Driver-side reference implementation of the winnowing rule."""
    grams = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    hashes = [(_h32(g), i + 1) for i, g in enumerate(grams)]
    if not hashes:
        return set()
    selected = set()
    n = len(hashes)
    for end in range(min(w, n) - 1, n):
        win = hashes[max(0, end - w + 1) : end + 1]
        mh = min(h for h, _ in win)
        pos = max(p for h, p in win if h == mh)  # rightmost minimal
        selected.add((pos, mh))
    return selected


@pytest.mark.parametrize("text,k,w", [
    ("a b c d e f g h i j k l", 3, 4),
    ("x x x x x x x x", 3, 4),          # all-equal hashes: rightmost ties
    ("a b c", 3, 4),                     # single k-gram (n_grams < w)
    ("p q r s t u p q r s t u p q", 2, 5),
])
def test_matches_reference_implementation(spark, text, k, w):
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    got = {
        (r["pos"], r["h32"])
        for r in winnow_fingerprints(df, "doc_id", "text", k=k, w=w).collect()
    }
    assert got == _reference_winnow(text.split(), k, w)


def test_detection_guarantee(spark):
    # Two documents sharing a run of w + k - 1 = 8 tokens must share a
    # fingerprint — the winnowing guarantee.
    shared = "g1 g2 g3 g4 g5 g6 g7 g8"
    df = spark.createDataFrame(
        [(1, f"u1 u2 u3 {shared} u4 u5"), (2, f"v1 {shared} v2 v3 v4 v5")],
        "doc_id int, text string",
    )
    fp = winnow_fingerprints(df, "doc_id", "text", k=5, w=4)
    shared_fp = (
        fp.groupBy("h32").agg(F.countDistinct("doc_id").alias("n")).filter("n = 2")
    )
    assert shared_fp.count() >= 1
    pairs = winnow_overlap_pairs(df, "doc_id", "text", k=5, w=4, min_shared=1)
    assert [(r["id_a"], r["id_b"]) for r in pairs.collect()] == [(1, 2)]


def test_density_bound(spark):
    # expected density ~ 2/(w+1); assert a loose upper bound over a
    # long pseudo-random document
    toks = " ".join(f"t{(i * 2654435761) % 997}" for i in range(2000))
    df = spark.createDataFrame([(1, toks)], "doc_id int, text string")
    k, w = 5, 8
    n_grams = 2000 - k + 1
    n_sel = winnow_fingerprints(df, "doc_id", "text", k=k, w=w).count()
    assert n_sel <= n_grams * 2 * 2 // (w + 1)  # 2x slack over expectation
    assert n_sel >= n_grams // (w + 1)          # at least one per window span


def test_incremental_matches_batch_restriction(spark):
    from sf_datalake_spark.operators.winnow import (
        winnow_fingerprints,
        winnow_overlap_pairs,
        winnow_pairs_against,
    )

    shared = "g1 g2 g3 g4 g5 g6 g7 g8"
    rows = [(1, f"a b {shared}"), (2, f"{shared} c d"),
            (10, f"x y {shared}"), (11, "p q r s t u v w")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    stored = winnow_fingerprints(
        df.filter("doc_id < 10"), "doc_id", "text", k=5, w=4)
    got = {
        (r["batch_id"], r["stored_id"])
        for r in winnow_pairs_against(
            df.filter("doc_id >= 10"), stored, "doc_id", "text",
            k=5, w=4, min_shared=1).collect()
    }
    # batch doc 10 shares the run with both stored docs; 11 with none
    assert got == {(10, 1), (10, 2)}
    # cross-check vs the one-shot pair screen restricted to batch x stored
    full = {
        (b, a)
        for r in winnow_overlap_pairs(df, "doc_id", "text", k=5, w=4,
                                      min_shared=1).collect()
        for a, b in [(r["id_a"], r["id_b"])]
        if a < 10 <= b
    }
    assert got == full
