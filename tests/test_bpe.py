"""BPE vocabulary induction (operators/bpe.py) vs a reference
implementation of Sennrich et al. 2016 (word-type weighted pair counts,
greedy left-to-right merge application, deterministic tie-break)."""

from __future__ import annotations

from collections import Counter

from sf_datalake_spark.operators.bpe import bpe_segment, train_bpe


def _reference_bpe(texts, num_merges, min_pair_count=2):
    vocab = Counter()
    for t in texts:
        vocab.update(t.split())
    types = {w: list(w) for w in vocab}
    merges = []
    for rank in range(1, num_merges + 1):
        pairs = Counter()
        for w, sym in types.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += vocab[w]
        if not pairs:
            break
        # max freq, ties -> lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), freq = best
        if freq < min_pair_count:
            break
        merges.append((rank, l, r, l + r, freq))
        for w, sym in types.items():
            out = []
            for x in sym:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            types[w] = out
    return merges, types


_TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest new low",
]


def test_merge_table_matches_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(_TEXTS)],
                               "doc_id int, text string")
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["freq"])
        for r in train_bpe(df, "text", num_merges=10).orderBy("rank").collect()
    ]
    want, _ = _reference_bpe(_TEXTS, 10)
    assert got == want


def test_overlapping_pair_merges_left_to_right(spark):
    # "xxx" with merge (x,x): greedy left fold -> [xx, x], never [x, xx]
    df = spark.createDataFrame([(0, "xxx xxx xx")], "doc_id int, text string")
    merges = train_bpe(df, "text", num_merges=1)
    seg = bpe_segment(df, "doc_id", "text", merges).first()["bpe_tokens"]
    assert seg == ["xx", "x", "xx", "x", "xx"]


def test_segment_matches_reference_types(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(_TEXTS)],
                               "doc_id int, text string")
    merges = train_bpe(df, "text", num_merges=8)
    want_merges, want_types = _reference_bpe(_TEXTS, 8)
    seg = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_segment(df, "doc_id", "text", merges).collect()
    }
    for i, t in enumerate(_TEXTS):
        expect = [s for w in t.split() for s in want_types[w]]
        assert seg[i] == expect


def test_min_pair_count_stops_training(spark):
    df = spark.createDataFrame([(0, "ab cd ef")], "doc_id int, text string")
    # every pair occurs once -> below min_pair_count=2, no merges
    assert train_bpe(df, "text", num_merges=5).count() == 0


def test_no_cached_state_leaks(spark):
    df = spark.createDataFrame([(0, "aa bb aa bb aa")], "doc_id int, text string")
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    train_bpe(df, "text", num_merges=3).collect()
    after = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert after == before


def test_distributed_path_matches_driver_path(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(_TEXTS)],
                               "doc_id int, text string")
    driver = [tuple(r) for r in
              train_bpe(df, "text", num_merges=6).orderBy("rank").collect()]
    dist = [tuple(r) for r in
            train_bpe(df, "text", num_merges=6, driver_type_budget=0)
            .orderBy("rank").collect()]
    assert driver == dist and len(driver) == 6
