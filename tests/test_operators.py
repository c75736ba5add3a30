"""Tests for intervals, sessionize, aggregation, split, resample."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sf_datalake_spark.operators.aggregates import aggregate_by_keys
from sf_datalake_spark.operators.intervals import sessionize, union_intervals
from sf_datalake_spark.operators.resample import resample_classes
from sf_datalake_spark.operators.split import hash_split, train_test_split_grouped

from tests.conftest import d, ts


def test_union_intervals_merges_overlaps(spark):
    df = spark.createDataFrame(
        [
            ("s1", d("2023-01-01"), d("2023-01-10")),
            ("s1", d("2023-01-05"), d("2023-01-20")),   # overlaps → merged
            ("s1", d("2023-02-01"), d("2023-02-05")),   # gap → new island
            ("s2", d("2023-01-01"), d("2023-01-02")),
        ],
        "siren string, start date, end date",
    )
    out = union_intervals(df, ["siren"], "start", "end")
    got = {(r["siren"], r["start"], r["end"]) for r in out.collect()}
    assert got == {
        ("s1", d("2023-01-01"), d("2023-01-20")),
        ("s1", d("2023-02-01"), d("2023-02-05")),
        ("s2", d("2023-01-01"), d("2023-01-02")),
    }


def test_union_intervals_touching_spans_merge(spark):
    """start == running max end → same island (inclusive bounds)."""
    df = spark.createDataFrame(
        [("s1", d("2023-01-01"), d("2023-01-10")), ("s1", d("2023-01-10"), d("2023-01-15"))],
        "siren string, start date, end date",
    )
    assert union_intervals(df, ["siren"], "start", "end").count() == 1


def test_union_intervals_extra_aggs(spark):
    df = spark.createDataFrame(
        [
            ("s1", d("2023-01-01"), d("2023-01-10"), 5.0),
            ("s1", d("2023-01-05"), d("2023-01-20"), 7.0),
        ],
        "siren string, start date, end date, hours double",
    )
    row = union_intervals(df, ["siren"], "start", "end", agg={"hours": "sum"}).first()
    assert row["sum_hours"] == 12.0


def test_sessionize_gap(spark):
    df = spark.createDataFrame(
        [
            ("u", ts("2023-01-01 10:00:00")),
            ("u", ts("2023-01-01 10:10:00")),   # 10 min gap, same session
            ("u", ts("2023-01-01 11:00:00")),   # 50 min gap, new session
        ],
        "uid string, t timestamp",
    )
    out = sessionize(df, ["uid"], "t", gap_seconds=1800).collect()
    got = {r["t"]: r["session_id"] for r in out}
    assert got[ts("2023-01-01 10:00:00")] == got[ts("2023-01-01 10:10:00")]
    assert got[ts("2023-01-01 11:00:00")] == got[ts("2023-01-01 10:00:00")] + 1


def test_sessionize_boundary_exact_gap_same_session(spark):
    """gap == threshold does NOT start a new session (strict >)."""
    df = spark.createDataFrame(
        [("u", ts("2023-01-01 10:00:00")), ("u", ts("2023-01-01 10:30:00"))],
        "uid string, t timestamp",
    )
    out = sessionize(df, ["uid"], "t", gap_seconds=1800).collect()
    assert len({r["session_id"] for r in out}) == 1


def test_aggregate_by_keys_carry_deterministic(spark):
    df = spark.createDataFrame(
        [("k", 1.0, "z"), ("k", 2.0, "a")], "k string, v double, tag string"
    )
    row = aggregate_by_keys(df, ["k"], {"v": "sum"}, carry=["tag"]).first()
    assert row["v"] == 3.0
    assert row["tag"] == "a"  # min, not partition-order-dependent first


def test_hash_split_no_leakage_and_deterministic(spark):
    df = spark.createDataFrame([(i, i % 7) for i in range(1000)], "id bigint, g int")
    train, test = hash_split(df, "g", test_fraction=0.3)
    tg = {r["g"] for r in train.select("g").distinct().collect()}
    sg = {r["g"] for r in test.select("g").distinct().collect()}
    assert tg.isdisjoint(sg)
    assert tg | sg == set(range(7))
    # deterministic across invocations
    train2, _ = hash_split(df, "g", test_fraction=0.3)
    assert train.count() == train2.count()


def test_grouped_split_no_leakage(spark):
    df = spark.createDataFrame([(f"s{i % 20}", i) for i in range(200)], "siren string, x int")
    train, test = train_test_split_grouped(df, "siren", train_size=0.8, seed=42)
    inter = train.select("siren").intersect(test.select("siren"))
    assert inter.count() == 0
    assert train.count() + test.count() == 200


def test_resample_undersampling_ratio(spark):
    df = spark.createDataFrame(
        [(i, 1 if i < 100 else 0) for i in range(1100)], "id bigint, failure int"
    )
    out = resample_classes(df, "failure", target_ratio=0.35,
                           method="undersampling", seed=42)
    counts = {r["failure"]: r["count"] for r in out.groupBy("failure").count().collect()}
    ratio = counts[1] / counts[0]
    assert abs(ratio - 0.35) < 0.2  # tolerance like reference tests


def test_resample_oversampling_ratio(spark):
    df = spark.createDataFrame(
        [(i, 1 if i < 100 else 0) for i in range(1100)], "id bigint, failure int"
    )
    out = resample_classes(df, "failure", target_ratio=0.35,
                           method="oversampling", seed=42)
    counts = {r["failure"]: r["count"] for r in out.groupBy("failure").count().collect()}
    assert counts[0] == 1000
    assert abs(counts[1] / counts[0] - 0.35) < 0.2


def test_resample_rejects_nonbinary(spark):
    df = spark.createDataFrame([(1, 0), (2, 1), (3, 2)], "id bigint, failure int")
    with pytest.raises(ValueError):
        resample_classes(df, "failure")


def test_fuzzy_join_exact_recall(spark):
    """Symmetric-delete blocking must find EVERY pair within the edit
    threshold — compare against the naive quadratic join on a
    vocabulary with substitutions, insertions, deletions, and decoys."""
    from pyspark.sql import functions as F

    from sf_datalake_spark.operators.fuzzy import fuzzy_join

    words = ["kitten", "sitten", "kitte", "kittens", "mitten",
             "banana", "bananna", "apple", "appel", "grape"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    l = df.select(F.col("w").alias("lw"))
    r = df.select(F.col("w").alias("rw"))
    got = {
        (x["lw"], x["rw"])
        for x in fuzzy_join(l, r, "lw", "rw", max_distance=1)
        .filter("lw < rw").collect()
    }
    import itertools

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {
        (a, b) for a, b in itertools.combinations(sorted(words), 2)
        if lev(a, b) <= 1
    }
    assert got == want and len(want) >= 4


def test_fuzzy_join_distance_two(spark):
    from pyspark.sql import functions as F

    from sf_datalake_spark.operators.fuzzy import fuzzy_join

    df = spark.createDataFrame(
        [("abcdef",), ("abXdYf",), ("abcd",), ("zzzzzz",)], "w string"
    )
    l = df.select(F.col("w").alias("lw"))
    r = df.select(F.col("w").alias("rw"))
    got = {
        (x["lw"], x["rw"], x["edit_distance"])
        for x in fuzzy_join(l, r, "lw", "rw", max_distance=2)
        .filter("lw < rw").collect()
    }
    assert ("abXdYf", "abcdef", 2) in got      # double substitution
    assert ("abcd", "abcdef", 2) in got        # double insertion
    assert not any("zzzzzz" in t[:2] for t in got)


def test_interval_overlap_join_matches_naive(spark):
    """Chunk-bucketed overlap join must equal the naive theta join —
    including touching endpoints, containment, multi-chunk spans, and
    cross-key non-matches."""
    import datetime as dt

    from pyspark.sql import functions as F

    from sf_datalake_spark.operators.intervals import interval_overlap_join

    def ts(s):
        return dt.datetime.fromisoformat(s)

    left = spark.createDataFrame(
        [
            ("u1", 1, ts("2023-01-01 10:00:00"), ts("2023-01-01 11:00:00")),
            ("u1", 2, ts("2023-01-01 12:00:00"), ts("2023-01-01 12:05:00")),
            ("u2", 3, ts("2023-01-01 10:30:00"), ts("2023-01-01 10:40:00")),
            # spans many chunks
            ("u1", 4, ts("2023-01-01 00:00:00"), ts("2023-01-02 00:00:00")),
        ],
        "k string, lid int, ls timestamp, le timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", 10, ts("2023-01-01 10:30:00"), ts("2023-01-01 10:45:00")),
            ("u1", 11, ts("2023-01-01 11:00:00"), ts("2023-01-01 11:30:00")),  # touches 1
            ("u1", 12, ts("2023-01-01 12:06:00"), ts("2023-01-01 12:07:00")),  # gap after 2
            ("u2", 13, ts("2023-01-01 10:00:00"), ts("2023-01-01 10:31:00")),
            ("u3", 14, ts("2023-01-01 10:00:00"), ts("2023-01-01 11:00:00")),  # wrong key
        ],
        "k string, rid int, rs timestamp, re timestamp",
    )
    got = {
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right, ["k"], ("ls", "le"), ("rs", "re"), chunk_seconds=600
        ).collect()
    }
    naive = {
        (r["lid"], r["rid"])
        for r in left.join(
            right,
            (left.k == right.k) & (left.ls <= right.re) & (right.rs <= left.le),
        ).collect()
    }
    assert got == naive
    assert (1, 11) in got      # touching endpoints overlap
    assert (4, 10) in got and (4, 11) in got and (4, 12) in got  # containment
    assert (2, 12) not in got  # 1-minute gap
    assert all(r != 14 for _, r in got)


def test_incremental_aggregate_fold_and_retraction(spark):
    from pyspark.sql import functions as F

    from sf_datalake_spark.operators.aggregates import incremental_aggregate

    stored = spark.createDataFrame(
        [("a", 10, 2), ("b", 5, 1)], "k string, v long, n_rows long"
    )
    delta = spark.createDataFrame(
        [("a", 3), ("c", 7), ("c", 1)], "k string, v long"
    )
    got = {
        r["k"]: (r["v"], r["n_rows"])
        for r in incremental_aggregate(stored, delta, ["k"], ["v"]).collect()
    }
    assert got == {"a": (13, 3), "b": (5, 1), "c": (8, 2)}

    # retraction: fold the negated delta back in → original table
    retract = delta.select("k", (-F.col("v")).alias("v"))
    updated = spark.createDataFrame(
        [(k, v, n) for k, (v, n) in got.items()], "k string, v long, n_rows long"
    )
    # counts retract via a prepared (sum, count) delta frame
    from sf_datalake_spark.operators.aggregates import incremental_aggregate as ia
    neg_aggs = retract.groupBy("k").agg(
        F.sum("v").alias("v"), (-F.count("*")).alias("n_rows")
    )
    back = ia(updated, neg_aggs, ["k"], ["v", "n_rows"], count_col=None)
    final = {r["k"]: (r["v"], r["n_rows"]) for r in back.collect()}
    assert final == {"a": (10, 2), "b": (5, 1), "c": (0, 0)}


def test_incremental_aggregate_signed_count_retraction(spark):
    """A delta CARRYING count_col uses signed per-row count
    contributions (−1 per retracted row), so a single batch can mix
    inserts and retractions without pre-aggregation tricks."""
    from sf_datalake_spark.operators.aggregates import incremental_aggregate

    stored = spark.createDataFrame(
        [("a", 13, 3), ("c", 8, 2)], "k string, v long, n_rows long"
    )
    # retract one (a, 3) row, insert one (c, 2) row — in ONE batch
    delta = spark.createDataFrame(
        [("a", -3, -1), ("c", 2, 1)], "k string, v long, n_rows long"
    )
    got = {
        r["k"]: (r["v"], r["n_rows"])
        for r in incremental_aggregate(stored, delta, ["k"], ["v"]).collect()
    }
    assert got == {"a": (10, 2), "c": (10, 3)}


def test_kll_merged_quantiles_empty_input(spark):
    """Zero input rows → NULL quantile estimates, not a slice() error."""
    from sf_datalake_spark.operators.sketches import kll_merged_quantiles

    df = spark.createDataFrame([], "p int, v double")
    rows = kll_merged_quantiles(df, ["p"], "v", [0.5, 0.9]).collect()
    assert len(rows) == 1
    assert rows[0]["q_est_0"] is None and rows[0]["q_est_1"] is None


def test_interval_overlap_join_preserves_duplicate_rows(spark):
    """Witness-chunk emission (not distinct()) must preserve input-row
    multiplicity: duplicated left rows yield duplicated pairs, exactly
    like the naive theta join."""
    import datetime as dt

    from sf_datalake_spark.operators.intervals import interval_overlap_join

    t0 = dt.datetime(2023, 1, 1, 10, 0)
    t1 = dt.datetime(2023, 1, 1, 13, 0)  # spans several 10-min chunks
    left = spark.createDataFrame(
        [("u", t0, t1), ("u", t0, t1)], "k string, ls timestamp, le timestamp"
    )
    right = spark.createDataFrame(
        [("u", dt.datetime(2023, 1, 1, 11, 0), dt.datetime(2023, 1, 1, 11, 30))],
        "k string, rs timestamp, re timestamp",
    )
    out = interval_overlap_join(
        left, right, ["k"], ("ls", "le"), ("rs", "re"), chunk_seconds=600
    )
    assert out.count() == 2  # one pair per duplicate left row


def test_incremental_aggregate_preserves_null_sums(spark):
    """An all-NULL measure group must fold to NULL (SUM semantics), not
    0 — incremental must stay equivalent to the from-scratch SUM."""
    from sf_datalake_spark.operators.aggregates import incremental_aggregate

    stored = spark.createDataFrame(
        [("a", None, 2), ("b", 5, 1)],
        "k string, v long, n_rows long",
    )
    delta = spark.createDataFrame(
        [("a", None), ("c", None), ("b", 2)], "k string, v long"
    )
    got = {
        r["k"]: (r["v"], r["n_rows"])
        for r in incremental_aggregate(stored, delta, ["k"], ["v"]).collect()
    }
    assert got == {"a": (None, 3), "b": (7, 2), "c": (None, 1)}


def test_resample_undersampling_hash_deterministic(spark):
    df = spark.createDataFrame(
        [(i, 1 if i < 100 else 0) for i in range(1100)], "id bigint, failure int"
    )
    out = resample_classes(df, "failure", target_ratio=0.35,
                           method="undersampling_hash", seed=42,
                           key_cols=["id"])
    counts = {r["failure"]: r["count"]
              for r in out.groupBy("failure").count().collect()}
    assert counts[1] == 100                    # minority kept whole
    assert abs(counts[1] / counts[0] - 0.35) < 0.1
    # bit-for-bit reproducible: same call, same kept ids
    again = resample_classes(df, "failure", target_ratio=0.35,
                             method="undersampling_hash", seed=42,
                             key_cols=["id"])
    assert sorted(r["id"] for r in out.collect()) == \
        sorted(r["id"] for r in again.collect())
    # already balanced -> threshold >= 1e6 keeps everything
    bal = spark.createDataFrame(
        [(i, i % 2) for i in range(100)], "id bigint, failure int"
    )
    kept = resample_classes(bal, "failure", target_ratio=0.35,
                            method="undersampling_hash", seed=1,
                            key_cols=["id"])
    assert kept.count() == 100
    with pytest.raises(ValueError, match="key_cols"):
        resample_classes(df, "failure", method="undersampling_hash")


def test_grouped_split_deterministic(spark):
    from sf_datalake_spark.operators.split import train_test_split_grouped

    df = spark.createDataFrame(
        [(i // 3, i) for i in range(300)], "siren bigint, row_id bigint"
    )
    train, test = train_test_split_grouped(df, "siren", train_size=0.8,
                                           seed=7, deterministic=True)
    # groups never straddle, full partition
    assert train.select("siren").intersect(test.select("siren")).count() == 0
    assert train.count() + test.count() == 300
    # reproducible group assignment
    train2, _ = train_test_split_grouped(df, "siren", train_size=0.8,
                                         seed=7, deterministic=True)
    assert sorted(r["row_id"] for r in train.collect()) == \
        sorted(r["row_id"] for r in train2.collect())
