"""MERGE upsert + SCD2 interval versioning (operators/merge.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sf_datalake_spark.operators.merge import merge_upsert, scd2_apply
from tests.conftest import d


def test_merge_upsert_update_insert_keep(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id int, name string, v double",
    )
    source = spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)], "id int, name string, v double"
    )
    got = {r["id"]: (r["name"], r["v"])
           for r in merge_upsert(target, source, ["id"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_upsert_schema_mismatch_raises(spark):
    t = spark.createDataFrame([(1, "a")], "id int, x string")
    s = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(t, s, ["id"])


def test_merge_upsert_duplicate_source_deterministic(spark):
    t = spark.createDataFrame([(1, 0.0)], "id int, v double")
    s = spark.createDataFrame([(1, 5.0), (1, 7.0)], "id int, v double")
    # max-struct policy: the larger source row wins, deterministically
    assert merge_upsert(t, s, ["id"]).collect()[0]["v"] == 7.0


def _scd2_fixture(spark):
    dim = spark.createDataFrame(
        [
            (1, "A", d("2020-01-01"), d("2022-01-01")),  # closed history
            (1, "B", d("2022-01-01"), None),             # current
            (2, "A", d("2020-01-01"), None),
            (3, "C", d("2020-01-01"), None),
        ],
        "k int, seg string, date_debut date, date_fin date",
    )
    changes = spark.createDataFrame(
        [
            (1, "Z", d("2023-06-15")),  # real change → close + open
            (2, "A", d("2023-06-15")),  # no-op (same value)
            (9, "N", d("2023-06-15")),  # brand-new key
        ],
        "k int, seg string, effective_date date",
    )
    return dim, changes


def test_scd2_apply_semantics(spark):
    dim, changes = _scd2_fixture(spark)
    out = scd2_apply(dim, changes, keys=["k"], value_cols=["seg"])
    rows = {(r["k"], r["seg"], r["date_debut"]): r["date_fin"] for r in out.collect()}
    assert rows == {
        (1, "A", d("2020-01-01")): d("2022-01-01"),  # history untouched
        (1, "B", d("2022-01-01")): d("2023-06-15"),  # closed by the change
        (1, "Z", d("2023-06-15")): None,             # successor opened
        (2, "A", d("2020-01-01")): None,             # no-op stays current
        (3, "C", d("2020-01-01")): None,             # unchanged key
        (9, "N", d("2023-06-15")): None,             # first version
    }


def test_scd2_intervals_partition_time_per_key(spark):
    """Per key: exactly one current row, and [start, end) intervals
    never overlap (end of one version = start of the next)."""
    dim, changes = _scd2_fixture(spark)
    out = scd2_apply(dim, changes, keys=["k"], value_cols=["seg"])
    per_key = {}
    for r in out.collect():
        per_key.setdefault(r["k"], []).append((r["date_debut"], r["date_fin"]))
    for k, spans in per_key.items():
        assert sum(1 for _, e in spans if e is None) == 1, k
        closed = sorted([s for s in spans if s[1] is not None])
        start_of_current = next(s for s, e in spans if e is None)
        seq = closed + [(start_of_current, None)]
        for (s1, e1), (s2, _) in zip(seq, seq[1:]):
            assert e1 == s2, f"gap/overlap in key {k}: {seq}"


def test_merge_upsert_keeps_unmatched_duplicate_targets(spark):
    """Duplicate-key target rows with NO matching source row must pass
    through untouched (regression: the keyed window used to collapse
    them); a matched duplicate key collapses to its source row."""
    t = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "x"), (2, "y")], "id int, s string"
    )
    s = spark.createDataFrame([(2, "z")], "id int, s string")
    got = sorted((r["id"], r["s"]) for r in merge_upsert(t, s, ["id"]).collect())
    assert got == [(1, "a"), (1, "b"), (2, "z")]


def test_scd2_backdated_change_clamps(spark):
    """A change effective BEFORE the current row's start must not
    invert the interval: it clamps to the start (degenerate close +
    successor from the start)."""
    dim = spark.createDataFrame(
        [(1, "A", d("2023-01-01"), None)],
        "k int, seg string, date_debut date, date_fin date",
    )
    changes = spark.createDataFrame(
        [(1, "B", d("2022-06-15"))], "k int, seg string, effective_date date"
    )
    rows = {(r["seg"], r["date_debut"]): r["date_fin"]
            for r in scd2_apply(dim, changes, ["k"], ["seg"]).collect()}
    assert rows == {
        ("A", d("2023-01-01")): d("2023-01-01"),  # degenerate [s, s)
        ("B", d("2023-01-01")): None,             # successor from s, not 2022
    }


def test_merge_upsert_idempotent(spark):
    """Merging the same source twice equals merging it once."""
    t = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id int, s string")
    s = spark.createDataFrame([(2, "B"), (4, "D")], "id int, s string")
    once = merge_upsert(t, s, ["id"])
    twice = merge_upsert(once, s, ["id"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_scd2_empty_and_noop_batches_are_identity(spark):
    dim = spark.createDataFrame(
        [(1, "A", d("2020-01-01"), d("2021-01-01")),
         (1, "B", d("2021-01-01"), None)],
        "k int, seg string, date_debut date, date_fin date",
    )
    empty = spark.createDataFrame([], "k int, seg string, effective_date date")
    out = scd2_apply(dim, empty, ["k"], ["seg"])
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, dim.collect()))
    # a batch whose values equal current state is also identity
    noop = spark.createDataFrame(
        [(1, "B", d("2023-01-01"))], "k int, seg string, effective_date date"
    )
    out2 = scd2_apply(dim, noop, ["k"], ["seg"])
    assert sorted(map(tuple, out2.collect())) == sorted(map(tuple, dim.collect()))


def test_scd2_apply_twice_converges(spark):
    """Re-applying the same change batch is a no-op the second time
    (the successor row already carries the new values)."""
    dim = spark.createDataFrame(
        [(1, "A", d("2020-01-01"), None)],
        "k int, seg string, date_debut date, date_fin date",
    )
    chg = spark.createDataFrame(
        [(1, "Z", d("2023-06-15"))], "k int, seg string, effective_date date"
    )
    once = scd2_apply(dim, chg, ["k"], ["seg"])
    twice = scd2_apply(once, chg, ["k"], ["seg"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_snapshot_diff_classifies_changes(spark):
    from pyspark.sql import functions as F

    from sf_datalake_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k int, name string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),      # unchanged → absent from output
         (2, "b", 21.0),      # update
         (3, "c", None),      # unchanged incl. null → absent
         (5, "e", 50.0)],     # insert; 4 deleted
        "k int, name string, v double",
    )
    got = {r["k"]: (r["change"], r["name"], r["v"])
           for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {
        2: ("update", "b", 21.0),
        4: ("delete", None, None),
        5: ("insert", "e", 50.0),
    }


def test_snapshot_diff_null_value_transitions(spark):
    """null→value and value→null are UPDATES (the null-safe struct
    hash sees them), and a null key matches itself across snapshots."""
    from sf_datalake_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, None), (2, 2.0), (None, 9.0)], "k int, v double"
    )
    new = spark.createDataFrame(
        [(1, 1.0), (2, None), (None, 9.0)], "k int, v double"
    )
    got = {r["k"]: r["change"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "update", 2: "update"}  # null key row unchanged


def test_incremental_join_view_equals_rebuild(spark):
    """Delta-join maintenance must reproduce the full-rebuild join
    exactly, including delta-delta matches (dL rows joining dR rows)."""
    from sf_datalake_spark.operators.merge import incremental_join_view

    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k bigint, lv string"
    )
    right = spark.createDataFrame(
        [(1, "X"), (2, "Y"), (3, "Z"), (4, "W")], "k bigint, rv string"
    )
    left_old = left.filter("k <= 2")
    delta_left = left.filter("k > 2")
    right_old = right.filter("k % 2 = 0")
    delta_right = right.filter("k % 2 = 1")

    v0 = left_old.join(right_old, "k")
    v1 = incremental_join_view(
        v0, left_old, delta_left, right_old, delta_right, ["k"]
    )
    want = {(r["k"], r["lv"], r["rv"]) for r in left.join(right, "k").collect()}
    got = {(r["k"], r["lv"], r["rv"]) for r in v1.collect()}
    # (3, c, Z) is the delta-delta pair: dL |><| R' must cover it
    assert (3, "c", "Z") in got
    assert got == want
