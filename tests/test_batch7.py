"""Batch 4c part 2: Bellman-Ford k-hop costs and the exact integer
Gram matrix — hand-computed goldens plus the invariants that matter
(longer-but-cheaper paths, partitioning independence, HALF_UP
quantization on negatives)."""

from __future__ import annotations

import numpy as np

from sf_datalake_spark.operators.components import bellman_k_hops
from sf_datalake_spark.operators.similarity import gram_matrix_int


def test_bellman_prefers_cheap_long_path(spark):
    # 1 → 4 direct costs 100; 1 → 2 → 3 → 4 costs 3.  BFS would stop at
    # the 1-hop path; Bellman-Ford with k=3 must return 3.
    edges = spark.createDataFrame(
        [(1, 4, 100), (1, 2, 1), (2, 3, 1), (3, 4, 1)],
        "src bigint, dst bigint, wgt bigint",
    )
    seeds = spark.createDataFrame([(1,)], "id bigint")
    got = {
        r["id"]: r["min_cost"]
        for r in bellman_k_hops(edges, seeds, k=3).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}
    # with k=1 only the direct edge is reachable
    got1 = {
        r["id"]: r["min_cost"]
        for r in bellman_k_hops(edges, seeds, k=1).collect()
    }
    assert got1 == {1: 0, 2: 1, 4: 100}


def test_bellman_improves_already_settled_node(spark):
    # node 2 is found at cost 10 in round 1, then improved to 2 via the
    # 3 → 2 back edge in round 2 — the "no frontier shrink" property
    edges = spark.createDataFrame(
        [(1, 2, 10), (1, 3, 1), (3, 2, 1)],
        "src bigint, dst bigint, wgt bigint",
    )
    seeds = spark.createDataFrame([(1,)], "id bigint")
    got = {
        r["id"]: r["min_cost"]
        for r in bellman_k_hops(edges, seeds, k=2).collect()
    }
    assert got[2] == 2


def test_gram_matrix_hand_case(spark):
    # rows (1, 2) and (3, -4) at quant=1: G = [[10, -10], [-10, 20]]
    df = spark.createDataFrame(
        [([1.0, 2.0],), ([3.0, -4.0],)], "embedding array<float>"
    )
    got = {
        (r["i"], r["j"]): r["gram"]
        for r in gram_matrix_int(df, quant=1).collect()
    }
    assert got == {(1, 1): 10, (1, 2): -10, (2, 2): 20}


def test_gram_matrix_partitioning_invariant(spark):
    rng = np.random.RandomState(7)
    rows = [(rng.randn(8).astype("float32").tolist(),) for _ in range(40)]
    df1 = spark.createDataFrame(rows, "embedding array<float>").coalesce(1)
    df4 = spark.createDataFrame(rows, "embedding array<float>").repartition(4)
    g1 = {(r["i"], r["j"]): r["gram"] for r in gram_matrix_int(df1).collect()}
    g4 = {(r["i"], r["j"]): r["gram"] for r in gram_matrix_int(df4).collect()}
    # integer quantization makes the distributed sum EXACTLY equal no
    # matter how rows are partitioned — the float version of this
    # operator fails this test
    assert g1 == g4
    assert len(g1) == 8 * 9 // 2


def test_gram_matrix_half_up_negative(spark):
    # -2.5 and 2.5 micro-units must round AWAY from zero (SQL HALF_UP),
    # not to even (numpy default): quant=1 → q = (-3, 3), gram = 9 each
    df = spark.createDataFrame(
        [([-2.5, 2.5],)], "embedding array<float>"
    )
    got = {
        (r["i"], r["j"]): r["gram"]
        for r in gram_matrix_int(df, quant=1).collect()
    }
    assert got == {(1, 1): 9, (1, 2): -9, (2, 2): 9}


def test_greedy_coverage_select_hand_case(spark):
    from sf_datalake_spark.operators.corpus import greedy_coverage_select

    # doc 1: {a,b,c}; doc 2: {c,d}; doc 3: {a,b}; doc 4: {e}
    # pick 1 → doc 1 (3 new). pick 2: doc 2 adds {d} (1), doc 4 adds
    # {e} (1) — tie broken to the SMALLER id → doc 2. pick 3 → doc 4.
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "c"), (2, "d"),
            (3, "a"), (3, "b"), (4, "e")]
    toks = spark.createDataFrame(rows, "doc_id bigint, tok string")
    got = [
        (r["rank"], r["doc_id"], r["new_tokens"], r["cumulative_coverage"])
        for r in greedy_coverage_select(toks, 3)
        .orderBy("rank")
        .collect()
    ]
    assert got == [(1, 1, 3, 3), (2, 2, 1, 4), (3, 4, 1, 5)]


def test_greedy_coverage_select_stops_when_covered(spark):
    from sf_datalake_spark.operators.corpus import greedy_coverage_select

    # doc 2 is a strict subset of doc 1: after pick 1 nothing adds
    # coverage, so k=3 returns ONE row, not three
    rows = [(1, "a"), (1, "b"), (2, "a")]
    toks = spark.createDataFrame(rows, "doc_id bigint, tok string")
    got = greedy_coverage_select(toks, 3).collect()
    assert len(got) == 1
    assert got[0]["doc_id"] == 1 and got[0]["new_tokens"] == 2
