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


def test_grid_density_clusters_two_blobs_and_noise(spark):
    from sf_datalake_spark.operators.clustering import grid_density_clusters

    # blob A: 5 points near (0, 0); blob B: 5 points near (3, 3) —
    # separated by > one cell; one lone point at (10, 10) = noise
    rows = (
        [(i, [0.01 * i, 0.02 * i, 0.0]) for i in range(5)]
        + [(10 + i, [3.0 + 0.01 * i, 3.0, 0.0]) for i in range(5)]
        + [(99, [10.0, 10.0, 0.0])]
    )
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = {
        r["vec_id"]: r["cluster"]
        for r in grid_density_clusters(
            df, "vec_id", cell_micro=500_000, min_pts=5
        ).collect()
    }
    a_labels = {got[i] for i in range(5)}
    b_labels = {got[10 + i] for i in range(5)}
    assert len(a_labels) == 1 and len(b_labels) == 1
    assert a_labels != b_labels          # two separate clusters
    assert got[99] == -1                  # sparse cell = noise
    assert all(v != -1 for k, v in got.items() if k != 99)


def test_grid_density_clusters_adjacent_cells_merge(spark):
    from sf_datalake_spark.operators.clustering import grid_density_clusters

    # two dense cells sharing a corner (Chebyshev distance 1): one cluster
    rows = [(i, [0.1, 0.1, 0.0]) for i in range(5)] + [
        (10 + i, [0.6, 0.6, 0.0]) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = {
        r["vec_id"]: r["cluster"]
        for r in grid_density_clusters(
            df, "vec_id", cell_micro=500_000, min_pts=5
        ).collect()
    }
    assert len(set(got.values())) == 1


def test_split_conformal_hand_coverage(spark):
    from pyspark.sql import functions as F
    from sf_datalake_spark.ml.evaluation import split_conformal_intervals

    # one group; buckets hand-assigned: train {0..5999}=values 0,100,200
    # (median 100); calibration residuals |v-100| = {0, 50, 300}; 90%
    # rank = least(ceil(4*0.9)=4, 3)=3 → q_hat=300; test: |150-100|=50
    # covered, |900-100|=800 not → coverage 500000 ppm
    rows = [
        ("g", 0, 0), ("g", 100, 1000), ("g", 200, 2000),
        ("g", 100, 6000), ("g", 150, 6500), ("g", 400, 7000),
        ("g", 150, 8000), ("g", 900, 9000),
    ]
    df = spark.createDataFrame(rows, "seg string, cents bigint, bkt int")
    out = split_conformal_intervals(
        df, "seg", "cents", F.col("bkt"), alpha_ppm=100_000
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_train"], r["n_cal"], r["n_test"]) == (3, 3, 2)
    assert r["med_cents"] == 100
    assert r["q_hat_cents"] == 300
    assert r["coverage_ppm"] == 500_000


def test_ncd_scores_identical_and_unrelated(spark):
    import zlib

    from sf_datalake_spark.operators.dedup import ncd_scores

    same = "the quick brown fox jumps over the lazy dog " * 20
    other = "completely different content with its own words 123 " * 20
    pairs = spark.createDataFrame(
        [(1, 2, same, same), (1, 3, same, other)],
        "id_a bigint, id_b bigint, text_a string, text_b string",
    )
    got = {
        (r["id_a"], r["id_b"]): (r["c_a"], r["c_ab"], r["ncd_ppm"])
        for r in ncd_scores(pairs).collect()
    }
    # identical texts: C(xx) barely exceeds C(x) — zlib's window/header
    # overhead keeps it ~0.1 on short strings, far below any real pair
    assert got[(1, 2)][2] < 200_000
    # unrelated texts: C(xy) ≈ C(x) + C(y) → NCD near 1e6
    assert got[(1, 3)][2] > 600_000
    # sizes replay exactly through python zlib (same level)
    assert got[(1, 2)][0] == len(zlib.compress(same.encode(), 6))


def test_grid_density_clusters_rejects_tiny_cell(spark):
    # ADVICE r4: cell_micro below 2e9/_ENC would overflow the packed
    # key's per-axis digits — must be an eager error, not silent
    # false adjacency
    from sf_datalake_spark.operators.clustering import grid_density_clusters

    df = spark.createDataFrame([(1, [0.0, 0.0])],
                               "id bigint, embedding array<double>")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cell_micro"):
        grid_density_clusters(df, "id", cell_micro=1999)


def test_grid_density_clusters_rejects_out_of_domain_coordinate(spark):
    # a coordinate beyond +-1000 after quantization leaves the packed
    # domain -> loud execution-time error instead of a wrong cluster
    from pyspark.sql.utils import AnalysisException
    from py4j.protocol import Py4JJavaError
    from sf_datalake_spark.operators.clustering import grid_density_clusters

    df = spark.createDataFrame(
        [(i, [-1500.0, 0.0]) for i in range(6)],
        "id bigint, embedding array<double>",
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="packed-key domain"):
        grid_density_clusters(df, "id", cell_micro=500_000).collect()
