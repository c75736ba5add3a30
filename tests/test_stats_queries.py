"""Tests for the round-4 statistical-monitoring batch: Pettitt
changepoint, exact weighted quantiles, bitmap-exact distinct,
time-decay attribution, Nelson-Aalen hazard, vocab coverage, RRF
fusion.  Hand-computed and brute-force-verified cases, per the
reference's golden-column strategy (SURVEY.md §5)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from sf_datalake_spark.operators.aggregates import weighted_quantiles

from .conftest import d
from sf_datalake_spark.operators.sketches import bitmap_distinct
from sf_datalake_spark.operators.timeseries import pettitt_test


# ---------------------------------------------------------------------------
# Pettitt changepoint
# ---------------------------------------------------------------------------

def _pettitt_brute(values):
    """Brute-force Pettitt over one series: returns (K, argmax index
    0-based, n) using midranks, U_t = 2*S_t - t*(n+1)."""
    n = len(values)
    ranks = []
    for v in values:
        lt = sum(1 for x in values if x < v)
        eq = sum(1 for x in values if x == v)
        ranks.append(lt + (eq + 1) / 2)
    best_k, best_i = -1, None
    s = 0.0
    for t in range(1, n):
        s += ranks[t - 1]
        u = abs(2 * s - t * (n + 1))
        if u > best_k:
            best_k, best_i = u, t - 1
    return best_k, best_i, n


def test_pettitt_known_shift(spark):
    # level shift after index 4: changepoint must land on the boundary
    vals = [10, 12, 11, 13, 12, 55, 54, 53, 56, 57]
    rows = [("a", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = pettitt_test(df, ["k"], "t", "v").collect()
    assert len(out) == 1
    r = out[0]
    k_b, i_b, n = _pettitt_brute(vals)
    assert r["n_obs"] == 10
    assert r["k_stat"] == k_b
    assert r["changepoint"] == i_b
    # clean balanced shift: |U_t| = t(n-t) maximized at t=5 -> 25
    assert r["k_stat"] == 25
    assert r["changepoint"] == 4
    assert 0.0 <= r["p_approx"] <= 1.0


def test_pettitt_ties_and_multi_key(spark):
    random.seed(7)
    series = {
        "flat": [5, 5, 5, 5, 5, 5],  # all tied: K = 0 everywhere
        "noisy": [random.randint(0, 9) for _ in range(25)],
    }
    rows = [(k, i, v) for k, vs in series.items() for i, v in enumerate(vs)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    got = {r["k"]: r for r in pettitt_test(df, ["k"], "t", "v").collect()}
    assert got["flat"]["k_stat"] == 0
    assert got["flat"]["changepoint"] == 0  # earliest on ties
    k_b, i_b, _ = _pettitt_brute(series["noisy"])
    assert got["noisy"]["k_stat"] == k_b
    assert got["noisy"]["changepoint"] == i_b


# ---------------------------------------------------------------------------
# weighted quantiles
# ---------------------------------------------------------------------------

def test_weighted_median_hand_case(spark):
    # values 1..4 with weights 1,1,1,7 -> total 10; median reached at
    # value 4 (cum 3 < 5 at value 3, cum 10 >= 5 at 4); q25 at 3
    # (cum 2 < 2.5 at 2 -> 4*2 < 10; 4*3 >= 10 at 3)
    rows = [("g", 1, 1), ("g", 2, 1), ("g", 3, 1), ("g", 4, 7)]
    df = spark.createDataFrame(rows, ["k", "v", "w"])
    r = weighted_quantiles(df, ["k"], "v", "w").collect()[0]
    assert r["total_weight"] == 10
    assert r["q_1_4"] == 3
    assert r["q_1_2"] == 4
    assert r["q_3_4"] == 4


def test_weighted_median_equals_plain_median_on_unit_weights(spark):
    vals = [9, 1, 7, 3, 5]
    df = spark.createDataFrame(
        [("g", v, 1) for v in vals], ["k", "v", "w"]
    )
    r = weighted_quantiles(df, ["k"], "v", "w").collect()[0]
    # lower median of 1,3,5,7,9 with the "2*cum >= tot" reach rule: 5
    assert r["q_1_2"] == 5


def test_weighted_median_duplicate_values_merge(spark):
    # same value appearing in many rows must pre-aggregate: weight of
    # value 2 is 5 across three rows
    rows = [("g", 2, 2), ("g", 2, 2), ("g", 2, 1), ("g", 1, 1)]
    df = spark.createDataFrame(rows, ["k", "v", "w"])
    r = weighted_quantiles(df, ["k"], "v", "w").collect()[0]
    assert r["total_weight"] == 6
    assert r["q_1_2"] == 2


# ---------------------------------------------------------------------------
# bitmap-exact distinct
# ---------------------------------------------------------------------------

def test_bitmap_distinct_matches_count_distinct(spark):
    random.seed(11)
    rows = [
        (random.choice(["p1", "p2", "p3"]), random.randint(0, 999))
        for _ in range(2000)
    ]
    df = spark.createDataFrame(rows, ["prio", "uid"])
    cls = F.when(F.col("prio") == "p1", F.lit("hi")).otherwise(F.lit("lo"))
    got = {
        r["grp"]: (r["n_distinct"], r["n_words"])
        for r in bitmap_distinct(df, ["prio"], cls, "uid").collect()
    }
    want = {
        r["grp"]: (r["nd"], r["nw"])
        for r in df.select(
            cls.alias("grp"), "uid", F.expr("uid div 64").alias("w")
        )
        .groupBy("grp")
        .agg(
            F.countDistinct("uid").alias("nd"),
            F.countDistinct("w").alias("nw"),
        )
        .collect()
    }
    assert got == want


def test_bitmap_distinct_bit63_boundary(spark):
    # ids 63 and 64 straddle a word boundary; id 63 sets the sign bit
    df = spark.createDataFrame(
        [("a", 0), ("a", 63), ("a", 64), ("a", 63)], ["k", "uid"]
    )
    r = bitmap_distinct(df, ["k"], F.lit("all"), "uid").collect()[0]
    assert r["n_distinct"] == 3
    assert r["n_words"] == 2


# ---------------------------------------------------------------------------
# registry queries on the sf0.001 tables
# ---------------------------------------------------------------------------

SF_DIR = "/root/testdata/sf0.001"


def test_decay_attribution_invariants(spark):
    from sf_datalake_spark.queries_stats import q_decay_attribution

    out = q_decay_attribution(spark, SF_DIR)
    rows = {r["event_type"]: r for r in out.collect()}
    assert set(rows) <= {"view", "click"}
    # per-purchase credits sum to <= 1e6 with truncation loss < m <= 10:
    # check the global invariant  sum(credits) <= 1e6 * purchases_reached
    total_credit = sum(r["credit_ppm_total"] for r in rows.values())
    n_purch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert total_credit <= 1_000_000 * n_purch
    # most-recent-touch dominance: with every user having dense touch
    # history, credited touch counts are capped at 10 per purchase
    n_reached = max(r["n_purchases_reached"] for r in rows.values())
    n_touches = sum(r["n_touches"] for r in rows.values())
    assert n_touches <= 10 * n_reached


def test_decay_attribution_weights_hand_case(spark):
    import datetime as dt
    import tempfile

    # one purchase, three prior touches: weights 512,256,128 of
    # denom 1024-128=896 -> ppm 571428, 285714, 142857
    base = dt.datetime(2024, 1, 10, 12, 0, 0)
    rows = [
        (1, base, 9, "purchase", 0.0, None),
        (2, base - dt.timedelta(hours=1), 9, "click", 0.0, None),
        (3, base - dt.timedelta(hours=2), 9, "view", 0.0, None),
        (4, base - dt.timedelta(hours=3), 9, "view", 0.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    tmp = tempfile.mkdtemp(prefix="decay-attr-")
    df.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    from sf_datalake_spark.queries_stats import q_decay_attribution

    got = {
        r["event_type"]: r["credit_ppm_total"]
        for r in q_decay_attribution(spark, tmp).collect()
    }
    # click (most recent): 1e6*512 div 896; views: 256 and 128
    assert got["click"] == 1_000_000 * 512 // 896
    assert got["view"] == 1_000_000 * 256 // 896 + 1_000_000 * 128 // 896


def test_nelson_aalen_curve_properties(spark):
    from sf_datalake_spark.queries_stats import q_nelson_aalen

    out = q_nelson_aalen(spark, SF_DIR).collect()
    assert len(out) > 0
    by_seg: dict = {}
    for r in out:
        by_seg.setdefault(r["c_mktsegment"], []).append(r)
    for seg, rows in by_seg.items():
        rows.sort(key=lambda r: r["t"])
        # cumulative hazard is nondecreasing; at_risk strictly
        # decreasing across event times; d <= at_risk
        for a, b in zip(rows, rows[1:]):
            assert b["cum_hazard_ppm"] >= a["cum_hazard_ppm"]
            assert b["at_risk"] < a["at_risk"]
        for r in rows:
            assert 0 < r["d"] <= r["at_risk"]
        # first increment is exactly d*1e6 div at_risk
        f = rows[0]
        assert f["cum_hazard_ppm"] == f["d"] * 1_000_000 // f["at_risk"]


def test_vocab_coverage_hand_case(spark):
    import tempfile

    rows = [
        (0, "a a b", "en", "s", 5),
        (1, "a c", "en", "s", 3),
        (2, "d d d", "fr", "s", 5),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="vocab-cov-")
    df.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    import sf_datalake_spark.queries_stats as qs

    old_k = qs._VOCAB_K
    qs._VOCAB_K = 2  # df: a->2 docs, d->1, b->1, c->1; top2 = {a, b}
    try:
        got = {r["lang"]: r for r in qs.q_vocab_coverage(spark, tmp).collect()}
    finally:
        qs._VOCAB_K = old_k
    # vocab = {a (df 2), b (df 1, token-asc beats c,d)}
    en = got["en"]
    assert en["total_tokens"] == 5
    assert en["oov_tokens"] == 1  # 'c'
    assert en["oov_ppm"] == 1_000_000 // 5
    fr = got["fr"]
    assert fr["oov_tokens"] == 3  # 'd' out of vocab entirely
    assert fr["oov_ppm"] == 1_000_000


def test_rrf_fusion_shape_and_order(spark):
    from sf_datalake_spark.queries_stats import q_rrf_fusion

    rows = q_rrf_fusion(spark, SF_DIR).collect()
    assert len(rows) == 20
    scores = [r["rrf_ppm"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # the query vector's own doc ranks first on the cosine side
    both = [r for r in rows if r["r_bm25"] is not None and r["r_cos"]]
    for r in both:
        assert r["rrf_ppm"] == 1_000_000 // (60 + r["r_bm25"]) + (
            1_000_000 // (60 + r["r_cos"])
        )
    top_cos = [r for r in rows if r["r_cos"] == 1]
    assert top_cos and top_cos[0]["doc_id"] == 0


def test_pettitt_changepoint_registry(spark):
    from sf_datalake_spark.queries_stats import q_pettitt_changepoint

    rows = q_pettitt_changepoint(spark, SF_DIR).collect()
    assert len(rows) == 5  # one per priority
    for r in rows:
        assert r["k_stat"] >= 0
        assert 199000 <= r["changepoint_month"] <= 210012
        assert 0.0 <= r["p_approx"] <= 2.0  # the approximation can exceed 1


# ---------------------------------------------------------------------------
# batch 2: containment, decomposition, readability, time-to-convert
# ---------------------------------------------------------------------------

def test_containment_join_hand_case(spark):
    from sf_datalake_spark.operators.ssjoin import containment_join

    rows = [
        (1, ["a", "b"]),                      # fully inside 2 and 3
        (2, ["a", "b", "c", "d", "e"]),
        (3, ["a", "b", "z"]),
        (4, ["q", "r", "s"]),                 # disjoint
        (5, ["a", "x", "y", "w"]),            # 1/2 of doc1 -> below 0.9
    ]
    df = spark.createDataFrame(rows, ["id", "toks"])
    got = {
        (r["id_small"], r["id_big"], r["containment_ppm"])
        for r in containment_join(df, "id", "toks", 900_000).collect()
    }
    # doc1 ({a,b}) contained in doc2 and doc3; doc3 in doc2 is 2/3
    assert got == {(1, 2, 1_000_000), (1, 3, 1_000_000)}


def test_containment_join_brute_force(spark):
    random.seed(23)
    alphabet = list("abcdefghij")
    rows = [
        (i, random.sample(alphabet, random.randint(1, 8)))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, ["id", "toks"])
    from sf_datalake_spark.operators.ssjoin import containment_join

    got = {
        (r["id_small"], r["id_big"])
        for r in containment_join(df, "id", "toks", 800_000).collect()
    }
    want = set()
    for i, ta in rows:
        for j, tb in rows:
            sa, sb = set(ta), set(tb)
            if (len(sa), i) >= (len(sb), j):
                continue
            if len(sa & sb) * 1_000_000 >= 800_000 * len(sa):
                want.add((i, j))
    assert got == want


def test_classical_decomposition_reconstruction(spark):
    from sf_datalake_spark.operators.timeseries import classical_decomposition

    # deterministic seasonal + trend series: x = 100*phase + 10*idx
    rows = [("k", i, 100 * (i % 4) + 10 * i) for i in range(16)]
    df = spark.createDataFrame(rows, ["k", "i", "x"])
    out = classical_decomposition(df, ["k"], "i", "x", period=4).collect()
    by_idx = {r["idx"]: r for r in out}
    assert len(by_idx) == 16
    for i, r in by_idx.items():
        if i < 2 or i > 13:  # +-p/2 edges
            assert r["trend2p"] is None and r["resid2p"] is None
        else:
            # identity: detr = 2p*x - trend; resid = detr - seasonal
            assert r["detr2p"] == 8 * r["value"] - r["trend2p"]
            assert r["resid2p"] == r["detr2p"] - r["seasonal2p"]
            # 2x4 MA of the linear component is exact: trend2p/8 =
            # 10*i + mean seasonal (100*1.5); check the scaled identity
            assert r["trend2p"] == 8 * (10 * i + 150)


def test_readability_counts(spark):
    from sf_datalake_spark.queries_stats import q_readability_scores
    import tempfile

    rows = [
        (0, "Hello world. How are you?", "en", "s", 25),
        (1, "no sentence marker here", "en", "s", 23),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="readability-")
    df.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    r = q_readability_scores(spark, tmp).collect()[0]
    # words: 5 + 4; sentences: 2 + max(1,0)=1 -> 3
    assert r["words"] == 9
    assert r["sentences"] == 3
    # vowel groups: hello(e,o) world(o) how(o) are(a,e) you(ou) = 7;
    # no(o) sentence(e,e,e) marker(a,e) here(e,e) = 8 -> 15
    assert r["vowel_groups"] == 15
    expected = round(206.835 - 1.015 * (9 / 3) - 84.6 * (15 / 9), 6)
    assert abs(r["flesch"] - expected) < 1e-9


def test_time_to_convert_matches_direct_quantile(spark):
    from sf_datalake_spark.queries_stats import q_time_to_convert

    rows = q_time_to_convert(spark, SF_DIR).collect()
    assert rows
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    # recompute p50 for one cohort directly in python
    firsts = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("v"),
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("p"),
        )
        .filter(F.col("v").isNotNull() & F.col("p").isNotNull() & (F.col("p") > F.col("v")))
        .select(
            (F.year("v") * 100 + F.month("v")).cast("int").alias("cm"),
            (F.unix_timestamp("p") - F.unix_timestamp("v")).alias("d"),
        )
        .collect()
    )
    cohort = rows[0]["cohort_month"]
    deltas = sorted(r["d"] for r in firsts if r["cm"] == cohort)
    assert rows[0]["n_converting"] == len(deltas)
    # lower weighted median with unit weights: first value where
    # 2*rank >= n
    import math
    p50 = deltas[math.ceil(len(deltas) / 2) - 1]
    assert rows[0]["p50_s"] == p50
    p90 = deltas[math.ceil(9 * len(deltas) / 10) - 1]
    assert rows[0]["p90_s"] == p90


# ---------------------------------------------------------------------------
# batch 3: anomaly, trimmed stats, hierarchy shares, business days
# ---------------------------------------------------------------------------

def test_busday_counter_hand_cases(spark):
    # g(d) = 5*(idx div 7) + least(idx % 7, 4), idx days since Mon
    # 1970-01-05. Mon->Fri same week = 4 busdays; Fri->Mon = 1;
    # Sat->Sun = 0; Mon->Mon next week = 5.
    import datetime as dt

    def g(d):
        idx = (d - dt.date(1970, 1, 5)).days
        return 5 * (idx // 7) + min(idx % 7, 4)

    mon = dt.date(2024, 1, 8)
    fri = dt.date(2024, 1, 12)
    sat = dt.date(2024, 1, 13)
    sun = dt.date(2024, 1, 14)
    next_mon = dt.date(2024, 1, 15)
    assert g(fri) - g(mon) == 4
    assert g(next_mon) - g(fri) == 1
    assert g(sun) - g(sat) == 0
    assert g(next_mon) - g(mon) == 5
    # spark expression agrees
    df = spark.createDataFrame(
        [(mon, fri), (fri, next_mon), (sat, sun), (mon, next_mon)],
        ["a", "b"],
    )
    got = [
        r["bd"]
        for r in df.select(
            (
                F.expr("5 * (datediff(b, date'1970-01-05') div 7)")
                + F.least(F.expr("datediff(b, date'1970-01-05') % 7"), F.lit(4))
                - F.expr("5 * (datediff(a, date'1970-01-05') div 7)")
                - F.least(F.expr("datediff(a, date'1970-01-05') % 7"), F.lit(4))
            ).alias("bd")
        ).collect()
    ]
    assert got == [4, 1, 0, 5]


def test_trimmed_stats_hand_case(spark):
    import tempfile

    # 10 values 1..9 + outlier 1000 (cents scale: /100). k = 1:
    # trimmed drops min (1) and max (1000): mean of 2..9 = 44/8 = 5
    # winsorized clamps 1->2 and 1000->9: (2+2+...+9+9)/10
    rows = [
        (i, 1, i, v / 100.0, 0.0, 0.0, "N", "O", None)
        for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate date",
    )
    tmp = tempfile.mkdtemp(prefix="trimmed-")
    df.write.mode("overwrite").parquet(f"{tmp}/lineitem.parquet")
    from sf_datalake_spark.queries_stats import q_trimmed_stats

    r = q_trimmed_stats(spark, tmp).collect()[0]
    assert r["n_rows"] == 10
    assert r["trimmed_mean_cents"] == (2 + 3 + 4 + 5 + 6 + 7 + 8 + 9) // 8
    assert r["winsorized_mean_cents"] == (2 + 2 + 3 + 4 + 5 + 6 + 7 + 8 + 9 + 9) // 10


def test_hierarchy_shares_sum_to_million(spark):
    from sf_datalake_spark.queries_stats import q_hierarchy_shares

    rows = q_hierarchy_shares(spark, SF_DIR).collect()
    assert len(rows) == 25
    by_region: dict = {}
    for r in rows:
        by_region.setdefault(r["r_name"], []).append(r)
    for reg, rs in by_region.items():
        # truncating div: region total within 1e6 and within n ulps under
        s = sum(r["nation_share_ppm"] for r in rs)
        assert 1_000_000 - len(rs) <= s <= 1_000_000
        # region share identical on every nation row of the region
        assert len({r["region_share_ppm"] for r in rs}) == 1


def test_seasonal_anomaly_rows_are_extreme(spark):
    from sf_datalake_spark.queries_stats import (
        q_seasonal_anomaly,
        q_seasonal_decomposition,
    )

    anom = q_seasonal_anomaly(spark, SF_DIR).collect()
    assert anom  # fires at sf0.001
    decomp = {
        (r["o_orderpriority"], r["midx"]): r
        for r in q_seasonal_decomposition(spark, SF_DIR).collect()
    }
    for r in anom:
        d = decomp[(r["o_orderpriority"], r["midx"])]
        assert d["resid2p"] == r["resid2p"]
        assert abs(r["resid2p"]) * 10_000 > 37_065 * r["mad2p"]


# ---------------------------------------------------------------------------
# MMR diverse top-k
# ---------------------------------------------------------------------------

def _mmr_brute(cands, k):
    """cands: list of (id, rel, {other_id: sim}); greedy lambda=1/2 MMR."""
    sel = []
    for _ in range(k):
        best = None
        for i, r, s in cands:
            if i in sel:
                continue
            ms = max((s.get(j, 0) for j in sel), default=0)
            sc = r - ms
            if best is None or sc > best[0] or (sc == best[0] and i < best[1]):
                best = (sc, i)
        sel.append(best[1])
    return sel


def test_mmr_select_matches_brute_force(spark):
    from sf_datalake_spark.operators.similarity import mmr_select

    random.seed(31)
    n = 12
    cands = []
    sims_all = {}
    for i in range(n):
        for j in range(i + 1, n):
            sims_all[(i, j)] = random.randint(0, 1_000_000)
    for i in range(n):
        s = {
            j: sims_all[(min(i, j), max(i, j))]
            for j in range(n) if j != i
        }
        cands.append((i, random.randint(500_000, 1_000_000), s))
    df = spark.createDataFrame(
        cands, "id long, rel_ppm long, sims map<long,long>"
    )
    got = [
        r["id"]
        for r in mmr_select(df, 5).orderBy("sel_rank").collect()
    ]
    assert got == _mmr_brute(cands, 5)


def test_mmr_prefers_diversity_over_pure_relevance(spark):
    from sf_datalake_spark.operators.similarity import mmr_select

    # two near-identical high-relevance docs + one distinct medium one:
    # pure top-2 by relevance picks the twins; MMR must skip the twin
    cands = [
        (1, 990_000, {2: 990_000, 3: 50_000}),
        (2, 980_000, {1: 990_000, 3: 50_000}),
        (3, 800_000, {1: 50_000, 2: 50_000}),
    ]
    df = spark.createDataFrame(
        cands, "id long, rel_ppm long, sims map<long,long>"
    )
    got = [r["id"] for r in mmr_select(df, 2).orderBy("sel_rank").collect()]
    assert got == [1, 3]


def test_mmr_registry_query(spark):
    from sf_datalake_spark.queries_stats import q_mmr_diverse_topk

    rows = q_mmr_diverse_topk(spark, SF_DIR).collect()
    assert len(rows) == 8
    assert [r["sel_rank"] for r in rows] == list(range(1, 9))
    # the query vector's own doc is maximally relevant -> picked first
    assert rows[0]["vec_id"] == 0
    # no duplicate picks
    assert len({r["vec_id"] for r in rows}) == 8


# ---------------------------------------------------------------------------
# batch 4: proximity, PMI, SPRT
# ---------------------------------------------------------------------------

def test_proximity_search_hand_case(spark):
    import tempfile

    rows = [
        (0, "join x window", "en", "s", 1),          # dist 2
        (1, "join a b c d e window", "en", "s", 1),  # dist 6 -> no
        (2, "window join", "en", "s", 1),            # dist 1
        (3, "join only here", "en", "s", 1),         # no window
        (4, "join join window", "en", "s", 1),       # 2 close pairs
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="prox-")
    df.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    from sf_datalake_spark.queries_stats import q_proximity_search

    got = {r["doc_id"]: r for r in q_proximity_search(spark, tmp).collect()}
    assert set(got) == {0, 2, 4}
    assert got[0]["min_dist"] == 2 and got[0]["n_close_pairs"] == 1
    assert got[2]["min_dist"] == 1
    assert got[4]["n_close_pairs"] == 2 and got[4]["min_dist"] == 1


def test_token_pmi_identities(spark):
    from sf_datalake_spark.queries_stats import q_token_pmi
    import math

    rows = q_token_pmi(spark, SF_DIR).collect()
    assert len(rows) == 30
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    ratios = [r["ratio_ppm"] for r in rows]
    assert ratios == sorted(ratios, reverse=True)
    for r in rows:
        assert r["tok_a"] < r["tok_b"]
        assert r["c_ab"] >= 5
        assert r["c_ab"] <= min(r["c_a"], r["c_b"])
        assert r["ratio_ppm"] == r["c_ab"] * n_docs * 1_000_000 // (
            r["c_a"] * r["c_b"]
        )
        want = round(math.log(r["c_ab"] * n_docs / (r["c_a"] * r["c_b"])), 6)
        assert abs(r["pmi"] - want) < 1e-9


def test_sprt_hand_case_all_successes(spark):
    import datetime as dt
    import tempfile

    # 14 consecutive converting views for one even user: LLR = 223*t
    # crosses +2944 at t = 14 (223*13 = 2899 < 2944 <= 3122)
    rows = []
    eid = 0
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    for i in range(14):
        eid += 1
        rows.append((eid, base + dt.timedelta(days=i), 2, "view", 0.0, None))
        eid += 1
        rows.append(
            (eid, base + dt.timedelta(days=i, hours=1), 2, "purchase", 0.0, None)
        )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    tmp = tempfile.mkdtemp(prefix="sprt-")
    df.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    from sf_datalake_spark.queries_stats import q_sprt_decision

    got = {r["variant"]: r for r in q_sprt_decision(spark, tmp).collect()}
    r = got[0]
    assert r["n_obs"] == 14 and r["successes"] == 14
    assert r["decision"] == "accept_h1"
    assert r["decision_t"] == 14


def test_sprt_registry_consistency(spark):
    from sf_datalake_spark.queries_stats import q_sprt_decision

    rows = q_sprt_decision(spark, SF_DIR).collect()
    assert {r["variant"] for r in rows} == {0, 1}
    for r in rows:
        assert (r["decision"] == "continue") == (r["decision_t"] is None)
        assert 0 <= r["successes"] <= r["n_obs"]


def test_markov_attribution_hand_case(spark):
    """Two-user hand case: u1 view->click->purchase, u2 view (no
    conversion).  counts: start->view 2, view->click 1, click->conv 1,
    view->null 1.  Fixpoint: v(click)=1e6, v(view)=5e5, v(start)=5e5.
    Removing EITHER channel severs every converting path, so both
    removal effects are 1e6 and shares split 50/50."""
    from sf_datalake_spark.operators.attribution import (
        markov_removal_attribution,
    )

    rows = [
        (1, 10, d("2024-01-01"), "view"),
        (1, 11, d("2024-01-02"), "click"),
        (1, 12, d("2024-01-03"), "purchase"),
        (2, 20, d("2024-01-01"), "view"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts date, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["channel"]: (r["base_conv_ppm"], r["removal_effect_ppm"],
                       r["share_ppm"])
        for r in markov_removal_attribution(
            ev, touch_states=["view", "click"]).collect()
    }
    assert got == {
        "click": (500000, 1000000, 500000),
        "view": (500000, 1000000, 500000),
    }


def test_markov_attribution_no_conversions(spark):
    """No purchases anywhere: base conversion 0, all effects/shares 0
    (no division by zero)."""
    from sf_datalake_spark.operators.attribution import (
        markov_removal_attribution,
    )

    rows = [(1, 1, d("2024-01-01"), "view"), (1, 2, d("2024-01-02"), "click")]
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts date, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = markov_removal_attribution(ev, touch_states=["view", "click"]).collect()
    assert all(
        (r["base_conv_ppm"], r["removal_effect_ppm"], r["share_ppm"])
        == (0, 0, 0)
        for r in got
    )


def test_shapley_attribution_hand_case(spark):
    """u1 view->click->purchase (mask {view,click}, converted), u2 view
    only (not converted). v(S)=1 iff S contains BOTH channels, so each
    channel's marginal contribution is 1 only when joining the other:
    phi_click = phi_view = 1/2, shares 50/50; with the 4-channel
    vocabulary the untouched channels get exactly zero."""
    from sf_datalake_spark.operators.attribution import shapley_attribution

    rows = [
        (1, 10, d("2024-01-01"), "view"),
        (1, 11, d("2024-01-02"), "click"),
        (1, 12, d("2024-01-03"), "purchase"),
        (2, 20, d("2024-01-01"), "view"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts date, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    two = {
        r["channel"]: (r["phi_x_kfact"], r["share_ppm"])
        for r in shapley_attribution(
            ev, touch_states=["view", "click"]).collect()
    }
    # k=2: phi x 2! = 1 each (marginal only when completing the pair)
    assert two == {"click": (1, 500000), "view": (1, 500000)}

    four = {
        r["channel"]: (r["phi_x_kfact"], r["share_ppm"])
        for r in shapley_attribution(
            ev, touch_states=["view", "click", "signup", "error"]).collect()
    }
    # k=4: phi x 4! = 12 each for the necessary pair, 0 for untouched
    assert four == {"click": (12, 500000), "view": (12, 500000),
                    "signup": (0, 0), "error": (0, 0)}


def test_shapley_attribution_efficiency_property(spark):
    """Shapley efficiency axiom: Sum phi = v(full) - v(empty), i.e. the
    x k! values sum to k! x (touched conversions - no-touch
    conversions). Checked on a mixed mini-corpus including a no-touch
    conversion (which must cancel out of every phi)."""
    from sf_datalake_spark.operators.attribution import shapley_attribution

    rows = [
        (1, 10, d("2024-01-01"), "view"),
        (1, 11, d("2024-01-02"), "purchase"),
        (2, 20, d("2024-01-01"), "click"),
        (2, 21, d("2024-01-02"), "signup"),
        (2, 22, d("2024-01-03"), "purchase"),
        (3, 30, d("2024-01-01"), "purchase"),   # no-touch conversion
        (4, 40, d("2024-01-01"), "error"),      # touch, no conversion
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts date, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = shapley_attribution(
        ev, touch_states=["view", "click", "signup", "error"]).collect()
    tot = sum(r["phi_x_kfact"] for r in got)
    # v(full)=3 (all converting journeys), v(empty)=1 (the no-touch one)
    assert tot == 24 * (3 - 1)
    shares = sum(r["share_ppm"] for r in got)
    assert 999998 <= shares <= 1000000  # ppm rounding only


def test_attribution_rejects_reserved_and_quoted_channels(spark):
    """Both attribution entry points validate touch_states up front:
    names colliding with the absorption chain's reserved states
    ('conv'/'start'/'null') or the conversion event would silently
    mis-attribute, and quoted names signal an upstream bug — all must
    raise, and duplicates too."""
    import pytest as _pytest

    from sf_datalake_spark.operators.attribution import (
        markov_removal_attribution,
        shapley_attribution,
    )

    ev = spark.createDataFrame(
        [(1, 1, d("2024-01-01"), "view")],
        "user_id bigint, event_id bigint, ts date, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    for fn in (markov_removal_attribution, shapley_attribution):
        for bad in (["view", "conv"], ["start"], ["null", "click"],
                    ["purchase"], ["o'brien"], ['say"x'], ["view", "view"]):
            with _pytest.raises(ValueError):
                fn(ev, touch_states=bad)
    # valid vocabulary still works after the guard
    assert markov_removal_attribution(ev, touch_states=["view"]).count() == 1
