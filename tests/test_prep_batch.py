"""Batch 4c feature-prep/privacy operators: quantile normalization,
sliding bitmap distinct, k-anonymity audit, Laplace noisy counts,
feature-hash scoring — hand-computed goldens and the distribution-edge
cases (ties, empty text, negative balances, window boundaries)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sf_datalake_spark.functions.text import feature_hash_score
from sf_datalake_spark.operators.aggregates import quantile_normalize
from sf_datalake_spark.operators.privacy import (
    k_anonymity_audit,
    laplace_noisy_counts,
)
from sf_datalake_spark.operators.sketches import sliding_bitmap_distinct

from .conftest import d, ts


def test_quantile_normalize_two_groups_hand_case(spark):
    # group A values (10, 20), group B values (30, 40):
    # pooled sorted = [10, 20, 30, 40]
    # A rank1 → p=ceil(1*4/2)=2 → 20 ; A rank2 → p=4 → 40
    # B rank1 → p=2 → 20 ; B rank2 → p=4 → 40
    df = spark.createDataFrame(
        [("A", 10, 1), ("A", 20, 2), ("B", 30, 3), ("B", 40, 4)],
        "g string, v bigint, id bigint",
    )
    got = {
        (r["g"], r["v"]): r["norm_value"]
        for r in quantile_normalize(df, ["g"], "v", "id").collect()
    }
    assert got == {("A", 10): 20, ("A", 20): 40, ("B", 30): 20, ("B", 40): 40}


def test_quantile_normalize_identity_single_group(spark):
    # one group = pooled distribution: the map is the identity
    df = spark.createDataFrame(
        [("A", v, i) for i, v in enumerate([5, 1, 9, 7])],
        "g string, v bigint, id bigint",
    )
    got = quantile_normalize(df, ["g"], "v", "id").collect()
    assert all(r["v"] == r["norm_value"] for r in got)


def test_quantile_normalize_ties_stay_deterministic(spark):
    # duplicate values: the exploded rank table assigns tied values
    # contiguous ranks; any rank within the tie run maps to the SAME
    # value, so ties cannot produce engine-dependent output
    df = spark.createDataFrame(
        [("A", 10, 1), ("A", 10, 2), ("B", 10, 3), ("B", 99, 4)],
        "g string, v bigint, id bigint",
    )
    got = {
        (r["g"], r["id"]): r["norm_value"]
        for r in quantile_normalize(df, ["g"], "v", "id").collect()
    }
    # pooled = [10,10,10,99]; A ranks 1,2 → p=2,4 → 10,99; B same
    assert got == {("A", 1): 10, ("A", 2): 99, ("B", 3): 10, ("B", 4): 99}


def test_quantile_normalize_rank_exact_at_decimal_scale(spark):
    # ADVICE r5 regression: decimal `/` rounds HALF_UP to scale 6 before
    # floor, so rg=N=ng=2.5e6 (an exact multiple) produced rank N+1 —
    # the group's top row mapped past the pooled table and was silently
    # dropped. The `div` integral division is exact; replay the exact
    # expression used by quantile_normalize at the failing magnitude.
    row = spark.range(1).select(
        F.expr(
            "(cast(2500000 as decimal(38,0)) * 2500000 + 2500000 - 1)"
            " div 2500000"
        ).alias("p")
    ).first()
    assert row["p"] == 2500000
    # and the boundary just below an exact multiple still floors down
    row2 = spark.range(1).select(
        F.expr(
            "(cast(2499999 as decimal(38,0)) * 2500000 + 2500000 - 1)"
            " div 2500000"
        ).alias("p")
    ).first()
    assert row2["p"] == 2499999 + 1 - 1  # ceil(2499999*2500000/2500000)


def test_sliding_bitmap_distinct_window_boundaries(spark):
    # users 1,2 on day 1; user 2 on day 8 (outside day-1's 7-day reach,
    # inside nothing else); user 3 on day 7 (inside day-1→7 window)
    df = spark.createDataFrame(
        [
            (d("2024-01-01"), 1),
            (d("2024-01-01"), 2),
            (d("2024-01-07"), 3),
            (d("2024-01-08"), 2),
        ],
        "day date, user_id bigint",
    )
    got = {
        str(r["window_day"]): r["n_distinct"]
        for r in sliding_bitmap_distinct(df, "day", "user_id", 7).collect()
    }
    # window at 01-01: just that day = {1,2}; at 01-07: 01-01..01-07 =
    # {1,2,3}; at 01-08: 01-02..01-08 = {3,2}
    assert got == {"2024-01-01": 2, "2024-01-07": 3, "2024-01-08": 2}
    # no row for days with no events (e.g. 01-05), even though they fall
    # inside other windows
    assert "2024-01-05" not in got


def test_sliding_bitmap_distinct_dedups_across_days(spark):
    # same user every day for 3 days: each window still counts 1
    df = spark.createDataFrame(
        [(d("2024-01-01"), 5), (d("2024-01-02"), 5), (d("2024-01-03"), 5)],
        "day date, user_id bigint",
    )
    got = {
        str(r["window_day"]): r["n_distinct"]
        for r in sliding_bitmap_distinct(df, "day", "user_id", 7).collect()
    }
    assert got == {"2024-01-01": 1, "2024-01-02": 1, "2024-01-03": 1}


def test_k_anonymity_audit_counts(spark):
    # QI classes: (x,1)×5 safe at k=5, (x,2)×2 unsafe, (y,3)×1 unsafe
    rows = [("x", 1)] * 5 + [("x", 2)] * 2 + [("y", 3)]
    df = spark.createDataFrame(rows, "qa string, qb int")
    got = k_anonymity_audit(df, ["qa", "qb"], k=5).collect()[0]
    assert got["n_classes"] == 3
    assert got["n_unsafe_classes"] == 2
    assert got["rows_unsafe"] == 3
    assert got["suppress_ppm"] == 3 * 1_000_000 // 8


def test_k_anonymity_audit_grouped(spark):
    df = spark.createDataFrame(
        [("n1", "s", 1)] * 5 + [("n2", "s", 1)],
        "nat string, seg string, b int",
    )
    got = {
        r["nat"]: (r["n_unsafe_classes"], r["suppress_ppm"])
        for r in k_anonymity_audit(
            df, ["seg", "b"], k=5, by=["nat"]
        ).collect()
    }
    assert got["n1"] == (0, 0)
    assert got["n2"] == (1, 1_000_000)


def test_laplace_noisy_counts_matches_inverse_cdf(spark):
    import hashlib

    df = spark.createDataFrame([("g1",)] * 7 + [("g2",)] * 3, "k string")
    got = {
        r["k"]: (r["true_n"], r["noisy_n"])
        for r in laplace_noisy_counts(df, ["k"], 20.0, "s").collect()
    }
    for key, n in (("g1", 7), ("g2", 3)):
        u32 = int(hashlib.md5((key + "s").encode()).hexdigest()[:8], 16)
        u = (u32 % 1_000_000 + 0.5) / 1_000_000
        noise = -20.0 * math.copysign(1.0, u - 0.5) * math.log(
            1 - 2 * abs(u - 0.5)
        )
        assert got[key][0] == n
        assert got[key][1] == round(n + noise, 6)


def test_feature_hash_score_empty_and_sum(spark):
    import hashlib

    def w(tok: str) -> int:
        return int(hashlib.md5((tok + "fh").encode()).hexdigest()[:8], 16) % 2001 - 1000

    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, ""), (3, "   ")],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", feature_hash_score("text").alias("s")
        ).collect()
    }
    assert got[1] == 2 * w("alpha") + w("beta")
    assert got[2] == 0  # empty text scores zero, row not dropped
    assert got[3] == 0  # whitespace-only likewise
