"""Mergeable-sketch operators (operators/sketches.py).

The property under test in each family is the one the 100 TB pattern
relies on: MERGING per-partition sketches answers the global question
within the family's published error bound — and, where the sketch has
an exact regime (theta below nominal entries, CMS's one-sided floor),
exactness is asserted, not approximated.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sf_datalake_spark.operators.sketches import (
    cms_estimate_counts,
    hll_merge,
    hll_partition_sketches,
    kll_merged_quantiles,
    theta_set_estimates,
)


def _base(spark, n=20000, mod=10):
    return spark.range(0, n).select(
        (F.col("id") % mod).alias("part"),
        F.col("id").alias("v"),
        (F.col("id") % 400).alias("dup"),
    )


def test_hll_partition_merge_matches_exact(spark):
    df = _base(spark)
    sk = hll_partition_sketches(df, [], ["part"], "v", lg_k=14)
    assert sk.count() == 10  # one sketch per partition
    est = hll_merge(sk, []).collect()[0]["distinct_est"]
    assert abs(est - 20000) <= 0.03 * 20000


def test_hll_merge_equals_single_shot(spark):
    """Mergeability: union of per-partition sketches must give the SAME
    estimate as one sketch over all rows — HLL union is lossless."""
    df = _base(spark)
    merged = hll_merge(
        hll_partition_sketches(df, [], ["part"], "v", lg_k=12), []
    ).collect()[0]["distinct_est"]
    single = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("v", F.lit(12))).alias("e")
    ).collect()[0]["e"]
    assert merged == single


def test_hll_counts_duplicated_keys_once(spark):
    df = _base(spark)
    est = hll_merge(
        hll_partition_sketches(df, [], ["part"], "dup", lg_k=14), []
    ).collect()[0]["distinct_est"]
    assert abs(est - 400) <= 0.03 * 400


def test_kll_merged_rank_error_bound(spark):
    df = _base(spark)
    est = kll_merged_quantiles(df, ["part"], "v", (0.25, 0.5, 0.75)).collect()[0]
    n = 20000
    for i, q in enumerate((0.25, 0.5, 0.75)):
        v = est[f"q_est_{i}"]
        exact_rank = df.filter(F.col("v") <= v).count() / n
        assert abs(exact_rank - q) <= 0.03, (q, v, exact_rank)


def test_theta_exact_mode_small_sets(spark):
    """Below 2^lg_k distinct values the theta sketch stores the raw
    hashes — set algebra is EXACT, not estimated."""
    df = spark.range(0, 300).select(F.col("id").alias("v"))
    est = theta_set_estimates(
        df, "v", F.col("v") < 200, F.col("v") >= 100, lg_k=12
    ).collect()[0]
    assert round(est["union_est"]) == 300
    assert round(est["intersect_est"]) == 100  # [100, 200)
    assert round(est["diff_est"]) == 100  # [0, 100)


def test_theta_null_conditions_sketch_nothing(spark):
    df = spark.range(0, 100).select(F.col("id").alias("v"))
    est = theta_set_estimates(
        df, "v", F.col("v") < 50, F.lit(False), lg_k=12
    ).collect()[0]
    assert round(est["union_est"]) == 50
    assert round(est["intersect_est"]) == 0
    assert round(est["diff_est"]) == 50


def test_cms_one_sided_bound_and_determinism(spark):
    words = spark.createDataFrame(
        [("alpha",)] * 500 + [("beta",)] * 100 + [("gamma",)] * 7,
        "word string",
    )
    eps = 0.01
    est1 = cms_estimate_counts(words, "word", ["alpha", "beta", "gamma"], eps=eps)
    est2 = cms_estimate_counts(words, "word", ["alpha", "beta", "gamma"], eps=eps)
    assert est1 == est2  # seeded → deterministic
    n = 607
    for item, true in [("alpha", 500), ("beta", 100), ("gamma", 7)]:
        assert true <= est1[item] <= true + eps * n, (item, est1[item])


def test_sketches_survive_parquet_roundtrip(spark, tmp_path):
    """The store-then-merge claim: sketches written to parquet as
    binary columns and read back must merge to the SAME estimates as
    the in-memory path — this is what makes them pre-aggregates rather
    than query-local state."""
    df = _base(spark)
    sk = hll_partition_sketches(df, [], ["part"], "v", lg_k=12)
    p = str(tmp_path / "sketch_table")
    sk.write.parquet(p)
    reread = spark.read.parquet(p)
    direct = hll_merge(sk, []).collect()[0]["distinct_est"]
    stored = hll_merge(reread, []).collect()[0]["distinct_est"]
    assert stored == direct

    # KLL: unlike HLL union, the merge is ORDER-SENSITIVE in its exact
    # output (compaction depends on the merge sequence, and
    # collect_list order is plan-dependent), so the stored-table merge
    # is held to the family's actual contract — the rank bound — not
    # bitwise equality with the in-memory path.
    per_part = df.groupBy("part").agg(
        F.kll_sketch_agg_double(F.col("v").cast("double"), F.lit(200)).alias(
            "kll"
        )
    )
    p2 = str(tmp_path / "kll_table")
    per_part.write.parquet(p2)
    merged = (
        spark.read.parquet(p2)
        .agg(
            F.expr(
                "kll_sketch_get_quantile_double("
                "aggregate(slice(collect_list(kll), 2, size(collect_list(kll)) - 1), "
                "collect_list(kll)[0], (a, x) -> kll_sketch_merge_double(a, x)), "
                "cast(0.5 as double))"
            ).alias("q")
        )
        .collect()[0]["q"]
    )
    exact_rank = df.filter(F.col("v") <= merged).count() / 20000
    assert abs(exact_rank - 0.5) <= 0.03
