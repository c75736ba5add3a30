"""Adversarial-skew probe: measure the whale guards instead of
reasoning about them (round-4 verdict tasks #3 and #8).

The ordinary testdata has no whales, so the ×8 scale probe cannot see
the two Σn² blow-ups the guards exist for.  This probe BUILDS them:

- **CF whale user**: one synthetic customer whose orders cover 10 000
  distinct parts, appended to sf0.1 orders/lineitem.  Uncapped item-CF
  explodes that user into C(10k,2) ≈ 5·10⁷ pairs; the default
  ``max_basket=32`` cap bounds the user at C(32,2) = 496.
- **LSH whale bucket**: a 10 000-member near-identical document family
  appended to sf0.1 documents.  Every member lands in the same bucket
  in every band → C(10k,2) pairs × bands uncapped; with
  ``max_bucket_size`` the bucket switches to O(n) star linking.

Prints one JSON line with wall seconds + output pair counts for the
guarded and (bounded-)unguarded variants.  Unguarded runs are executed
with a hard timeout budget in mind: pass --skip-unguarded to measure
only the guarded paths (e.g. in CI).

Usage: python tools/whale_probe.py [--skip-unguarded]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
WHALE = "/tmp/sf_whale"

WHALE_CUST = 990_000_001
WHALE_PARTS = 10_000
WHALE_DOCS = 10_000
WHALE_DOC_BASE = 980_000_000


def build_whale(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(WHALE):
        shutil.rmtree(WHALE)
    os.makedirs(WHALE)
    for t in ("region", "nation", "supplier", "part", "customer",
              "events", "embeddings"):
        shutil.copy(f"{BASE}/{t}.parquet", f"{WHALE}/{t}.parquet")

    # CF whale: 100 orders x 100 distinct parts each, one customer
    orders = spark.read.parquet(f"{BASE}/orders.parquet")
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    worders = spark.range(100).select(
        (F.lit(900_000_000) + F.col("id")).alias("o_orderkey"),
        F.lit(WHALE_CUST).alias("o_custkey"),
    )
    # align remaining order columns with nulls/defaults
    worders = worders.select(
        *[
            F.col(c) if c in ("o_orderkey", "o_custkey")
            else F.lit(None).cast(orders.schema[c].dataType).alias(c)
            for c in orders.columns
        ]
    )
    # k-core mega-order (round-5 verdict #2): ONE order holding all
    # 10 000 whale parts — the per-ORDER basket whale. Same customer,
    # so item-CF's per-customer basket (already the 10k-part union) is
    # unchanged; only the per-order pair build sees a new worst case:
    # uncapped it alone emits C(10k,2) ≈ 5x10^7 pairs.
    worders = worders.unionByName(
        spark.range(1).select(
            *[
                F.lit(910_000_000).cast(
                    orders.schema["o_orderkey"].dataType
                ).alias("o_orderkey") if c == "o_orderkey"
                else F.lit(WHALE_CUST).cast(
                    orders.schema["o_custkey"].dataType
                ).alias("o_custkey") if c == "o_custkey"
                else F.lit(None).cast(orders.schema[c].dataType).alias(c)
                for c in orders.columns
            ]
        )
    )
    wli = spark.range(WHALE_PARTS).select(
        (F.lit(900_000_000) + (F.col("id") % 100)).alias("l_orderkey"),
        (F.col("id") + 1).alias("l_partkey"),
    ).unionByName(
        spark.range(WHALE_PARTS).select(
            F.lit(910_000_000).alias("l_orderkey"),
            (F.col("id") + 1).alias("l_partkey"),
        )
    )
    wli = wli.select(
        *[
            F.col(c) if c in ("l_orderkey", "l_partkey")
            else F.lit(None).cast(li.schema[c].dataType).alias(c)
            for c in li.columns
        ]
    )
    orders.unionByName(worders).write.mode("overwrite").parquet(
        f"{WHALE}/orders.parquet"
    )
    li.unionByName(wli).write.mode("overwrite").parquet(
        f"{WHALE}/lineitem.parquet"
    )

    # LSH whale: near-identical family — identical text except a
    # trailing token, so all 8 minhash slots agree for ~every member
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    family = spark.range(WHALE_DOCS).select(
        (F.lit(WHALE_DOC_BASE) + F.col("id")).alias("doc_id"),
        F.concat(
            F.lit("the quick brown fox jumps over the lazy dog again and "
                  "again in the same boilerplate paragraph tail marker "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    family = family.select(
        *[
            F.col(c) if c in ("doc_id", "text")
            else F.lit(None).cast(docs.schema[c].dataType).alias(c)
            for c in docs.columns
        ]
    )
    docs.unionByName(family).write.mode("overwrite").parquet(
        f"{WHALE}/documents.parquet"
    )


def timed(fn):
    t0 = time.perf_counter()
    n = fn()
    return round(time.perf_counter() - t0, 3), n


def main() -> int:
    skip_unguarded = "--skip-unguarded" in sys.argv

    from sf_datalake_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signature,
    )
    from sf_datalake_spark.queries import _t
    from sf_datalake_spark.queries_analytics import q_item_cf_topk
    from sf_datalake_spark.session import get_spark_session

    spark = get_spark_session("whale_probe")
    build_whale(spark)
    out = {}

    # --- item CF ---
    cap_s, cap_n = timed(lambda: q_item_cf_topk(spark, WHALE).count())
    out["item_cf_capped"] = {"s": cap_s, "rows": cap_n}
    print(f"# item_cf capped(32): {cap_s}s, {cap_n} rows", file=sys.stderr)
    if not skip_unguarded:
        un_s, un_n = timed(
            lambda: q_item_cf_topk(spark, WHALE, max_basket=10**9).count()
        )
        out["item_cf_uncapped"] = {"s": un_s, "rows": un_n}
        print(f"# item_cf uncapped: {un_s}s, {un_n} rows", file=sys.stderr)

    # --- k-core co-purchase pair build (round-5 verdict #2) ---
    # the CF whale doubles as a k-core whale: its 100 orders hold 100
    # distinct parts each, so the uncapped inline explode would emit
    # 100 x C(100,2) = 495 000 pairs from one customer alone (and a
    # single 10k-part order would emit 5x10^7); the frequent_pairs
    # routing drops baskets > max_basket after Apriori pruning.
    from sf_datalake_spark.queries_mining import q_k_core_parts

    kc_s, kc_n = timed(lambda: q_k_core_parts(spark, WHALE).count())
    out["k_core_capped"] = {"s": kc_s, "rows": kc_n}
    print(f"# k_core capped(64): {kc_s}s, {kc_n} rows", file=sys.stderr)
    if not skip_unguarded:
        kun_s, kun_n = timed(
            lambda: q_k_core_parts(spark, WHALE, max_basket=10**9).count()
        )
        out["k_core_uncapped"] = {"s": kun_s, "rows": kun_n}
        print(f"# k_core uncapped: {kun_s}s, {kun_n} rows", file=sys.stderr)

    # --- LSH whale bucket ---
    docs = _t(spark, WHALE, "documents")
    sig = minhash_signature(docs, "doc_id", "text", num_hashes=8,
                            shingle_n=3).persist()
    sig.count()
    star_s, star_n = timed(
        lambda: lsh_candidate_pairs(
            sig, "doc_id", bands=4, rows_per_band=2, signature_length=8,
            max_bucket_size=64,
        ).count()
    )
    out["lsh_star_capped"] = {"s": star_s, "pairs": star_n}
    print(f"# lsh star-capped(64): {star_s}s, {star_n} pairs",
          file=sys.stderr)
    if not skip_unguarded:
        full_s, full_n = timed(
            lambda: lsh_candidate_pairs(
                sig, "doc_id", bands=4, rows_per_band=2, signature_length=8
            ).count()
        )
        out["lsh_uncapped"] = {"s": full_s, "pairs": full_n}
        print(f"# lsh uncapped: {full_s}s, {full_n} pairs", file=sys.stderr)
    sig.unpersist()

    print(json.dumps({"whale_parts": WHALE_PARTS, "whale_docs": WHALE_DOCS,
                      "results": out}))
    shutil.rmtree(WHALE, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
