"""Bucketed-table tests: a same-key bucketed join must plan with ZERO
shuffle exchanges — the storage-level co-location story for the panel's
repeated entity joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sf_datalake_spark.io import write_bucketed
from sf_datalake_spark.plans import plan_report


@pytest.fixture()
def bucketed_tables(spark):
    a = spark.createDataFrame(
        [(i, float(i)) for i in range(1000)], "k bigint, v double"
    )
    b = spark.createDataFrame(
        [(i, f"lbl{i % 7}") for i in range(0, 1000, 2)], "k bigint, label string"
    )
    write_bucketed(a, "bkt_a", ["k"], n_buckets=8, sort_cols=["k"])
    write_bucketed(b, "bkt_b", ["k"], n_buckets=8, sort_cols=["k"])
    yield "bkt_a", "bkt_b"
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    ta, tb = bucketed_tables
    a, b = spark.table(ta), spark.table(tb)
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "k")
        rep = plan_report(joined)
        assert rep["n_exchanges"] == 0          # co-located: no shuffle at all
        assert joined.count() == 500
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_groupby_on_bucket_key_has_no_exchange(spark, bucketed_tables):
    ta, _ = bucketed_tables
    df = spark.table(ta).groupBy("k").agg(F.sum("v").alias("s"))
    rep = plan_report(df)
    assert rep["n_exchanges"] == 0


def test_file_skipping_prunes_and_matches_full_scan(spark, tmp_path):
    """Data skipping over a clustered layout: the stats table prunes to
    the files whose [min,max] box intersects the range, the pruned read
    touches FEWER files than the layout holds, and the result is
    row-identical to a full scan + filter (skipping is cost-only)."""
    from sf_datalake_spark.functions.skipping import (
        collect_file_stats,
        prune_files,
        pruned_read,
    )

    path = str(tmp_path / "clustered")
    # 4 files with disjoint key ranges (repartitionByRange + one file
    # per partition = a clustered write)
    df = spark.range(0, 4000).withColumn("v", F.col("id") % 97)
    df.repartitionByRange(4, "id").write.mode("overwrite").parquet(path)

    stats = collect_file_stats(spark, path, ["id", "v"])
    srows = stats.collect()
    assert len(srows) == 4
    assert sum(r["n_rows"] for r in srows) == 4000

    # range touching ~one quarter of the key space
    files = prune_files(stats, {"id": (100, 600)})
    assert 1 <= len(files) < 4, files

    got = pruned_read(spark, stats, {"id": (100, 600)})
    full = spark.read.parquet(path).filter("id >= 100 and id <= 600")
    assert got.count() == full.count() == 501
    assert got.exceptAll(full).count() == 0

    # fully out-of-range predicate: every file pruned, empty same-schema frame
    none = pruned_read(spark, stats, {"id": (100000, 200000)})
    assert none.count() == 0
    assert set(none.columns) == set(full.columns)

    # all-NULL column handling: a file whose column is entirely NULL is
    # pruned for range predicates on that column
    p2 = str(tmp_path / "nulls")
    spark.createDataFrame(
        [(1, None), (2, None)], "id long, v long"
    ).coalesce(1).write.mode("overwrite").parquet(p2)
    s2 = collect_file_stats(spark, p2, ["v"])
    assert prune_files(s2, {"v": (0, 10)}) == []
