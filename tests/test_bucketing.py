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
