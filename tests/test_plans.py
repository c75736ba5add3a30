"""Plan-inspection tests: pushdown, pruning, broadcast — asserted on the
real testdata parquet (sf0.001), because this is exactly what the
100 TB deployment depends on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sf_datalake_spark.plans import plan_report

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet")


def test_filter_pushdown_and_column_pruning(orders):
    df = orders.filter(F.col("o_custkey") == 42).select("o_orderkey", "o_totalprice")
    rep = plan_report(df)
    assert any("o_custkey" in f for f in rep["pushed_filters"])
    # pruned scan: only the 3 referenced columns reach parquet
    assert rep["read_schemas"], "no scan schema found"
    schema = rep["read_schemas"][0]
    assert "o_orderkey" in schema and "o_custkey" in schema
    assert "o_orderpriority" not in schema and "o_orderdate" not in schema


def test_small_dim_join_is_broadcast(spark, orders):
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    df = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .count()
    )
    rep = plan_report(df)
    assert rep["n_broadcasts"] >= 1
    assert rep["n_nested_loop_joins"] == 0


def test_aggregation_plan_shape(orders):
    df = orders.groupBy("o_orderpriority").agg(F.sum("o_totalprice").alias("s"))
    rep = plan_report(df, execute=True)
    assert rep["n_exchanges"] == 1          # one shuffle for the agg
    assert rep["n_python_evals"] == 0       # JVM end-to-end
    assert rep["n_codegen_spans"] >= 1      # whole-stage codegen active


def test_python_stage_detection(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    from sf_datalake_spark.operators.similarity import brute_force_topk_np

    rep = plan_report(brute_force_topk_np(emb, emb, k=2))
    assert rep["n_python_evals"] == 1       # exactly the one mapInPandas


def test_filter_battery_single_pushed_conjunction(spark):
    """The four chained predicate transformers must collapse into ONE
    filter over the scan with every conjunct pushed to parquet."""
    from sf_datalake_spark.queries_ext import q_filter_battery

    rep = plan_report(q_filter_battery(spark, SF_DIR))
    # exactly one scan: the chain collapsed instead of layering filters
    assert len(rep["pushed_filters"]) == 1
    pushed = rep["pushed_filters"][0]
    for col in ("o_totalprice", "o_orderpriority", "o_orderstatus", "o_orderdate"):
        assert col in pushed, f"{col} not pushed to the scan"
    # column pruning survives the transformer chain
    schema = rep["read_schemas"][0]
    assert "o_comment" not in schema and "o_clerk" not in schema


def test_tfidf_broadcast_vocab_join(spark):
    """broadcast_vocab=True turns the vocabulary join into a broadcast
    hash join — the skewable term-key shuffle disappears."""
    from sf_datalake_spark.functions.text import tf_idf_topk

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rep = plan_report(tf_idf_topk(docs, broadcast_vocab=True))
    assert rep["n_broadcasts"] >= 2  # vocabulary + the 1-row corpus size
    assert rep["n_nested_loop_joins"] <= 1  # only the 1-row scalar cross join
