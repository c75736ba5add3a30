"""IO coverage: readers/writers, prediction writer, csv→orc, sampled
scan, compound-condition semi join (the reference's activity-window
filter shape, ``join_datasets.py:202-210``)."""

from __future__ import annotations

from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import VectorAssembler
from pyspark.sql import functions as F

from sf_datalake_spark.io import csv_to_orc, load_data, write_data, write_predictions
from sf_datalake_spark.pipelines import ExtractJob

from tests.conftest import d


def test_csv_roundtrip_with_custom_sep(spark, tmp_path):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    p = str(tmp_path / "out_csv")
    write_data(df, p, "csv", sep="|")
    back = load_data(spark, p, "csv", sep="|", infer_schema=True)
    assert {(r["k"], r["v"]) for r in back.collect()} == {("a", 1), ("b", 2)}


def test_csv_to_orc_and_lowercase(spark, tmp_path):
    src = tmp_path / "in.csv"
    src.write_text("SIREN,Montant\n123,4.5\n")
    out = str(tmp_path / "out_orc")
    csv_to_orc(spark, str(src), out)
    back = load_data(spark, out, "orc", lowercase_columns=True)
    assert back.columns == ["siren", "montant"]


def test_write_predictions_extracts_positive_probability(spark, tmp_path):
    df = spark.createDataFrame(
        [(1.0, 0.0, 1), (0.0, 1.0, 0), (2.0, 1.0, 1), (0.5, 2.0, 0)] * 5,
        "x double, y double, label int",
    )
    assembled = VectorAssembler(inputCols=["x", "y"], outputCol="features").transform(df)
    model = LogisticRegression(featuresCol="features", labelCol="label").fit(assembled)
    preds = model.transform(assembled)
    p = str(tmp_path / "preds")
    write_predictions(preds, p, keep_cols=["label"])
    back = spark.read.parquet(p)
    assert set(back.columns) == {"label", "probability"}
    probs = [r["probability"] for r in back.collect()]
    assert all(0.0 <= v <= 1.0 for v in probs)


def test_sampled_scan(spark, tmp_path):
    src = tmp_path / "big.csv"
    src.write_text("id\n" + "\n".join(str(i) for i in range(1000)))
    job = ExtractJob(source_path=str(src), sample_ratio=0.2, random_seed=42)
    n = job.build(spark).count()
    assert 100 < n < 320            # Bernoulli sample around 200
    # deterministic for a fixed seed
    assert job.build(spark).count() == n


def test_compound_condition_semi_join(spark):
    """Activity-window membership: siren equal AND date_début <= période
    < date_fin, as a left-semi join (reference ``join_datasets.py:202-210``)."""
    panel = spark.createDataFrame(
        [("1", d("2023-01-01")), ("1", d("2023-05-01")), ("2", d("2023-01-01"))],
        "siren string, `période` date",
    )
    windows = spark.createDataFrame(
        [("1", d("2022-12-01"), d("2023-03-01"))],
        "siren_w string, d0 date, d1 date",
    )
    out = panel.join(
        windows,
        (F.col("siren") == F.col("siren_w"))
        & (F.col("d0") <= F.col("période"))
        & (F.col("période") < F.col("d1")),
        "left_semi",
    )
    assert [(r["siren"], r["période"]) for r in out.collect()] == [("1", d("2023-01-01"))]


def test_events_loader_normalizes_nanos_timestamp(spark):
    """The events parquet stores TIMESTAMP(NANOS); ``queries._t`` must
    surface it as a UTC TIMESTAMP with floor-to-micros values on every
    Spark build (native-nanos readers hand back timestamp_ntz, legacy
    readers bigint nanos — both shapes caught environment drift once).
    Pinned against DuckDB's epoch_us of the same file."""
    import duckdb

    from sf_datalake_spark.queries import _t

    df = _t(spark, "/root/testdata/sf0.001", "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = {
        r["event_id"]: r["us"]
        for r in df.orderBy("event_id")
        .limit(3)
        .select("event_id", F.unix_micros("ts").alias("us"))
        .collect()
    }
    want = dict(
        duckdb.sql(
            "SELECT event_id, epoch_us(ts) FROM "
            "'/root/testdata/sf0.001/events.parquet' ORDER BY event_id LIMIT 3"
        ).fetchall()
    )
    assert got == want


def test_compact_files_reduces_file_count(spark, tmp_path):
    from sf_datalake_spark.io import compact_files

    p = str(tmp_path / "frag")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(40).write.parquet(p)  # 40 tiny files

    stats = compact_files(spark, p, target_mb=128)
    assert stats["files_before"] == 40
    assert stats["files_after"] == 1  # 10k rows << 128 MB

    back = spark.read.parquet(p)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).first()[0] == 2 * sum(range(10_000))
    import glob

    assert len(glob.glob(f"{p}/*.parquet")) == 1


def test_vacuum_staging_removes_only_old_orphans(spark, tmp_path):
    import os
    import time

    from sf_datalake_spark.io import vacuum_staging

    root = str(tmp_path / "lake")
    os.makedirs(f"{root}/table.compacting")
    os.makedirs(f"{root}/table.staging-3")
    os.makedirs(f"{root}/table")          # live dataset: never touched
    os.makedirs(f"{root}/fresh.staging-1")
    old = time.time() - 48 * 3600
    os.utime(f"{root}/table.compacting", (old, old))
    os.utime(f"{root}/table.staging-3", (old, old))

    dry = vacuum_staging(spark, root, retention_hours=24, dry_run=True)
    assert len(dry["removed"]) == 2 and os.path.exists(f"{root}/table.compacting")

    res = vacuum_staging(spark, root, retention_hours=24)
    assert [os.path.basename(p) for p in res["removed"]] == [
        "table.compacting", "table.staging-3"
    ]
    assert [os.path.basename(p) for p in res["kept_recent"]] == [
        "fresh.staging-1"
    ]
    assert not os.path.exists(f"{root}/table.compacting")
    assert os.path.exists(f"{root}/table")
    assert os.path.exists(f"{root}/fresh.staging-1")


def test_align_schemas_evolution(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from sf_datalake_spark.io import align_schemas
    from sf_datalake_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 1.5)], "k int, name string, score double"
    )
    evolved = spark.createDataFrame([(2, 7)], "k int, score int")  # no name; int score
    aligned = align_schemas(evolved, target)
    assert aligned.columns == ["k", "name", "score"]
    assert dict(aligned.dtypes)["score"] == "double"
    row = aligned.collect()[0]
    assert (row["k"], row["name"], row["score"]) == (2, None, 7.0)
    # and the aligned batch flows into merge_upsert
    merged = merge_upsert(target, aligned, ["k"]).orderBy("k").collect()
    assert [(r["k"], r["name"]) for r in merged] == [(1, "a"), (2, None)]
    # extra columns refuse rather than silently dropping data
    with _pytest.raises(ValueError, match="absent from the target"):
        align_schemas(
            spark.createDataFrame([(1, "x")], "k int, rogue string"), target
        )


def test_align_schemas_refuses_lossy_casts(spark):
    import pytest as _pytest

    from sf_datalake_spark.io import align_schemas

    target = spark.createDataFrame([(1, 1.5)], "k int, score double")
    drifted = spark.createDataFrame([(1, "n/a")], "k int, score string")
    with _pytest.raises(ValueError, match="lossy casts refused"):
        align_schemas(drifted, target)
    # explicit override performs the cast (NULLing the bad value)
    row = align_schemas(drifted, target, allow_lossy_casts=True).collect()[0]
    assert row["score"] is None
    # narrowing numeric also refused
    target2 = spark.createDataFrame([(1, 1)], "k int, n int")
    with _pytest.raises(ValueError, match="lossy"):
        align_schemas(spark.createDataFrame([(1, 1.5)], "k int, n double"), target2)
