"""SparkSession factory with scale-appropriate defaults.

Reference behavior replaced: ``sf_datalake.utils.get_spark_session``
(reference ``src/sf_datalake/utils.py:15-20``) set an obsolete Spark-2.x
shuffle transport and a driver result cap. Here we configure a modern
Spark 4.x session: AQE on (runtime re-planning, skew-join handling,
partition coalescing), Arrow on (fast pandas interchange), UTC session
timezone (deterministic date semantics vs external oracles).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark_session(
    app_name: str = "sf_datalake_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    On a real cluster ``master`` comes from the submit environment; locally
    we default to ``local[N]`` with N = SPARK_GRAFT_CPUS. Shuffle
    partitions default to the core count — at 100 TB scale the caller
    should raise this (or rely on AQE coalescing from a high initial
    value); the knob is exposed rather than hidden.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Runtime filtering: build a bloom filter from a join's selective
        # side and push it into the other side's scan — at 100 TB this
        # prunes shuffle input the static optimizer can't see. Pinned on
        # explicitly (the default has flipped across Spark minors).
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # MIN/MAX/COUNT over parquet answer from footer statistics
        # without touching a data page (off by default).
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        # Whole-stage codegen emits new classes per query; JDK 17's
        # default 240 MB code cache fills after a few hundred distinct
        # plans in one JVM, the JIT silently stops compiling, and
        # late-run queries execute INTERPRETED — audited in round 5 as
        # a positional 5-10x inflation of small codegen-bound queries
        # at the tail of a 300-query drive (the same setting Spark's
        # own tuning guide prescribes for many-query applications).
        # Only effective when this builder launches the JVM (local
        # mode / driver); harmless if a running gateway already exists.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
    )
    if master:
        builder = builder.master(master)
    else:
        # Only default to local[N] when no master was provided by the
        # submit environment — spark-submit passes --master as the
        # spark.master system property, NOT an env var, and overriding
        # it would silently run the "cluster" job single-node.
        from pyspark import SparkConf

        if not SparkConf().contains("spark.master"):
            builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
