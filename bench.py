"""Benchmark harness: run every headline query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is total wall-clock seconds across all queries (each query is
fully materialized via a count-style collect of its rows). Session/JVM
startup is excluded; a warm-up query primes the JVM and parquet footer
cache so timings reflect execution, not first-touch overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod
    from sf_datalake_spark.session import get_spark_session

    spark = get_spark_session("bench")

    qs = entry_mod.queries()

    # Warm up: JVM codegen, parquet footers, the Arrow python workers
    # (so the first mapInPandas query doesn't pay worker spawn), the
    # MLlib optimizer path (class loading + BLAS + JIT is worth tens of
    # seconds on the first .fit of a session), and the Structured
    # Streaming machinery.
    try:
        next(iter(qs.values()))(spark, sf_dir).limit(1).collect()
        spark.range(32).repartition(32).mapInPandas(
            lambda it: it, schema="id long"
        ).count()
        from pyspark.ml.classification import LogisticRegression
        from pyspark.ml.linalg import Vectors

        tiny = spark.createDataFrame(
            [(Vectors.dense([0.0, 1.0]), 0.0), (Vectors.dense([1.0, 0.0]), 1.0)]
            * 8,
            ["features", "label"],
        )
        LogisticRegression(maxIter=2).fit(tiny)
        (
            spark.readStream.format("rate").option("rowsPerSecond", 1).load()
            .writeStream.format("memory").queryName("_bench_warmup")
            .trigger(availableNow=True).start().awaitTermination()
        )
    except Exception:
        pass

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            # The noop sink fully materializes every column (count() would
            # let Catalyst prune computed columns) with no driver transfer.
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:
            print(f"bench error in {name}: {e}", file=sys.stderr)
            timings[name] = -1.0
        # A query that leaks persisted frames would tax every later
        # timing; clearing between queries keeps them independent.
        spark.catalog.clearCache()
    total = round(sum(t for t in timings.values() if t >= 0), 3)

    sf = None
    try:
        base = os.path.basename(sf_dir.rstrip("/"))
        if base.startswith("sf"):
            sf = float(base[2:])
    except ValueError:
        pass

    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
