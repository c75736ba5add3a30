"""Time named registry queries through the noop sink (bench §1.4
methodology: best-of-N, cache cleared between runs) and print one JSON
line.  Used for targeted before/after A/B during optimization rounds —
the full bench.py stays the canonical record.

Usage: python tools/time_queries.py [--sf DIR] [--runs N] q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    runs = 2
    names = []
    i = 0
    while i < len(argv):
        if argv[i] == "--sf":
            sf_dir = argv[i + 1]; i += 2
        elif argv[i] == "--runs":
            runs = int(argv[i + 1]); i += 2
        else:
            names.append(argv[i]); i += 1

    import __spark_entry__ as entry_mod
    from sf_datalake_spark.session import get_spark_session

    spark = get_spark_session("time_queries")
    qs = entry_mod.queries()
    # Warm-up: JVM, parquet footers, Arrow workers (bench does the same).
    qs[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    out: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            try:
                spark.catalog.clearCache()
                for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                    jrdd.unpersist(False)
            except Exception:
                pass
        out[name] = times
    print(json.dumps({"sf_dir": sf_dir, "times": out,
                      "best": {k: min(v) for k, v in out.items()}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
