"""Measured-scaling probe: how do the headline operators behave when
the data grows ~8x beyond the bench scale?

Builds a scaled copy of the sf0.1 testdata in /tmp by unioning each
large table N times with disjoint key offsets (so joins stay consistent
and dedup/similarity keys stay unique), then times a representative
query per operator family at BOTH scales through the ordinary registry
(same code path the driver runs — the scaled directory mimics an sf
directory). Prints one JSON line:

    {"n_copies": 8, "queries": {name: {"base_s": ..., "scaled_s": ...,
     "ratio": ...}}}

A ratio near the data ratio (or below it, for fixed-output aggregates
where only the scan grows) is the linear-scaling evidence SCALE.md
cites; a super-linear ratio flags an operator whose plan degrades with
volume.

Usage: python tools/scale_probe.py [n_copies] [query ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
SCALED = "/tmp/sf_scaled"

# per-table key columns to offset per copy (disjoint id spaces keep
# dedup exact, joins consistent, and group counts growing with the data)
OFFSETS = {
    "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
    "lineitem": {"l_orderkey": 100_000_000},
    "customer": {"c_custkey": 10_000_000},
    "events": {"event_id": 100_000_000, "user_id": 10_000_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
}
SMALL = ["region", "nation", "supplier", "part"]

DEFAULT_QUERIES = [
    "monthly_panel",        # scan + groupBy agg
    "exact_dedup",          # hash-agg dedup
    "minhash_lsh_pairs",    # explode + banded self-join
    "asof_backward",        # union-tag + window as-of
    "embedding_topk_sharded",  # cogrouped BLAS grid
    "sessionize",           # keyed window gaps-and-islands
]


def build_scaled(spark, n_copies: int) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(SCALED):
        shutil.rmtree(SCALED)
    os.makedirs(SCALED)
    for t in SMALL:
        shutil.copy(f"{BASE}/{t}.parquet", f"{SCALED}/{t}.parquet")
    for t, offs in OFFSETS.items():
        if t == "events":
            from sf_datalake_spark.queries import _t

            df = _t(spark, BASE, "events")  # normalizes the nanos ts
        else:
            df = spark.read.parquet(f"{BASE}/{t}.parquet")
        parts = []
        for i in range(n_copies):
            part = df
            for col, step in offs.items():
                part = part.withColumn(col, F.col(col) + F.lit(i * step))
            parts.append(part)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{SCALED}/{t}.parquet")


def main() -> int:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    names = sys.argv[2:] or DEFAULT_QUERIES

    import __spark_entry__ as entry_mod
    from sf_datalake_spark.session import get_spark_session

    spark = get_spark_session("scale_probe")
    qs = entry_mod.queries()
    build_scaled(spark, n_copies)

    def run(name, sf_dir):
        best = None
        for _ in range(2):  # best-of-2, same rule as bench.py
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
            spark.catalog.clearCache()
        return round(best, 3)

    # warm both directories' footers + the Arrow workers
    qs[names[0]](spark, BASE).limit(1).collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    out = {}
    for name in names:
        base_s = run(name, BASE)
        scaled_s = run(name, SCALED)
        out[name] = {
            "base_s": base_s,
            "scaled_s": scaled_s,
            "ratio": round(scaled_s / base_s, 2) if base_s > 0 else None,
        }
        print(f"# {name}: {base_s}s -> {scaled_s}s "
              f"(x{out[name]['ratio']})", file=sys.stderr)
    print(json.dumps({"n_copies": n_copies, "queries": out}))
    shutil.rmtree(SCALED, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
