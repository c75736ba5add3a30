"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB against the same sf dir, then compares row count, column NAMES
(types are engine-specific strings and deliberately not compared), and
an order-insensitive, TYPE-FAITHFUL value hash: an int ``3`` and a float
``3.0`` hash differently, mirroring the driver's strict pandas-based
comparator (round 1's only red row, cumulative_revenue, was a DuckDB
HUGEINT surfacing as float that the old ``%.9g`` folding hid).  Float
magnitudes are still normalized to 9 significant digits — the queries
are designed engine-exact, the tolerance only absorbs 15th-decimal
noise, never a type change.  DuckDB results are fetched through Arrow so
HUGEINT/DECIMAL columns are visible (they arrive as decimal128) and
fail loudly with a "cast it in the SQL" hint instead of silently
comparing as arbitrary-precision ints.  Assumes a UTC driver (this
container is UTC): Spark's non-Arrow collect() renders timestamps in the
driver's local zone.

Usage: python tools/check_oracle.py [--strict-hash] [sf_dir] [query ...]

``--strict-hash`` replicates the driver's FULL-precision float
comparator (repr(), 17 significant digits) instead of the default
9-sig-digit fold.  Queries must be engine-exact to pass strict mode —
use it to catch merge_upsert-style double-summation drift locally
before the driver does (round 3's only red row passed the 9g fold but
failed the driver's strict hash on a cents-level association drift).
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys
import time

import duckdb
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


STRICT_HASH = False  # set by --strict-hash: full-precision float compare


def norm_cell(v):
    """Type-tagged cell rendering: values of different Python types never
    collide (int 3 != float 3.0 != Decimal 3), matching the driver's
    type-aware comparator."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return f"b:{int(v)}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        if STRICT_HASH:
            return f"f:{repr(v + 0.0)}"  # full 17-digit precision
        return f"f:{v + 0.0:.9g}"  # fold -0.0 into 0.0
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, datetime.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"d:{v.isoformat()}"
    return str(v)


def suspect_duckdb_types(arrow_schema: "pa.Schema") -> list[str]:
    """Columns whose DuckDB result type cannot round-trip to a Spark type:
    HUGEINT/DECIMAL arrive as decimal128 — the SQL should CAST to
    BIGINT/DOUBLE (DuckDB sums of integers are HUGEINT, including windowed
    sums; sums of DECIMAL literals stay DECIMAL)."""
    bad = []
    for field in arrow_schema:
        if pa.types.is_decimal(field.type):
            bad.append(f"{field.name}:{field.type}")
    return bad


def table_digest(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    import hashlib

    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> int:
    global STRICT_HASH
    argv = [a for a in sys.argv[1:] if a != "--strict-hash"]
    STRICT_HASH = len(argv) != len(sys.argv) - 1
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entry_mod
    from sf_datalake_spark.session import get_spark_session

    spark = get_spark_session("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"Unknown query name(s): {sorted(unknown)}")
        return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        finally:
            # free localCheckpoint blocks between queries — across a
            # full 300-query drive they otherwise pile up in storage
            # memory until a JVM GC (see bench.py's identical hygiene)
            try:
                spark.catalog.clearCache()
                for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                    jrdd.unpersist(False)
            except Exception:
                pass
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            atbl = con.execute(oracles[name]).fetch_arrow_table()
            dcols = atbl.column_names
            dpy = [col.to_pylist() for col in atbl.columns]
            drows = list(zip(*dpy)) if dcols else []
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            continue
        problems = []
        bad_types = suspect_duckdb_types(atbl.schema)
        if bad_types:
            problems.append(
                f"oracle yields HUGEINT/DECIMAL ({', '.join(bad_types)}) — "
                "CAST to BIGINT/DOUBLE in the SQL"
            )
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rows spark={len(srows)} duck={len(drows)}")
        if not problems:
            sh = table_digest([[r[c] for c in scols] for r in srows], scols)
            dh = table_digest(drows, dcols)
            if sh != dh:
                problems.append("value-hash mismatch")
                # show a sample diff
                sset = {
                    "|".join(
                        norm_cell(row[i])
                        for i in sorted(range(len(scols)), key=lambda i: scols[i])
                    )
                    for row in ([[r[c] for c in scols] for r in srows])
                }
                dset = {
                    "|".join(
                        norm_cell(r[i])
                        for i in sorted(range(len(dcols)), key=lambda i: dcols[i])
                    )
                    for r in drows
                }
                for x in list(sset - dset)[:3]:
                    print(f"   spark-only: {x}")
                for x in list(dset - sset)[:3]:
                    print(f"   duck-only:  {x}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"OK   {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
