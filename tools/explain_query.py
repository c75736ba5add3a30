"""Dump ``.explain("formatted")`` for named registry queries to
``plans/<tag>/<query>_<suffix>.txt`` — the optimization-round evidence
files (guide §1: capture the plan before and after every change).

Usage: python tools/explain_query.py --tag r10 --suffix before [--sf DIR] q1 q2 ...

Note: for queries that run eager work inside the callable (iterative
fixed-point loops, streaming replays, MLlib fits), the captured plan is
the FINAL returned frame's plan; the eager stages are documented in
OPTIMIZATION notes instead.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    argv = sys.argv[1:]
    tag = "r10"
    suffix = "before"
    sf_dir = "/root/testdata/sf0.1"
    names = []
    i = 0
    while i < len(argv):
        if argv[i] == "--tag":
            tag = argv[i + 1]; i += 2
        elif argv[i] == "--suffix":
            suffix = argv[i + 1]; i += 2
        elif argv[i] == "--sf":
            sf_dir = argv[i + 1]; i += 2
        else:
            names.append(argv[i]); i += 1

    import __spark_entry__ as entry_mod
    from sf_datalake_spark.session import get_spark_session

    spark = get_spark_session("explain")
    qs = entry_mod.queries()
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"unknown query: {name}", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {path}")
        except Exception as e:
            print(f"explain failed for {name}: {e}", file=sys.stderr)
        finally:
            try:
                spark.catalog.clearCache()
                for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                    jrdd.unpersist(False)
            except Exception:
                pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
