"""Skyline (Pareto frontier) queries: 2-D window form + n-D two-phase.

The skyline of a set under (maximize a, minimize b, ...) is every row
not dominated by another (dominator at-least-as-good on every
dimension, strictly better on one) — Borzsony/Kossmann/Stocker, ICDE
2001 (public literature; no reference-engine equivalent).

Scale design:
- 2-D: aggregate FIRST.  The skyline only depends on min(b) per
  distinct value of the maximized dimension a, so one map-side-combined
  ``groupBy(a).min(b)`` collapses the input to |distinct(a)| rows; the
  strict-prefix minimum runs over that collapsed frame (for a
  high-cardinality ``a`` use :func:`skyline_nd` instead), and frontier
  membership rejoins via a broadcast equi-join — no theta join, no
  global sort of the raw data.
- n-D: the two-phase local/global scheme — per-partition skyline via a
  vectorized numpy pass (``mapInPandas``, O(k·n) per batch), then the
  (small) candidate union is verified with a broadcast theta self-join.
  The local pass is correct because dominance is transitive: a row
  dominated locally is dominated globally, so local pruning never drops
  a skyline row; the global verify removes cross-partition dominance.
  Candidate cardinality is the per-partition skyline sum — for random
  order data O(log^(d-1) n) per partition — so the broadcast side stays
  kilobytes where the input is terabytes.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(df: DataFrame, max_col: str, min_col: str) -> DataFrame:
    """Rows not dominated under (maximize ``max_col``, minimize
    ``min_col``).  Dominance: q beats p iff q.max >= p.max and
    q.min <= p.min with one strict.  Exact under ties: rows equal on
    BOTH dimensions do not dominate each other, so every row sitting
    exactly on the frontier point is returned.

    The raw input is never globally sorted: ``groupBy(max_col)``
    collapses it to one row per distinct maximized value (map-side
    combine), the strictly-greater prefix minimum runs over that small
    frame, and membership is recovered with a broadcast equi-join.
    """
    per_v = df.groupBy(F.col(max_col).alias("__v")).agg(
        F.min(min_col).alias("__mb")
    )
    # Each __v is unique after the groupBy, so a ROWS frame gives the
    # minimum over STRICTLY greater values regardless of the dim type.
    w = (
        Window.orderBy(F.col("__v").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = per_v.withColumn("__pm", F.min("__mb").over(w)).filter(
        F.col("__pm").isNull() | (F.col("__pm") > F.col("__mb"))
    )
    return df.join(
        F.broadcast(frontier),
        (F.col(max_col) == F.col("__v")) & (F.col(min_col) == F.col("__mb")),
    ).drop("__v", "__mb", "__pm")


def _local_skyline_pandas(dims: Sequence[str], signs: Sequence[int]):
    """Per-batch skyline: O(k·n) numpy sweep after a lexicographic sort."""
    import numpy as np

    def fn(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                yield pdf
                continue
            # Normalize every dimension to MAXIMIZE by sign flip.
            mat = np.column_stack(
                [pdf[d].to_numpy(dtype="float64") * s for d, s in zip(dims, signs)]
            )
            order = np.lexsort(mat.T[::-1])[::-1]  # best-first on dim 0
            keep_idx: list[int] = []
            kept = np.empty((0, mat.shape[1]))
            for i in order:
                row = mat[i]
                if len(keep_idx) and np.any(
                    np.all(kept >= row, axis=1) & np.any(kept > row, axis=1)
                ):
                    continue
                keep_idx.append(i)
                kept = np.vstack([kept, row])
            yield pdf.iloc[sorted(keep_idx)]

    return fn


def skyline_nd(
    df: DataFrame, dims: Sequence[str], directions: Sequence[str]
) -> DataFrame:
    """n-dimensional skyline; ``directions[i]`` is 'max' or 'min'.

    Two-phase: local numpy skyline per partition, then broadcast
    theta-join verification of the candidate union."""
    signs = [1 if d == "max" else -1 for d in directions]
    local = df.mapInPandas(_local_skyline_pandas(dims, signs), schema=df.schema)

    # Global verify: candidate c is dropped iff some candidate q
    # dominates it.  Candidates are few (local pruning), so the
    # broadcast side is kilobytes by construction.  The broadcast arm
    # re-derives `local` (the deterministic mapInPandas pass runs on
    # both sides) — deliberate: the pass is scan-stage cheap, and a
    # persist inside an operator would leak cached state into the
    # caller's long-lived session (cache-hygiene contract).
    q = local.select(*[F.col(d).alias(f"__q_{d}") for d in dims])
    geq = [
        (F.col(f"__q_{d}") >= F.col(d)) if s == 1 else (F.col(f"__q_{d}") <= F.col(d))
        for d, s in zip(dims, signs)
    ]
    gt = [
        (F.col(f"__q_{d}") > F.col(d)) if s == 1 else (F.col(f"__q_{d}") < F.col(d))
        for d, s in zip(dims, signs)
    ]
    cond = geq[0]
    for c in geq[1:]:
        cond = cond & c
    strict = gt[0]
    for c in gt[1:]:
        strict = strict | c
    return local.join(F.broadcast(q), on=cond & strict, how="left_anti")
