"""Skew mitigation: salted aggregation and salted joins.

The reference runs at ~few-GB scale and never hits key skew; at 100 TB a
single hot key (one giant company, one viral document, the NULL key)
serializes an entire stage. Two standard remedies, DataFrame-native:

- :func:`salted_aggregate` — two-phase aggregation: first groupBy
  (key, salt) spreads a hot key over N partitions, then the tiny partial
  result re-aggregates by key. Only algebraic aggregates (sum/count/
  min/max) compose this way; avg is derived as sum/count.
- :func:`salted_join` — explode the SMALL side N ways, salt the big
  side's key randomly in [0, N): every big-side row still meets its
  match exactly once, but a hot key's rows now land on N reducers.

AQE's skew-join handling (on in our session factory) covers sort-merge
joins automatically; these helpers are for aggregations and for join
shapes AQE can't split (e.g. shuffled hash with extreme single-key
skew).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ALGEBRAIC = {"sum", "count", "min", "max"}


def spread_narrow_scan(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition a NARROW scan so a CPU-heavy map stage (shingling,
    per-token hashing, Arrow codec work — stages whose cost per input
    byte is large) uses the whole cluster.

    Small parquet inputs arrive as one or two scan partitions (file <
    ``spark.sql.files.maxPartitionBytes``), which serializes the
    expensive map work onto one core.  When the input has fewer
    partitions than the default parallelism this round-robin
    repartitions up to ``defaultParallelism * factor``; at real scale
    (100 TB → thousands of scan splits) the guard makes it a no-op, so
    the shuffle of raw payloads is only ever paid when they are small.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    agg: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """GroupBy with hot-key protection: (keys, salt) partial aggregation
    then a by-keys final combine. Output matches ``groupBy(keys).agg``
    for algebraic functions; ``avg`` is computed as a salted sum/count
    pair. Column names keep the input name (like KeyAggregator)."""
    partials = []
    finals = []
    for c, fn in agg.items():
        if fn == "avg":
            partials += [F.sum(c).alias(f"__s_{c}"), F.count(c).alias(f"__c_{c}")]
            finals.append((F.sum(f"__s_{c}") / F.sum(f"__c_{c}")).alias(c))
        elif fn in _ALGEBRAIC:
            partials.append(getattr(F, fn)(c).alias(f"__p_{c}"))
            recombine = "sum" if fn == "count" else fn
            finals.append(getattr(F, recombine)(f"__p_{c}").alias(c))
        else:
            raise ValueError(
                f"{fn} is not algebraic — cannot be salted (use plain groupBy)"
            )
    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(*partials)
    return partial.groupBy(*keys).agg(*finals)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join with the small side replicated ``n_salts`` times and the
    big side salted — a hot join key fans out over ``n_salts`` reducers.

    The small side grows ×n_salts (keep it the genuinely smaller input);
    each big-side row joins exactly its one (key, salt) replica, so
    multiplicity is unchanged. Only inner/left are supported: in a
    right/full outer join an UNMATCHED small-side key would surface once
    per salt replica (×n_salts duplication)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins, not {how!r} — unmatched "
            "small-side rows would be duplicated once per salt replica"
        )
    on = list(on)
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    salted_big = big.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    return salted_big.join(replicated, on + ["__salt"], how).drop("__salt")
