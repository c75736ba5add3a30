"""First-order Markov (removal-effect) attribution — the data-driven
attribution model the positional family (linear / position / decay,
`queries_mining.py` / `queries_stats.py`) can't express: a channel's
credit is how much the journey-graph's conversion probability DROPS
when that channel is removed (Anderl et al. 2014's industry-standard
formulation, public literature).

Spark-first, 100 TB design:

- **Journey building is two keyed windows** — one cumulative count of
  prior purchases per user (journey id), one lag per (user, journey)
  for the predecessor state — so the only shuffle is on ``user_id``
  (the same exchange serves both windows; AQE sees matching keys).
  Ties order by (ts, event_id): deterministic across engines.
- **The transition matrix is a fixed-size aggregate** — at most
  (|channels|+1)² + 2·(|channels|+1) cells regardless of data volume —
  so collecting it to the driver is bounded by the SCHEMA, not the
  data (the same contract as collecting a groupBy-count over a fixed
  enum).  At 100 TB the scan and windows dominate; the fixpoint is
  microseconds.
- **All-integer fixed-point absorption**: probabilities never
  materialize as floats.  The absorption-to-conversion vector v (in
  ppm) iterates ``v'(s) = (Σ_t cnt[s→t]·v(t)) div out(s)`` a fixed 40
  rounds — every operation is exact int64 (counts ≤ 1e12 × ppm ≤ 1e6
  stays < 2^63), so the DuckDB oracle replays it bit-for-bit with a
  recursive CTE and integer ``//``.  Removing channel c clamps
  ``v(c) = 0`` each round — entering a removed channel absorbs to
  null, the standard removal-effect semantics.
- 40 rounds bound the truncation error at ≤ 40 ppm drift versus the
  true fixpoint while staying engine-exact; the fixpoint itself is a
  contraction (substochastic matrix), so iteration converges
  geometrically and 40 rounds saturate int-ppm resolution for any
  chain whose conversion probability exceeds ~e^-40.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ITERS = 40

#: State names the absorption chain claims for itself ('conv'/'start'/
#: 'null') — a channel with one of these names would silently alias a
#: reserved node and mis-attribute, so both entry points reject them.
_RESERVED_STATES = frozenset({"conv", "start", "null"})


def _checked_touches(touch_states: list[str], conversion: str) -> list[str]:
    """Sorted channel vocabulary, validated: no reserved-state or
    conversion-name collisions, no quotes (shapley's mask is built with
    ``F.when`` so names are never spliced into SQL, but a quoted channel
    name is still a symptom of an upstream bug), no duplicates."""
    touches = sorted(touch_states)
    if len(set(touches)) != len(touches):
        raise ValueError(f"duplicate channel names in touch_states: {touches}")
    bad = [
        c
        for c in touches
        if c in _RESERVED_STATES or c == conversion or "'" in c or '"' in c
    ]
    if bad:
        raise ValueError(
            f"invalid channel names {bad}: must not collide with the "
            f"reserved states {sorted(_RESERVED_STATES)} or the conversion "
            f"event {conversion!r}, and must not contain quotes"
        )
    return touches


def markov_removal_attribution(
    events: DataFrame,
    touch_states: list[str],
    conversion: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per channel: base conversion ppm, removal effect ppm, and the
    normalized attribution share ppm.

    Journeys split at conversions (each conversion terminates the
    journey containing it); a user's trailing touches after the last
    conversion form a null-terminated journey.  ``touch_states`` is the
    closed channel vocabulary (sorted for deterministic output).
    """
    touches = _checked_touches(touch_states, conversion)
    spark = events.sparkSession
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("event_type"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("event_id"),
    )
    w_user = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_j = Window.partitionBy("user_id", "journey").orderBy("ts", "event_id")
    st = (
        ev.withColumn(
            "journey",
            F.coalesce(
                F.sum(
                    F.when(F.col("event_type") == conversion, 1).otherwise(0)
                ).over(w_user),
                F.lit(0),
            ),
        )
        .withColumn(
            "state",
            F.when(F.col("event_type") == conversion, "conv").otherwise(
                F.col("event_type")
            ),
        )
        .withColumn("prev", F.coalesce(F.lag("state").over(w_j), F.lit("start")))
    )
    trans = st.select(F.col("prev").alias("src"), F.col("state").alias("dst"))
    last = (
        st.groupBy("user_id", "journey")
        .agg(F.max(F.struct("ts", "event_id", "state")).alias("m"))
        .select(F.col("m.state").alias("src"))
        .filter(F.col("src") != "conv")
        .withColumn("dst", F.lit("null"))
    )
    counts = (
        trans.unionByName(last).groupBy("src", "dst").agg(F.count("*").alias("n"))
    )
    # fixed-size matrix: bounded by the channel vocabulary, not the data
    cnt = {(r["src"], r["dst"]): r["n"] for r in counts.collect()}
    states = ["start"] + touches
    out = {s: sum(v for (a, _), v in cnt.items() if a == s) for s in states}

    def absorb(removed: str | None = None) -> int:
        v = {s: 0 for s in states}
        v["conv"] = 1_000_000
        v["null"] = 0
        for _ in range(ITERS):
            nv = {}
            for s in states:
                if out[s] == 0:
                    nv[s] = 0
                    continue
                tot = 0
                for t in states + ["conv", "null"]:
                    c = cnt.get((s, t), 0)
                    if c:
                        tot += c * (0 if t == removed else v.get(t, 0))
                nv[s] = tot // out[s]
            for s in states:
                v[s] = 0 if s == removed else nv[s]
        return v["start"]

    base = absorb()
    effects = {
        c: (((base - absorb(c)) * 1_000_000) // base if base else 0)
        for c in touches
    }
    tot_eff = sum(effects.values())
    rows = [
        (
            c,
            base,
            effects[c],
            (effects[c] * 1_000_000) // tot_eff if tot_eff else 0,
        )
        for c in touches
    ]
    return spark.createDataFrame(
        rows,
        "channel string, base_conv_ppm bigint, removal_effect_ppm bigint, "
        "share_ppm bigint",
    ).orderBy("channel")


def shapley_attribution(
    events: DataFrame,
    touch_states: list[str],
    conversion: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Exact Shapley-value attribution (Shapley 1953 via the simplified
    coalition game of Zhao et al. 2018, public literature): a channel's
    credit is its average marginal contribution to the coalition value
    ``v(S) = conversions among journeys touching only channels in S``
    over all orderings.

    Everything is exact integers: journeys reduce to a (channel
    bitmask, converted) pair; the coalition table has 2^k cells (k =
    |channels|, a SCHEMA bound, not a data bound — collected to the
    driver like markov's transition matrix); and the Shapley sum is
    computed scaled by k! so the factorial weights never leave ℤ.
    Returns ``(channel, phi_x_kfact, share_ppm)`` where
    ``phi_x_kfact = φ_c · k!`` (conversion-count units) and shares are
    normalized ppm — both bit-replayable by a SQL oracle that
    enumerates the same 2^k subsets.

    Scale shape: one user-keyed window for journey ids, one
    groupBy(user, journey) with ``bit_or`` for the mask, one
    groupBy(mask) — all shuffles on (user) or the ≤2^k mask key.
    """
    touches = _checked_touches(touch_states, conversion)
    k = len(touches)
    bit = {c: 1 << i for i, c in enumerate(touches)}
    spark = events.sparkSession
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("event_type"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("event_id"),
    )
    w_user = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # channel → bit as an F.when chain (names are data, never SQL text)
    mask_col = F.lit(0)
    for c in touches:
        mask_col = F.when(F.col("event_type") == c, F.lit(bit[c])).otherwise(
            mask_col
        )
    j = (
        ev.withColumn(
            "journey",
            F.coalesce(
                F.sum(
                    F.when(F.col("event_type") == conversion, 1).otherwise(0)
                ).over(w_user),
                F.lit(0),
            ),
        )
        .withColumn("touch_bit", mask_col)
        .groupBy("user_id", "journey")
        .agg(
            F.expr("bit_or(touch_bit)").alias("mask"),
            F.max(
                F.when(F.col("event_type") == conversion, 1).otherwise(0)
            ).alias("conv"),
        )
    )
    cm = {
        r["mask"]: r["c"]
        for r in j.groupBy("mask").agg(F.sum("conv").alias("c")).collect()
    }
    full = (1 << k) - 1
    # v(S) = conversions of journeys whose mask is a subset of S
    v = {
        s: sum(c for m, c in cm.items() if (m & ~s & full) == 0)
        for s in range(1 << k)
    }
    # φ_c·k! = Σ_{S ∌ c} |S|!·(k-|S|-1)!·(v(S∪c) − v(S)) — all integer
    w = [math.factorial(s) * math.factorial(k - s - 1) for s in range(k)]
    phi = {}
    for c in touches:
        b = bit[c]
        phi[c] = sum(
            w[bin(s).count("1")] * (v[s | b] - v[s])
            for s in range(1 << k)
            if (s & b) == 0
        )
    tot = sum(phi.values())
    rows = [
        (c, phi[c], (phi[c] * 1_000_000) // tot if tot else 0)
        for c in touches
    ]
    return spark.createDataFrame(
        rows, "channel string, phi_x_kfact bigint, share_ppm bigint"
    ).orderBy("channel")
