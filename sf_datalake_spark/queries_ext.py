"""Extended query/oracle registry: set operations, outer joins,
rollup/pivot, cumulative windows, date arithmetic, interpolation,
SimHash, multimodal metadata, forward as-of — widening SURVEY.md §2
coverage beyond the core registry in ``queries.py``. Same conventions
(identical aliases in Spark and SQL, exact-decimal rounding).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sf_datalake_spark.operators.asof import merge_asof
from sf_datalake_spark.operators.dedup import simhash, simhash_near_dup_pairs
from sf_datalake_spark.operators.windows import with_linear_interpolation
from sf_datalake_spark.queries import _t, customer_monthly_panel, _PANEL_SQL


# ---------------------------------------------------------------------------
# Set operations (SURVEY.md §2.7: union/intersect + the except the
# reference lacks)
# ---------------------------------------------------------------------------

def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union / intersect / except over yearly active-customer key sets."""
    orders = _t(spark, sf_dir, "orders")

    def active(year: int) -> DataFrame:
        return (
            orders.filter(F.year("o_orderdate") == year)
            .select(F.col("o_custkey").alias("custkey"))
            .distinct()
        )

    y96, y97 = active(1996), active(1997)
    return (
        y96.union(y97).distinct().select(F.lit("union").alias("op"), "custkey")
        .unionByName(y96.intersect(y97).select(F.lit("intersect").alias("op"), "custkey"))
        .unionByName(y96.exceptAll(y97).select(F.lit("except").alias("op"), "custkey"))
        .groupBy("op")
        .agg(F.count("*").alias("n_customers"))
    )


_SET_OPS_SQL = """
    WITH y96 AS (SELECT DISTINCT o_custkey AS custkey FROM orders
                 WHERE year(o_orderdate) = 1996),
         y97 AS (SELECT DISTINCT o_custkey AS custkey FROM orders
                 WHERE year(o_orderdate) = 1997),
    tagged AS (
        SELECT 'union' AS op, custkey FROM (SELECT custkey FROM y96 UNION
                                            SELECT custkey FROM y97)
        UNION ALL
        SELECT 'intersect', custkey FROM (SELECT custkey FROM y96 INTERSECT
                                          SELECT custkey FROM y97)
        UNION ALL
        SELECT 'except', custkey FROM (SELECT custkey FROM y96 EXCEPT
                                       SELECT custkey FROM y97)
    )
    SELECT op, CAST(count(*) AS BIGINT) AS n_customers FROM tagged GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Full outer join (reference ``extract_ap_data.py:225-229`` demande ⋈
# consommation shape)
# ---------------------------------------------------------------------------

def q_outer_join_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two per-(user, day) event-type rollups with
    key coalescing — months where either side exists survive."""
    ev = _t(spark, sf_dir, "events")

    def side(kind: str, alias: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == kind)
            .groupBy("user_id", F.col("ts").cast("date").alias("day"))
            .agg(F.round(F.sum("value"), 2).alias(alias))
        )

    clicks = side("click", "click_value")
    purchases = side("purchase", "purchase_value")
    return (
        clicks.join(purchases, ["user_id", "day"], "outer")
        .select("user_id", "day", "click_value", "purchase_value")
    )


_OUTER_JOIN_SQL = """
    WITH clicks AS (
        SELECT user_id, ts::date AS day, round(sum(value), 2) AS click_value
        FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ),
    purchases AS (
        SELECT user_id, ts::date AS day, round(sum(value), 2) AS purchase_value
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT coalesce(c.user_id, p.user_id) AS user_id,
           coalesce(c.day, p.day) AS day,
           c.click_value, p.purchase_value
    FROM clicks c FULL OUTER JOIN purchases p
      ON c.user_id = p.user_id AND c.day = p.day
"""


# ---------------------------------------------------------------------------
# Rollup + grouping id (beyond the reference: no grouping sets anywhere,
# SURVEY.md §2.4)
# ---------------------------------------------------------------------------

def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    base = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    )
    return (
        base.rollup(F.col("n_name").alias("nation_name"),
                    F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.grouping_id().alias("gid"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


_ROLLUP_SQL = """
    SELECT n_name AS nation_name, c_mktsegment AS mktsegment,
           CAST(GROUPING(n_name) * 2 + GROUPING(c_mktsegment) AS BIGINT) AS gid,
           round(sum(o_totalprice), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY ROLLUP(nation_name, mktsegment)
"""


# ---------------------------------------------------------------------------
# Pivot (wide conditional aggregation)
# ---------------------------------------------------------------------------

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIORITY_ALIASES = ["p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low"]


def q_pivot_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders per (month, priority) pivoted to one column per priority."""
    orders = _t(spark, sf_dir, "orders")
    out = (
        orders.groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("month"))
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
        .na.fill(0)
    )
    renames = dict(zip(_PRIORITIES, _PRIORITY_ALIASES))
    return out.select(
        "month", *[F.col(f"`{p}`").alias(a) for p, a in renames.items()]
    )


_PIVOT_SQL = """
    SELECT date_trunc('month', o_orderdate)::date AS month,
           count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS p1_urgent,
           count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS p2_high,
           count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS p3_medium,
           count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS p4_not_specified,
           count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS p5_low
    FROM orders GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Cumulative window (reference ``rar_dataset.py:52-76``) + multi-agg stats
# ---------------------------------------------------------------------------

def q_cumulative_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue + order count per customer over its monthly panel."""
    panel = customer_monthly_panel(spark, sf_dir)
    w = (
        Window.partitionBy("custkey")
        .orderBy("periode")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return panel.select(
        "custkey",
        "periode",
        F.round(F.sum("revenue").over(w), 2).alias("cum_revenue"),
        F.sum("n_orders").over(w).alias("cum_orders"),
    )


_CUMULATIVE_SQL = f"""
    WITH panel AS ({_PANEL_SQL})
    SELECT custkey, periode,
           round(sum(revenue) OVER w, 2) AS cum_revenue,
           CAST(sum(n_orders) OVER w AS BIGINT) AS cum_orders
    FROM panel
    WINDOW w AS (PARTITION BY custkey ORDER BY periode
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def q_supplier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-agg per group: sum/min/max/avg/stddev/count (reference AP
    interval agg ``extract_ap_data.py:185-207`` + ANOVA group stats
    ``exploration.py:118-125``)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.stddev("l_quantity"), 4).alias("std_qty"),
        F.count("*").alias("n_items"),
    )


_SUPPLIER_STATS_SQL = """
    SELECT l_suppkey,
           round(sum(l_quantity), 2) AS sum_qty,
           min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty,
           round(avg(l_quantity), 6) AS avg_qty,
           round(stddev_samp(l_quantity), 4) AS std_qty,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Date arithmetic battery (SURVEY.md §2.8)
# ---------------------------------------------------------------------------

def q_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    ship = F.col("l_shipdate").cast("date")
    ordered = F.col("o_orderdate").cast("date")
    return li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        F.datediff(ship, ordered).alias("ship_delay_days"),
        F.date_add(ship, 30).alias("ship_plus_30"),
        F.add_months(ship, 2).alias("ship_plus_2m"),
        F.last_day(ship).alias("ship_month_end"),
        F.year(ship).alias("ship_year"),
        F.quarter(ship).alias("ship_quarter"),
        F.dayofmonth(ship).alias("ship_dom"),
    )


_DATE_ARITH_SQL = """
    SELECT l_orderkey, l_linenumber,
           CAST(date_diff('day', o_orderdate::date, l_shipdate::date) AS INT)
             AS ship_delay_days,
           l_shipdate::date + 30 AS ship_plus_30,
           (l_shipdate::date + INTERVAL 2 MONTH)::date AS ship_plus_2m,
           last_day(l_shipdate::date) AS ship_month_end,
           CAST(year(l_shipdate::date) AS INT) AS ship_year,
           CAST(quarter(l_shipdate::date) AS INT) AS ship_quarter,
           CAST(day(l_shipdate::date) AS INT) AS ship_dom
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""


# ---------------------------------------------------------------------------
# Linear interpolation over the daily grid (reference
# ``transform.py:939-1054``), oracle-checked
# ---------------------------------------------------------------------------

_DAILY_BASE_SQL = """
        SELECT user_id, ts::date AS day, round(sum(value), 2) AS day_value
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
"""


def q_daily_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-user daily grid of purchase values with interior gaps
    linearly interpolated (row-index interpolation == day interpolation
    on a dense grid)."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.round(F.sum("value"), 2).alias("day_value"))
    )
    grid = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
        )
    )
    sparse = grid.join(daily, ["user_id", "day"], "left")
    out = with_linear_interpolation(
        sparse, "day_value", keys=["user_id"], order_col="day", out_fmt="{col}_interp"
    )
    return out.select(
        "user_id", "day", "day_value",
        F.round("day_value_interp", 6).alias("day_value_interp"),
    )


_INTERPOLATION_SQL = f"""
    WITH daily AS ({_DAILY_BASE_SQL}),
    bounds AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
    grid AS (
        SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::date AS day
        FROM bounds
    ),
    sparse AS (
        SELECT g.user_id, g.day, d.day_value,
               CAST(row_number() OVER (PARTITION BY g.user_id ORDER BY g.day) AS BIGINT)
                 AS rn
        FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    ),
    anchored AS (
        SELECT user_id, day, day_value, rn,
               last_value(day_value IGNORE NULLS) OVER wp AS v_prev,
               first_value(day_value IGNORE NULLS) OVER wn AS v_next,
               last_value(CASE WHEN day_value IS NOT NULL THEN rn END IGNORE NULLS)
                 OVER wp AS i_prev,
               first_value(CASE WHEN day_value IS NOT NULL THEN rn END IGNORE NULLS)
                 OVER wn AS i_next
        FROM sparse
        WINDOW wp AS (PARTITION BY user_id ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY user_id ORDER BY day
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, day, day_value,
           round(CASE WHEN day_value IS NOT NULL THEN day_value
                      WHEN i_prev IS NOT NULL AND i_next IS NOT NULL
                      THEN v_prev + (v_next - v_prev) * (rn - i_prev) / (i_next - i_prev)
                 END, 6) AS day_value_interp
    FROM anchored
"""


# ---------------------------------------------------------------------------
# SimHash (portable 48-bit family) + near-dup pairs
# ---------------------------------------------------------------------------

def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return simhash(docs, "doc_id", "text", bits=48)


def _simhash_sql(bits: int = 48) -> str:
    hexlen = bits // 4
    bit_sums = ",\n               ".join(
        f"CASE WHEN sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
        f"THEN {1 << i}::BIGINT ELSE 0 END AS b{i}"
        for i in range(bits)
    )
    total = " + ".join(f"b{i}" for i in range(bits))
    return rf"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS t
        FROM documents
    ),
    hashed AS (
        SELECT doc_id, CAST(('0x' || substr(md5(t), 1, {hexlen})) AS BIGINT) AS h
        FROM toks
    ),
    bitsums AS (
        SELECT doc_id,
               {bit_sums}
        FROM hashed GROUP BY doc_id
    )
    SELECT doc_id, {total} AS simhash FROM bitsums
"""


_SIMHASH_SQL = _simhash_sql(48)


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-block SimHash near-dups at the standard hamming ≤ 3: four
    12-bit blocks make candidate recall exact (pigeonhole), so the
    DuckDB oracle can be the genuinely independent brute-force all-pairs
    hamming join — any blocking bug shows up as missing rows."""
    docs = _t(spark, sf_dir, "documents")
    sims = simhash(docs, "doc_id", "text", bits=48)
    return simhash_near_dup_pairs(sims, "doc_id", max_hamming=3, bits=48)


_SIMHASH_PAIRS_SQL = f"""
    WITH sims AS ({_SIMHASH_SQL})
    SELECT a.doc_id AS id_1, b.doc_id AS id_2,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sims a JOIN sims b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


# ---------------------------------------------------------------------------
# Multimodal metadata pass (binary payloads; JVM-side, oracle-checked)
# ---------------------------------------------------------------------------

def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Treat each document's utf-8 bytes as an opaque binary payload and
    run the corpus-wide integrity/metadata pass (length + md5) — the
    stage that precedes any decode on a 100 TB media corpus."""
    from sf_datalake_spark.multimodal import with_asset_metadata

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text").alias("modality"),
        F.encode("text", "UTF-8").alias("content"),
    )
    out = with_asset_metadata(docs)
    return out.select("asset_id", "modality", "content_length", "content_md5")


_MULTIMODAL_META_SQL = """
    SELECT doc_id AS asset_id, 'text' AS modality,
           CAST(octet_length(encode(text)) AS INT) AS content_length,
           md5(text) AS content_md5
    FROM documents
"""


# ---------------------------------------------------------------------------
# Forward as-of join (completing the direction surface; DuckDB ASOF with
# a flipped inequality)
# ---------------------------------------------------------------------------

def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each click, the nearest purchase at-or-after it per user
    within 2 hours."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    from sf_datalake_spark.operators.windows import dedup_by_rank

    purchases = dedup_by_rank(
        ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", F.col("value").alias("purchase_value")
        ),
        keys=["user_id", "ts"],
        order_by=[F.col("purchase_value").desc()],
    )
    out = merge_asof(
        clicks, purchases, on="ts", by=["user_id"],
        value_cols=["purchase_value"], direction="forward", tolerance=7200,
    )
    return out.select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "purchase_value"
    )


_ASOF_FORWARD_SQL = """
    WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, ts, value AS purchase_value FROM events
               WHERE event_type = 'purchase'
               QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                          ORDER BY value DESC) = 1)
    SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
           CASE WHEN p.ts IS NOT NULL
                 AND (epoch_us(p.ts) - epoch_us(c.ts)) <= 7200000000::BIGINT
                THEN p.purchase_value END AS purchase_value
    FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.ts
"""


# ---------------------------------------------------------------------------
# Exploration: ANOVA (distributed Column arithmetic), exact quantiles,
# PCA (rows-only — component signs are implementation-defined)
# ---------------------------------------------------------------------------

def q_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event value across event types, as ONE DataFrame
    plan (group stats → broadcast grand mean → scalar combine) — no
    driver math (reference ``exploration.py:103-152`` used 2 UDFs +
    driver scipy)."""
    ev = _t(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.avg("value").alias("mean"),
        F.var_samp("value").alias("var"),
    )
    grand = stats.agg(
        (F.sum(F.col("n") * F.col("mean")) / F.sum("n")).alias("gm"),
        F.sum("n").alias("n_total"),
        F.count("*").alias("k"),
    )
    return (
        stats.crossJoin(F.broadcast(grand))
        .agg(
            F.round(
                (
                    F.sum(F.col("n") * F.pow(F.col("mean") - F.col("gm"), 2))
                    / (F.first("k") - 1)
                )
                / (
                    F.sum((F.col("n") - 1) * F.col("var"))
                    / (F.first("n_total") - F.first("k"))
                ),
                4,
            ).alias("f_stat"),
            (F.first("k") - 1).alias("df_between"),
            (F.first("n_total") - F.first("k")).alias("df_within"),
        )
    )


_ANOVA_SQL = """
    WITH stats AS (
        SELECT event_type, count(value) AS n, avg(value) AS mean,
               var_samp(value) AS var
        FROM events GROUP BY 1
    ),
    grand AS (
        SELECT sum(n * mean) / sum(n) AS gm, sum(n) AS n_total, count(*) AS k
        FROM stats
    )
    SELECT round((sum(n * (mean - gm) ^ 2) / (any_value(k) - 1))
                 / (sum((n - 1) * var) / (any_value(n_total) - any_value(k))),
                 4) AS f_stat,
           CAST(any_value(k) - 1 AS BIGINT) AS df_between,
           CAST(any_value(n_total) - any_value(k) AS BIGINT) AS df_within
    FROM stats CROSS JOIN grand
"""


def q_quantile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-column quantiles (reference ``exploration.py:392-401``)."""
    from sf_datalake_spark.ml.exploration import quantile_summary

    li = _t(spark, sf_dir, "lineitem")
    out = quantile_summary(li, ["l_quantity", "l_extendedprice"],
                           (0.05, 0.25, 0.5, 0.75, 0.95))
    return out.select("column", "quantile", F.round("value", 6).alias("value"))


_QUANTILE_SQL = """
    WITH agg AS (
        SELECT quantile_cont(l_quantity, [0.05, 0.25, 0.5, 0.75, 0.95]) AS vq,
               quantile_cont(l_extendedprice, [0.05, 0.25, 0.5, 0.75, 0.95]) AS vp
        FROM lineitem
    )
    SELECT 'l_quantity' AS column,
           CAST(unnest([0.05, 0.25, 0.5, 0.75, 0.95]) AS DOUBLE) AS quantile,
           round(unnest(vq), 6) AS value
    FROM agg
    UNION ALL
    SELECT 'l_extendedprice',
           CAST(unnest([0.05, 0.25, 0.5, 0.75, 0.95]) AS DOUBLE),
           round(unnest(vp), 6)
    FROM agg
"""


def q_pca_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA of the embeddings' FIRST 8 DIMENSIONS onto 2 components —
    deliberate truncation to keep the scalar-column assembly small
    (DataFrame-native; replaces the reference's RDD RowMatrix SVD,
    ``exploration.py:155-177``). Rows-only check: component signs and
    rotations are implementation-defined, so no cross-engine oracle."""
    from pyspark.ml.functions import vector_to_array

    from sf_datalake_spark.ml.exploration import pca_project

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", *[F.element_at("embedding", i + 1).alias(f"e{i}") for i in range(8)]
    )
    projected, _ = pca_project(emb, [f"e{i}" for i in range(8)], k=2)
    arr = vector_to_array("pca_features")
    return projected.select(
        "vec_id",
        F.element_at(arr, 1).alias("pc1"),
        F.element_at(arr, 2).alias("pc2"),
    )


def q_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: join + agg + global ORDER BY + LIMIT top-k
    (SURVEY.md §2.6 — the reference never uses limit/top-k; a complete
    engine needs the TakeOrderedAndProject path). Total order via the
    orderkey tiebreak keeps the result deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        .filter(F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp"))
        .groupBy(F.col("l_orderkey").alias("orderkey"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("orderkey").asc())
        .limit(10)
    )


_TOP_UNSHIPPED_SQL = """
    SELECT l_orderkey AS orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderdate < TIMESTAMP '1997-01-01'
      AND l_shipdate > TIMESTAMP '1997-01-01'
    GROUP BY 1
    ORDER BY revenue DESC, orderkey ASC
    LIMIT 10
"""


def q_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + single scalar aggregate — the
    pushdown-everything query (predicates reach the parquet scan)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.05))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "forecast_revenue"
            ),
            F.count("*").alias("n_lineitems"),
        )
    )


_FORECAST_SQL = """
    SELECT round(sum(l_extendedprice * l_discount), 4) AS forecast_revenue,
           CAST(count(*) AS BIGINT) AS n_lineitems
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.05
      AND l_quantity < 24
"""


def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of (the direction the reference documented
    but never implemented — ``utils.py:126`` vs ``:190-193``): closest
    click before OR after each purchase, 30-minute tolerance, ties →
    backward (pandas convention)."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    from sf_datalake_spark.operators.windows import dedup_by_rank

    clicks = dedup_by_rank(
        ev.filter(F.col("event_type") == "click").select(
            "user_id", "ts", F.col("value").alias("click_value")
        ),
        keys=["user_id", "ts"],
        order_by=[F.col("click_value").desc()],
    )
    out = merge_asof(
        purchases, clicks, on="ts", by=["user_id"],
        value_cols=["click_value"], direction="nearest", tolerance=1800,
    )
    return out.select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "click_value"
    )


_ASOF_NEAREST_SQL = """
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts, value AS click_value FROM events
               WHERE event_type = 'click'
               QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                          ORDER BY value DESC) = 1),
    b AS (
        SELECT p.event_id, c.ts AS bts, c.click_value AS bv
        FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    ),
    f AS (
        SELECT p.event_id, c.ts AS fts, c.click_value AS fv
        FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts
    )
    SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
           CASE
             WHEN b.bts IS NOT NULL
                  AND (epoch_us(p.ts) - epoch_us(b.bts)) <= 1800000000::BIGINT
                  AND (f.fts IS NULL
                       OR (epoch_us(f.fts) - epoch_us(p.ts)) > 1800000000::BIGINT
                       OR (epoch_us(p.ts) - epoch_us(b.bts))
                          <= (epoch_us(f.fts) - epoch_us(p.ts)))
               THEN b.bv
             WHEN f.fts IS NOT NULL
                  AND (epoch_us(f.fts) - epoch_us(p.ts)) <= 1800000000::BIGINT
               THEN f.fv
           END AS click_value
    FROM p LEFT JOIN b ON p.event_id = b.event_id
           LEFT JOIN f ON p.event_id = f.event_id
"""


def q_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking battery the reference never used (SURVEY.md §2.5 — only
    row_number appears there): dense_rank + ntile deciles over customer
    lifetime revenue."""
    panel = customer_monthly_panel(spark, sf_dir)
    totals = panel.groupBy("custkey").agg(
        F.round(F.sum("revenue"), 2).alias("total_revenue")
    )
    w = Window.orderBy(F.col("total_revenue").desc(), F.col("custkey").asc())
    return totals.select(
        "custkey",
        "total_revenue",
        F.dense_rank().over(w).alias("revenue_rank"),
        F.ntile(10).over(w).alias("decile"),
    )


_DECILES_SQL = f"""
    WITH panel AS ({_PANEL_SQL}),
    totals AS (
        SELECT custkey, round(sum(revenue), 2) AS total_revenue
        FROM panel GROUP BY 1
    )
    SELECT custkey, total_revenue,
           CAST(dense_rank() OVER w AS BIGINT) AS revenue_rank,
           CAST(ntile(10) OVER w AS BIGINT) AS decile
    FROM totals
    WINDOW w AS (ORDER BY total_revenue DESC, custkey ASC)
"""


def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String battery (SURVEY.md §2.8: lpad zero-pad, substr, concat,
    case mapping, regexp extraction)."""
    customer = _t(spark, sf_dir, "customer")
    padded = F.lpad(F.col("c_custkey").cast("string"), 9, "0")
    return customer.select(
        F.col("c_custkey").alias("custkey"),
        padded.alias("custkey_padded"),
        padded.substr(1, 3).alias("key_prefix"),
        F.concat_ws("/", F.col("c_mktsegment"), padded).alias("segment_key"),
        F.upper("c_name").alias("name_upper"),
        F.regexp_extract("c_name", r"(\d+)$", 1).alias("name_number"),
        F.length("c_name").alias("name_len"),
    )


_STRING_SQL = r"""
    SELECT c_custkey AS custkey,
           lpad(c_custkey::varchar, 9, '0') AS custkey_padded,
           substring(lpad(c_custkey::varchar, 9, '0'), 1, 3) AS key_prefix,
           concat_ws('/', c_mktsegment, lpad(c_custkey::varchar, 9, '0'))
             AS segment_key,
           upper(c_name) AS name_upper,
           regexp_extract(c_name, '(\d+)$', 1) AS name_number,
           CAST(length(c_name) AS INT) AS name_len
    FROM customer
"""


def q_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming sessionization IN the oracle harness: the
    events parquet is replayed as a file stream, aggregated with
    ``F.session_window`` (30-min gap) under an availableNow trigger, and
    the memory-sink result is compared against the batch
    gaps-and-islands SQL — proving the streaming and batch temporal
    semantics coincide (SURVEY.md §2.10's session-window candidate)."""
    from sf_datalake_spark.streaming import run_to_memory, session_aggregate

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = (
        spark.readStream.schema(
            "event_id bigint, ts bigint, user_id bigint, event_type string, "
            "value double, props string"
        )
        # file streams read directories: stream the sf dir, globbed to
        # the events file
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    agg = session_aggregate(
        stream, "ts", "30 minutes",
        aggs=[F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("session_value")],
        keys=["user_id"],
    )
    out = run_to_memory(agg, "q_streaming_sessions", output_mode="complete")
    return out.select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        "n_events",
        "session_value",
    )


_STREAMING_SESSIONS_SQL = """
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                     OR (epoch_us(ts) - epoch_us(lag(ts) OVER w)) > 1800 * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    tagged AS (
        SELECT user_id, ts, value,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    )
    SELECT user_id,
           min(epoch_us(ts)) AS session_start_us,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS session_value
    FROM tagged GROUP BY user_id, session_id
"""


def q_salted_supplier_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe two-phase aggregation (operators/skew.py): the salted
    plan must produce EXACTLY the plain groupBy's numbers — the oracle is
    the plain SQL aggregation, so the equivalence is checked cross-engine."""
    from sf_datalake_spark.operators.skew import salted_aggregate

    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.col("l_quantity").alias("sum_qty"),
        F.col("l_extendedprice").alias("max_price"),
        F.lit(1).alias("n_items"),
    )
    out = salted_aggregate(
        li, ["l_suppkey"],
        {"sum_qty": "sum", "max_price": "max", "n_items": "count"},
        n_salts=8,
    )
    return out.select(
        "l_suppkey",
        F.round("sum_qty", 2).alias("sum_qty"),
        F.round("max_price", 2).alias("max_price"),
        "n_items",
    )


_SALTED_AGG_SQL = """
    SELECT l_suppkey,
           round(sum(l_quantity), 2) AS sum_qty,
           round(max(l_extendedprice), 2) AS max_price,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem GROUP BY 1
"""


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-column profile of orders (n_rows, nulls, exact
    distinct, numeric min/max) — the pre-ingest data-quality report."""
    from sf_datalake_spark.functions.profile import profile_table

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    return profile_table(orders)


_TABLE_PROFILE_SQL = """
    WITH w AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS nu1,
               CAST(count(DISTINCT o_orderkey) AS BIGINT) AS d1,
               CAST(min(o_orderkey) AS DOUBLE) AS mn1,
               CAST(max(o_orderkey) AS DOUBLE) AS mx1,
               count(CASE WHEN o_custkey IS NULL THEN 1 END) AS nu2,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS d2,
               CAST(min(o_custkey) AS DOUBLE) AS mn2,
               CAST(max(o_custkey) AS DOUBLE) AS mx2,
               count(CASE WHEN o_orderstatus IS NULL THEN 1 END) AS nu3,
               CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS d3,
               count(CASE WHEN o_totalprice IS NULL THEN 1 END) AS nu4,
               CAST(count(DISTINCT o_totalprice) AS BIGINT) AS d4,
               CAST(min(o_totalprice) AS DOUBLE) AS mn4,
               CAST(max(o_totalprice) AS DOUBLE) AS mx4
        FROM orders
    )
    SELECT 'o_orderkey' AS column, n AS n_rows, nu1 AS n_nulls, d1 AS n_distinct,
           mn1 AS min_value, mx1 AS max_value FROM w
    UNION ALL
    SELECT 'o_custkey', n, nu2, d2, mn2, mx2 FROM w
    UNION ALL
    SELECT 'o_orderstatus', n, nu3, d3, NULL, NULL FROM w
    UNION ALL
    SELECT 'o_totalprice', n, nu4, d4, mn4, mx4 FROM w
"""


def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct cardinalities per dimension (one pass, multiple
    count-distincts — Catalyst expands these via a grouping-sets plan)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.countDistinct(F.year("o_orderdate")).alias("n_years"),
        F.count("*").alias("n_orders"),
    )


_DISTINCT_SQL = """
    SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
           CAST(count(DISTINCT year(o_orderdate)) AS BIGINT) AS n_years,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
"""


# ---------------------------------------------------------------------------
# Rows-only queries (no SQL oracle): ANN, ML training, resampling, the
# randomized grouped split. Deterministic (seeded) but not expressible
# as engine-portable SQL — the driver records the weaker rows-only check.
# ---------------------------------------------------------------------------

def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode + resize plumbing over binary payloads (deterministic
    stub decoder — real codecs are import-try'd): documents' utf-8 bytes
    become 16×16 fake images, resized to 8×8, with a pixel checksum.
    Rows-only: the md5-seeded fake pixels are not SQL-reproducible, but
    the row count, schema, and Arrow batch plumbing are fully exercised."""
    from sf_datalake_spark.multimodal import decode_images, resize_images

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "UTF-8").alias("content"),
    )
    decoded = decode_images(docs)
    resized = resize_images(decoded, 8, 8)
    return resized.select(
        "asset_id", "height", "width", "channels",
        F.md5("pixels").alias("pixels_md5"),
    )


def q_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based approximations for the interactive 100 TB path:
    HyperLogLog++ cardinalities and approximate percentiles. Rows-only —
    sketch internals are engine-specific by nature (exact twins:
    ``distinct_counts`` / ``quantile_summary``)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)").alias(
            "price_p50_p95"
        ),
    )

def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-3 neighbors via random-hyperplane LSH buckets
    (the 100 TB path: candidates meet in an equi-join, never all-pairs)."""
    from sf_datalake_spark.operators.similarity import lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    return lsh_topk(emb, emb, k=3, n_planes=8, dim=64).select(
        "query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine")
    )


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-3: KMeans cells + 4-probe + exact re-rank
    (rows-only: centroid assignment is iterative/seeded, not SQL)."""
    from sf_datalake_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb, k=3, n_cells=16, n_probe=4).select(
        "query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine")
    )


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by hyperplane LSH
    buckets — the vector-space twin of MinHash dedup. Threshold 0.3 sits
    at this synthetic corpus's 99th cosine percentile (max ≈ 0.51), so
    the candidate set is small but non-trivial. Rows-only: the seeded
    hyperplane buckets are not SQL-expressible."""
    from sf_datalake_spark.operators.similarity import embedding_near_dup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs(emb, threshold=0.3, n_planes=8, dim=64)
    return pairs.select("id_1", "id_2", F.round("cosine", 6).alias("cosine"))


def q_ml_train_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship learning slice as a query: panel features → logistic
    regression → per-entity failure probability + alert level."""
    from pyspark.ml.functions import vector_to_array
    from pyspark.ml.feature import VectorAssembler

    from sf_datalake_spark.ml import fit_ready, make_classifier, with_alert_levels
    from sf_datalake_spark.operators.split import hash_split
    from sf_datalake_spark.operators.windows import with_lag
    from sf_datalake_spark.queries import q_target_variable

    panel = customer_monthly_panel(spark, sf_dir)
    panel = with_lag(panel, "revenue", [1], keys=["custkey"], period_col="periode",
                     suffix_fmt="revenue_lag{n}m").fillna({"revenue_lag1m": 0.0})
    labeled = panel.join(q_target_variable(spark, sf_dir), ["custkey", "periode"])
    assembled = VectorAssembler(
        inputCols=["revenue", "revenue_lag1m"], outputCol="features"
    ).transform(labeled)
    train, test = hash_split(assembled, "custkey", test_fraction=0.3)
    train, _ = fit_ready(train)
    model = make_classifier("LogisticRegression", maxIter=10).fit(train)
    train.unpersist()
    preds = model.transform(test).withColumn(
        "probability_1", F.round(F.element_at(vector_to_array("probability"), 2), 6)
    )
    return with_alert_levels(
        preds, {0.5: 0.6, 2.0: 0.3}, score_col="probability_1"
    ).select("custkey", "periode", "failure", "probability_1", "alert_level")


def q_resampled_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class rebalancing to a 0.5 minority/majority ratio (seeded
    undersampling), reported as per-class counts."""
    from sf_datalake_spark.operators.resample import resample_classes
    from sf_datalake_spark.queries import q_target_variable

    labeled = q_target_variable(spark, sf_dir)
    out = resample_classes(labeled, "failure", target_ratio=0.5,
                           method="undersampling", seed=42)
    return out.groupBy("failure").agg(F.count("*").alias("n_rows"))


def q_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writers driven end-to-end (reference ``io.py:41-113`` csv/orc
    save + load + converter): customer → pipe-separated CSV (write,
    read back with explicit schema) → ORC (write, read back) →
    partitioned parquet (write with partition_by, read back). The
    oracle compares the final read-back against the source table, so
    any separator/quoting/schema/partition-encoding corruption anywhere
    in the chain breaks the value hash.

    The scratch dir is a FIXED path keyed by sf_dir (writers run in
    overwrite mode), not a fresh mkdtemp: the returned DataFrame reads
    lazily from the parquet leg, so the files must outlive this call —
    a fixed path bounds repeated gate/bench runs to one copy on disk
    instead of leaking one per invocation."""
    import hashlib
    import tempfile

    from sf_datalake_spark.io import load_data, write_data

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    base = os.path.join(tempfile.gettempdir(), f"sfdl_roundtrip_{tag}")
    csv_path, orc_path, pq_path = (os.path.join(base, d) for d in ("c", "o", "p"))
    write_data(cust, csv_path, "csv", sep="|")
    back_csv = load_data(spark, csv_path, "csv", sep="|", schema=cust.schema)
    write_data(back_csv, orc_path, "orc")
    back_orc = load_data(spark, orc_path, "orc")
    write_data(back_orc, pq_path, "parquet", partition_by=["c_mktsegment"])
    return load_data(spark, pq_path, "parquet").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )


_WRITE_ROUNDTRIP_SQL = """
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
"""


def q_semi_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join with a range predicate (the reference's activity-
    window perimeter filter, ``join_datasets.py:194-210`` + date clamp):
    customers having ≥1 order inside a half-open date window. The range
    condition rides INSIDE the semi join — no pre-aggregation, no
    post-distinct."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    cond = (
        (customer.c_custkey == orders.o_custkey)
        & (orders.o_orderdate >= F.lit("1997-01-01").cast("timestamp"))
        & (orders.o_orderdate < F.lit("1997-07-01").cast("timestamp"))
    )
    return customer.join(orders, cond, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


_SEMI_RANGE_SQL = """
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1997-07-01'
    )
"""


def q_tree_contributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-forest failure model + Saabas per-feature contributions
    (reference ``explain.py:63-107`` TreeExplainer, shap-free): per
    entity-month, base rate and additive revenue/lag contributions whose
    sum is exactly the predicted failure probability.  Rows-only: tree
    training is not SQL-expressible."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import vector_to_array

    from sf_datalake_spark.ml import fit_ready, make_classifier, tree_contributions
    from sf_datalake_spark.operators.split import hash_split
    from sf_datalake_spark.operators.windows import with_lag
    from sf_datalake_spark.queries import q_target_variable

    panel = customer_monthly_panel(spark, sf_dir)
    panel = with_lag(panel, "revenue", [1], keys=["custkey"], period_col="periode",
                     suffix_fmt="revenue_lag{n}m").fillna({"revenue_lag1m": 0.0})
    labeled = panel.join(q_target_variable(spark, sf_dir), ["custkey", "periode"])
    assembled = VectorAssembler(
        inputCols=["revenue", "revenue_lag1m"], outputCol="features"
    ).transform(labeled)
    train, test = hash_split(assembled, "custkey", test_fraction=0.3)
    train, _ = fit_ready(train)
    model = make_classifier(
        "RandomForestClassifier", numTrees=5, maxDepth=4, seed=42
    ).fit(train)
    train.unpersist()
    preds = model.transform(test).withColumn(
        "p1", F.element_at(vector_to_array("probability"), 2)
    )
    out = tree_contributions(preds, model, keep=["custkey", "periode"])
    return (
        out.join(preds.select("custkey", "periode", "p1"), ["custkey", "periode"])
        .select(
            "custkey",
            "periode",
            F.round("base", 6).alias("base"),
            F.round("contrib_revenue", 6).alias("contrib_revenue"),
            F.round("contrib_revenue_lag1m", 6).alias("contrib_revenue_lag1m"),
            F.round("p1", 6).alias("probability_1"),
        )
    )


def q_grouped_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-style randomized grouped split (distinct + randomSplit +
    left-semi), seeded; split sizes per side."""
    from sf_datalake_spark.operators.split import train_test_split_grouped

    customer = _t(spark, sf_dir, "customer")
    train, test = train_test_split_grouped(customer, "c_custkey",
                                           train_size=0.8, seed=42)
    return (
        train.select(F.lit("train").alias("split"))
        .unionByName(test.select(F.lit("test").alias("split")))
        .groupBy("split")
        .agg(F.count("*").alias("n_rows"))
    )


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QUERIES_EXT: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "set_ops": q_set_ops,
    "outer_join_activity": q_outer_join_activity,
    "rollup_revenue": q_rollup_revenue,
    "pivot_priority": q_pivot_priority,
    "cumulative_revenue": q_cumulative_revenue,
    "supplier_stats": q_supplier_stats,
    "date_arithmetic": q_date_arithmetic,
    "daily_interpolation": q_daily_interpolation,
    "simhash": q_simhash,
    "simhash_pairs": q_simhash_pairs,
    "multimodal_meta": q_multimodal_meta,
    "asof_forward": q_asof_forward,
    "anova_f": q_anova_f,
    "quantile_summary": q_quantile_summary,
    "pca_projection": q_pca_projection,
    "top_unshipped_orders": q_top_unshipped_orders,
    "forecast_revenue_change": q_forecast_revenue_change,
    "asof_nearest": q_asof_nearest,
    "revenue_deciles": q_revenue_deciles,
    "string_functions": q_string_functions,
    "distinct_counts": q_distinct_counts,
    "table_profile": q_table_profile,
    "salted_supplier_agg": q_salted_supplier_agg,
    "streaming_sessions": q_streaming_sessions,
    "sketches": q_sketches,
    "multimodal_decode": q_multimodal_decode,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "embedding_near_dups": q_embedding_near_dups,
    "ml_train_predict": q_ml_train_predict,
    "resampled_counts": q_resampled_counts,
    "grouped_split_counts": q_grouped_split_counts,
    "tree_contributions": q_tree_contributions,
    "write_roundtrip": q_write_roundtrip,
    "semi_range_join": q_semi_range_join,
}

ORACLES_EXT: dict[str, str] = {
    "set_ops": _SET_OPS_SQL,
    "outer_join_activity": _OUTER_JOIN_SQL,
    "rollup_revenue": _ROLLUP_SQL,
    "pivot_priority": _PIVOT_SQL,
    "cumulative_revenue": _CUMULATIVE_SQL,
    "supplier_stats": _SUPPLIER_STATS_SQL,
    "date_arithmetic": _DATE_ARITH_SQL,
    "daily_interpolation": _INTERPOLATION_SQL,
    "simhash": _SIMHASH_SQL,
    "simhash_pairs": _SIMHASH_PAIRS_SQL,
    "multimodal_meta": _MULTIMODAL_META_SQL,
    "asof_forward": _ASOF_FORWARD_SQL,
    "anova_f": _ANOVA_SQL,
    "quantile_summary": _QUANTILE_SQL,
    "top_unshipped_orders": _TOP_UNSHIPPED_SQL,
    "forecast_revenue_change": _FORECAST_SQL,
    "asof_nearest": _ASOF_NEAREST_SQL,
    "revenue_deciles": _DECILES_SQL,
    "string_functions": _STRING_SQL,
    "distinct_counts": _DISTINCT_SQL,
    "table_profile": _TABLE_PROFILE_SQL,
    "salted_supplier_agg": _SALTED_AGG_SQL,
    "streaming_sessions": _STREAMING_SESSIONS_SQL,
    "write_roundtrip": _WRITE_ROUNDTRIP_SQL,
    "semi_range_join": _SEMI_RANGE_SQL,
    # Rows-only by design (no SQL-expressible oracle): pca_projection,
    # sketches, ann_lsh_topk, ann_ivf_topk, embedding_near_dups,
    # multimodal_decode, ml_train_predict, resampled_counts,
    # grouped_split_counts, tree_contributions.
}
