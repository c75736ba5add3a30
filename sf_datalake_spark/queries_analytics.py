"""Product/retrieval analytics classes (round 4, beyond the reference):
BM25 keyword search, ordered funnel conversion, cohort retention,
frequent-itemset pairs.

Four analytics families no other registry module covers — text
retrieval ranking, sequential-pattern matching over an event stream,
cohort analysis, and association mining.  Conventions follow
``queries.py``: every computed column is aliased identically in the
Spark plan and the DuckDB oracle; floats cross an engine boundary only
after ``round(·, 6)``; thresholds and counts are exact integers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sf_datalake_spark.queries import _t


# ---------------------------------------------------------------------------
# BM25 keyword search: fixed 3-term query over the documents corpus.
# Spark-first: query terms are a broadcast literal, tf is counted for
# query terms only (filter before the shuffle), df/avgdl are broadcast
# scalar aggregates, top-k compiles to TakeOrderedAndProject.
# ---------------------------------------------------------------------------

_BM25_TERMS = ["join", "window", "spark"]


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents for the keyword query 'join window spark' under
    BM25 (k1=1.2, b=0.75), score rounded at 6, doc_id tiebreak."""
    from sf_datalake_spark.functions.text import bm25_topk

    docs = _t(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_TERMS, "doc_id", "text", top_k=20)


_BM25_SQL = r"""
    WITH toks AS (
        SELECT doc_id,
               len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
                   AS dl,
               unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
                   AS term
        FROM documents
    ),
    qt AS (SELECT * FROM (VALUES ('join'), ('window'), ('spark')) t(term)),
    tf AS (
        SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
        FROM toks JOIN qt USING (term) GROUP BY 1, 2
    ),
    dfv AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    stats AS (
        SELECT count(*) AS n_docs,
               sum(len(list_filter(string_split_regex(text, '\s+'),
                                   x -> x <> ''))) AS total_dl
        FROM documents
    ),
    scored AS (
        SELECT doc_id,
               ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl
                                          / (total_dl / n_docs))))
                   AS s
        FROM tf JOIN dfv USING (term) CROSS JOIN stats
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_terms,
           round(sum(s), 6) AS score
    FROM scored GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC LIMIT 20
"""


# ---------------------------------------------------------------------------
# Ordered funnel: view -> click -> purchase within 7 days of the first
# view.  Spark plan is the decorrelated chain (operators/funnel.py);
# the oracle is the textbook correlated min-after-min form.
# ---------------------------------------------------------------------------

def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per funnel stage: users whose ordered view->click->purchase
    journey reached it within 7 days of their first view."""
    from sf_datalake_spark.operators.funnel import funnel_counts

    events = _t(spark, sf_dir, "events")
    return funnel_counts(
        events,
        ["view", "click", "purchase"],
        within=F.expr("INTERVAL 7 DAYS"),
    )


_FUNNEL_SQL = """
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY 1
    ),
    s2 AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > s1.t1
          AND e.ts <= s1.t1 + INTERVAL 7 DAY
        GROUP BY 1
    ),
    s3 AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
          AND e.ts <= s1.t1 + INTERVAL 7 DAY
        GROUP BY 1
    ),
    n AS (
        SELECT 1 AS stage_idx, 'view' AS stage,
               (SELECT count(*) FROM s1) AS n_users
        UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)
    )
    SELECT CAST(stage_idx AS INT) AS stage_idx, stage,
           CAST(n_users AS BIGINT) AS n_users,
           round(n_users / (SELECT n_users FROM n WHERE stage_idx = 1), 6)
               AS conversion
    FROM n
"""


# ---------------------------------------------------------------------------
# Cohort retention: customers cohorted by first-order month, activity
# by order month, offset in exact integer months.  All counts exact;
# the one float division is the rounded retention rate.
# ---------------------------------------------------------------------------

def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly cohort retention matrix over orders: for each
    first-order-month cohort and month offset, the number of distinct
    active customers and the retained fraction of the cohort."""
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    first = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate"))
        .cast("date")
        .alias("cohort_month")
    )
    activity = orders.select(
        "o_custkey",
        F.date_trunc("month", F.col("o_orderdate"))
        .cast("date")
        .alias("activity_month"),
    ).distinct()
    # Exact integer month arithmetic (never months_between floats):
    # offset = (y*12+m)_activity − (y*12+m)_cohort.
    joined = activity.join(first, "o_custkey").withColumn(
        "month_offset",
        (
            F.year("activity_month") * 12 + F.month("activity_month")
            - F.year("cohort_month") * 12 - F.month("cohort_month")
        ).cast("int"),
    )
    cohort_sizes = first.groupBy("cohort_month").agg(
        F.count("*").alias("cohort_size")
    )
    cells = joined.groupBy("cohort_month", "month_offset").agg(
        F.countDistinct("o_custkey").alias("n_active")
    )
    return (
        cells.join(cohort_sizes, "cohort_month")
        .select(
            "cohort_month",
            "month_offset",
            "n_active",
            F.col("cohort_size").cast("long"),
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias(
                "retention"
            ),
        )
    )


_COHORT_SQL = """
    WITH first AS (
        SELECT o_custkey, date_trunc('month', min(o_orderdate)) AS cohort_month
        FROM orders GROUP BY 1
    ),
    activity AS (
        SELECT DISTINCT o_custkey,
               date_trunc('month', o_orderdate) AS activity_month
        FROM orders
    ),
    cells AS (
        SELECT cohort_month,
               CAST((year(activity_month) * 12 + month(activity_month)
                     - year(cohort_month) * 12 - month(cohort_month))
                    AS INT) AS month_offset,
               count(DISTINCT o_custkey) AS n_active
        FROM activity JOIN first USING (o_custkey)
        GROUP BY 1, 2
    ),
    sizes AS (
        SELECT cohort_month, count(*) AS cohort_size FROM first GROUP BY 1
    )
    SELECT CAST(cohort_month AS DATE) AS cohort_month, month_offset,
           CAST(n_active AS BIGINT) AS n_active,
           CAST(cohort_size AS BIGINT) AS cohort_size,
           round(n_active / cohort_size, 6) AS retention
    FROM cells JOIN sizes USING (cohort_month)
"""


# ---------------------------------------------------------------------------
# Frequent pairs: parts co-ordered in the same order, support >= 2,
# Apriori item pruning + basket self-join (operators/itemsets.py).
# ---------------------------------------------------------------------------

def q_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered part pairs appearing together in >= 2 orders."""
    from sf_datalake_spark.operators.itemsets import frequent_pairs

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pairs = frequent_pairs(
        li, "l_orderkey", "l_partkey", min_support=2
    )
    return pairs.select(
        F.col("item_1").alias("part_1"),
        F.col("item_2").alias("part_2"),
        "support",
    )


_FREQUENT_PAIRS_SQL = """
    WITH m AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
    freq AS (SELECT i FROM m GROUP BY i HAVING count(*) >= 2),
    mf AS (SELECT b, i FROM m JOIN freq USING (i)),
    p AS (
        SELECT a.i AS part_1, bb.i AS part_2
        FROM mf a JOIN mf bb ON a.b = bb.b AND a.i < bb.i
    )
    SELECT part_1, part_2, CAST(count(*) AS BIGINT) AS support
    FROM p GROUP BY 1, 2 HAVING count(*) >= 2
"""


QUERIES_ANALYTICS: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "bm25_search": q_bm25_search,
    "funnel_conversion": q_funnel_conversion,
    "cohort_retention": q_cohort_retention,
    "frequent_pairs": q_frequent_pairs,
}

ORACLES_ANALYTICS: dict[str, str] = {
    "bm25_search": _BM25_SQL,
    "funnel_conversion": _FUNNEL_SQL,
    "cohort_retention": _COHORT_SQL,
    "frequent_pairs": _FREQUENT_PAIRS_SQL,
}
