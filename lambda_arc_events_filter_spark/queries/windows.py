"""Window-function queries — SURVEY.md §2 B31-B34.

Window specs partition by a key and order with an explicit tiebreaker
column everywhere: rank/lag/frame results are only reproducible (and
oracle-comparable) under a total order per partition.

Scale: a window is one shuffle on its partition key + a per-partition
sort.  Partition keys here (nation, user, customer) are high-cardinality
relative to data volume, so partitions stay small at 100 TB; no global
sort is ever required.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from lambda_arc_events_filter_spark.catalog import load
from lambda_arc_events_filter_spark.registry import register


@register(
    "window_rank_ntile",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           row_number() OVER w AS rn,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    tags=("window",),
)
def window_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family: row_number / rank / dense_rank / ntile per nation."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts, value,
           lag(value)  OVER w                   AS prev_value,
           lead(event_type) OVER w              AS next_type,
           round(value - coalesce(lag(value) OVER w, 0), 4) AS delta,
           first_value(ts) OVER w               AS first_ts
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic family: lag / lead / first_value per user event timeline."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("event_type").over(w).alias("next_type"),
        F.round(
            F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0)), 4
        ).alias("delta"),
        F.first("ts").over(w).alias("first_ts"),
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT event_id, user_id, ts,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW), 4) AS running_total,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS n_so_far
    FROM events
    """,
    tags=("window",),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative frame aggregate: running total per user."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.sum("value").over(w), 4).alias("running_total"),
        F.count(F.lit(1)).over(w).alias("n_so_far"),
    )


@register(
    "window_moving_avg",
    oracle="""
    SELECT event_id, user_id, ts,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
                 6) AS moving_avg4
    FROM events
    """,
    tags=("window",),
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding frame aggregate: 4-row moving average per user."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.avg("value").over(w), 6).alias("moving_avg4"),
    )


@register(
    "window_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: row_number + filter.

    Spark 3.5+/4.x plans this as WindowGroupLimit — the per-partition
    top-k is computed BEFORE the shuffle, so only k rows per key move.
    That's the 100 TB-safe pattern (vs sort-the-world).
    """
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "window_first_last_nth",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           first_value(o_totalprice) OVER w                AS cheapest,
           last_value(o_totalprice)  OVER w_full           AS priciest,
           nth_value(o_totalprice, 2) OVER w_full          AS second_cheapest,
           round(o_totalprice - first_value(o_totalprice) OVER w, 2)
                                                           AS over_cheapest
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice, o_orderkey),
           w_full AS (PARTITION BY o_custkey
                      ORDER BY o_totalprice, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING)
    """,
    tags=("window",),
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-position family: first_value / last_value / nth_value per
    customer.  last_value and nth_value run over the FULL-partition frame
    on purpose — under the default running frame last_value degenerates to
    the current row (the classic window gotcha), and both engines agree on
    the explicit frame.  Same one-shuffle-one-sort cost envelope as every
    window query here.
    """
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.first("o_totalprice").over(w).alias("cheapest"),
        F.last("o_totalprice").over(w_full).alias("priciest"),
        F.nth_value("o_totalprice", 2).over(w_full).alias("second_cheapest"),
        F.round(
            F.col("o_totalprice") - F.first("o_totalprice").over(w), 2
        ).alias("over_cheapest"),
    )
