"""Advanced operator queries: as-of join (B21) and custom stateful
streaming (B55)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from lambda_arc_events_filter_spark.catalog import load
from lambda_arc_events_filter_spark.operators.asof import asof_join
from lambda_arc_events_filter_spark.operators.skew import salted_join
from lambda_arc_events_filter_spark.registry import register
from lambda_arc_events_filter_spark.sources.streams import events_stream, run_to_memory
from lambda_arc_events_filter_spark.streaming.stateful import conversion_stats


@register(
    "asof_join_events",
    oracle="""
    WITH u AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_view
      FROM events WHERE event_type IN ('purchase', 'view')
    ), c AS (
      SELECT *,
             last_value(CASE WHEN is_view = 1 THEN event_id END IGNORE NULLS)
               OVER w AS prior_view_id,
             last_value(CASE WHEN is_view = 1 THEN ts END IGNORE NULLS)
               OVER w AS prior_view_ts
      FROM u
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_view DESC, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
           prior_view_id, prior_view_ts
    FROM c WHERE event_type = 'purchase'
    """,
    tags=("join", "asof"),
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest prior view.

    Composite operator (operators/asof.py): union + one window pass — no
    native Spark ASOF exists.  Oracle reproduces it with IGNORE NULLS
    last_value in DuckDB.
    """
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(
        purchases,
        views,
        key="user_id",
        time_col="ts",
        value_cols=["event_id"],
        tiebreakers=["event_id"],
    )
    return out.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("_asof_event_id").alias("prior_view_id"),
        F.col("_asof_time").alias("prior_view_ts"),
    )


@register(
    "stream_stateful_conversions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_type,
             last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_view_ts
      FROM events
    )
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'view')     AS n_views,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
           count(*) FILTER (WHERE event_type = 'purchase'
                            AND last_view_ts >= ts - INTERVAL 30 MINUTE)
                                                           AS n_conversions
    FROM ordered
    GROUP BY user_id
    """,
    tags=("streaming", "stateful"),
)
def stream_stateful_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B55: arbitrary per-key state via applyInPandasWithState — CEP-ish
    view→purchase (≤30 min) conversion detection per user.

    Single-batch replay makes the update-mode output deterministic (one
    cumulative row per user), so this normally-rows-only operator gets a
    full SQL oracle.
    """
    s = events_stream(spark, sf_dir)
    return run_to_memory(conversion_stats(s), "stateful", mode="update")


@register(
    "join_salted_skew",
    oracle="""
    SELECT c.c_mktsegment,
           count(*)             AS n_events,
           round(sum(e.value), 4) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    tags=("join", "skew"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join (SURVEY.md §4 skew handling): events.user_id is
    low-cardinality by construction [FIXTURES.md events], so the plain
    shuffle join hashes the whole fact table onto a handful of reducers —
    the canonical hot-key shape at 100 TB.  ``salted_join`` shards each
    key 8 ways deterministically (hash of event_id, not rand(): retries
    and the oracle must see identical placement) and replicates the
    customer side per shard.  Output is salt-invariant, so the plain SQL
    join is a sound oracle.
    """
    e = load(spark, sf_dir, "events")
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(e, c, on="user_id", salt_col="event_id", salt=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


def tws_available() -> bool:
    """transformWithStateInPandas runs a protobuf-based state-server
    worker; without a working google.protobuf in the Python workers the
    query crashes at start.  Gate the registration on the capability so
    queries() stays runnable everywhere (this container ships no usable
    protobuf and installs are out of scope)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B55 via the Spark 4 ``transformWithStateInPandas`` API (typed
    ValueState per key) — the second arbitrary-state path beside
    ``applyInPandasWithState``.  Single-batch replay makes the update-mode
    output deterministic (one cumulative row per user), so it gets a full
    SQL oracle.

    The API requires the RocksDB state-store provider; set per-run and
    restored so the query stays session-config-agnostic.
    """
    from lambda_arc_events_filter_spark.streaming.stateful import user_value_stats

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    rocks = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", rocks)
    try:
        s = events_stream(spark, sf_dir)
        return run_to_memory(user_value_stats(s), "tws", mode="update")
    finally:
        if prev is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )


if tws_available():
    register(
        "stream_stateful_user_stats",
        oracle="""
        SELECT user_id,
               count(*)               AS n_events,
               round(sum(value), 4)   AS total_value,
               round(max(value), 4)   AS max_value
        FROM events
        GROUP BY user_id
        """,
        tags=("streaming", "stateful"),
    )(_stream_stateful_user_stats)
