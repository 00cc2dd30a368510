"""Bounded-state lever of conversion_stats (idle_ttl_s): eviction via
event-time timeout must run end-to-end and restart a returning user's
counters after the TTL — the unbounded-feed posture the module documents
(round-8 review: NoTimeout alone kept state for every user ever seen)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from lambda_arc_events_filter_spark.sources.streams import run_to_memory
from lambda_arc_events_filter_spark.streaming.stateful import conversion_stats

_T0 = dt.datetime(2024, 1, 1)


def _stream(spark, rows, path):
    df = spark.createDataFrame(
        [
            (i, _T0 + dt.timedelta(seconds=s), u, et)
            for i, (s, u, et) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    # one file per micro-batch, ordered by time: deterministic replay
    for i, r in enumerate(df.collect()):
        spark.createDataFrame([r], df.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{path}/f{i}")
    return (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{path}/f*")
    )


def test_idle_ttl_evicts_and_restarts_counters(spark, tmp_path):
    # user 1: two views 4 hours apart; TTL 30 min; watermark 0s.
    # Eviction fires only in a batch where the key has NO data (a key
    # with both a due timeout and new rows takes the data path), so the
    # replay needs an intermediate batch after the watermark passes the
    # TTL: f1 advances the watermark, f2 (user 3) fires user 1's
    # timeout, f3 is user 1 returning — fresh state, counters restart.
    rows = [
        (0, 1, "view"),
        (7200, 2, "view"),     # advances the watermark past user 1's TTL
        (9000, 3, "view"),     # user-1-free batch: the eviction fires here
        (14400, 1, "view"),    # user 1 returns after eviction
    ]
    src = _stream(spark, rows, str(tmp_path / "ttl"))
    out = run_to_memory(
        conversion_stats(
            src.withWatermark("ts", "0 seconds"), idle_ttl_s=1800
        ),
        "ttlconv",
        mode="update",
        state_partitions=1,
    )
    # last emitted row per user (update mode emits running counters)
    last = {
        r.user_id: r.n_views
        for r in out.withColumn("_ord", F.monotonically_increasing_id())
        .orderBy("_ord")
        .collect()
    }
    assert last[2] == 1
    assert last[1] == 1, "returning user's counters must restart after TTL"


def test_no_ttl_keeps_lifetime_counters(spark, tmp_path):
    rows = [
        (0, 1, "view"),
        (7200, 2, "view"),
        (14400, 1, "view"),
    ]
    src = _stream(spark, rows, str(tmp_path / "nottl"))
    out = run_to_memory(
        conversion_stats(src),
        "lifeconv",
        mode="update",
        state_partitions=1,
    )
    per_user_max = {
        r.user_id: r.n_views
        for r in out.groupBy("user_id")
        .agg(F.max("n_views").alias("n_views"))
        .collect()
    }
    assert per_user_max[1] == 2, "default profile keeps lifetime counters"
