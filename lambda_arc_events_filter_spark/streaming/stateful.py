"""Custom stateful streaming — SURVEY.md §2 B55.

``conversion_stats`` is a CEP-ish sequence detector (view → purchase within
30 minutes, per user) implemented with ``applyInPandasWithState``: per-key
arbitrary state carried across micro-batches, Arrow-transferred to Python
only for the state logic (everything up to the groupBy stays JVM-side).

State per user is three counters + the last view timestamp — O(1) per key,
watermark-evictable: the bounded-state posture required for an unbounded
feed at scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_views", LongType()),
        StructField("n_purchases", LongType()),
        StructField("n_conversions", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_views", LongType()),
        StructField("n_purchases", LongType()),
        StructField("n_conversions", LongType()),
        StructField("last_view_ts", TimestampType()),
    ]
)

CONVERSION_WINDOW_S = 30 * 60


def conversion_stats(
    events: DataFrame, idle_ttl_s: int | None = None
) -> DataFrame:
    """Per-user view→purchase conversion counters over an event stream.

    Input: streaming DataFrame with (event_id, ts, user_id, event_type).
    Output (update mode): one row per user per batch with cumulative
    counters.

    ``idle_ttl_s`` is the BOUNDED-STATE lever for an unbounded feed: when
    set (requires a watermark on ``events``), a user whose last event is
    older than the TTL has their state evicted via an event-time timeout —
    update mode has already emitted their running counters, so eviction
    loses nothing emitted; a user returning after the TTL restarts their
    counters (the documented trade).  Default ``None`` keeps lifetime
    counters — the exact-oracle profile used by the driver check, viable
    while |users| fits state (fixture) but NOT the posture for an
    unbounded production feed: state grows O(all users ever).  See
    ``session_stats_timeout`` below for the eviction machinery pattern.

    The state function is a CLOSURE, not a module-level function, on
    purpose: cloudpickle serializes closures by value, so Spark's Python
    workers don't need this package importable (a driver process launched
    outside the repo would otherwise hit ModuleNotFoundError).  All Python
    UDF bodies in this engine follow that rule.
    """
    window_s = CONVERSION_WINDOW_S

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if idle_ttl_s is not None and state.hasTimedOut:
            # running counters were already emitted in update mode;
            # eviction only releases the state entry
            state.remove()
            return
        if state.exists:
            n_views, n_purchases, n_conversions, last_view_ts = state.get
        else:
            n_views = n_purchases = n_conversions = 0
            last_view_ts = None
        max_ts = None
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for _, row in pdf.iterrows():
                et = row["event_type"]
                if max_ts is None or row["ts"] > max_ts:
                    max_ts = row["ts"]
                if et == "view":
                    n_views += 1
                    last_view_ts = row["ts"]
                elif et == "purchase":
                    n_purchases += 1
                    if (
                        last_view_ts is not None
                        and (row["ts"] - last_view_ts).total_seconds()
                        <= window_s
                    ):
                        n_conversions += 1
        state.update((n_views, n_purchases, n_conversions, last_view_ts))
        if idle_ttl_s is not None and max_ts is not None:
            wm = state.getCurrentWatermarkMs()
            deadline = int(max_ts.value // 1_000_000) + idle_ttl_s * 1000
            # setTimeoutTimestamp rejects deadlines at/below the current
            # watermark — a key already past its TTL times out next batch
            state.setTimeoutTimestamp(max(deadline, wm + 1))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_views": [n_views],
                "n_purchases": [n_purchases],
                "n_conversions": [n_conversions],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if idle_ttl_s is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


USER_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)


def user_value_stats(events: DataFrame) -> DataFrame:
    """Per-user cumulative event statistics via ``transformWithStateInPandas``
    — the Spark 4 arbitrary-state API (successor of applyInPandasWithState,
    SURVEY.md §2 B55): typed per-key ValueState managed by the state store,
    timers available, state schema evolvable.

    Requires the RocksDB state-store provider (the API rejects the default
    HDFS-backed provider); the registered query sets it per-run.  Same
    closure rule as ``conversion_stats``: the processor class is defined
    inside this function so cloudpickle serializes it by value.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("total", DoubleType()),
            StructField("vmax", DoubleType()),
        ]
    )

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            if self._agg.exists():
                n, total, vmax = self._agg.get()
            else:
                n, total, vmax = 0, 0.0, None
            for pdf in rows:
                if len(pdf) == 0:
                    continue
                n += len(pdf)
                total += float(pdf["value"].sum())
                m = float(pdf["value"].max())
                vmax = m if vmax is None else max(vmax, m)
            self._agg.update((n, total, vmax))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 4)],
                    "max_value": [round(vmax, 4)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserStats(),
        outputStructType=USER_STATS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("session_start", TimestampType()),
        StructField("last_ts", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def session_stats_timeout(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Gap-based sessionization with EVENT-TIME TIMEOUT eviction — the
    ``GroupStateTimeout.EventTimeTimeout`` surface of B55 that the other
    stateful operators don't exercise: a session that sees no successor
    event is closed by the WATERMARK crossing its (last event + gap)
    deadline, not by more data arriving.  Without timeouts an idle key's
    state lives forever and its session never emits — the difference
    between a demo and an operator that runs on an unbounded feed.

    Two emission paths, both append-semantics:
    - data-closed: a new event ≥ gap after the last one emits the prior
      session inline and restarts state;
    - timeout-closed: ``state.hasTimedOut`` fires once the watermark
      passes ``last_ts + gap`` (``setTimeoutTimestamp`` re-armed on every
      update), emitting the trailing session and REMOVING the state —
      O(1) state per active key, zero state for idle keys.

    Input must carry ``withWatermark`` on ``ts``.  Session interval
    matches ``session_window``'s end-exclusive convention: an event at
    exactly last_ts + gap starts a NEW session.  Closure rule as
    elsewhere in this module.
    """
    gap_us = gap_s * 1_000_000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def row(start, last, n, total):
            return pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [start],
                    "session_end": [last + pd.Timedelta(seconds=gap_s)],
                    "n_events": [n],
                    "total_value": [round(total, 4)],
                }
            )

        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield row(start, last, n, total)
            return
        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = None
            n, total = 0, 0.0
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for _, r in pdf.iterrows():
                ts = r["ts"]
                # pandas Timedelta .value is ns; compare in µs
                if last is not None and (ts - last).value // 1000 >= gap_us:
                    out.append(row(start, last, n, total))
                    start, n, total = ts, 0, 0.0
                if start is None:
                    start = ts
                n += 1
                total += float(r["value"])
                last = ts
        state.update((start, last, n, total))
        state.setTimeoutTimestamp(
            int(last.value // 1_000_000) + gap_s * 1000
        )
        for o in out:
            yield o

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
