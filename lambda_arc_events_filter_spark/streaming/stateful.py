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


def conversion_stats(events: DataFrame) -> DataFrame:
    """Per-user view→purchase conversion counters over an event stream.

    Input: streaming DataFrame with (event_id, ts, user_id, event_type).
    Output (update mode): one row per user per batch with cumulative
    counters.

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
        if state.exists:
            n_views, n_purchases, n_conversions, last_view_ts = state.get
        else:
            n_views = n_purchases = n_conversions = 0
            last_view_ts = None
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for _, row in pdf.iterrows():
                et = row["event_type"]
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
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
