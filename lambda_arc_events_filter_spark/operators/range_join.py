"""Banded range join — SURVEY.md §2 B19 / §4 "needs custom work".

OSS Spark plans a pure range (theta) predicate as BroadcastNestedLoopJoin —
O(N·M) row comparisons.  ``banded_range_join`` adds an equi bucket key on
both sides: a range predicate of width w, banded at w, can only match
within the left row's band or the next one, so each left row probes ≤ 2
buckets and Catalyst plans a plain (shuffle- or broadcast-) hash join on
the band key, with the exact predicate re-applied after.  O(N+M+matches),
partitionable, AQE-skew-splittable — the 100 TB form of the operator.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    width_seconds: int,
    extra_condition: Column | None = None,
) -> DataFrame:
    """Join rows where ``right_time ∈ [left_time, left_time + width)``.

    Both sides get ``band = floor(epoch/width)``; the left side explodes to
    (band, band+1) to cover ranges spanning a band edge.  The band size
    equals the range width — the provably sufficient choice (any interval
    of length w intersects at most 2 w-aligned buckets).

    Precondition (checked): neither side may already carry the internal
    ``_band`` column — ``withColumn`` would silently overwrite it and the
    caller's data would vanish from the output.
    """
    for side_name, df in (("left", left), ("right", right)):
        if "_band" in df.columns:
            raise ValueError(
                f"banded_range_join: {side_name} side already has a "
                "'_band' column (reserved internal name)"
            )
    w = width_seconds
    l_banded = left.withColumn(
        "_band",
        F.explode(
            F.array(
                (F.unix_timestamp(left_time) / w).cast("long"),
                (F.unix_timestamp(left_time) / w).cast("long") + 1,
            )
        ),
    )
    r_banded = right.withColumn(
        "_band", (F.unix_timestamp(right_time) / w).cast("long")
    )
    cond = (F.col(right_time) >= F.col(left_time)) & (
        F.col(right_time) < F.col(left_time) + F.expr(f"INTERVAL {w} SECONDS")
    )
    if extra_condition is not None:
        cond = cond & extra_condition
    return l_banded.join(r_banded, "_band").filter(cond).drop("_band")
