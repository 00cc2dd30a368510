"""Distributed statistical helpers.

``group_percentile_cont`` replaces Spark's builtin exact ``percentile``
UDAF for large groups: the builtin buffers EVERY group value in a single
aggregation buffer (OpenHashMap per group) — a driver-of-OOM at 100 TB and
~7s on a 600k-row group locally.  The sort-based form below ranks rows with
a window (distributed range-partitioned sort) and interpolates between the
two straddling ranks, which is both scale-safe and ~5× faster at sf0.1.

The interpolation is the standard PERCENTILE_CONT formula — identical to
DuckDB ``quantile_cont`` and Spark ``percentile``:
    p = 1 + q·(n-1);  v = v_floor(p) + (p - floor(p))·(v_ceil(p) - v_floor(p))
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def group_percentile_cont(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    quantiles: dict[str, float],
    extra_aggs: Sequence[Column] = (),
) -> DataFrame:
    """Exact interpolated per-group quantiles, sort-based.

    Returns one row per key combination with one column per entry of
    ``quantiles`` (alias → q), plus any ``extra_aggs`` computed in the same
    pass.  NULL values in ``value_col`` are excluded (matching both the
    builtin percentile and DuckDB quantile_cont).
    """
    w_rank = Window.partitionBy(*keys).orderBy(value_col)
    w_all = Window.partitionBy(*keys)
    # keep all input columns so extra_aggs can reference them; Catalyst's
    # column pruning removes the unused ones from the scan
    ranked = df.filter(F.col(value_col).isNotNull()).select(
        "*",
        F.row_number().over(w_rank).alias("_rn"),
        F.count(F.lit(1)).over(w_all).alias("_n"),
    )
    aggs: list[Column] = []
    for alias, q in quantiles.items():
        # _n is constant within a group, so the target position p (and its
        # floor/ceil/frac) are per-row constants — no nested aggregates
        p = F.lit(1.0) + (F.col("_n") - F.lit(1)) * F.lit(q)
        lo, hi = F.floor(p), F.ceil(p)
        v_lo = F.max(F.when(F.col("_rn") == lo, F.col(value_col)))
        v_hi = F.max(F.when(F.col("_rn") == hi, F.col(value_col)))
        frac = F.max(p - lo)
        aggs.append((v_lo + frac * (v_hi - v_lo)).alias(alias))
    return ranked.groupBy(*keys).agg(*aggs, *extra_aggs)
