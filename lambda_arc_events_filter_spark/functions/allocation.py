"""Integer-exact allocation primitives.

``largest_remainder`` — Hamilton apportionment: split an integer budget
across rows proportional to a non-negative integer weight so the parts
sum to the budget EXACTLY and every part satisfies the quota rule
(``floor(ideal) ≤ part ≤ ceil(ideal)``).  All share math runs in
DECIMAL(38,0) (budget×weight overflows BIGINT at real volumes); the
remainder rank is a broadcast self-join count over the input relation —
callers apportion over BOUNDED group aggregates (nations, sources,
shards), so the quadratic-in-|groups| rank join is broadcast-scale by
contract, and no partition-less window ever forms.

``prorate_months`` — day-weighted calendar proration via the telescoping
floor form (see queries/allocation_q.py), exposed for reuse.

Both are pinned by Hypothesis properties (tests/test_properties.py)
against pure-Python references on generated weights, on top of their
fixture queries' DuckDB oracles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def largest_remainder(
    df: DataFrame,
    weight_col: str,
    budget: int,
    key_cols: list[str],
    out_col: str = "alloc",
) -> DataFrame:
    """Apportion ``budget`` (integer units) across rows ∝ ``weight_col``.

    ``key_cols`` must uniquely identify rows; ties in remainder break on
    them, making the top-up deterministic.  Rows with zero weight get 0
    unless a remainder unit reaches them (it cannot: zero weight ⇒ zero
    remainder ⇒ ranked after every positive remainder — except when ALL
    weights are zero, in which case the budget goes to the first rows by
    key order, documented degenerate case).  Returns the input columns
    plus ``out_col``.
    """
    tot = df.agg(F.sum(F.col(weight_col)).alias("_t"))
    prod = (
        F.lit(budget).cast("decimal(38,0)")
        * F.col(weight_col).cast("decimal(38,0)")
    )
    t_dec = F.col("_t").cast("decimal(38,0)")
    fl = df.crossJoin(F.broadcast(tot)).select(
        *df.columns,
        F.when(
            F.col("_t") != 0, F.call_function("div", prod, t_dec)
        )
        .otherwise(F.lit(0))
        .alias("_floor"),
        F.when(F.col("_t") != 0, (prod % t_dec).cast("long"))
        .otherwise(F.lit(0))
        .alias("_rem"),
    )
    peers = fl.select(
        F.col("_rem").alias("_p_rem"),
        *[F.col(k).alias(f"_p_{k}") for k in key_cols],
    )
    # rank = 1 + |{peer : peer sorts strictly before me}| under
    # (_rem DESC, key_cols ASC) — deterministic because keys are unique
    before = F.col("_p_rem") > F.col("_rem")
    tie = F.col("_p_rem") == F.col("_rem")
    key_lt = F.lit(False)
    for k in reversed(key_cols):
        key_lt = (F.col(f"_p_{k}") < F.col(k)) | (
            (F.col(f"_p_{k}") == F.col(k)) & key_lt
        )
    rk = (
        fl.join(F.broadcast(peers), before | (tie & key_lt), "left")
        .groupBy(*fl.columns)
        .agg((F.count("_p_rem") + 1).alias("_rk"))
    )
    short = fl.agg((F.lit(budget) - F.sum("_floor")).alias("_s"))
    return (
        rk.crossJoin(F.broadcast(short))
        .select(
            *df.columns,
            (
                F.col("_floor")
                + F.when(F.col("_rk") <= F.col("_s"), 1).otherwise(0)
            ).alias(out_col),
        )
    )
