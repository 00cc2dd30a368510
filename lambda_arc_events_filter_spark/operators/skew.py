"""Skew-mitigating salted equi-join — the deterministic lever for hot
keys at 100 TB (SURVEY.md §4 "Skew handling").

AQE's skew-join splitting (on in this engine's session) re-plans oversized
shuffle partitions at runtime, but it only helps sort-merge joins it can
observe; salting is the explicit, plan-time mitigation for the cases AQE
can't touch: a single dominant key (the classic null-ish default carrying
a double-digit share of a fact table), broadcast-ineligible dimension
sides, and stateful streaming joins where the physical plan is fixed at
start.

Mechanics: shard the big side's key space by a deterministic salt derived
from a high-cardinality column (NOT rand() — nondeterministic expressions
break retry semantics under task re-execution and make results
unverifiable), replicate the small side across every shard with an
explode, then equi-join on (key, shard).  The hot key's rows now spread
across ``salt`` shuffle partitions instead of one.  Replication cost:
|small| × salt rows — the same trade broadcast makes, but bounded per
shard rather than per executor.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_col: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on``, salted ``salt`` ways.

    ``salt_col``: a high-cardinality column of ``big`` whose hash spreads
    rows uniformly across shards (a row id, a timestamp).  Deterministic:
    the same row always lands in the same shard, so retries and the
    correctness oracle both see identical results.

    ``how`` is restricted to inner/left (big side preserved): the small
    side is replicated ``salt`` ways before the join, so right/full outer
    would emit each unmatched small-side row once PER SHARD — silently
    wrong multiplicity.  Unmatched small-side rows need a different
    construction (e.g. anti-join the small side back), so refuse rather
    than corrupt.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            "exploded small side would duplicate unmatched rows salt times"
        )
    for side_name, df in (("big", big), ("small", small)):
        if "_shard" in df.columns:
            raise ValueError(
                f"salted_join: {side_name} side already has a '_shard' "
                "column (reserved internal name; withColumn would "
                "silently overwrite it)"
            )
    b = big.withColumn(
        "_shard", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(salt))
    )
    s = small.withColumn(
        "_shard", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("_shard", F.col("_shard").cast("bigint"))
    return b.join(s, [on, "_shard"], how).drop("_shard")
