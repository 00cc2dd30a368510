"""Range-partitioned global-order primitives.

A ``Window.orderBy(...)`` with no partition spec plans as WindowExec over
``SinglePartition`` — ALL rows move to one task ("No Partition Defined"
warning).  Fine for a relation bounded by construction (a ``limit(k)``, a
calendar series); a scale bug for anything that grows with the data.

These helpers compute the same order statistics with NO single-partition
exchange, using the classic three-step decomposition:

1. ``repartitionByRange`` on the total order — ascending key ranges land
   on ascending partition ids, so partition-id order == global order;
2. per-partition (parallel) rank / running aggregate;
3. a per-partition summary relation (≤ ``num_partitions`` rows —
   broadcast-sized at ANY data volume) gives each partition the offset
   contributed by all partitions before it.

CORRECTNESS INVARIANT (exchange reuse).  The summary and the main branch
both evaluate the range exchange; ``repartitionByRange`` SAMPLES, so two
independent evaluations pick different boundaries and the per-partition
offsets would rebase the wrong rows (measured: ~90 % of ranks off at 10k
rows).  Spark only collapses the two evaluations into one physical
exchange (ReusedExchange) when the subtrees are canonically IDENTICAL —
which column pruning breaks if either branch carries a column the other
does not.  Therefore the helper projects the input to a CORE relation
(order columns + running bases, nothing else) so every branch requires
every core column and pruning cannot diverge; payload columns re-attach
by key afterwards.  ``tests/test_rank_helpers.py`` pins both the values
and the single-materialized-exchange plan shape.

Callers MUST pass a TOTAL order (include a unique tiebreak key).  Same
machinery as ``functions/stats.py::group_percentile_cont``'s ``range``
strategy, generalized to rank + running sum/max/min with inclusive or
exclusive frames; bounded lag/lead/sliding frames build on the global
rank via rank-shifted equi-joins (``global_order_neighbors`` — chosen
over a ghost-row partition shift, whose one-partition reach silently
loses neighbors across empty/sparse range partitions; regression-tested).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: running-aggregate kinds → (aggregator, cross-partition offset combiner)
_AGGS = {
    "sum": (F.sum, lambda local, off: local + off),
    "max": (F.max, lambda local, off: F.greatest(local, off)),
    "min": (F.min, lambda local, off: F.least(local, off)),
}

OrderBy = Sequence[str | tuple[str, str]]


def _parse_order(order_by: OrderBy) -> tuple[list[Column], list[str]]:
    cols: list[Column] = []
    names: list[str] = []
    for o in order_by:
        if isinstance(o, str):
            name, direction = o, "asc"
        else:
            name, direction = o
        if direction not in ("asc", "desc"):
            raise ValueError(f"order direction must be asc|desc, got {direction!r}")
        cols.append(F.col(name).desc() if direction == "desc" else F.col(name))
        names.append(name)
    return cols, names


def _default_partitions(df: DataFrame, num_partitions: int | None) -> int:
    if num_partitions is not None:
        return num_partitions
    return min(32, df.sparkSession.sparkContext.defaultParallelism)


def global_order_stats(
    df: DataFrame,
    order_by: OrderBy,
    *,
    rank: str | None = None,
    running: Mapping[str, tuple[str, str]] | None = None,
    exclusive: bool = False,
    key: Sequence[str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Global ``row_number`` and/or running aggregates over a total order
    without a single-partition WindowExec.

    ``order_by``: column names, optionally ``(name, "desc")`` — must be a
    total order.  ``rank``: output alias for the 1-based global
    row_number (long).  ``running``: alias → (column_name, kind) with
    kind in {sum, max, min}.  ``exclusive=True`` ends every running frame
    one row BEFORE the current row (NULL on the first global row).

    If ``df`` has columns beyond the order/base columns, pass ``key`` — a
    unique key that is PART of the order — and the helper computes on the
    core projection and joins results back on it (see module docstring
    for why the core projection is load-bearing, not a tidy-up).

    Float caveat: the cross-partition combine re-associates a double sum
    (per-partition totals first), so double running sums can drift ~1 ulp
    versus a sequential fold.  Integer sums and max/min are exact — use
    the engine-wide integer-cents discipline when the oracle must agree
    bit-for-bit.
    """
    running = dict(running or {})
    if rank is None and not running:
        raise ValueError("need at least one of rank=/running=")
    for alias, (_, kind) in running.items():
        if kind not in _AGGS:
            raise ValueError(f"unknown running kind {kind!r} for {alias!r}")
    num_partitions = _default_partitions(df, num_partitions)
    cols, order_names = _parse_order(order_by)
    base_names = [c for c, _ in running.values()]
    core_names = list(dict.fromkeys(order_names + base_names))

    extra = [c for c in df.columns if c not in core_names]
    if extra:
        if key is None:
            raise ValueError(
                f"df carries non-core columns {extra}; pass key= so the "
                "helper can compute on the core projection and join back"
            )
        key = list(key)
        if not set(key) <= set(order_names):
            raise ValueError("key must be part of the order (total order)")
        core = df.select(*core_names)
    else:
        key = None
        core = df.select(*core_names)  # fix column order

    rp = core.repartitionByRange(num_partitions, *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_loc = Window.partitionBy("_pid").orderBy(*cols)
    hi = -1 if exclusive else Window.currentRow
    w_run = w_loc.rowsBetween(Window.unboundedPreceding, hi)

    local = rp.withColumn("_lrn", F.row_number().over(w_loc))
    for alias, (base, kind) in running.items():
        agg, _ = _AGGS[kind]
        local = local.withColumn(f"_lr_{alias}", agg(base).over(w_run))

    # per-partition totals: ≤ num_partitions rows, broadcast at any scale.
    # Derived from rp so its exchange subtree is canonically identical to
    # local's (core projection ⇒ no prunable column on either side).
    aggs = [F.count(F.lit(1)).alias("_cnt")]
    for alias, (base, kind) in running.items():
        agg, _ = _AGGS[kind]
        aggs.append(agg(base).alias(f"_pt_{alias}"))
    # coalesce(1): the summary is ≤ num_partitions rows, and a single
    # partition SATISFIES the offsets window's clustering requirement —
    # Catalyst then plans the window with no exchange (one fewer stage
    # per helper call; measured ~40 ms at fixture scale)
    sizes = rp.groupBy("_pid").agg(*aggs).coalesce(1)

    # running offsets over ascending _pid on the TINY summary relation.
    # Keyed by a constant expression DERIVED from _pid so Catalyst cannot
    # constant-fold the partition spec away (a plain lit(0) folds to an
    # empty spec): bounded by construction at ≤ num_partitions rows, so
    # one task is the right plan for this relation.
    w_off = (
        Window.partitionBy(F.col("_pid") - F.col("_pid"))
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off_cols = [
        F.col("_pid"),
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_orn"),
    ]
    for alias, (_, kind) in running.items():
        agg, _ = _AGGS[kind]
        off_cols.append(agg(f"_pt_{alias}").over(w_off).alias(f"_po_{alias}"))
    offsets = sizes.select(*off_cols)

    out = local.join(F.broadcast(offsets), "_pid")
    result_cols = []
    if rank is not None:
        out = out.withColumn(rank, (F.col("_lrn") + F.col("_orn")).cast("long"))
        result_cols.append(rank)
    for alias, (_, kind) in running.items():
        _, combine = _AGGS[kind]
        local_c, off_c = F.col(f"_lr_{alias}"), F.col(f"_po_{alias}")
        # NULLs only at frame edges: local is NULL on a partition's first
        # row under exclusive frames; the offset is NULL for partition 0.
        out = out.withColumn(
            alias, F.coalesce(combine(local_c, off_c), local_c, off_c)
        )
        result_cols.append(alias)
    drop = ["_pid", "_lrn", "_orn"]
    drop += [f"_lr_{a}" for a in running] + [f"_po_{a}" for a in running]
    out = out.drop(*drop)

    if key is not None:
        return df.join(out.select(*key, *result_cols), key)
    return out


def ntile_from_rank(rank_col: Column, n_col: Column, buckets: int) -> Column:
    """Reproduce ``ntile(buckets)`` arithmetically from a 1-based global
    rank and the row count — integer-exact and identical to the Spark /
    DuckDB ntile convention (with q = n div buckets and r = n mod
    buckets, the first r buckets hold q+1 rows): bucket(i) = ceil(i/(q+1))
    while i ≤ r(q+1), else r + ceil((i − r(q+1))/q).  Lets a decile/
    quantile label ride the range-partitioned rank instead of a
    single-partition ntile window."""
    q = F.floor((n_col - n_col % buckets) / buckets).cast("long")
    r = (n_col % buckets).cast("long")
    t = r * (q + 1)
    return (
        F.when(rank_col <= t, F.floor((rank_col + q) / (q + 1)))
        .otherwise(r + F.floor((rank_col - t + q - 1) / q))
        .cast("int")
    )


def global_order_neighbors(
    df: DataFrame,
    order_by: OrderBy,
    *,
    key: Sequence[str] | None = None,
    lags: Mapping[str, tuple[str, int]] | None = None,
    leads: Mapping[str, tuple[str, int]] | None = None,
    frames: Mapping[str, tuple[str, str, int, int]] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """lag/lead and bounded ROWS-frame aggregates over a global (total)
    order without a single-partition WindowExec, exact for ANY offset.

    ``lags`` / ``leads``: alias → (column, k).  ``frames``: alias →
    (column, kind, lo, hi) with kind in {sum, max, min, avg, count} and a
    rows-frame [lo, hi] relative to the current row (lo ≤ 0 ≤ hi or any
    bounded pair).  ``key`` as in :func:`global_order_stats`.

    Mechanism: the range-partitioned global rank ``g`` (above) makes a
    row's frame a RANK INTERVAL, so lag(k) is an equi-join on ``g − k``
    and a bounded frame is an explode of the (hi−lo+1) relative offsets
    joined on the shifted rank and re-aggregated — shuffles keyed by the
    dense rank, never a single-partition exchange, and immune to the
    sparse-partition hazard a ghost-row shift has (a neighbor more than
    one range partition away is still one rank away).  Frame aggregates
    combine hash-aggregate-style; integer inputs are exact, double
    inputs carry the usual ±1 ulp association caveat vs a sequential
    window evaluation.
    """
    lags = dict(lags or {})
    leads = dict(leads or {})
    frames = dict(frames or {})
    if not (lags or leads or frames):
        raise ValueError("need at least one of lags=/leads=/frames=")
    for alias, (_, kind, lo, hi) in frames.items():
        if kind not in ("sum", "max", "min", "avg", "count"):
            raise ValueError(f"unknown frame kind {kind!r} for {alias!r}")
        if lo > hi:
            raise ValueError(f"frame lo > hi for {alias!r}")

    ranked = global_order_stats(
        df, order_by, rank="_g", key=key, num_partitions=num_partitions
    )
    out = ranked
    for alias, (col, k) in lags.items():
        nb = ranked.select(
            (F.col("_g") + k).alias("_g"), F.col(col).alias(alias)
        )
        out = out.join(nb, "_g", "left")
    for alias, (col, k) in leads.items():
        nb = ranked.select(
            (F.col("_g") - k).alias("_g"), F.col(col).alias(alias)
        )
        out = out.join(nb, "_g", "left")
    if frames:
        lo_all = min(lo for (_, _, lo, _) in frames.values())
        hi_all = max(hi for (_, _, _, hi) in frames.values())
        fan = ranked.select(
            "_g", F.explode(F.sequence(F.lit(lo_all), F.lit(hi_all))).alias("_o")
        ).select((F.col("_g") + F.col("_o")).alias("_gn"), "_g", "_o")
        cols_needed = {col for (col, _, _, _) in frames.values()}
        nb = ranked.select(F.col("_g").alias("_gn"), *sorted(cols_needed))
        joined = fan.join(nb, "_gn")
        aggs = []
        for alias, (col, kind, lo, hi) in frames.items():
            in_frame = (F.col("_o") >= lo) & (F.col("_o") <= hi)
            agg_fn = {
                "sum": F.sum,
                "max": F.max,
                "min": F.min,
                "avg": F.avg,
                "count": F.count,
            }[kind]
            aggs.append(agg_fn(F.when(in_frame, F.col(col))).alias(alias))
        frame_vals = joined.groupBy("_g").agg(*aggs)
        out = out.join(frame_vals, "_g", "left")
    return out.drop("_g")
