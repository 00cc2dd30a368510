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
exclusive frames, and to bounded lag/lead/sliding frames (ghost-row
overlap).
"""

from __future__ import annotations

from typing import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
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


def range_bounded_frame(
    df: DataFrame,
    order_by: OrderBy,
    before: int,
    after: int,
    exprs: Mapping[str, Callable[[WindowSpec], Column]],
    num_partitions: int | None = None,
) -> DataFrame:
    """Bounded-frame window functions (lag/lead/sliding aggregates) over a
    global order without a single-partition WindowExec.

    Every expression in ``exprs`` (alias → fn(window_spec) → Column, e.g.
    ``lambda w: F.lag("n").over(w)`` or
    ``lambda w: F.avg("x").over(w.rowsBetween(-11, 12))``) must read only
    rows within ``before`` rows behind / ``after`` rows ahead of the
    current row.

    Mechanism: range-partition on the (total) order, then give each
    partition "ghost" copies of its neighbours' edge rows — the last
    ``before`` rows of the previous partition and the first ``after``
    rows of the next, a per-partition CONSTANT number of duplicated rows,
    independent of data volume — evaluate the frame locally, and drop
    the ghosts.  All union branches carry the identical full schema, so
    the exchange-reuse invariant (module docstring) holds structurally
    here without a core projection.
    """
    if before < 0 or after < 0:
        raise ValueError("before/after are non-negative row counts")
    num_partitions = _default_partitions(df, num_partitions)
    cols, _ = _parse_order(order_by)

    rp = df.repartitionByRange(num_partitions, *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_loc = Window.partitionBy("_pid").orderBy(*cols)
    marked = rp.withColumn("_lrn", F.row_number().over(w_loc)).withColumn(
        "_pn", F.count(F.lit(1)).over(Window.partitionBy("_pid"))
    )
    own = marked.withColumn("_ghost", F.lit(False))
    unioned = own
    if before > 0:  # last `before` rows also serve the NEXT partition
        unioned = unioned.unionByName(
            marked.filter(F.col("_lrn") > F.col("_pn") - before)
            .withColumn("_pid", F.col("_pid") + 1)
            .withColumn("_ghost", F.lit(True))
        )
    if after > 0:  # first `after` rows also serve the PREVIOUS partition
        unioned = unioned.unionByName(
            marked.filter(F.col("_lrn") <= after)
            .withColumn("_pid", F.col("_pid") - 1)
            .withColumn("_ghost", F.lit(True))
        )

    w = Window.partitionBy("_pid").orderBy(*cols)
    out = unioned
    for alias, fn in exprs.items():
        out = out.withColumn(alias, fn(w))
    return out.filter(~F.col("_ghost")).drop("_pid", "_lrn", "_pn", "_ghost")
