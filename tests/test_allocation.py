"""Invariant pins for the allocation/calendarization operators
(queries/allocation_q.py) — the properties the oracle diff alone cannot
express: exact-sum conservation."""

from __future__ import annotations

import pyspark.sql.functions as F

from lambda_arc_events_filter_spark.queries.allocation_q import (
    _BUDGET_CENTS,
    lineitem_month_proration,
    nation_budget_allocation,
)


def test_budget_allocation_sums_exactly_to_budget(spark, sf_dir):
    rows = nation_budget_allocation(spark, sf_dir).collect()
    assert sum(r["alloc_cents"] for r in rows) == _BUDGET_CENTS
    # every nation with revenue gets at least its floor share (> 0 here)
    assert all(r["alloc_cents"] > 0 for r in rows if r["rev_cents"] > 0)


def test_month_proration_conserves_cents(spark, sf_dir):
    out = lineitem_month_proration(spark, sf_dir)
    total_alloc = out.agg(F.sum("alloc_cents")).collect()[0][0]
    # Recompute the included lines' cents independently of the operator.
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_shipdate"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderdate"
    )
    included = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            F.abs(
                F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
            )
            < 366
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        )
        .collect()[0][0]
    )
    assert total_alloc == included


def test_shapley_attribution_efficiency_and_nonnegativity(spark, sf_dir):
    """Game-theory invariants the oracle diff can't express: the Shapley
    values are non-negative (v is ⊆-monotone) and EFFICIENT — Σφ·24
    equals 24·(v(full) − v(∅)), i.e. total credit = conversions enabled
    by any channel beyond the channel-free baseline."""
    import pyspark.sql.functions as FF

    from lambda_arc_events_filter_spark.queries.quality_q import (
        events_attribution_shapley,
    )

    out = events_attribution_shapley(spark, sf_dir).collect()
    assert all(r["phi24"] >= 0 for r in out)
    # recompute v(full) and v(empty) independently: sessions ending in a
    # purchase, split by whether any channel preceded it
    from lambda_arc_events_filter_spark.catalog import load
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = FF.unix_micros("ts") - FF.lag(FF.unix_micros("ts")).over(w)
    new_s = FF.when(gap.isNull() | (gap >= 30 * 60 * 1_000_000), 1).otherwise(0)
    run_w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        e.withColumn("_n", new_s)
        .withColumn("sid", FF.sum("_n").over(run_w))
        .withColumn(
            "st",
            FF.when(FF.col("event_type") == "purchase", "CONV").otherwise(
                FF.col("event_type")
            ),
        )
    )
    w_s = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    rn = sess.withColumn("rn", FF.row_number().over(w_s))
    cut = rn.groupBy("user_id", "sid").agg(
        FF.min(FF.when(FF.col("st") == "CONV", FF.col("rn"))).alias("c")
    )
    per = (
        rn.join(cut, ["user_id", "sid"])
        .filter(FF.col("c").isNull() | (FF.col("rn") <= FF.col("c")))
        .groupBy("user_id", "sid")
        .agg(
            FF.max(FF.when(FF.col("st") == "CONV", 1).otherwise(0)).alias(
                "conv"
            ),
            FF.max(FF.when(FF.col("st") != "CONV", 1).otherwise(0)).alias(
                "touched"
            ),
        )
        .filter(FF.col("conv") == 1)
    )
    v_full = per.count()
    v_empty = per.filter(FF.col("touched") == 0).count()
    assert sum(r["phi24"] for r in out) == 24 * (v_full - v_empty)
