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
