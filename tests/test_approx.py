"""Error-bound tests for the approximate (rows-only, oracle-less)
aggregates: the driver's gate only counts their rows, so accuracy is
pinned here against the exact computation instead."""

from __future__ import annotations

import pyspark.sql.functions as F

from lambda_arc_events_filter_spark.catalog import load
from lambda_arc_events_filter_spark.registry import specs

ALL = specs()


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    approx = {
        r.event_type: r.approx_users
        for r in ALL["agg_approx_count_distinct"].fn(spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k, n in exact.items():
        # rsd=0.02 → HLL++ standard error ~2%; allow 4 sigma
        assert abs(approx[k] - n) <= max(2, 0.08 * n), (k, approx[k], n)


def test_approx_percentile_within_rank_error(spark, sf_dir):
    approx = {
        r.l_returnflag: (r.approx_median, r.approx_p95)
        for r in ALL["agg_approx_percentile"].fn(spark, sf_dir).collect()
    }
    l = load(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: (r.m, r.p)
        for r in l.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("m"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("p"),
        )
        .collect()
    }
    # accuracy=10000 bounds RANK error at n/10000; translate to a value
    # tolerance via the observed value spread (prices span ~[900, 600k])
    for k, (am, ap) in approx.items():
        em, ep = exact[k]
        assert abs(am - em) / em < 0.02, (k, am, em)
        assert abs(ap - ep) / ep < 0.02, (k, ap, ep)
