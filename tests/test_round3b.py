"""Plan-shape and property tests for the round-3 second-wave operators
(statistics family, TPC-H Q4/Q6 shapes, interval overlap join, SemDeDup,
mixture rebalance, path trigrams)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F

from lambda_arc_events_filter_spark.plans import inspect as I
from lambda_arc_events_filter_spark.registry import specs

ALL = specs()


# ---------------------------------------------------------------------------
# Plan shapes (a regression here is a scale bug even when results pass)
# ---------------------------------------------------------------------------


def test_q06_pushes_every_predicate_and_prunes(spark, sf_dir):
    """Q6 is the scan-efficiency benchmark: all four range predicates must
    reach the parquet reader and the scan must read only the four needed
    columns."""
    df = ALL["q06_forecast_revenue"].fn(spark, sf_dir)
    assert I.has_pushed_filters(df), I.formatted_plan(df)[:1500]
    cols = set(I.scan_read_schema(df))
    assert cols == {
        "l_shipdate",
        "l_discount",
        "l_quantity",
        "l_extendedprice",
    }, cols


def test_q04_exists_plans_semi_join_not_nested_loop(spark, sf_dir):
    plan = I.formatted_plan(ALL["q04_late_shipment_exists"].fn(spark, sf_dir))
    assert "LeftSemi" in plan, plan[:1500]
    assert "NestedLoop" not in plan, plan[:1500]


def test_interval_overlap_joins_on_cell_not_theta(spark, sf_dir):
    """The chunked rewrite must plan the pair generation as an equi-join
    on the cell id — a nested-loop theta join would be the quadratic
    scale-killer the chunking exists to avoid."""
    df = ALL["interval_overlap_join"].fn(spark, sf_dir)
    assert not I.uses_nested_loop_join(df), I.formatted_plan(df)[:2000]


def test_anomaly_zscore_broadcasts_moments(spark, sf_dir):
    """The per-type moment table is |event_type| rows — it must broadcast
    back over the corpus, never shuffle the corpus."""
    df = ALL["events_anomaly_zscore"].fn(spark, sf_dir)
    assert I.uses_broadcast_join(df), I.formatted_plan(df)[:1500]


def test_path_trigrams_top20_plans_take_ordered(spark, sf_dir):
    df = ALL["events_path_trigrams"].fn(spark, sf_dir)
    assert I.uses_take_ordered(df), "top-20 must not global-sort"


def test_statistics_family_stays_jvm_side(spark, sf_dir):
    for name in (
        "agg_regression_suite",
        "agg_median_mode",
        "fn_try_suite",
        "fn_hash_suite",
        "events_resample_ffill",
        "events_anomaly_zscore",
        "agg_listagg_ordered",
        "semdedup_cluster_prune",
        "corpus_mixture_rebalance",
        "events_path_trigrams",
    ):
        df = ALL[name].fn(spark, sf_dir)
        assert not I.has_python_in_plan(df), f"{name} fell off codegen"


# ---------------------------------------------------------------------------
# Semantic properties
# ---------------------------------------------------------------------------


def test_resample_spine_is_complete_and_fill_is_last_observation(
    spark, sf_dir
):
    """Every user's bucket sequence must be gap-free (consecutive 21600 s
    steps), every non-gap row's filled_value must equal its own bucket
    average, and every gap row's filled_value must equal the nearest
    preceding non-gap value."""
    rows = (
        ALL["events_resample_ffill"]
        .fn(spark, sf_dir)
        .orderBy("user_id", "bucket")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for seq in by_user.values():
        last_seen = None
        for i, r in enumerate(seq):
            if i:
                assert r.bucket - seq[i - 1].bucket == 21600, (
                    "spine gap at",
                    r.user_id,
                    r.bucket,
                )
            if r.is_gap:
                assert r.n_events == 0
                assert r.filled_value == last_seen
            else:
                assert r.n_events > 0
                last_seen = r.filled_value


def test_semdedup_accounting_is_consistent(spark, sf_dir):
    """Pruned docs are a subset of pair right-sides, pairs only form
    within a cluster, and membership sums to the corpus size."""
    acc = ALL["semdedup_cluster_prune"].fn(spark, sf_dir).collect()
    n_total = sum(r.n_members for r in acc)
    from lambda_arc_events_filter_spark.catalog import load

    assert n_total == load(spark, sf_dir, "embeddings").count()
    for r in acc:
        assert 0 <= r.n_pruned <= r.n_dup_pairs or r.n_dup_pairs == 0
        assert r.n_pruned < r.n_members or r.n_members == 0


def test_mixture_rebalance_rates_hit_targets(spark, sf_dir):
    """Keep rates must cap at 10000 bp and langs above their target share
    must get rates strictly below 10000 (they are being downsampled)."""
    rows = ALL["corpus_mixture_rebalance"].fn(spark, sf_dir).collect()
    total = sum(r.n_total for r in rows)
    targets = {"en": 0.5, "zh": 0.2}
    for r in rows:
        assert 0 <= r.rate_bp <= 10000
        assert 0 <= r.n_kept <= r.n_total
        tgt = targets.get(r.lang, 0.1)
        if r.n_total > tgt * total:  # over-represented → downsample
            assert r.rate_bp < 10000
        else:  # under-represented → keep everything
            assert r.rate_bp == 10000


def test_listagg_is_deterministic_across_runs(spark, sf_dir):
    a = ALL["agg_listagg_ordered"].fn(spark, sf_dir).collect()
    b = (
        ALL["agg_listagg_ordered"]
        .fn(spark, sf_dir)
        .repartition(7)
        .collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_try_suite_nulls_only_where_malformed(spark, sf_dir):
    df = ALL["fn_try_suite"].fn(spark, sf_dir)
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("safe_div").alias("n_div"),
        F.count("parsed_int").alias("n_int"),
        F.count("parsed_ts").alias("n_ts"),
    ).first()
    # each try_ column must have BOTH successes and NULL-routed failures
    assert 0 < agg.n_div < agg.n
    assert 0 < agg.n_int < agg.n
    assert 0 < agg.n_ts < agg.n


def test_zscore_rows_actually_exceed_threshold(spark, sf_dir):
    rows = ALL["events_anomaly_zscore"].fn(spark, sf_dir).collect()
    assert rows, "fixture should contain >2.5 sigma outliers"
    assert all(abs(r.zscore) > 2.5 for r in rows)


def test_hll_union_within_error_bound(spark, sf_dir):
    """Default lgK=12 standard error is ~1.6%; allow 5% vs exact."""
    from lambda_arc_events_filter_spark.catalog import load

    rows = ALL["agg_hll_sketch_union"].fn(spark, sf_dir).collect()
    est = {r.scope: r.approx_users for r in rows}
    e = load(spark, sf_dir, "events")
    exact_total = e.select("user_id").distinct().count()
    assert abs(est["total"] - exact_total) <= max(1, 0.05 * exact_total)
    daily = dict(
        e.groupBy(F.date_trunc("day", "ts").cast("string").alias("d"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    )
    for day, n in daily.items():
        assert abs(est[day] - n) <= max(1, 0.05 * n), (day, est[day], n)


def test_bitmap_distinct_equals_exact(spark, sf_dir):
    """The bitmap rewrite must be EXACT, not approximate."""
    from lambda_arc_events_filter_spark.catalog import load

    got = {
        r.event_type: (r.n_users, r.n_events)
        for r in ALL["agg_bitmap_distinct"].fn(spark, sf_dir).collect()
    }
    e = load(spark, sf_dir, "events")
    want = {
        r.event_type: (r.nu, r.ne)
        for r in e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("nu"),
            F.countDistinct("event_id").alias("ne"),
        )
        .collect()
    }
    assert got == want


def test_pareto_classes_partition_by_cum_share(spark, sf_dir):
    rows = (
        ALL["lineitem_pareto_abc"]
        .fn(spark, sf_dir)
        .orderBy("cum_share")
        .collect()
    )
    assert rows[-1].cum_share == 1.0
    seen = [r.abc_class for r in rows]
    # classes must appear in A..B..C blocks as share grows
    assert seen == sorted(seen), "class must be monotone in cum_share"
    for r in rows:
        want = "A" if r.cum_share <= 0.5 else ("B" if r.cum_share <= 0.8 else "C")
        # boundary rows can differ from the rounded cum_share; recompute
        # loosely: class is decided on the unrounded share, so only assert
        # rows safely away from the boundaries
        if abs(r.cum_share - 0.5) > 1e-5 and abs(r.cum_share - 0.8) > 1e-5:
            assert r.abc_class == want, (r.l_partkey, r.cum_share, r.abc_class)


def test_iter_udf_initializes_once_per_worker(spark, sf_dir):
    """The iterator form must see MANY batches per initialization —
    assert via a per-worker side-channel accumulator."""
    sc = spark.sparkContext
    inits = sc.accumulator(0)
    batches = sc.accumulator(0)

    @F.pandas_udf("double")
    def probe(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        inits.add(1)
        for b in it:
            batches.add(1)
            yield b * 0.0

    from lambda_arc_events_filter_spark.catalog import load

    e = load(spark, sf_dir, "events").repartition(2)
    # consume the UDF column (a bare count() would prune the projection
    # and the UDF would never run)
    e.select(probe("value").alias("x")).agg(F.sum("x")).first()
    assert inits.value >= 1
    assert batches.value >= inits.value
