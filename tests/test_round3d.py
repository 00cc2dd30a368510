"""Plan-shape and property tests for the round-3 fourth wave: TPC-H
Q12/Q14/Q19/Q22 shapes, OHLC positional aggregates, association lift,
SCD2 point-in-time join, table fingerprints, quarantine accounting, and
cross-source overlap."""

from __future__ import annotations

import pyspark.sql.functions as F

from lambda_arc_events_filter_spark.catalog import load
from lambda_arc_events_filter_spark.plans import inspect as I
from lambda_arc_events_filter_spark.registry import specs

ALL = specs()


# ---------------------------------------------------------------------------
# TPC-H shapes
# ---------------------------------------------------------------------------


def test_q19_pushes_single_side_factors_below_join(spark, sf_dir):
    """The CNF extraction Q19 exists to test: the brand/size factors of
    the OR must prune the part scan BEFORE the join (and quantity must
    prune lineitem) even though the full condition straddles both sides."""
    df = ALL["q19_disjunctive_revenue"].fn(spark, sf_dir)
    plan = I.formatted_plan(df)
    assert "PushedFilters" in plan
    # both scans carry pushed predicates on their own disjunct factors
    assert "p_brand" in plan.split("Scan parquet")[-1] or "p_brand" in plan
    assert "l_quantity" in plan, plan[:3000]


def test_q19_broadcasts_part_no_nested_loop(spark, sf_dir):
    df = ALL["q19_disjunctive_revenue"].fn(spark, sf_dir)
    assert I.uses_broadcast_join(df)
    assert not I.uses_nested_loop_join(df)


def test_q22_anti_join_and_counts(spark, sf_dir):
    """NOT EXISTS must lower to an anti hash join; the kept customers
    must truly have no orders and beat the rounded positive-avg."""
    plan = I.formatted_plan(ALL["q22_idle_customer_balance"].fn(spark, sf_dir))
    assert "LeftAnti" in plan, plan[:2000]


def test_q12_counters_partition_the_join(spark, sf_dir):
    """high + low per flag must equal the late-shipment join cardinality —
    the two CASE counters are a partition, not overlapping filters."""
    rows = ALL["q12_late_priority_mix"].fn(spark, sf_dir).collect()
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    total = (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .count()
    )
    assert sum(r.high_line_count + r.low_line_count for r in rows) == total


# ---------------------------------------------------------------------------
# OHLC positional aggregates
# ---------------------------------------------------------------------------


def test_ohlc_open_close_match_window_formulation(spark, sf_dir):
    """min_by/max_by over the (ts, event_id) struct must agree with the
    explicit first/last-row window formulation on every bar."""
    from pyspark.sql import Window

    bars = ALL["events_ohlc_bars"].fn(spark, sf_dir)
    e = load(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").alias("day")
    w = Window.partitionBy("event_type", F.date_trunc("day", "ts")).orderBy(
        "ts", "event_id"
    )
    ref = (
        e.select(
            "event_type",
            day,
            F.first("value").over(w).alias("o"),
            F.last("value")
            .over(w.rowsBetween(0, Window.unboundedFollowing))
            .alias("c"),
        )
        .groupBy("event_type", "day")
        .agg(
            F.round(F.min("o"), 6).alias("open"),
            F.round(F.min("c"), 6).alias("close"),
        )
    )
    assert bars.count() == ref.count()
    merged = (
        bars.alias("b")
        .join(ref.alias("r"), ["event_type", "day"])
        .filter(
            (F.col("b.open") != F.col("r.open"))
            | (F.col("b.close") != F.col("r.close"))
        )
    )
    assert merged.count() == 0
    assert bars.filter(
        (F.col("high") < F.col("low"))
        | (F.col("open") > F.col("high"))
        | (F.col("close") < F.col("low"))
    ).count() == 0


# ---------------------------------------------------------------------------
# Association lift
# ---------------------------------------------------------------------------


def test_assoc_lift_identities(spark, sf_dir):
    """confidence ≥ support, lift = confidence / P(consequent), and the
    pair support can never exceed either single support."""
    e = load(spark, sf_dir, "events")
    n_users = e.select("user_id").distinct().count()
    singles = {
        r.event_type: r.c
        for r in e.select("user_id", "event_type")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    for r in ALL["events_assoc_lift"].fn(spark, sf_dir).collect():
        assert r.support_count <= singles[r.antecedent]
        assert r.support_count <= singles[r.consequent]
        assert r.confidence >= r.support - 1e-9
        expected_lift = (r.support_count * n_users) / (
            singles[r.antecedent] * singles[r.consequent]
        )
        assert abs(r.lift - round(expected_lift, 6)) < 1e-9


# ---------------------------------------------------------------------------
# SCD2 point-in-time join
# ---------------------------------------------------------------------------


def test_scd2_pit_totals_conserve_purchases(spark, sf_dir):
    """Every purchase lands in exactly one prevailing state (or 'none'):
    the as-of join must neither drop nor duplicate facts."""
    res = ALL["scd2_point_in_time_join"].fn(spark, sf_dir)
    n_purch = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    rows = res.collect()
    assert sum(r.n_purchases for r in rows) == n_purch
    assert {r.state for r in rows} <= {"signup", "error", "none"}


def test_scd2_pit_matches_interval_join(spark, sf_dir):
    """The as-of formulation must equal the naive interval join it
    replaces (spans tile time, so 'latest start ≤ ts' ≡ containment)."""
    from lambda_arc_events_filter_spark.queries.lakehouse_q import (
        scd2_point_in_time_join,
    )

    res = {
        r.state: (r.n_purchases, r.volume, r.n_users)
        for r in scd2_point_in_time_join(spark, sf_dir).collect()
    }
    e = load(spark, sf_dir, "events")
    st = e.filter(F.col("event_type").isin("signup", "error")).select(
        "user_id", "ts", "event_type", "event_id"
    )
    from pyspark.sql import Window

    w_ts = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    s1 = st.withColumn("rn", F.row_number().over(w_ts)).filter("rn = 1")
    w_ord = Window.partitionBy("user_id").orderBy("ts")
    chg = F.when(
        ~F.lag("event_type").over(w_ord).eqNullSafe(F.col("event_type")), 1
    ).otherwise(0)
    seg = s1.select(
        "user_id",
        "event_type",
        "ts",
        F.sum(chg)
        .over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
        .alias("seg_id"),
    )
    spans = (
        seg.groupBy("user_id", "seg_id")
        .agg(
            F.min("event_type").alias("state"),
            F.min("ts").alias("valid_from"),
        )
        .withColumn(
            "valid_to",
            F.lead("valid_from").over(
                Window.partitionBy("user_id").orderBy("seg_id")
            ),
        )
    )
    facts = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    naive = (
        facts.alias("f")
        .join(
            spans.alias("s"),
            (F.col("f.user_id") == F.col("s.user_id"))
            & (F.col("s.valid_from") <= F.col("f.ts"))
            & (
                F.col("s.valid_to").isNull()
                | (F.col("f.ts") < F.col("s.valid_to"))
            ),
            "left",
        )
        .groupBy(F.coalesce(F.col("s.state"), F.lit("none")).alias("state"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("f.value"), 2).alias("v"),
            F.count_distinct("f.user_id").cast("long").alias("u"),
        )
    )
    for r in naive.collect():
        assert res[r.state] == (r.n, r.v, r.u), (r.state, res[r.state], r)


# ---------------------------------------------------------------------------
# Table fingerprint
# ---------------------------------------------------------------------------


def test_fingerprint_is_order_and_layout_invariant(spark, sf_dir):
    """The checksum's reason to exist: identical content in any row order
    or partitioning must fingerprint identically; any single-row change
    must not."""
    base = {
        r.o_orderstatus: (r.n_rows, r.sum_hash, r.xor_hash)
        for r in ALL["table_fingerprint_checksum"].fn(spark, sf_dir).collect()
    }
    o = load(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey"),
        F.col("o_orderpriority"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
    )
    h = F.expr(
        "aggregate(split(canon, ''), 0L,"
        " (a, c) -> pmod(a * 31 + ascii(c), 2147483647))"
    )
    shuffled = (
        o.orderBy(F.col("o_totalprice"))  # different order
        .repartition(7)  # different layout
        .select("o_orderstatus", canon.alias("canon"))
        .select("o_orderstatus", h.alias("h"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("h").alias("sum_hash"),
            F.expr("bit_xor(h)").alias("xor_hash"),
        )
    )
    for r in shuffled.collect():
        assert base[r.o_orderstatus] == (r.n_rows, r.sum_hash, r.xor_hash)


# ---------------------------------------------------------------------------
# Quarantine accounting
# ---------------------------------------------------------------------------


def test_quarantine_catches_exactly_the_corrupted_slice(spark, sf_dir):
    """Counts must conserve (parsed + quarantined = total) and the
    quarantined set must be exactly the event_id % 17 slice — valid
    payloads must never be flagged."""
    rows = ALL["json_quarantine_accounting"].fn(spark, sf_dir).collect()
    e = load(spark, sf_dir, "events")
    per_type = {
        r.event_type: (r.total, r.corrupt)
        for r in e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(
                F.when(F.col("event_id") % 17 == 0, 1).otherwise(0)
            ).alias("corrupt"),
        )
        .collect()
    }
    for r in rows:
        total, corrupt = per_type[r.event_type]
        assert r.n_total == total
        assert r.n_parsed + r.n_quarantined == r.n_total
        assert r.n_quarantined == corrupt, r


# ---------------------------------------------------------------------------
# Cross-source overlap
# ---------------------------------------------------------------------------


def test_source_overlap_jaccard_bounds_and_symmetry_base(spark, sf_dir):
    """0 < jaccard ≤ 1, shared ≤ min(n_a, n_b), and pairs are canonical
    (source_a < source_b exactly once)."""
    rows = ALL["corpus_source_overlap"].fn(spark, sf_dir).collect()
    seen = set()
    for r in rows:
        assert r.source_a < r.source_b
        assert (r.source_a, r.source_b) not in seen
        seen.add((r.source_a, r.source_b))
        assert 0 < r.shared_shingles <= min(r.n_a, r.n_b)
        assert 0 < r.jaccard <= 1


def test_cluster_representatives_cover_clusters(spark, sf_dir):
    """Representative must belong to its cluster, sizes ≥ 2 only when
    real merges happen, and accounting (size = dropped + 1) holds."""
    rows = ALL["dedup_cluster_representatives"].fn(spark, sf_dir).collect()
    cc = {
        r.doc_id: r.cluster_id
        for r in ALL["dedup_connected_components"].fn(spark, sf_dir).collect()
    }
    for r in rows:
        assert cc[r.rep_doc_id] == r.cluster_id
        assert r.cluster_size == r.n_dropped + 1
        assert r.rep_chars <= r.total_chars
