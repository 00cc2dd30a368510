"""Plan-shape and property tests for the round-3 third wave: lakehouse
layout mechanics (schema evolution, manifest pruning, Z-order, parquet
bloom filters), robust/rolling statistics, and corpus mining."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from lambda_arc_events_filter_spark.plans import inspect as I
from lambda_arc_events_filter_spark.queries import lakehouse_q as L
from lambda_arc_events_filter_spark.registry import specs

ALL = specs()


# ---------------------------------------------------------------------------
# Lakehouse layouts
# ---------------------------------------------------------------------------


def test_zorder_pushes_both_cluster_dims(spark, sf_dir):
    """Both predicates (user_id range AND the persisted hr range) must
    reach the parquet scan as pushed filters — the whole point of
    materializing the derived dimension at layout time."""
    df = ALL["zorder_layout_scan"].fn(spark, sf_dir)
    plan = I.formatted_plan(df)
    assert "PushedFilters" in plan
    pushed = plan[plan.index("PushedFilters"):].split("]")[0]
    assert "user_id" in pushed, pushed
    assert "hr" in pushed, pushed


def test_morton_expr_interleaves_and_separates(spark):
    """Known values (bit i of a → 2i, bit i of b → 2i+1) and injectivity
    over a small grid — the property that makes the Z-curve a valid
    cluster key."""
    grid = spark.createDataFrame(
        [(a, b) for a in range(16) for b in range(16)], "a long, b long"
    )
    rows = grid.select(
        "a", "b", L.morton_expr(F.col("a"), F.col("b"), bits=8).alias("z")
    ).collect()
    by_pair = {(r.a, r.b): r.z for r in rows}
    assert by_pair[(1, 0)] == 1
    assert by_pair[(0, 1)] == 2
    assert by_pair[(3, 3)] == 15
    assert by_pair[(4, 0)] == 16
    assert len(set(by_pair.values())) == len(by_pair)  # injective


def test_bloom_layout_has_multiple_row_groups(spark, sf_dir):
    """Bloom skipping needs granularity: the layout write must produce
    several row groups (small block size), otherwise there is nothing to
    skip."""
    import pyarrow.parquet as pq
    import glob
    import os

    path = L._bloom_events_path(spark, sf_dir)
    files = glob.glob(os.path.join(path, "*.parquet"))
    assert files
    total_rgs = sum(pq.ParquetFile(f).metadata.num_row_groups for f in files)
    assert total_rgs >= len(files)


def test_bloom_point_scan_pushes_in_predicate(spark, sf_dir):
    plan = I.formatted_plan(ALL["bloom_filter_point_scan"].fn(spark, sf_dir))
    pushed = plan[plan.index("PushedFilters"):].split("]")[0]
    assert "user_id" in pushed, pushed


def test_manifest_pruning_reads_fewer_files(spark, sf_dir):
    """The pruned read must touch a strict subset of the 16 layout files
    (the 25 % time cut leaves ~4-5 overlapping files), and pruning must
    be lossless vs filtering the full layout."""
    path = L._time_ranged_events_path(spark, sf_dir)
    back = spark.read.schema(L._EVENTS_DDL).parquet(path)
    sec = F.floor(F.unix_timestamp("ts")).cast("long")
    manifest = (
        back.select(F.input_file_name().alias("file"), sec.alias("sec"))
        .groupBy("file")
        .agg(F.min("sec").alias("min_sec"))
    )
    n_files = manifest.count()
    lo, hi = back.agg(F.min(sec), F.max(sec)).first()
    thr = int(lo + (hi - lo) * 0.25)
    keep = [r["file"] for r in manifest.filter(F.col("min_sec") <= thr).collect()]
    assert 0 < len(keep) < n_files
    pruned_n = ALL["manifest_file_pruning"].fn(spark, sf_dir).agg(F.sum("n")).first()[0]
    full_n = back.filter(sec <= thr).count()
    assert pruned_n == full_n


def test_schema_evolution_null_pads_old_batch(spark, sf_dir):
    df = ALL["schema_evolution_scan"].fn(spark, sf_dir).collect()
    total = sum(r.n for r in df)
    with_channel = sum(r.n_with_channel for r in df)
    assert 0 < with_channel < total
    assert all(r.n_channels <= 2 for r in df)


# ---------------------------------------------------------------------------
# Robust / rolling statistics
# ---------------------------------------------------------------------------


def test_rolling_median_matches_pandas(spark, sf_dir):
    """Cross-check the manual frame-median (collect_list + sort + midpoint)
    against pandas' rolling median on one user's series."""
    from lambda_arc_events_filter_spark.catalog import load

    e = load(spark, sf_dir, "events")
    uid = e.groupBy("user_id").count().orderBy(F.desc("count")).first()[0]
    got = (
        ALL["window_rolling_median"].fn(spark, sf_dir)
        .filter(F.col("user_id") == uid)
        .orderBy("event_id")
        .toPandas()
    )
    src = (
        e.filter(F.col("user_id") == uid)
        .orderBy("ts", "event_id")
        .select("event_id", "value")
        .toPandas()
    )
    expected = src["value"].rolling(5, min_periods=1).median().round(6)
    merged = src.assign(exp=expected).merge(got, on="event_id")
    assert (merged["exp"] - merged["rolling_med"]).abs().max() < 1e-9


def test_mad_flags_injected_extreme(spark):
    df = spark.createDataFrame(
        [(i, "t", float(v)) for i, v in enumerate([10, 11, 9, 10, 12, 10, 11, 9, 500])],
        "event_id long, event_type string, value double",
    )
    med = df.groupBy("event_type").agg(F.median("value").alias("med"))
    mad = (
        df.join(med, "event_type")
        .groupBy("event_type")
        .agg(F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"))
    )
    rz = 0.6745 * (F.col("value") - F.col("med")) / F.col("mad")
    flagged = (
        df.join(med, "event_type").join(mad, "event_type")
        .filter(F.abs(rz) > 3.5)
        .collect()
    )
    assert [r.event_id for r in flagged] == [8]


def test_equi_depth_buckets_are_balanced(spark, sf_dir):
    rows = ALL["histogram_equi_depth"].fn(spark, sf_dir).collect()
    by_type: dict[str, list[int]] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.n)
    for t, ns in by_type.items():
        assert max(ns) - min(ns) <= 1, (t, sorted(ns))
        assert len(ns) <= 10


def test_decayed_engagement_bounded_by_count(spark, sf_dir):
    """Each decay weight is in (0, 1], so 0 < decayed_count ≤ n_events."""
    rows = ALL["events_decayed_engagement"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.decayed_count <= r.n_events + 1e-9


# ---------------------------------------------------------------------------
# Corpus mining
# ---------------------------------------------------------------------------


def test_kl_divergence_nonnegative(spark, sf_dir):
    rows = ALL["corpus_kl_divergence"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.kl_vs_corpus >= -1e-9, r


def test_pmi_favors_rare_over_frequent_pairs(spark):
    """PMI must rank a perfectly-predictive rare bigram above a chance
    co-occurrence of two frequent words."""
    docs = [
        (0, "zig zag " + "the cat " * 20),
        (1, "zig zag " + "the dog " * 20),
        (2, "the cat the dog " * 10),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    big = df.select(
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(split(text, ' ')) - 1, 0)),"
                " i -> struct(split(text, ' ')[i-1] as w1,"
                " split(text, ' ')[i] as w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    tot = bc.agg(F.sum("c12").alias("n"))
    uni1 = bc.groupBy("w1").agg(F.sum("c12").alias("c1"))
    uni2 = bc.groupBy("w2").agg(F.sum("c12").alias("c2"))
    pmi_col = F.log(
        (F.col("c12") * 1.0 / F.col("n"))
        / ((F.col("c1") * 1.0 / F.col("n")) * (F.col("c2") * 1.0 / F.col("n")))
    )
    pmi = {
        (r.w1, r.w2): r.pmi
        for r in bc.join(uni1, "w1").join(uni2, "w2").join(tot)
        .select("w1", "w2", pmi_col.alias("pmi")).collect()
    }
    assert pmi[("zig", "zag")] > pmi[("the", "cat")]


def test_weighted_sample_is_deterministic_and_capped(spark, sf_dir):
    a = ALL["corpus_weighted_sample"].fn(spark, sf_dir).collect()
    b = ALL["corpus_weighted_sample"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_source: dict[str, int] = {}
    for r in a:
        per_source[r.source] = per_source.get(r.source, 0) + 1
    assert all(v <= 3 for v in per_source.values())


def test_centroid_eval_diagonal_dominates(spark, sf_dir):
    """Fixture embeddings are (weakly) label-clustered: the diagonal of
    the confusion matrix must beat the 1/k = 10 % chance rate by a wide
    margin — the property that makes nearest-centroid a meaningful
    separability probe here."""
    rows = ALL["embedding_centroid_eval"].fn(spark, sf_dir).collect()
    diag = sum(r.n for r in rows if r.label == r.assigned)
    total = sum(r.n for r in rows)
    assert total > 0
    assert diag / total > 0.25, (diag, total)


# ---------------------------------------------------------------------------
# TPC-H Q7 / Q10 shapes + reconcile + streaming top-k
# ---------------------------------------------------------------------------


def test_q07_broadcasts_both_dimension_chains(spark, sf_dir):
    """Lineitem must stream through two broadcast probes (supplier-nation
    and customer-nation chains) without shuffling before the aggregate."""
    df = ALL["q07_nation_volume"].fn(spark, sf_dir)
    plan = I.formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]


def test_q10_plans_take_ordered_top20(spark, sf_dir):
    df = ALL["q10_returned_items"].fn(spark, sf_dir)
    assert I.uses_take_ordered(df), I.formatted_plan(df)[:1500]


def test_reconcile_diff_classes_complete(spark, sf_dir):
    """The synthesized drift guarantees all four classes appear, and the
    class counts reconstruct both snapshots' row counts exactly."""
    from lambda_arc_events_filter_spark.catalog import load

    rows = {r.diff_class: r for r in ALL["table_reconcile_diff"].fn(spark, sf_dir).collect()}
    assert set(rows) == {
        "match", "value_drift", "missing_in_replica", "extra_in_replica"
    }
    n_orders = load(spark, sf_dir, "orders").count()
    base_seen = (
        rows["match"].n + rows["value_drift"].n + rows["missing_in_replica"].n
    )
    assert base_seen == n_orders
    assert rows["value_drift"].total_drift > 0
    assert rows["match"].total_drift == 0.0


def test_stream_topk_caps_rank_per_window(spark, sf_dir):
    rows = ALL["stream_topk_per_window"].fn(spark, sf_dir).collect()
    assert rows
    per_win: dict = {}
    for r in rows:
        per_win.setdefault(r.window_start, []).append(r.rk)
    for w, rks in per_win.items():
        assert sorted(rks) == list(range(1, len(rks) + 1))
        assert len(rks) <= 3


def test_growth_accounting_ledger_identities(spark, sf_dir):
    """actives(w) = new + retained + resurrected, and the churn ledger
    balances: retained(w+1) = actives(w) − churned(w+1) − (those who
    skipped w+1), so churned(w+1) ≤ actives(w)."""
    from lambda_arc_events_filter_spark.catalog import load

    rows = sorted(
        ALL["events_growth_accounting"].fn(spark, sf_dir).collect(),
        key=lambda r: r.wk,
    )
    e = load(spark, sf_dir, "events")
    wk = F.floor(F.floor(F.unix_timestamp("ts")) / 604800).cast("long")
    actives = {
        r.wk: r.n
        for r in e.select("user_id", wk.alias("wk")).distinct()
        .groupBy("wk").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    prev = None
    for r in rows:
        assert r.n_new + r.n_retained + r.n_resurrected == actives.get(r.wk, 0)
        if prev is not None and r.wk == prev.wk + 1:
            prev_active = actives.get(prev.wk, 0)
            assert r.n_churned <= prev_active
            assert r.n_retained <= prev_active
        prev = r


def test_rfm_quintiles_balanced_and_segments_partition(spark, sf_dir):
    rows = ALL["customer_rfm_segments"].fn(spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    for col in ("r_score", "f_score", "m_score"):
        counts: dict[int, int] = {}
        for r in rows:
            v = r[col]
            assert 1 <= v <= 5
            counts[v] = counts.get(v, 0) + 1
        assert max(counts.values()) - min(counts.values()) <= 1, (col, counts)
    assert all(
        r.segment in {"champion", "recent", "at_risk", "lost", "core"}
        for r in rows
    )


def test_skyline_matches_bruteforce(spark, sf_dir):
    """The one-pass analytic skyline must equal the quadratic NOT-EXISTS
    definition of strict 2-D dominance."""
    from lambda_arc_events_filter_spark.catalog import load

    got = {
        r.o_orderkey
        for r in ALL["orders_skyline_frontier"].fn(spark, sf_dir).collect()
    }
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("p"),
        F.floor(F.unix_timestamp("o_orderdate")).cast("long").alias("d"),
    )
    rows = o.collect()
    expected = {
        r.o_orderkey
        for r in rows
        if not any(s.p < r.p and s.d > r.d for s in rows)
    }
    assert got == expected


def test_welch_ztest_pvalue_sane(spark, sf_dir):
    """Parity split of the same population: p-values must be in [0, 1]
    and (with no true effect) mostly far from 0."""
    rows = ALL["events_ab_welch_ztest"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.p_value <= 1.0
        assert r.n_treat > 0 and r.n_ctrl > 0
    assert sum(1 for r in rows if r.p_value > 0.01) >= len(rows) - 1


def test_sequence_pattern_detects_constructed_funnel(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, base + dt.timedelta(minutes=i), 100 + i, t)
        for i, t in enumerate(["view", "scroll", "click", "view", "purchase"])
    ] + [
        (2, base + dt.timedelta(minutes=i), 200 + i, t)
        for i, t in enumerate(["error", "error"])
    ] + [
        (3, base + dt.timedelta(minutes=i), 300 + i, t)
        for i, t in enumerate(["purchase", "click", "view"])  # wrong order
    ]
    df = spark.createDataFrame(
        [(u, ts, i, t) for (u, ts, i, t) in rows],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    path = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda x: x["event_type"],
        ),
        ">",
    )
    agg = df.groupBy("user_id").agg(path.alias("path"))
    got = {
        r.user_id: (
            bool(__import__("re").search("view.*click.*purchase", r.path)),
            ">".join(["error", "error"]) in r.path,
        )
        for r in agg.collect()
    }
    assert got[1] == (True, False)
    assert got[2] == (False, True)
    assert got[3] == (False, False)


def test_bigram_logprob_penalizes_novel_text(spark, sf_dir):
    """A doc whose bigrams are common in the corpus must outscore the
    corpus minimum; scores are finite and negative (log-probs)."""
    rows = ALL["text_bigram_logprob"].fn(spark, sf_dir).collect()
    assert rows
    import math

    for r in rows:
        assert r.mean_logprob < 0
        assert math.isfinite(r.mean_logprob)
        assert r.n_bigrams > 0


def test_incremental_maintenance_equals_recompute(spark, sf_dir):
    from lambda_arc_events_filter_spark.catalog import load

    got = {
        r.event_type: (r.n, r.sum_value)
        for r in ALL["incremental_agg_maintenance"].fn(spark, sf_dir).collect()
    }
    full = {
        r.event_type: (r.n, round(r.s, 4))
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(got) == set(full)
    for k in got:
        assert got[k][0] == full[k][0]
        assert abs(got[k][1] - full[k][1]) < 1e-6


def test_retention_delete_removes_expired_days(spark, sf_dir):
    """Surviving day partitions must all be strictly after the cutoff
    and the surviving row count must be a strict subset of the corpus."""
    from lambda_arc_events_filter_spark.catalog import load

    row = ALL["retention_delete_partitions"].fn(spark, sf_dir).first()
    total = load(spark, sf_dir, "events").count()
    assert 0 < row.n_rows < total
    assert row.n_days > 0


def test_observed_metrics_account_without_extra_pass(spark, sf_dir):
    from lambda_arc_events_filter_spark.catalog import load
    from lambda_arc_events_filter_spark.queries.curation_q import (
        filter_with_accounting,
    )

    d = load(spark, sf_dir, "documents")
    kept, obs = filter_with_accounting(d)
    n_kept_action = kept.count()
    m = obs.get
    assert m["rows_seen"] == d.count()
    assert m["rows_kept"] == n_kept_action
    assert m["chars_seen"] == d.agg(F.sum("n_chars")).first()[0]


# ---------------------------------------------------------------------------
# Round-3 fourth wave: chi-square, weighted median, entropy, Heaps, SCD2
# ---------------------------------------------------------------------------


def test_chi_square_contributions_nonnegative(spark, sf_dir):
    rows = ALL["events_chi_square_independence"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.chi2_contrib >= 0
        assert 1 <= r.n_cells <= 7


def test_weighted_median_within_price_range_and_crossing(spark, sf_dir):
    """The weighted median must lie within the group's price range and
    at least half the quantity weight must sit at-or-below it."""
    from lambda_arc_events_filter_spark.catalog import load

    got = {
        r.l_returnflag: r.w_median_price
        for r in ALL["lineitem_weighted_median"].fn(spark, sf_dir).collect()
    }
    li = load(spark, sf_dir, "lineitem")
    for flag, med in got.items():
        g = li.filter(F.col("l_returnflag") == flag)
        tot = g.agg(F.sum("l_quantity")).first()[0]
        below = (
            g.filter(F.col("l_extendedprice") <= med)
            .agg(F.sum("l_quantity"))
            .first()[0]
        )
        assert below >= tot / 2
        # strict crossing: weight strictly below the median is < half
        under = (
            g.filter(F.col("l_extendedprice") < med)
            .agg(F.coalesce(F.sum("l_quantity"), F.lit(0.0)))
            .first()[0]
        )
        assert under < tot / 2


def test_entropy_bounded_by_log_vocab(spark, sf_dir):
    import math

    rows = ALL["corpus_token_entropy"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.entropy <= math.log(r.n_terms) + 1e-9
        assert 0 <= r.norm_entropy <= 1 + 1e-9


def test_vocab_growth_monotone_and_total(spark, sf_dir):
    """Cumulative curves are monotone; the final point equals the exact
    corpus totals (token count and distinct-vocabulary size)."""
    from lambda_arc_events_filter_spark.catalog import load
    from lambda_arc_events_filter_spark.operators import dedup as D

    rows = sorted(
        ALL["vocab_growth_curve"].fn(spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    for a, b in zip(rows, rows[1:]):
        assert b.cum_tokens >= a.cum_tokens
        assert b.cum_vocab >= a.cum_vocab
    tok = D.with_tokens(load(spark, sf_dir, "documents")).select(
        F.explode("tokens").alias("t")
    )
    assert rows[-1].cum_tokens == tok.count()
    assert rows[-1].cum_vocab == tok.distinct().count()


def test_scd2_intervals_partition_each_users_timeline(spark, sf_dir):
    """Per user: exactly one current row, intervals are disjoint and
    adjacent (each valid_to equals the next valid_from), and adjacent
    segments never carry the same event_type."""
    df = ALL["scd2_dimension_build"].fn(spark, sf_dir)
    pdf = df.toPandas()
    assert (pdf.groupby("user_id")["is_current"].sum() == 1).all()
    for _uid, g in list(pdf.groupby("user_id"))[:50]:
        g = g.sort_values("valid_from")
        assert g["is_current"].iloc[-1]
        for i in range(len(g) - 1):
            assert g["valid_to"].iloc[i] == g["valid_from"].iloc[i + 1]
            assert g["event_type"].iloc[i] != g["event_type"].iloc[i + 1]
