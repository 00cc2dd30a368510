"""Property tests for the round-3 fifth wave: cohort LTV, touch
attribution, capped running balance (applyInPandas), OOV rate, shingle
containment, near-dup degree stats, hierarchy shares, and mutual
information."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from lambda_arc_events_filter_spark.catalog import load
from lambda_arc_events_filter_spark.plans import inspect as I
from lambda_arc_events_filter_spark.registry import specs

ALL = specs()


def test_cohort_ltv_monotone_and_conserves_revenue(spark, sf_dir):
    """Cumulative revenue is non-decreasing along each cohort's age axis
    and the final cumulative values sum to total purchase revenue."""
    rows = ALL["events_cohort_ltv"].fn(spark, sf_dir).collect()
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_day, []).append(r)
    finals = 0.0
    for seq in by_cohort.values():
        seq.sort(key=lambda r: r.age_days)
        for a, b in zip(seq, seq[1:]):
            assert b.cum_revenue >= a.cum_revenue - 1e-6
        finals += seq[-1].cum_revenue
    total = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(F.sum("value"))
        .collect()[0][0]
    )
    assert abs(finals - total) < 0.05 * len(by_cohort) + 1e-6


def test_attribution_conserves_purchases(spark, sf_dir):
    rows = ALL["events_attribution_touch"].fn(spark, sf_dir).collect()
    n_purch = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert sum(r.n_purchases for r in rows) == n_purch
    # last_touch can never be 'purchase' (it is defined as non-purchase)
    assert all(r.last_touch != "purchase" for r in rows)


def test_capped_balance_fold_matches_python_reference(spark, sf_dir):
    """The applyInPandas fold must equal a straight driver-side replay of
    the same recurrence."""
    res = {
        r.user_id: (r.n_events, r.final_balance, r.max_balance, r.n_floored)
        for r in ALL["events_capped_running_balance"].fn(spark, sf_dir).collect()
    }
    events = (
        load(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .collect()
    )
    per_user: dict = {}
    for r in sorted(events, key=lambda r: (r.ts, r.event_id)):
        per_user.setdefault(r.user_id, []).append(r)
    for uid, seq in per_user.items():
        b = mx = 0.0
        floored = 0
        for r in seq:
            d = (
                r.value
                if r.event_type == "purchase"
                else -r.value if r.event_type == "error" else 0.0
            )
            b += d
            if b < 0.0:
                b = 0.0
                floored += 1
            mx = max(mx, b)
        got = res[uid]
        assert got[0] == len(seq)
        assert abs(got[1] - b) < 1e-6, (uid, got, b)
        assert abs(got[2] - mx) < 1e-6
        assert got[3] == floored


def test_capped_balance_is_arrow_grouped_map(spark, sf_dir):
    """The one sanctioned Python stage: FlatMapGroupsInArrow/Pandas, not a
    row-at-a-time Python UDF."""
    plan = I.formatted_plan(
        ALL["events_capped_running_balance"].fn(spark, sf_dir)
    )
    assert "FlatMapGroupsInPandas" in plan or "FlatMapGroupsInArrow" in plan


def test_oov_rate_bounds_and_head_coverage(spark, sf_dir):
    """Rates lie in [0,1]; with a 30-term head over a ~40-term vocabulary
    the corpus-wide OOV mass must be the tail's share (strictly between 0
    and the uniform bound)."""
    rows = ALL["corpus_oov_rate"].fn(spark, sf_dir).collect()
    assert all(0.0 <= r.oov_rate <= 1.0 for r in rows)
    assert all(r.n_oov <= r.n_tokens for r in rows)
    total_oov = sum(r.n_oov for r in rows)
    total_tok = sum(r.n_tokens for r in rows)
    assert 0 < total_oov < total_tok


def test_containment_dominates_jaccard(spark, sf_dir):
    """Containment ≥ Jaccard for every pair (|∩|/min ≥ |∩|/|∪|), so the
    0.9-containment set must include every 0.9-Jaccard pair."""
    cont = {
        (r.id_a, r.id_b): r.containment
        for r in ALL["dedup_shingle_containment"].fn(spark, sf_dir).collect()
    }
    jacc = {
        (r.id_a, r.id_b): r.jaccard
        for r in ALL["dedup_ngram_jaccard"].fn(spark, sf_dir).collect()
    }
    for pair, j in jacc.items():
        if j >= 0.9:
            assert pair in cont
            assert cont[pair] >= j - 1e-9
    assert all(0 < c <= 1.0 + 1e-9 for c in cont.values())


def test_degree_stats_account_for_every_pair_endpoint(spark, sf_dir):
    """Σ degree·n_nodes = 2·|edges| — the handshake lemma as a data
    integrity check on the histogram."""
    from lambda_arc_events_filter_spark.operators import dedup as D

    rows = ALL["dedup_graph_degree_stats"].fn(spark, sf_dir).collect()
    d = D.with_tokens(load(spark, sf_dir, "documents")).withColumn(
        "_one", F.lit(1)
    )
    n_edges = D.exact_jaccard_pairs(
        d, id_col="doc_id", block_col="_one", threshold=0.5
    ).count()
    assert sum(r.degree * r.n_nodes for r in rows) == 2 * n_edges


def test_hierarchy_shares_sum_to_one(spark, sf_dir):
    rows = ALL["revenue_share_hierarchy"].fn(spark, sf_dir).collect()
    by_region: dict = {}
    for r in rows:
        by_region.setdefault(r.r_name, []).append(r)
    for seq in by_region.values():
        assert abs(sum(x.pct_of_region for x in seq) - 1.0) < 1e-4
    assert abs(sum(r.pct_of_global for r in rows) - 1.0) < 1e-4


def test_mutual_information_total_nonnegative(spark, sf_dir):
    """I(X;Y) = Σ contributions ≥ 0 (Gibbs); individual cells may be
    negative but the total cannot."""
    rows = ALL["events_mutual_information"].fn(spark, sf_dir).collect()
    total = sum(r.mi_contrib for r in rows)
    assert total >= -1e-6
    # joint probabilities form a distribution
    assert abs(sum(r.p_joint for r in rows) - 1.0) < 1e-3
    assert all(not math.isnan(r.mi_contrib) for r in rows)
