"""Model-evaluation family (queries/evaluation_q.py): the AUC identity
against a brute-force pair count, and the algebraic invariants of the
decile and threshold tables."""

from __future__ import annotations

from lambda_arc_events_filter_spark.queries.evaluation_q import (
    _scored,
    score_auc_rank,
    score_calibration_deciles,
    score_threshold_metrics,
)


def test_auc_matches_bruteforce_pairs(spark, sf_dir):
    """Tie-corrected rank-sum AUC ≡ P(score⁺>score⁻) + ½P(=) counted
    directly over all (positive, negative) pairs."""
    rows = _scored(spark, sf_dir).select("k", "y").collect()
    pos = sorted(r.k for r in rows if r.y == 1)
    neg = sorted(r.k for r in rows if r.y == 0)
    import bisect

    wins = ties = 0
    for p in pos:
        wins += bisect.bisect_left(neg, p)
        ties += bisect.bisect_right(neg, p) - bisect.bisect_left(neg, p)
    expected = (wins + 0.5 * ties) / (len(pos) * len(neg))
    out = score_auc_rank(spark, sf_dir).collect()[0]
    assert out.n_pos == len(pos) and out.n_neg == len(neg)
    assert abs(out.auc - expected) < 1e-6


def test_threshold_metrics_invariants(spark, sf_dir):
    rows = {r.threshold: r for r in score_threshold_metrics(spark, sf_dir).collect()}
    assert sorted(rows) == list(range(100, 1000, 100))
    totals = {(r.tp + r.fn, r.fp + r.tn) for r in rows.values()}
    assert len(totals) == 1  # constant (all_pos, all_neg) at every threshold
    recalls = [rows[t].recall for t in sorted(rows)]
    assert recalls == sorted(recalls, reverse=True)  # recall falls with threshold
    for r in rows.values():
        if r.precision is not None:
            assert 0.0 <= r.precision <= 1.0
        assert 0.0 <= r.recall <= 1.0


def test_calibration_deciles_partition_and_gain(spark, sf_dir):
    per = {r.decile: r for r in score_calibration_deciles(spark, sf_dir).collect()}
    assert sorted(per) == list(range(1, 11))
    n_total = sum(r.n_events for r in per.values())
    assert n_total == _scored(spark, sf_dir).count()
    # decile sizes differ by at most one (ntile convention)
    sizes = [r.n_events for r in per.values()]
    assert max(sizes) - min(sizes) <= 1
    # gains accumulate from the top decile down to 1.0 at decile 1
    assert per[1].cum_gain_from_top == 1.0
    gains = [per[d].cum_gain_from_top for d in range(10, 0, -1)]
    assert gains == sorted(gains)
