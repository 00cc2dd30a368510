"""Invariant tests for the F4/F5 time-series queries (timeseries_q.py):
brute-force parity for the CUSUM argmax, spine completeness/exactness for
the gap fill, and the plan shapes that make both scale."""

from __future__ import annotations

import datetime as dt

import pytest

from lambda_arc_events_filter_spark.registry import specs


def test_changepoint_matches_bruteforce(spark, sf_dir, duck):
    """The TakeOrdered argmax must agree with a literal O(n²) scan of
    every split point of the daily series."""
    daily = duck.execute(
        """
        SELECT CAST(ts AS DATE) AS d, count(*) AS x FROM events
        WHERE event_type = 'error' GROUP BY 1 ORDER BY d
        """
    ).fetchall()
    xs = [x for _, x in daily]
    n, total = len(xs), sum(xs)
    best = None  # (stat, day, t)
    s = 0
    for t, (day, x) in enumerate(daily, start=1):
        s += x
        stat = abs(n * s - t * total)
        if best is None or stat > best[0]:
            best = (stat, day, t)
    row = specs()["daily_changepoint_cusum"].fn(spark, sf_dir).collect()[0]
    assert row["cusum_scaled"] == best[0]
    assert row["changepoint_day"] == best[1]
    assert row["prefix_days"] == best[2]
    assert row["n_days"] == n


def test_spine_covers_every_day_exactly_once(spark, sf_dir):
    """The interval-explode must emit each calendar day in the observed
    extent exactly once — no dup at interval seams, no hole inside."""
    rows = specs()["daily_spine_interpolate"].fn(spark, sf_dir).collect()
    days = sorted(r["day"] for r in rows)
    assert len(days) == len(set(days)), "duplicate spine day"
    lo, hi = days[0], days[-1]
    assert days == [
        lo + dt.timedelta(days=i) for i in range((hi - lo).days + 1)
    ], "hole in the spine"


def test_spine_observed_rows_and_interpolation_exact(spark, sf_dir, duck):
    """Observed rows carry the raw daily cents; every filled row is the
    half-up-rounded linear blend of its bracketing observations."""
    obs = dict(
        duck.execute(
            """
            SELECT CAST(ts AS DATE) AS d,
                   sum(CAST(round(value * 100) AS BIGINT)) AS v
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1 HAVING day(CAST(ts AS DATE)) % 7 NOT IN (0, 3, 4)
            """
        ).fetchall()
    )
    rows = {
        r["day"]: r
        for r in specs()["daily_spine_interpolate"].fn(spark, sf_dir).collect()
    }
    obs_days = sorted(obs)
    for d, r in rows.items():
        if r["observed"]:
            assert r["cents"] == obs[d]
        else:
            assert d not in obs
            prev = max(o for o in obs_days if o < d)
            nxt = min(o for o in obs_days if o > d)
            gap, p = (nxt - prev).days, (d - prev).days
            num = obs[prev] * (gap - p) + obs[nxt] * p
            # round-half-up in exact integer space
            assert r["cents"] == (2 * num + gap) // (2 * gap)
    # every observed day is present in the spine output
    assert set(obs_days) <= set(rows)


def test_changepoint_plans_take_ordered_no_growing_sort(spark, sf_dir):
    from lambda_arc_events_filter_spark.plans import inspect as I

    df = specs()["daily_changepoint_cusum"].fn(spark, sf_dir)
    assert I.uses_take_ordered(df), "argmax must plan TakeOrderedAndProject"
    assert not I.has_python_in_plan(df)


def test_spine_no_nested_loop_no_python(spark, sf_dir):
    """The gap fill must stay join-free after the rank-shifted neighbor
    lookup — in particular no cartesian spine×observations join."""
    from lambda_arc_events_filter_spark.plans import inspect as I

    df = specs()["daily_spine_interpolate"].fn(spark, sf_dir)
    assert not I.uses_nested_loop_join(df), I.formatted_plan(df)[:2000]
    assert not I.has_python_in_plan(df)


@pytest.mark.parametrize(
    "a,b", [(0, 1), (1, 2), (3, 2), (5, 4), (7, 3), (10, 4), (999, 1000)]
)
def test_half_up_div_matches_decimal_half_up(spark, a, b):
    from decimal import ROUND_HALF_UP, Decimal

    from lambda_arc_events_filter_spark.functions.exact import half_up_div
    import pyspark.sql.functions as F

    got = (
        spark.range(1)
        .select(half_up_div(F.lit(a), F.lit(b)).alias("r"))
        .collect()[0]["r"]
    )
    want = int(
        (Decimal(a) / Decimal(b)).quantize(Decimal(1), rounding=ROUND_HALF_UP)
    )
    assert got == want


def test_batch_hopping_window_covers_each_event_twice(spark, sf_dir):
    """size/slide = 2: summed n_events across all windows must be exactly
    2x the event count, every window must span exactly 2 hours, and each
    event's timestamp must fall inside both assigned windows."""
    from lambda_arc_events_filter_spark.catalog import load
    from lambda_arc_events_filter_spark.registry import specs

    out = specs()["batch_hopping_window_agg"].fn(spark, sf_dir).collect()
    total = load(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in out) == 2 * total
    for r in out:
        span = r["window_end"] - r["window_start"]
        assert span.total_seconds() == 7200
        assert r["window_start"].minute == 0 and r["window_start"].second == 0
