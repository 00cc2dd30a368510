"""Independent re-derivations of the statistical-test family.

The oracle-parity gate proves Spark and DuckDB compute the SAME number —
it cannot catch a formula that is wrong IDENTICALLY on both sides (the
oracle SQL is written to mirror the query definition).  These tests close
that class: each statistic is recomputed from the raw parquet with
pandas / fractions / math, from the TEXTBOOK definition, by a different
route than the query takes (direct deviations instead of power sums,
per-row ranks instead of bucket arithmetic, erfc instead of the
Abramowitz-Stegun polynomial), and compared within the documented
rounding tolerance.

Tolerances: every query rounds its statistic to 6 (or 1/4) decimals, so
an independent float route may legitimately differ by one rounding step
when the true value sits within float error of a .5 boundary; asserts use
one-rounding-step bounds (e.g. 2e-6 for round-6 columns), far below any
formula error, which shifts results by whole percents.
"""

from __future__ import annotations

import math
from fractions import Fraction

import pandas as pd

from lambda_arc_events_filter_spark.registry import specs


def _events(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def _rows(spark, sf_dir, name):
    return [r.asDict() for r in specs()[name].fn(spark, sf_dir).collect()]


def test_welch_ztest_matches_erfc_route(spark, sf_dir):
    """Welch z per event type recomputed with pandas moments and the
    two-sided normal tail via erfc — the query uses the A&S 26.2.17
    polynomial (|eps| < 8e-8), so p must agree within one round-6 step."""
    e = _events(sf_dir)
    got = {r["event_type"]: r for r in _rows(spark, sf_dir, "events_ab_welch_ztest")}
    g = e.assign(grp=e.user_id % 2).groupby(["event_type", "grp"])["value"]
    n, m, s2 = g.count(), g.mean(), g.var(ddof=1)
    for et in e.event_type.unique():
        n1, n0 = int(n[(et, 1)]), int(n[(et, 0)])
        lift = m[(et, 1)] - m[(et, 0)]
        z = lift / math.sqrt(s2[(et, 1)] / n1 + s2[(et, 0)] / n0)
        p = math.erfc(abs(z) / math.sqrt(2))  # = 2 * (1 - Phi(|z|))
        r = got[et]
        assert (r["n_treat"], r["n_ctrl"]) == (n1, n0), et
        assert abs(r["lift"] - lift) < 2e-6, et
        assert abs(r["z_score"] - z) < 2e-6, et
        assert abs(r["p_value"] - p) < 1.2e-6, et


def test_chi_square_matches_fraction_route(spark, sf_dir):
    """Per-type chi² contributions recomputed exactly with Fractions over
    the observed contingency cells (the query's cell universe: cells come
    from a group-by, so only observed (type, dow) pairs exist)."""
    e = _events(sf_dir)
    got = {r["event_type"]: r for r in _rows(spark, sf_dir, "events_chi_square_independence")}
    dow = (e.ts.dt.dayofweek + 1) % 7  # pandas Mon=0 -> Sunday-based 0
    cells = e.assign(dow=dow).groupby(["event_type", "dow"]).size()
    row_t = cells.groupby("event_type").sum()
    col_t = cells.groupby("dow").sum()
    n = int(cells.sum())
    for et in e.event_type.unique():
        contrib = Fraction(0)
        n_cells = 0
        for (t, d), o in cells.items():
            if t != et:
                continue
            n_cells += 1
            exp = Fraction(int(row_t[et]) * int(col_t[d]), n)
            contrib += (Fraction(int(o)) - exp) ** 2 / exp
        r = got[et]
        assert r["n_events"] == int(row_t[et]), et
        assert r["n_cells"] == n_cells, et
        assert abs(r["chi2_contrib"] - float(contrib)) < 2e-6, et


def test_mann_whitney_matches_per_row_ranks(spark, sf_dir):
    """U recomputed from PER-ROW average ranks (pandas rank) — the query
    never materializes row ranks (bucket arithmetic), so agreement pins
    the tie-handling algebra, not just the plumbing."""
    e = _events(sf_dir)
    s = e[e.event_type.isin(["purchase", "view"])]
    ranks = s.value.rank(method="average")
    is_a = (s.event_type == "purchase").astype(int)
    n_a = int(is_a.sum())
    rank_sum_a = math.fsum(ranks[is_a == 1])
    u_a = rank_sum_a - n_a * (n_a + 1) / 2
    (r,) = _rows(spark, sf_dir, "events_mann_whitney_u")
    assert r["n_a"] == n_a and r["n_b"] == len(s) - n_a
    assert abs(r["rank_sum_a"] - rank_sum_a) < 0.06
    assert abs(r["u_a"] - u_a) < 0.06


def test_ks_two_sample_matches_fraction_ecdf(spark, sf_dir):
    """D = sup|F̂ₐ−F̂ᵦ| recomputed exactly with Fractions over the pooled
    sample points."""
    e = _events(sf_dir)
    s = e[e.event_type.isin(["purchase", "view"])]
    a = sorted(s.value[s.event_type == "purchase"])
    b = sorted(s.value[s.event_type == "view"])
    na, nb = len(a), len(b)
    d_best = Fraction(0)
    ca = cb = 0
    ia = ib = 0
    for v in sorted(set(a) | set(b)):
        while ia < na and a[ia] <= v:
            ia += 1
        while ib < nb and b[ib] <= v:
            ib += 1
        d_best = max(d_best, abs(Fraction(ia, na) - Fraction(ib, nb)))
    (r,) = _rows(spark, sf_dir, "events_ks_two_sample")
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert abs(r["ks_d"] - float(d_best)) < 6e-7


def test_anova_matches_direct_deviations(spark, sf_dir):
    """SS_between / SS_within / F recomputed by DIRECT squared deviations
    (fsum-exact) on the cent-integer values — the query derives the same
    quantities from power sums (Σx, Σx²), a different algebraic route."""
    e = _events(sf_dir)
    x = (e.value * 100).round().astype(int)
    grand = math.fsum(x) / len(x)
    ssb = ssw = 0.0
    groups = list(e.groupby("event_type"))
    k = len(groups)
    for _, grp in groups:
        gx = (grp.value * 100).round().astype(int)
        gm = math.fsum(gx) / len(gx)
        ssb += len(gx) * (gm - grand) ** 2
        ssw += math.fsum((v - gm) ** 2 for v in gx)
    f = (ssb / (k - 1)) / (ssw / (len(x) - k))
    (r,) = _rows(spark, sf_dir, "events_anova_oneway")
    assert (r["k_groups"], r["n_total"]) == (k, len(x))
    assert abs(r["ss_between"] - ssb) < max(2e-4, 1e-9 * abs(ssb))
    assert abs(r["ss_within"] - ssw) < max(2e-4, 1e-9 * abs(ssw))
    assert abs(r["f_stat"] - f) < 2e-6


def test_kaplan_meier_matches_textbook_product(spark, sf_dir):
    """S(t) recomputed as the literal product Π(1 − dᵢ/nᵢ) with Fractions
    (the query computes exp(Σlog) with a zero-factor guard)."""
    e = _events(sf_dir)
    day = e.ts.dt.floor("D")
    per = e.assign(day=day).groupby("user_id").agg(
        first_day=("day", "min"), last_day=("day", "max")
    )
    conv = (
        e[e.event_type == "purchase"].assign(day=day).groupby("user_id")["day"].min()
    )
    per["conv_day"] = conv
    t = (per.conv_day.fillna(per.last_day) - per.first_day).dt.days
    converted = per.conv_day.notna()
    per_t = pd.DataFrame({"t": t, "conv": converted}).groupby("t").agg(
        d=("conv", "sum"), exits=("conv", "size")
    )
    got = {r["t"]: r for r in _rows(spark, sf_dir, "users_survival_km")}
    surv = Fraction(1)
    at_risk = int(per_t.exits.sum())
    for ti, row in per_t.sort_index().iterrows():
        d_i, exits = int(row.d), int(row.exits)
        surv *= 1 - Fraction(d_i, at_risk)
        if d_i > 0:
            r = got[int(ti)]
            assert r["d"] == d_i and r["n_at_risk"] == at_risk, ti
            assert abs(r["survival"] - float(surv)) < 1.5e-6, ti
        at_risk -= exits
    assert set(got) == {int(ti) for ti, row in per_t.iterrows() if row.d > 0}


def test_auc_matches_per_row_ranks(spark, sf_dir):
    """AUC recomputed by the rank-sum identity on PER-ROW average ranks:
    AUC = (R₁ − n₁(n₁+1)/2) / (n₁n₀) — equal to the query's bucket-count
    form (neg-below + half ties) when and only when tie credit is exactly
    half."""
    e = _events(sf_dir)
    k = (e.event_id * 2654435761) % 1000
    y = (e.value > 100).astype(int)
    ranks = k.rank(method="average")
    n1, n0 = int(y.sum()), int((1 - y).sum())
    auc = (math.fsum(ranks[y == 1]) - n1 * (n1 + 1) / 2) / (n1 * n0)
    (r,) = _rows(spark, sf_dir, "score_auc_rank")
    assert (r["n_pos"], r["n_neg"]) == (n1, n0)
    assert abs(r["auc"] - auc) < 6e-7


def test_spearman_matches_pandas_rank_corr(spark, sf_dir):
    """ρ recomputed as the Pearson correlation of per-row average ranks
    (the classical definition with fractional ties) — the query's doubled
    centered bucket ranks must be the same number."""
    e = _events(sf_dir)
    s = e[e.value.notna()]
    ka = (s.event_id * 2654435761) % 1000
    kb = s.value.apply(math.floor).clip(0, 999)
    rho = ka.rank(method="average").corr(kb.rank(method="average"))
    (r,) = _rows(spark, sf_dir, "score_spearman_rank_corr")
    assert r["n_events"] == len(s)
    assert abs(r["spearman_rho"] - rho) < 2e-6
