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


def _r(v, nd: int = 6) -> float:
    """Round-half-up at nd decimals of the double's shortest decimal
    representation — Spark's F.round semantics (BigDecimal.valueOf).
    Where a query rounds an INTERMEDIATE (part of its definition), the
    re-derivation must mirror that convention exactly; pandas .round is
    banker's and flips half-boundary values (seen: a per-user round-6
    mean shifting a downstream variance by 2e-6)."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-nd)
    return float(Decimal(repr(float(v))).quantize(q, rounding=ROUND_HALF_UP))


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


def test_logrank_matches_fraction_route(spark, sf_dir):
    """Log-rank O/E/V recomputed with exact Fractions from the cohort
    risk sets (query: integer expression tree + range-partitioned
    reverse running sums)."""
    e = _events(sf_dir)
    day = e.ts.dt.floor("D")
    per = e.assign(day=day).groupby("user_id").agg(
        first_day=("day", "min"), last_day=("day", "max")
    )
    conv = (
        e[e.event_type == "purchase"].assign(day=day).groupby("user_id")["day"].min()
    )
    per["conv_day"] = conv
    per["t"] = (per.conv_day.fillna(per.last_day) - per.first_day).dt.days
    per["g"] = per.index % 2
    per["d"] = per.conv_day.notna()
    obs1 = obs0 = 0
    sum_e1 = sum_v = Fraction(0)
    times = sorted(per.t.unique())
    for t in times:
        at = per[per.t >= t]
        here = per[per.t == t]
        d1 = int((here.d & (here.g == 1)).sum())
        d0 = int((here.d & (here.g == 0)).sum())
        d, n = d1 + d0, len(at)
        n1 = int((at.g == 1).sum())
        if d == 0:
            continue
        obs1 += d1
        obs0 += d0
        sum_e1 += Fraction(d * n1, n)
        if n > 1:
            sum_v += (
                Fraction(d)
                * Fraction(n1, n)
                * (1 - Fraction(n1, n))
                * Fraction(n - d, n - 1)
            )
    chi2 = float(Fraction((obs1 - sum_e1) ** 2) / sum_v)
    (r,) = _rows(spark, sf_dir, "users_logrank_test")
    assert (r["observed_1"], r["observed_0"]) == (obs1, obs0)
    assert abs(r["expected_1"] - float(sum_e1)) < 2e-6
    assert abs(r["expected_0"] - float(obs1 + obs0 - sum_e1)) < 2e-6
    assert abs(r["chi_square"] - chi2) < 2e-6


def test_cuped_matches_numpy_moments(spark, sf_dir):
    """CUPED theta-adjustment recomputed with numpy population moments.
    The pre/post split, the per-user round-6 means, and the round-6
    theta/x-bar are part of the query definition; the ALGEBRA
    (theta = cov/var, y' = y - theta(x - xbar), per-variant moments) is
    what this pins."""
    import numpy as np

    e = _events(sf_dir)
    us = e.ts.astype("int64")  # datetime64[us] -> epoch micros
    m_us = (int(us.min()) + int(us.max())) // 2
    pu = pd.DataFrame({"user_id": e.user_id, "pre": us < m_us, "value": e.value})
    x = pu[pu.pre].groupby("user_id").value.mean().map(_r)
    y = pu[~pu.pre].groupby("user_id").value.mean().map(_r)
    both = pd.DataFrame({"x": x, "y": y}).dropna()
    th = _r(np.cov(both.x, both.y, ddof=0)[0, 1] / np.var(both.x))
    mx = _r(both.x.mean())
    adj = both.y - th * (both.x - mx)
    got = {r["variant"]: r for r in _rows(spark, sf_dir, "events_cuped_adjusted_ab")}
    for v in (0, 1):
        sel = both.index % 2 == v
        r = got[v]
        assert r["n_users"] == int(sel.sum())
        assert abs(r["mean_raw"] - both.y[sel].mean()) < 2e-6
        assert abs(r["mean_cuped"] - adj[sel].mean()) < 2e-6
        assert abs(r["var_raw"] - float(np.var(both.y[sel]))) < 2e-6
        assert abs(r["var_cuped"] - float(np.var(adj[sel]))) < 2e-6
        # CUPED must not move the pooled mean and must not raise variance
    pooled_raw = float(both.y.mean())
    pooled_adj = float(adj.mean())
    # exact only for unrounded theta/x-bar; the definition rounds both
    # to 6dp, so the pooled mean may drift by ~|round err| * mean|x - mx|
    assert abs(pooled_raw - pooled_adj) < 1e-6
    assert float(np.var(adj)) <= float(np.var(both.y)) + 1e-12


def test_theil_sen_matches_numpy_medians(spark, sf_dir):
    """Theil-Sen slope/intercept recomputed as numpy medians over the
    explicit O(n^2) pairwise-slope list."""
    import numpy as np

    e = _events(sf_dir)
    daily = (
        e.assign(t=e.ts.astype("int64") // (86400 * 10**6))
        .groupby("t")
        .value.mean()
        .map(_r)
    )
    t = daily.index.to_numpy()
    y = daily.to_numpy()
    slopes = [
        _r((y[j] - y[i]) / (t[j] - t[i]), 9)
        for i in range(len(t))
        for j in range(len(t))
        if t[j] > t[i]
    ]
    slope = float(np.median(slopes))
    icepts = [_r(v, 9) for v in (y - slope * t)]
    intercept = float(np.median(icepts))
    (r,) = _rows(spark, sf_dir, "daily_theil_sen_trend")
    assert r["n_days"] == len(t)
    assert abs(r["slope_per_day"] - slope) < 2e-6
    assert abs(r["intercept"] - intercept) < 2e-6


def test_mutual_information_matches_entropy_identity(spark, sf_dir):
    """Per-cell MI contributions recomputed from the contingency counts,
    AND the identity I(X;Y) = H(X) + H(Y) - H(X,Y) as a second,
    algebra-independent route to the total."""
    e = _events(sf_dir)
    dow = (e.ts.dt.dayofweek + 1) % 7
    cells = e.assign(dow=dow).groupby(["event_type", "dow"]).size()
    rt, ct, n = cells.groupby("event_type").sum(), cells.groupby("dow").sum(), int(cells.sum())
    got = {
        (r["event_type"], r["dow"]): r
        for r in _rows(spark, sf_dir, "events_mutual_information")
    }
    assert set(got) == set(cells.index)
    total_mine = 0.0
    for (et, d), o in cells.items():
        o = int(o)
        mi = o / n * math.log(o * n / (int(rt[et]) * int(ct[d])))
        total_mine += mi
        r = got[(et, d)]
        assert r["n_events"] == o
        assert abs(r["p_joint"] - o / n) < 6e-7
        assert abs(r["mi_contrib"] - mi) < 2e-6, (et, d)

    def h(counts):
        return -math.fsum(c / n * math.log(c / n) for c in counts)

    i_entropy = h(rt.values) + h(ct.values) - h(cells.values)
    assert abs(total_mine - i_entropy) < 1e-9


def test_gini_matches_mean_absolute_difference(spark, sf_dir):
    """Gini recomputed by the mean-absolute-difference identity
    G = sum_ij |x_i - x_j| / (2 n^2 mean) — a different formula from the
    query's rank form 2*sum(i*x_i)/(n*total) - (n+1)/n."""
    import numpy as np

    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = (
        (o.o_totalprice * 100)
        .round()
        .astype("int64")
        .groupby(o.o_custkey)
        .sum()
        .to_numpy()
    )
    n, total = len(cents), int(cents.sum())
    # Chunked pairwise sum (ADVICE r8): the full n x n |x_i - x_j| matrix is
    # O(n^2) MEMORY, which blows past RAM if SPARK_GRAFT_TEST_SF_DIR points at
    # a larger scale factor.  Chunking keeps peak memory at chunk*n while the
    # formula stays the mean-absolute-difference identity — still independent
    # of the query's sorted-rank form.
    chunk = 1024
    mad = float(
        sum(
            np.abs(cents[i : i + chunk, None] - cents[None, :]).sum()
            for i in range(0, n, chunk)
        )
    )
    gini = mad / (2 * n * total)
    top = int(np.sort(cents)[n - n // 10 :].sum()) if n // 10 else 0
    (r,) = _rows(spark, sf_dir, "customer_revenue_gini")
    assert r["n_customers"] == n
    assert abs(r["total_revenue"] - total / 100) < 0.011
    assert abs(r["gini"] - gini) < 2e-6
    assert abs(r["top_decile_share"] - top / total) < 2e-6


def test_acf_matches_deviation_route(spark, sf_dir):
    """Sample ACF at lags 1-7 recomputed from explicit mean-deviations
    (query: exact-integer moment assembly n^2 p - nS(A+B) + n_k S^2)."""
    e = _events(sf_dir)
    daily = e.groupby(e.ts.dt.date).size()
    xbar = daily.mean()
    denom = math.fsum((v - xbar) ** 2 for v in daily)
    got = {r["lag"]: r for r in _rows(spark, sf_dir, "events_acf_daily")}
    days = set(daily.index)
    for lag in range(1, 8):
        pairs = [
            (daily[d], daily[d - pd.Timedelta(days=lag)])
            for d in daily.index
            if d - pd.Timedelta(days=lag) in days
        ]
        acf = math.fsum((a - xbar) * (b - xbar) for a, b in pairs) / denom
        r = got[lag]
        assert r["n_pairs"] == len(pairs)
        assert abs(r["acf"] - acf) < 2e-6, lag


def test_ewma_matches_python_recurrence(spark, sf_dir):
    """s_t = 0.3 x_t + 0.7 s_{t-1} replayed as a literal python loop
    (the query runs it as per-row prefix HOF folds)."""
    e = _events(sf_dir)
    daily = (
        e.assign(day=e.ts.dt.floor("D")).groupby("day").value.mean().map(_r)
    )
    got = {r["day"]: r for r in _rows(spark, sf_dir, "events_ewma_daily")}
    s = None
    for day, x in daily.sort_index().items():
        s = x if s is None else 0.3 * x + 0.7 * s
        r = got[day.to_pydatetime()]
        assert abs(r["x"] - x) < 1e-9
        assert abs(r["ewma"] - s) < 2e-6, day
    assert len(got) == len(daily)


def test_holt_matches_python_recurrence(spark, sf_dir):
    """Coupled level/trend recurrence replayed as a literal python loop
    (the query folds once with a struct accumulator and explodes)."""
    e = _events(sf_dir)
    daily = (
        e.assign(day=e.ts.dt.floor("D")).groupby("day").value.mean().map(_r)
    ).sort_index()
    xs = list(daily.items())
    got = {r["day"]: r for r in _rows(spark, sf_dir, "events_holt_smoothing")}
    assert len(got) == len(xs)
    l, b = xs[0][1], xs[1][1] - xs[0][1]
    for i, (day, x) in enumerate(xs):
        if i:
            l_new = 0.3 * x + 0.7 * (l + b)
            b = 0.2 * (l_new - l) + 0.8 * b
            l = l_new
        r = got[day.to_pydatetime()]
        assert abs(r["level"] - l) < 2e-6, day
        assert abs(r["trend"] - b) < 2e-6, day
        assert abs(r["forecast_next"] - (l + b)) < 2e-6, day


def test_hurst_rs_matches_numpy_route(spark, sf_dir):
    """R/S per block from explicit cumulative deviations and the H fit
    via numpy polyfit (query: exact-integer moments + closed-form OLS)."""
    import numpy as np

    e = _events(sf_dir)
    cents = (
        e.assign(
            day=e.ts.dt.floor("D"), c=(e.value * 100).round().astype("int64")
        )
        .groupby("day")
        .c.sum()
    )
    d0 = cents.index.min()
    idx = {(d - d0).days: int(v) for d, v in cents.items()}
    ndays = len(idx)
    got = {r["block_size"]: r for r in _rows(spark, sf_dir, "events_hurst_rs")}
    pts = []
    for n in (5, 10, 15):
        rs_vals = []
        for blk in range(ndays // n):
            xs = [(i % n, idx[i]) for i in sorted(idx) if i // n == blk]
            vals = [v for _, v in xs]
            sx, sxx = sum(vals), math.fsum(v * v for v in vals)
            run = 0.0
            devs = []
            for pos, v in xs:
                run += v
                devs.append(run - (pos + 1) * (sx / n))
            s_std = math.sqrt(sxx / n - (sx / n) ** 2)
            rs_vals.append((max(devs) - min(devs)) / s_std)
        mean_rs = math.fsum(rs_vals) / len(rs_vals)
        pts.append((math.log(n), math.log(mean_rs)))
        r = got[n]
        assert r["n_blocks"] == len(rs_vals)
        assert abs(r["mean_rs"] - mean_rs) < 2e-6, n
    h = float(np.polyfit([p[0] for p in pts], [p[1] for p in pts], 1)[0])
    assert abs(got[5]["hurst"] - h) < 2e-6


def test_psi_matches_pandas_route(spark, sf_dir):
    """PSI per event type: halves by the deterministic (ts, event_id)
    ntile, quintile edges frozen on the first half (pandas linear
    quantile == quantile_cont), epsilon-smoothed sum — recomputed wholly
    in pandas."""
    e = _events(sf_dir)
    got = {r["event_type"]: r for r in _rows(spark, sf_dir, "events_psi_drift")}
    for et, grp in e.groupby("event_type"):
        g = grp.sort_values(["ts", "event_id"])
        n = len(g)
        first = g.value.iloc[: (n + 1) // 2]
        second = g.value.iloc[(n + 1) // 2 :]
        edges = [first.quantile(q) for q in (0.2, 0.4, 0.6, 0.8)]

        def bin_of(v):
            for i, ed in enumerate(edges):
                if v < ed:
                    return i
            return 4

        import collections

        cf = collections.Counter(bin_of(v) for v in first)
        cs = collections.Counter(bin_of(v) for v in second)
        bins = sorted(set(cf) | set(cs))
        psi = math.fsum(
            (cf[b] / len(first) + 1e-6 - (cs[b] / len(second) + 1e-6))
            * math.log(
                (cf[b] / len(first) + 1e-6) / (cs[b] / len(second) + 1e-6)
            )
            for b in bins
        )
        r = got[et]
        assert r["n_bins"] == len(bins), et
        assert abs(r["psi"] - psi) < 2e-6, et
        assert r["psi"] >= 0  # PSI is a symmetrized KL: nonnegative


def test_kl_divergence_matches_counter_route(spark, sf_dir):
    """Per-source KL vs the corpus token distribution recomputed from
    python Counters with fsum; KL >= 0 (Gibbs) as the identity check."""
    import collections

    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    per_src: dict = {}
    corpus: collections.Counter = collections.Counter()
    for src, text in zip(d.source, d.text):
        toks = text.split(" ")
        per_src.setdefault(src, collections.Counter()).update(toks)
        corpus.update(toks)
    n_c = sum(corpus.values())
    got = {r["source"]: r for r in _rows(spark, sf_dir, "corpus_kl_divergence")}
    for src, cnt in per_src.items():
        n_s = sum(cnt.values())
        kl = math.fsum(
            (c / n_s) * math.log((c / n_s) / (corpus[t] / n_c))
            for t, c in cnt.items()
        )
        r = got[src]
        assert r["n_tokens"] == n_s and r["n_terms"] == len(cnt), src
        assert abs(r["kl_vs_corpus"] - kl) < 2e-6, src
        assert kl > -1e-12, src


def test_theil_index_matches_share_route(spark, sf_dir):
    """Theil T recomputed as the share form sum((x/S) ln(x n / S))
    (query: the decomposed (sum x ln x)/S + ln n - ln S)."""
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = (o.o_totalprice * 100).round().astype("int64").groupby(o.o_custkey).sum()
    n, s = len(cents), int(cents.sum())
    theil = math.fsum((x / s) * math.log(x * n / s) for x in cents)
    (r,) = _rows(spark, sf_dir, "customer_theil_index")
    assert r["n_customers"] == n
    assert abs(r["theil_t"] - theil) < 2e-6
    assert -1e-9 < theil < math.log(n) + 1e-9  # Theil T range


def test_zipf_slope_matches_numpy_lstsq(spark, sf_dir):
    """Zipf OLS over the top-1000 (f desc, term) terms via numpy polyfit
    (query: closed-form normal equations from exact integer ranks)."""
    import collections

    import numpy as np

    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cnt = collections.Counter()
    for text in d.text:
        cnt.update(text.split(" "))
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    u = np.log(np.arange(1, len(top) + 1, dtype=float))
    v = np.log(np.array([f for _, f in top], dtype=float))
    slope, intercept = np.polyfit(u, v, 1)
    (r,) = _rows(spark, sf_dir, "tokens_zipf_slope")
    assert r["n_terms"] == len(top)
    assert abs(r["zipf_slope"] - slope) < 2e-6
    assert abs(r["zipf_intercept"] - intercept) < 2e-6


def test_median_ci_matches_sorted_lookup(spark, sf_dir):
    """Order-statistic CI recomputed by direct sorted-array indexing
    (query: banded global rank + broadcast rank filter)."""
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    xs = o.sort_values(["o_totalprice", "o_orderkey"]).o_totalprice.to_numpy()
    n = len(xs)
    lo_r = math.floor((n - 1.96 * math.sqrt(n)) / 2)
    hi_r = math.ceil(1 + (n + 1.96 * math.sqrt(n)) / 2)
    m1, m2 = math.floor((n + 1) / 2), math.ceil((n + 1) / 2)
    (r,) = _rows(spark, sf_dir, "orders_median_ci_binomial")
    assert r["n_orders"] == n
    assert abs(r["median"] - (xs[m1 - 1] + xs[m2 - 1]) / 2) < 0.011
    assert abs(r["ci_lo"] - xs[lo_r - 1]) < 0.011
    assert abs(r["ci_hi"] - xs[hi_r - 1]) < 0.011
    assert r["ci_lo"] <= r["median"] <= r["ci_hi"]


# ---------------------------------------------------------------------------
# Sequential SPRT
# ---------------------------------------------------------------------------


def test_sprt_prefix_sum_and_decision_rule(spark, sf_dir):
    """llr_cum must be the running prefix sum of llr_day in day order;
    the decision must be exactly the boundary rule on the rounded
    evidence; daily n_obs must account for every event."""
    import math

    rows = (
        specs()["events_ab_sequential_sprt"]
        .fn(spark, sf_dir)
        .orderBy("day")
        .collect()
    )
    assert rows
    bound = round(math.log(19.0), 6)
    cum = 0.0
    for r in rows:
        assert r["n_conv"] <= r["n_obs"]
        cum += r["llr_day"]
        # rounded per-day terms re-summed: tolerance covers the
        # round-then-sum vs sum-then-round gap over <=31 days
        assert abs(r["llr_cum"] - cum) < 31 * 5e-7 + 1e-9
        cum = r["llr_cum"]
        if r["llr_cum"] >= bound:
            assert r["decision"] == "accept_h1"
        elif r["llr_cum"] <= -bound:
            assert r["decision"] == "accept_h0"
        else:
            assert r["decision"] == "continue"
    from lambda_arc_events_filter_spark.catalog import load

    total = load(spark, sf_dir, "events").count()
    assert sum(r["n_obs"] for r in rows) == total


def test_krippendorff_alpha_matches_reference(spark, sf_dir):
    """Alpha must equal the textbook nominal coincidence computation on
    the same three weak labels, re-derived row-by-row in Python; the
    abstaining rater must actually abstain (n_ratings < 3 * n_units
    whenever short docs exist)."""
    docs = (
        specs()["text_quality_scores"].fn(spark, sf_dir).collect()
    )  # doc_id, n_tokens, type_token_ratio ...
    from lambda_arc_events_filter_spark.catalog import load

    raw = {
        r["doc_id"]: r
        for r in load(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    units = []
    for d in docs:
        la = 1 if raw[d["doc_id"]]["n_chars"] >= 260 else 0
        lb = 1 if d["n_tokens"] >= 50 else 0
        units.append((d["doc_id"], [la, lb]))
    # third rater recomputed exactly from tokens
    toks = {
        r["doc_id"]: (r["nd"], r["nt"])
        for r in load(spark, sf_dir, "documents")
        .selectExpr(
            "doc_id",
            "size(array_distinct(split(text, ' '))) AS nd",
            "size(split(text, ' ')) AS nt",
        )
        .collect()
    }
    by_doc = {}
    for doc_id, ratings in units:
        nd, nt = toks[doc_id]
        if nt >= 20:
            ratings = ratings + [1 if nd * 10 >= 7 * nt else 0]
        by_doc[doc_id] = ratings
    uu = {k: v for k, v in by_doc.items() if len(v) >= 2}
    n = sum(len(v) for v in uu.values())
    n1 = sum(sum(v) for v in uu.values())
    n0 = n - n1
    dsum = sum(
        sum(v) * (len(v) - sum(v)) / (len(v) - 1) for v in uu.values()
    )
    expected = round(1.0 - (n - 1) * dsum / (n1 * n0), 6)
    out = specs()["labels_krippendorff_alpha"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_units"] == len(uu)
    assert r["n_ratings"] == n
    assert r["n_pos"] == n1 and r["n_neg"] == n0
    assert abs(r["alpha"] - expected) < 2e-6
    assert r["n_ratings"] < 3 * r["n_units"] or all(
        len(v) == 3 for v in uu.values()
    )


def test_srm_check_chi2_and_flag(spark, sf_dir):
    """chi2 must equal (n1-n0)^2/(n1+n0) on exact distinct-user counts;
    the flag must be exactly (rounded p < 0.001); a fair parity split on
    a contiguous user-id space must NOT flag."""
    from lambda_arc_events_filter_spark.catalog import load

    users = {
        r.user_id
        for r in load(spark, sf_dir, "events").select("user_id").collect()
    }
    n1 = sum(1 for u in users if u % 2 == 1)
    n0 = len(users) - n1
    out = specs()["events_ab_srm_check"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_treat"], r["n_ctrl"]) == (n1, n0)
    assert abs(r["chi2"] - round((n1 - n0) ** 2 / (n1 + n0), 6)) < 2e-6
    assert r["srm_flag"] == (r["p_value"] < 0.001)
    assert not r["srm_flag"], "parity split over contiguous ids flagged SRM"


def test_srm_check_empty_arm_flags_not_null(spark, tmp_path):
    """Regression (r11 ADVICE): with one parity arm EMPTY (every user_id
    even), the conditional arm sum was NULL, so chi2/p_value/srm_flag all
    went NULL exactly when the sample-ratio mismatch is maximal.  The
    coalesce(...,0) guard must yield finite chi2 = n and srm_flag=true."""
    import pandas as pd

    n_users = 50
    ev = pd.DataFrame(
        {
            "event_id": range(n_users),
            "ts": pd.to_datetime("2024-01-01"),
            "user_id": [2 * i for i in range(n_users)],  # all even: grp 0
            "event_type": "click",
            "value": 1.0,
            "props": "{}",
        }
    )
    ev.to_parquet(str(tmp_path / "events.parquet"))
    out = specs()["events_ab_srm_check"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_treat"], r["n_ctrl"]) == (0, n_users)
    assert r["chi2"] == float(n_users)
    assert r["p_value"] is not None
    assert r["srm_flag"] is True


def test_bradley_terry_matches_python_mm(spark, sf_dir):
    """Comparison mining + 3 MM rounds replayed literally in python
    (the query: in-row pair HOF + broadcast join-agg rounds)."""
    from collections import defaultdict

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_orderkey", "l_linenumber", "l_partkey", "l_quantity"]
    ]
    pt = pd.read_parquet(f"{sf_dir}/part.parquet")[["p_partkey", "p_brand"]]
    lines = (
        li.merge(pt, left_on="l_partkey", right_on="p_partkey")[
            ["l_orderkey", "l_linenumber", "p_brand", "l_quantity"]
        ]
        .drop_duplicates()
    )
    cmat = defaultdict(int)
    for _, grp in lines.groupby("l_orderkey"):
        rows = sorted(
            grp[["l_linenumber", "p_brand", "l_quantity"]].itertuples(
                index=False, name=None
            )
        )
        for ii in range(len(rows)):
            for jj in range(ii + 1, len(rows)):
                a, b = rows[ii], rows[jj]
                if a[1] != b[1] and a[2] != b[2]:
                    w, l = (a[1], b[1]) if a[2] > b[2] else (b[1], a[1])
                    cmat[(w, l)] += 1
    qual = {w for w, _ in cmat} & {l for _, l in cmat}
    cmat = {k: v for k, v in cmat.items() if k[0] in qual and k[1] in qual}
    # Zero-win qualified brands (wins only against non-qualified
    # brands) are carried at p = 0 by both the query (left-join wins +
    # coalesce 0, r12 ADVICE) and this replay (defaultdict) — the
    # constructed-case pin lives in
    # tests/test_advice_r12.py::test_bradley_terry_zero_win_brand_parity.
    wins = defaultdict(int)
    n = defaultdict(int)
    for (w, l), k in cmat.items():
        wins[w] += k
        n[(w, l)] += k
        n[(l, w)] += k
    opp = defaultdict(dict)
    for (i, j), k in n.items():
        opp[i][j] = k
    games = {i: sum(opp[i].values()) for i in opp}
    p = {i: 1.0 for i in opp}
    for _ in range(3):
        p = {
            i: wins[i] / sum(k / (p[i] + p[j]) for j, k in opp[i].items())
            for i in opp
        }
    mean_p = sum(p.values()) / len(p)
    got = {r["brand"]: r for r in _rows(spark, sf_dir, "parts_bradley_terry_strength")}
    assert set(got) == set(opp)
    for b in opp:
        assert got[b]["wins"] == wins[b]
        assert got[b]["games"] == games[b]
        assert abs(got[b]["strength"] - p[b] / mean_p) < 2e-6, b


def test_jackknife_ratio_matches_direct_loo(spark, sf_dir):
    """Delete-one-nation jackknife replayed with an explicit loop over
    groups (the query: closed form from per-group sums)."""
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")[
        ["o_custkey", "o_totalprice"]
    ]
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")[
        ["c_custkey", "c_nationkey"]
    ]
    na = pd.read_parquet(f"{sf_dir}/nation.parquet")[
        ["n_nationkey", "n_name"]
    ]
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        na, left_on="c_nationkey", right_on="n_nationkey"
    )
    g = m.groupby("n_name").o_totalprice.agg(["count", "sum"])
    N, S, G = g["count"].sum(), g["sum"].sum(), len(g)
    loo = [(S - s) / (N - n) for n, s in zip(g["count"], g["sum"])]
    thbar = sum(loo) / G
    se = math.sqrt((G - 1) / G * sum((t - thbar) ** 2 for t in loo))
    (r,) = _rows(spark, sf_dir, "orders_jackknife_ratio_ci")
    assert r["n_groups"] == G and r["n_orders"] == N
    assert abs(r["estimate"] - S / N) < 2e-6
    assert abs(r["se_jack"] - se) < 2e-6
    assert abs(r["ci_lo"] - (S / N - 1.959964 * se)) < 2e-6
    assert abs(r["ci_hi"] - (S / N + 1.959964 * se)) < 2e-6


def test_ipw_ate_matches_direct_estimator(spark, sf_dir):
    """Hajek IPW replayed from numpy quantile strata + the literal
    weight formula; also pins that the assignment rule actually
    confounds (treatment rate rises with stratum)."""
    import numpy as np

    e = _events(sf_dir)
    cut = pd.Timestamp("2024-01-11")
    pre = e[e.ts < cut].groupby("user_id").size().rename("pre_cnt")
    post = e[e.ts >= cut].groupby("user_id").value.mean().rename("y")
    u = pd.concat([pre, post], axis=1, join="inner").reset_index()
    q1 = _r(float(np.quantile(u.pre_cnt, 1.0 / 3.0)))
    q2 = _r(float(np.quantile(u.pre_cnt, 2.0 / 3.0)))
    u["stratum"] = np.where(
        u.pre_cnt <= q1, 1, np.where(u.pre_cnt <= q2, 2, 3)
    )
    u["treated"] = (
        (u.user_id.astype("int64") * 48271) % 97 < 19 + 10 * u.stratum
    ).astype(int)
    es = u.groupby("stratum").treated.mean()
    # design-level confounding: the rule's acceptance thresholds rise
    # with the stratum (29/97 < 39/97 < 49/97); observed shares at toy
    # scale are noisy, so pin the construction plus a nonzero spread
    assert [19 + 10 * s for s in (1, 2, 3)] == sorted(
        19 + 10 * s for s in (1, 2, 3)
    )
    assert max(es) > min(es), "strata must receive different shares"
    u["wt"] = np.where(
        u.treated == 1, 1.0 / u.stratum.map(es), 1.0 / (1.0 - u.stratum.map(es))
    )
    t, ctl = u[u.treated == 1], u[u.treated == 0]
    ate = (t.y * t.wt).sum() / t.wt.sum() - (ctl.y * ctl.wt).sum() / ctl.wt.sum()
    naive = t.y.mean() - ctl.y.mean()
    (r,) = _rows(spark, sf_dir, "events_ipw_ate_stratified")
    assert r["n_users"] == len(u) and r["n_treated"] == int(u.treated.sum())
    assert abs(r["naive_diff"] - naive) < 2e-6
    assert abs(r["ate_ipw"] - ate) < 2e-6


def test_holt_winters_matches_python_recurrence(spark, sf_dir):
    """Triple recurrence with the m=7 seasonal ring replayed as a
    literal python loop (the query folds once with an array-of-7
    accumulator and explodes)."""
    e = _events(sf_dir)
    daily = (
        e.assign(day=e.ts.dt.floor("D")).groupby("day").value.mean().map(_r)
    ).sort_index()
    xs = list(daily.items())
    assert len(xs) >= 15, "fixture must span two weekly periods"
    l = sum(x for _, x in xs[:7]) / 7.0
    b = (sum(x for _, x in xs[7:14]) - sum(x for _, x in xs[:7])) / 49.0
    s = [x - l for _, x in xs[:7]]
    got = {
        r["day"]: r
        for r in _rows(spark, sf_dir, "events_holt_winters_seasonal")
    }
    assert len(got) == len(xs) - 7
    for day, x in xs[7:]:
        fc = l + b + s[0]
        l_new = 0.3 * (x - s[0]) + 0.7 * (l + b)
        b = 0.2 * (l_new - l) + 0.8 * b
        s_new = 0.1 * (x - l_new) + 0.9 * s[0]
        s = s[1:] + [s_new]
        l = l_new
        r = got[day.to_pydatetime()]
        assert abs(r["level"] - l) < 2e-6, day
        assert abs(r["trend"] - b) < 2e-6, day
        assert abs(r["seasonal"] - s_new) < 2e-6, day
        assert abs(r["forecast"] - fc) < 2e-6, day
