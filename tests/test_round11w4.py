"""Independent re-derivations for the round-11 fourth wave (AIPW,
Cochran-Armitage, WOE/IV, TextRank, bot-score heuristics).

Same discipline as test_stat_formulas.py: each statistic is recomputed
from the raw parquet by a DIFFERENT route than the query takes
(pandas/numpy loops, erfc instead of the Abramowitz-Stegun polynomial),
within one-rounding-step tolerances.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd

from lambda_arc_events_filter_spark.registry import specs


def _rows(spark, sf_dir, name):
    return [r.asDict() for r in specs()[name].fn(spark, sf_dir).collect()]


def _events(sf_dir):
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def _ipw_frame(sf_dir):
    import numpy as np

    e = _events(sf_dir)
    cut = pd.Timestamp("2024-01-11")
    pre = e[e.ts < cut].groupby("user_id").size().rename("pre_cnt")
    post = e[e.ts >= cut].groupby("user_id").value.mean().rename("y")
    u = pd.concat([pre, post], axis=1, join="inner").reset_index()
    q1 = round(float(np.quantile(u.pre_cnt, 1.0 / 3.0)), 6)
    q2 = round(float(np.quantile(u.pre_cnt, 2.0 / 3.0)), 6)
    u["stratum"] = np.where(u.pre_cnt <= q1, 1, np.where(u.pre_cnt <= q2, 2, 3))
    u["treated"] = (
        (u.user_id.astype("int64") * 48271) % 97 < 19 + 10 * u.stratum
    ).astype(int)
    return u


def test_aipw_matches_influence_function_route(spark, sf_dir):
    """psi recomputed per user from stratum means; the ATE and its
    influence-function SE from plain pandas moments."""
    u = _ipw_frame(sf_dir)
    sm = u.groupby("stratum").apply(
        lambda g: pd.Series(
            {
                "e": g.treated.mean(),
                "m1": g[g.treated == 1].y.mean(),
                "m0": g[g.treated == 0].y.mean(),
            }
        ),
        include_groups=False,
    )
    j = u.join(sm, on="stratum")
    psi = (
        j.m1
        - j.m0
        + j.treated * (j.y - j.m1) / j.e
        - (1 - j.treated) * (j.y - j.m0) / (1.0 - j.e)
    )
    n = len(psi)
    se = psi.std(ddof=1) / math.sqrt(n)
    (r,) = _rows(spark, sf_dir, "events_aipw_doubly_robust")
    assert r["n_users"] == n
    assert abs(r["ate_aipw"] - psi.mean()) < 2e-6
    assert abs(r["se_if"] - se) < 2e-6
    assert abs(r["ci_lo"] - (psi.mean() - 1.959964 * se)) < 2e-6
    assert abs(r["ci_hi"] - (psi.mean() + 1.959964 * se)) < 2e-6


def test_cochran_armitage_matches_textbook_formula(spark, sf_dir):
    """CA z from the literal 2xk-table formula; two-sided p via erfc
    (vs the query's A-S polynomial, |err| < 7.5e-8)."""
    import numpy as np

    e = _events(sf_dir)
    cut = pd.Timestamp("2024-01-11")
    pre = e[e.ts < cut].groupby("user_id").size().rename("pre_cnt")
    purch = (
        e[(e.ts >= cut) & (e.event_type == "purchase")]
        .groupby("user_id")
        .size()
        .rename("purch")
    )
    u = pre.to_frame().join(purch, how="left").fillna(0).reset_index()
    q1 = round(float(np.quantile(u.pre_cnt, 1.0 / 3.0)), 6)
    q2 = round(float(np.quantile(u.pre_cnt, 2.0 / 3.0)), 6)
    pmed = round(float(np.quantile(u.purch, 0.5)), 6)
    u["dose"] = np.where(u.pre_cnt <= q1, 1, np.where(u.pre_cnt <= q2, 2, 3))
    u["resp"] = (u.purch > pmed).astype(int)
    g = u.groupby("dose").resp.agg(["count", "sum"])
    N, R = g["count"].sum(), g["sum"].sum()
    xbar = (g.index * g["count"]).sum() / N
    num = (g["sum"] * (g.index - xbar)).sum()
    pbar = R / N
    den = pbar * (1 - pbar) * (g["count"] * (g.index - xbar) ** 2).sum()
    z = num / math.sqrt(den)
    p = math.erfc(abs(z) / math.sqrt(2))
    (r,) = _rows(spark, sf_dir, "events_cochran_armitage_trend")
    assert r["n_users"] == N and r["n_resp"] == R
    assert abs(r["z_trend"] - z) < 2e-6
    assert abs(r["p_value"] - p) < 2e-6


def test_woe_iv_matches_fraction_route(spark, sf_dir):
    """WOE/IV from the smoothed-count definition, recomputed per
    priority with plain python floats."""
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["bad"] = (o.o_orderstatus == "F").astype(int)
    g = o.groupby("o_orderpriority").bad.agg(["count", "sum"])
    tg = (g["count"] - g["sum"]).sum()
    tb = g["sum"].sum()
    got = {r["category"]: r for r in _rows(spark, sf_dir, "features_woe_iv")}
    assert set(got) == set(g.index)
    for cat, row in g.iterrows():
        ngood, nbad = row["count"] - row["sum"], row["sum"]
        pg = (ngood + 0.5) / (tg + 0.5)
        pb = (nbad + 0.5) / (tb + 0.5)
        woe = math.log(pg / pb)
        r = got[cat]
        assert r["n_good"] == ngood and r["n_bad"] == nbad
        assert abs(r["woe"] - woe) < 2e-6
        assert abs(r["iv_contrib"] - (pg - pb) * woe) < 2e-6


def test_textrank_matches_python_pagerank(spark, sf_dir):
    """Edge extraction + 2 PR rounds replayed literally; the query's
    top-50 must agree on membership and rank values."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cnt = defaultdict(int)
    for text in docs.text:
        ts = text.split(" ")
        for i in range(len(ts) - 1):
            if ts[i] != ts[i + 1]:
                cnt[tuple(sorted((ts[i], ts[i + 1])))] += 1
        for i in range(len(ts) - 2):
            if ts[i] != ts[i + 2]:
                cnt[tuple(sorted((ts[i], ts[i + 2])))] += 1
    edges = {k: v for k, v in cnt.items() if v >= 2}
    adj = defaultdict(dict)
    for (a, b), w in edges.items():
        adj[a][b] = adj[a].get(b, 0) + w
        adj[b][a] = adj[b].get(a, 0) + w
    nodes = sorted(adj)
    n = len(nodes)
    ow = {v: sum(adj[v].values()) for v in nodes}
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(2):
        pr = {
            v: round(
                0.15 / n
                + 0.85 * sum(pr[s] * w / ow[s] for s, w in adj[v].items()),
                9,
            )
            for v in nodes
        }
    top = sorted(
        ((round(pr[v], 6), v) for v in nodes), key=lambda t: (-t[0], t[1])
    )[:50]
    got = _rows(spark, sf_dir, "text_textrank_keywords")
    assert len(got) == len(top) == min(50, n)
    for r, (rank, word) in zip(got, top):
        assert r["word"] == word, (r, word)
        assert abs(r["textrank"] - rank) < 2e-6


def test_bot_score_matches_pandas_route(spark, sf_dir):
    """Per-user cv/night/error shares replayed with pandas group ops on
    exact-microsecond gaps."""
    e = _events(sf_dir).sort_values(["user_id", "ts", "event_id"])
    # pandas datetime64[ns] → exact µs integers (the query's unix_micros)
    e["us"] = e.ts.astype("int64") // 1000
    got = {r["user_id"]: r for r in _rows(spark, sf_dir, "events_bot_score_heuristics")}
    for uid, g in e.groupby("user_id"):
        if len(g) < 5:
            assert uid not in got
            continue
        gaps = g.us.diff().dropna()
        cv = gaps.std(ddof=1) / gaps.mean()
        night = (g.ts.dt.hour < 6).mean()
        err = (g.event_type == "error").mean()
        score = 0.4 * math.exp(-cv) + 0.3 * night + 0.3 * err
        r = got[uid]
        assert r["n_events"] == len(g)
        assert abs(r["iat_cv"] - cv) < 2e-6
        assert abs(r["night_share"] - night) < 2e-6
        assert abs(r["error_share"] - err) < 2e-6
        assert abs(r["bot_score"] - score) < 2e-6
        assert r["is_bot"] == (round(score, 6) > 0.35)


def test_shrinkage_matches_fraction_route(spark, sf_dir):
    """Beta-binomial MoM prior + shrink replayed with pandas moments."""
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_partkey", "l_returnflag"]
    ]
    li["ret"] = (li.l_returnflag == "R").astype(int)
    g = li.groupby("l_partkey").ret.agg(["count", "sum"])
    rates = g["sum"] / g["count"]
    xb, s2 = rates.mean(), rates.var(ddof=1)
    ab0 = round(max(xb * (1 - xb) / s2 - 1, 1e-9), 9)
    alpha = round(ab0 * xb, 9)
    got = {
        r["l_partkey"]: r
        for r in _rows(spark, sf_dir, "parts_return_rate_shrinkage")
    }
    assert set(got) == set(g.index)
    for pk, row in g.iterrows():
        r = got[pk]
        assert r["n"] == row["count"] and r["r"] == row["sum"]
        assert abs(r["raw_rate"] - row["sum"] / row["count"]) < 2e-6
        shrunk = (row["sum"] + alpha) / (row["count"] + ab0)
        assert abs(r["shrunk_rate"] - shrunk) < 2e-6, pk
    # shrinkage must actually shrink: every posterior rate strictly
    # between the raw rate and the prior mean (or equal at the fixpoint)
    prior = alpha / ab0
    for pk, row in g.iterrows():
        raw = row["sum"] / row["count"]
        s = got[pk]["shrunk_rate"]
        lo, hi = sorted((raw, prior))
        assert lo - 2e-6 <= s <= hi + 2e-6, pk


def test_markov_holdout_matches_python_argmax(spark, sf_dir):
    """Train-era argmax + test-era scoring replayed with dict loops."""
    from collections import Counter, defaultdict

    e = _events(sf_dir).sort_values(["user_id", "ts", "event_id"])
    cut = pd.Timestamp("2024-01-21")
    e["era"] = (e.ts >= cut).astype(int)
    train = Counter()
    test = []
    for (_, era), g in e.groupby(["user_id", "era"]):
        seq = list(g.event_type)
        for a, b in zip(seq, seq[1:]):
            if era == 0:
                train[(a, b)] += 1
            else:
                test.append((a, b))
    byprev = defaultdict(dict)
    for (a, b), c in train.items():
        byprev[a][b] = c
    pred = {
        a: min(((-c, b) for b, c in d.items()))[1] for a, d in byprev.items()
    }
    stats = defaultdict(lambda: [0, 0])
    for a, b in test:
        if a in pred:
            stats[a][0] += 1
            stats[a][1] += int(pred[a] == b)
    got = {r["prev"]: r for r in _rows(spark, sf_dir, "events_markov_holdout_accuracy")}
    assert set(got) == set(stats)
    for a, (n, k) in stats.items():
        r = got[a]
        assert r["predicted"] == pred[a]
        assert r["n_test"] == n and r["n_correct"] == k
        assert abs(r["accuracy"] - k / n) < 2e-6


def test_chao1_good_turing_matches_counter_route(spark, sf_dir):
    """Frequency-of-frequencies + both estimators from a Counter."""
    from collections import Counter

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["source"]: r
        for r in _rows(spark, sf_dir, "corpus_unseen_vocab_estimate")
    }
    for src, g in docs.groupby("source"):
        c = Counter(w for t in g.text for w in t.split(" "))
        n = sum(c.values())
        v = len(c)
        f1 = sum(1 for k in c.values() if k == 1)
        f2 = sum(1 for k in c.values() if k == 2)
        r = got[src]
        assert (r["n_tokens"], r["vocab"], r["f1"], r["f2"]) == (n, v, f1, f2)
        assert abs(r["chao1_est"] - (v + f1 * (f1 - 1) / (2.0 * (f2 + 1)))) < 2e-6
        assert abs(r["gt_coverage"] - (1.0 - f1 / n)) < 2e-6
        assert r["chao1_est"] >= v  # estimator is a lower bound ABOVE V
    assert set(got) == set(docs.source.unique())


def test_permutation_test_matches_python_loop(spark, sf_dir):
    """All 199 hash permutations replayed literally; p from the
    add-one formula."""
    e = _events(sf_dir)
    cut = pd.Timestamp("2024-01-11")
    y = e[e.ts >= cut].groupby("user_id").value.mean()
    uids = y.index.astype("int64")
    obs = y[uids % 2 == 1].mean() - y[uids % 2 == 0].mean()
    exceed = 0
    for j in range(1, 200):
        parm = ((uids * 48271 + j * 2246822519) % 2147483647) % 2
        d = y[parm == 1].mean() - y[parm == 0].mean()
        if not math.isnan(d) and abs(d) >= abs(obs):
            exceed += 1
    p = (1.0 + exceed) / 200.0
    (r,) = _rows(spark, sf_dir, "events_permutation_test")
    assert r["n_users"] == len(y) and r["n_perms"] == 199
    assert abs(r["obs_diff"] - obs) < 2e-6
    assert abs(r["p_value"] - p) < 2e-6


def test_psm_matches_python_argmin(spark, sf_dir):
    """1-NN with-replacement matching replayed with explicit loops:
    same caliper, same (distance, control-id) tie-break; also pins the
    band-join completeness (bucket width == caliper → no candidate
    outside the band can be within the caliper)."""
    import numpy as np

    u = _ipw_frame(sf_dir)
    treated = u[u.treated == 1]
    control = u[u.treated == 0]
    matches = {}
    for t in treated.itertuples():
        cands = control[
            (control.stratum == t.stratum)
            & ((control.pre_cnt - t.pre_cnt).abs() <= 5)
        ]
        if len(cands):
            c = cands.assign(dist=(cands.pre_cnt - t.pre_cnt).abs()).sort_values(
                ["dist", "user_id"]
            ).iloc[0]
            matches[t.user_id] = (c.user_id, t.y - c.y)
    (r,) = _rows(spark, sf_dir, "events_psm_nn_att")
    assert r["n_treated"] == len(treated)
    assert r["n_matched"] == len(matches)
    assert r["n_controls_used"] == len({c for c, _ in matches.values()})
    att = sum(d for _, d in matches.values()) / len(matches)
    assert abs(r["att"] - att) < 2e-6
