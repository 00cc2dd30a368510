"""Round-4 wave: unit/property tests beyond the oracle gate.

The oracle gate proves engine≡DuckDB on the fixtures; these pin the
algorithmic claims that equivalence alone wouldn't catch — banding
completeness against brute force, the arithmetic ntile reproduction
against the builtin, and hand-computed iterative fixpoints.
"""

from __future__ import annotations

import math
import random

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from lambda_arc_events_filter_spark.functions.rank import (
    global_order_stats,
    ntile_from_rank,
)


@pytest.mark.parametrize("n", [1, 7, 10, 23, 100, 101])
def test_ntile_from_rank_matches_builtin(spark, n):
    df = spark.createDataFrame([(i,) for i in range(n)], "v long")
    ref = df.select(
        "v", F.ntile(10).over(Window.partitionBy(F.lit(0)).orderBy("v")).alias("nt")
    )
    got = (
        global_order_stats(df, ["v"], rank="rk")
        .withColumn("nt2", ntile_from_rank(F.col("rk"), F.lit(n), 10))
        .select("v", "nt2")
    )
    j = {r["v"]: r["nt"] for r in ref.collect()}
    for r in got.collect():
        assert j[r["v"]] == r["nt2"], (n, r["v"])


def test_radius_band_join_is_complete(spark, sf_dir):
    """Banding must find EXACTLY the brute-force pair set: a pair missed
    by the latitude band would be silent wrong data at any scale."""
    from lambda_arc_events_filter_spark.registry import specs

    banded = {
        (r["user_a"], r["n_neighbors"], r["nearest_km"])
        for r in specs()["users_geo_radius_join"].fn(spark, sf_dir).collect()
    }
    # brute force in python on the same deterministic points (events read
    # through catalog.load — the ts-unit probe — never raw parquet)
    from lambda_arc_events_filter_spark.catalog import load

    ids = [
        r["user_id"]
        for r in load(spark, sf_dir, "events").select("user_id").distinct().collect()
    ]
    pts = {
        u: (
            ((u * 2654435761) % 16000) / 100.0 - 80.0,
            ((u * 40503) % 36000) / 100.0 - 180.0,
        )
        for u in ids
    }

    def hav(a, b):
        (la, lo), (lb, lob) = pts[a], pts[b]
        arg = min(
            1.0,
            math.sin(math.radians(lb - la) / 2) ** 2
            + math.cos(math.radians(la))
            * math.cos(math.radians(lb))
            * math.sin(math.radians(lob - lo) / 2) ** 2,
        )
        return round(2 * 6371.0 * math.asin(math.sqrt(arg)), 3)

    brute = {}
    for a in ids:
        ds = [hav(a, b) for b in ids if b != a]
        ds = [d for d in ds if d <= 500.0]
        if ds:
            brute[a] = (len(ds), round(min(ds), 3))
    assert banded == {(u, n, d) for u, (n, d) in brute.items()}


def test_pagerank_hand_graph(spark):
    """Two unrolled iterations on a hand-computable 3-node graph."""
    # a->b (w2), a->c (w1), b->c (w1): hand-roll the recurrence
    edges = {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}
    nodes = ["a", "b", "c"]
    outw = {"a": 3, "b": 1}
    pr = {x: 1 / 3 for x in nodes}
    for _ in range(2):
        nxt = {}
        for nd in nodes:
            mass = sum(
                pr[s] * w / outw[s] for (s, d), w in edges.items() if d == nd
            )
            nxt[nd] = round(0.15 / 3 + 0.85 * mass, 9)
        pr = nxt
    edf = spark.createDataFrame(
        [(s, d, w) for (s, d), w in edges.items()], "src string, dst string, w long"
    )
    # drive the same fixpoint the query runs, on the synthetic edges
    nodes_df = (
        edf.select(F.col("src").alias("node")).union(edf.select("dst")).distinct()
    )
    n_row = nodes_df.agg(F.count(F.lit(1)).alias("n"))
    outw_df = edf.groupBy("src").agg(F.sum("w").alias("ow"))
    ew = edf.join(F.broadcast(outw_df), "src")
    cur = nodes_df.join(F.broadcast(n_row)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("pr")
    )
    for _ in range(2):
        contrib = (
            ew.join(F.broadcast(cur), F.col("src") == F.col("node"))
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("w") / F.col("ow")).alias("mass"))
        )
        cur = (
            nodes_df.join(F.broadcast(n_row))
            .join(contrib, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                F.round(
                    0.15 / F.col("n") + 0.85 * F.coalesce("mass", F.lit(0.0)), 9
                ).alias("pr"),
            )
        )
    got = {r["node"]: r["pr"] for r in cur.collect()}
    assert got == pytest.approx(pr, abs=1e-9)


def test_pq_codes_are_bruteforce_argmin(spark, sf_dir):
    from lambda_arc_events_filter_spark.registry import specs

    out = {
        r["vec_id"]: (r["pq_code"], r["recon_error"])
        for r in specs()["embedding_pq_assign"].fn(spark, sf_dir).collect()
    }
    embs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    cents = {c: embs[c] for c in range(4)}
    rng = random.Random(0)
    for vid in rng.sample(sorted(embs), min(25, len(embs))):
        v = embs[vid]
        code, err = 0, 0.0
        for s in range(4):
            best = None
            for c in range(4):
                d = round(
                    sum(
                        (v[s * 16 + k] - cents[c][s * 16 + k]) ** 2
                        for k in range(16)
                    ),
                    6,
                )
                if best is None or (d, c) < best:
                    best = (d, c)
            code = code * 4 + best[1]
            err += best[0]
        assert out[vid] == (code, pytest.approx(round(err, 6), abs=1e-6)), vid


def test_logrank_identical_cohorts_chi2_zero(spark):
    """Same durations in both cohorts → observed == expected, χ² = 0."""
    from lambda_arc_events_filter_spark.functions.rank import global_order_stats

    rows = []
    for g in (0, 1):
        for t, conv in [(1, True), (2, True), (3, False), (5, True)]:
            rows.append((g, t, conv))
    df = spark.createDataFrame(rows, "g long, t long, conv boolean")
    one = F.lit(1)
    per_t = df.groupBy("t").agg(
        F.sum(F.when((F.col("g") == 1) & F.col("conv"), one).otherwise(0)).alias("d1"),
        F.sum(F.when(F.col("g") == 1, one).otherwise(0)).alias("x1"),
        F.sum(F.when((F.col("g") == 0) & F.col("conv"), one).otherwise(0)).alias("d0"),
        F.sum(F.when(F.col("g") == 0, one).otherwise(0)).alias("x0"),
    )
    risk = global_order_stats(
        per_t, [("t", "desc")], running={"n1": ("x1", "sum"), "n0": ("x0", "sum")},
        key=["t"],
    )
    n = F.col("n1") + F.col("n0")
    d = F.col("d1") + F.col("d0")
    e1 = d * 1.0 * F.col("n1") / n
    r = (
        risk.filter(d > 0)
        .agg(
            F.sum("d1").alias("o1"),
            F.sum(e1).alias("e1"),
        )
        .collect()[0]
    )
    assert r["o1"] == pytest.approx(r["e1"], abs=1e-12)


def test_radius_join_plans_hash_not_nested_loop(spark, sf_dir):
    """The whole point of latitude banding: the radius predicate must ride
    an equi-join on the band key, never a BroadcastNestedLoopJoin."""
    from lambda_arc_events_filter_spark.plans import inspect as I
    from lambda_arc_events_filter_spark.registry import specs

    df = specs()["users_geo_radius_join"].fn(spark, sf_dir)
    assert not I.uses_nested_loop_join(df), I.formatted_plan(df)[:2000]


def test_bm25_and_skew_audit_plan_take_ordered(spark, sf_dir):
    from lambda_arc_events_filter_spark.plans import inspect as I
    from lambda_arc_events_filter_spark.registry import specs

    for name in ("text_bm25_search", "events_key_skew_audit", "text_rake_keyphrases"):
        df = specs()[name].fn(spark, sf_dir)
        assert I.uses_take_ordered(df), f"{name} must plan TakeOrderedAndProject"


def test_pagerank_broadcasts_rank_vector(spark, sf_dir):
    """Iterations must broadcast the |nodes| rank vector, never shuffle
    the edge relation by rank."""
    from lambda_arc_events_filter_spark.plans import inspect as I
    from lambda_arc_events_filter_spark.registry import specs

    df = specs()["nations_trade_pagerank"].fn(spark, sf_dir)
    assert I.uses_broadcast_join(df)
    assert not I.has_python_in_plan(df)


def test_pq_assign_is_map_only_over_corpus(spark, sf_dir):
    """PQ encode: broadcast codebook + in-row argmin — the corpus must
    not exchange at all (scan → project → output)."""
    from lambda_arc_events_filter_spark.plans import inspect as I
    from lambda_arc_events_filter_spark.registry import specs

    df = specs()["embedding_pq_assign"].fn(spark, sf_dir)
    plan = I.formatted_plan(df)
    # the only exchange allowed is the 1-row codebook broadcast
    assert "Exchange hashpartitioning" not in plan, plan[:2000]
    assert "Exchange rangepartitioning" not in plan, plan[:2000]


def test_dbscan_reference_replay(spark, sf_dir):
    """DBSCAN roles and clusters must match a direct Python replay:
    quadratic haversine, degree>=3 cores, union-find over core-core
    pairs with min-id labels, border = min core-neighbor cluster."""
    import math

    from lambda_arc_events_filter_spark.registry import specs

    out = specs()["users_geo_dbscan_clusters"].fn(spark, sf_dir).collect()
    got = {r["user_id"]: (r["role"], r["cluster_id"]) for r in out}
    users = sorted(got)
    pts = {
        u: (
            ((u * 2654435761) % 16000) / 100.0 - 80.0,
            ((u * 40503) % 36000) / 100.0 - 180.0,
        )
        for u in users
    }

    def hav(a, b):
        la, lo = pts[a]
        lb, lo2 = pts[b]
        arg = min(
            1.0,
            math.sin(math.radians(lb - la) / 2) ** 2
            + math.cos(math.radians(la))
            * math.cos(math.radians(lb))
            * math.sin(math.radians(lo2 - lo) / 2) ** 2,
        )
        return round(2 * 6371.0 * math.asin(math.sqrt(arg)), 3)

    nbr = {u: [] for u in users}
    for i, ua in enumerate(users):
        for ub in users[i + 1:]:
            if hav(ua, ub) <= 200.0:
                nbr[ua].append(ub)
                nbr[ub].append(ua)
    core = {u for u in users if len(nbr[u]) >= 3}
    parent = {u: u for u in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u in core:
        for v in nbr[u]:
            if v in core:
                ra, rb = find(u), find(v)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for u in core:
        comp.setdefault(find(u), []).append(u)
    label = {u: min(comp[find(u)]) for u in core}
    for u in users:
        role, cid = got[u]
        if u in core:
            assert role == "core" and cid == label[u], u
        else:
            cores_near = sorted(label[v] for v in nbr[u] if v in core)
            if cores_near:
                assert role == "border" and cid == cores_near[0], u
            else:
                assert role == "noise" and cid is None, u
