"""Constructed-case pins for the round-11 ADVICE items: each degenerate
input that could make the two engines diverge is built explicitly, run
through BOTH the Spark query and its DuckDB oracle, and the outputs
compared — so the guards live under test instead of leaning on fixture
luck."""

from __future__ import annotations

import duckdb
import pandas as pd

from lambda_arc_events_filter_spark.registry import specs
from lambda_arc_events_filter_spark.testing import rowset


def _oracle_rows(tmp_path, table, name):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM "
        f"read_parquet('{tmp_path}/{table}.parquet')"
    )
    rel = con.sql(specs()[name].oracle)
    return rel.columns, rel.fetchall()


def _spark_rows(spark, tmp_path, name):
    df = specs()[name].fn(spark, str(tmp_path))
    return df.columns, [tuple(r) for r in df.collect()]


def test_shrinkage_zero_variance_corpus_parity(spark, tmp_path):
    """ADVICE r11 #1: every part has the IDENTICAL return rate, so the
    across-part rate variance s2 is exactly 0.  Un-guarded, Spark's
    x/0 → NULL collapses the prior to the 1e-9 floor (near-raw rates)
    while IEEE engines give inf; with greatest(s2, 1e-12) both sides
    compute a HUGE finite prior — full shrink to the corpus mean."""
    rows = []
    for pk in range(1, 9):
        for ln, flag in enumerate(["R", "N", "N", "N"], start=1):
            rows.append((pk * 10, pk, pk, ln, 1.0, 1.0, 0.0, 0.0, flag,
                         "O", pd.Timestamp("2024-01-01")))
    li = pd.DataFrame(
        rows,
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    )
    li.to_parquet(str(tmp_path / "lineitem.parquet"))
    scols, srows = _spark_rows(spark, tmp_path, "parts_return_rate_shrinkage")
    dcols, drows = _oracle_rows(tmp_path, "lineitem",
                                "parts_return_rate_shrinkage")
    assert len(srows) == 8
    # full shrink: every shrunk rate is the corpus mean = raw rate = 0.25
    for r in srows:
        d = dict(zip(scols, r))
        assert d["raw_rate"] == 0.25
        assert d["shrunk_rate"] == 0.25
    assert rowset(scols, srows) == rowset(dcols, drows)


def test_bot_score_same_timestamp_user_parity(spark, tmp_path):
    """ADVICE r11 #2: a user whose ≥5 events share ONE timestamp has
    0/0 gap cv.  The clamp must read it as cv = 0 (perfect regularity →
    the e^−cv term contributes its full 0.4) on BOTH engines — not a
    NULL score on one and NaN on the other."""
    ts0 = pd.Timestamp("2024-01-01 12:00:00")
    ev = pd.DataFrame(
        {
            "event_id": list(range(6)) + list(range(10, 15)),
            "ts": [ts0] * 6
            + [pd.Timestamp("2024-01-01 12:00:00")
               + pd.Timedelta(minutes=7 * i) for i in range(5)],
            "user_id": [1] * 6 + [2] * 5,
            "event_type": ["click"] * 11,
            "value": 1.0,
            "props": "{}",
        }
    )
    ev.to_parquet(str(tmp_path / "events.parquet"))
    scols, srows = _spark_rows(spark, tmp_path, "events_bot_score_heuristics")
    dcols, drows = _oracle_rows(tmp_path, "events",
                                "events_bot_score_heuristics")
    got = {dict(zip(scols, r))["user_id"]: dict(zip(scols, r)) for r in srows}
    # user 1: all-same-ts -> cv clamped to 0, score = 0.4*e^0 = 0.4 > 0.35
    assert got[1]["iat_cv"] == 0.0
    assert got[1]["bot_score"] == 0.4
    assert got[1]["is_bot"] is True
    # user 2: metronomic 7-min gaps -> cv 0 as well (identical gaps)
    assert got[2]["iat_cv"] == 0.0
    assert rowset(scols, srows) == rowset(dcols, drows)


def test_holt_winters_short_series_empty_on_both_engines(spark, tmp_path):
    """ADVICE r11 #3: a 10-day series cannot initialize b0 (needs two
    full weeks).  Both the Spark query and the oracle must short-circuit
    to ZERO rows — previously Spark summed the empty second week to a
    numeric b0 while the oracle's CASE-sum was NULL."""
    ev = pd.DataFrame(
        {
            "event_id": range(10),
            "ts": [pd.Timestamp("2024-01-01") + pd.Timedelta(days=i)
                   for i in range(10)],
            "user_id": 1,
            "event_type": "click",
            "value": [float(i) for i in range(10)],
            "props": "{}",
        }
    )
    ev.to_parquet(str(tmp_path / "events.parquet"))
    scols, srows = _spark_rows(spark, tmp_path, "events_holt_winters_seasonal")
    dcols, drows = _oracle_rows(tmp_path, "events",
                                "events_holt_winters_seasonal")
    assert srows == []
    assert drows == []


def test_holt_winters_exactly_14_days_emits_both_engines(spark, tmp_path):
    """Boundary twin of the short-series pin: at EXACTLY 14 days the
    recurrence initializes and both engines emit the same 7 stepped
    rows (days 8-14)."""
    ev = pd.DataFrame(
        {
            "event_id": range(14),
            "ts": [pd.Timestamp("2024-01-01") + pd.Timedelta(days=i)
                   for i in range(14)],
            "user_id": 1,
            "event_type": "click",
            "value": [float((i * 7) % 13) for i in range(14)],
            "props": "{}",
        }
    )
    ev.to_parquet(str(tmp_path / "events.parquet"))
    scols, srows = _spark_rows(spark, tmp_path, "events_holt_winters_seasonal")
    dcols, drows = _oracle_rows(tmp_path, "events",
                                "events_holt_winters_seasonal")
    assert len(srows) == 7
    assert rowset(scols, srows) == rowset(dcols, drows)


def test_hybrid_rrf_matches_python_replay(spark, sf_dir):
    """retrieval_hybrid_rrf replayed with pandas/numpy by a different
    route (python BM25 loop + numpy cosine, scipy-free): identical
    top-10 ids, ranks, and round-9 fused scores."""
    import math

    import numpy as np

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = docs.assign(toks=docs.text.str.split(" "))
    n_docs = len(docs)
    lens = {r.doc_id: len(r.toks) for r in toks.itertuples()}
    avglen = sum(lens.values()) / n_docs
    terms = ("join", "filter", "scan")
    tf: dict[tuple[int, str], int] = {}
    for r in toks.itertuples():
        for w in r.toks:
            if w in terms:
                tf[(r.doc_id, w)] = tf.get((r.doc_id, w), 0) + 1
    df = {w: sum(1 for (_, ww) in tf if ww == w) for w in terms}
    bm: dict[int, float] = {}
    for (did, w), f in tf.items():
        idf = math.log((n_docs - df[w] + 0.5) / (df[w] + 0.5) + 1)
        bm[did] = bm.get(did, 0.0) + idf * (f * 2.2) / (
            f + 1.2 * (1 - 0.75 + 0.75 * lens[did] / avglen)
        )
    lex_sorted = sorted(bm.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))
    lex_rank = {did: i + 1 for i, (did, _) in enumerate(lex_sorted[:50])}

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vs = np.stack(emb.embedding.map(np.asarray))
    vs = vs / np.linalg.norm(vs, axis=1, keepdims=True)
    ids = emb.vec_id.to_numpy()
    q = vs[ids == 0][0]
    cos = {int(i): round(float(vs[k] @ q), 6)
           for k, i in enumerate(ids) if i != 0}
    sem_sorted = sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))
    sem_rank = {did: i + 1 for i, (did, _) in enumerate(sem_sorted[:50])}

    fused = {}
    for did in set(lex_rank) | set(sem_rank):
        s = (1.0 / (60 + lex_rank[did]) if did in lex_rank else 0.0) + (
            1.0 / (60 + sem_rank[did]) if did in sem_rank else 0.0
        )
        fused[did] = round(s, 9)
    top = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    got = [r.asDict() for r in
           specs()["retrieval_hybrid_rrf"].fn(spark, sf_dir).collect()]
    assert [g["doc_id"] for g in got] == [d for d, _ in top]
    for g in got:
        assert g["rrf_score"] == fused[g["doc_id"]]
        assert g["lex_rank"] == lex_rank.get(g["doc_id"])
        assert g["sem_rank"] == sem_rank.get(g["doc_id"])


def test_exact_substring_incremental_completeness(spark, sf_dir):
    """BB2 completeness (the BA3 discipline applied to exact-substring):
    the append path's spans for the delta shard must equal the one-shot
    full-corpus sweep restricted to delta docs — Spark-side, independent
    of the DuckDB oracle."""
    inc = {
        r["doc_id"]: tuple(r)[1:]
        for r in specs()["dedup_exact_substring_incremental"]
        .fn(spark, sf_dir)
        .collect()
    }
    full = {
        r["doc_id"]: tuple(r)[1:]
        for r in specs()["dedup_exact_substring"].fn(spark, sf_dir).collect()
        if r["doc_id"] % 5 == 0
    }
    assert inc == full


def test_exact_substring_incremental_constructed(spark, tmp_path):
    """Constructed append: delta doc 5 shares a 20-token run ONLY with
    snapshot doc 1; delta docs 10/15 share a 20-token run only with each
    other; delta doc 20 is unique (absent); snapshot-only dup pairs
    (docs 1/2) must NOT appear."""
    run_a = " ".join(f"a{i}" for i in range(20))
    run_b = " ".join(f"b{i}" for i in range(20))
    filler = lambda p, n: " ".join(f"{p}{i}" for i in range(n))  # noqa: E731
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 5, 10, 15, 20],
            "text": [
                run_a + " " + filler("x", 10),      # snapshot
                filler("y", 8) + " " + run_a,       # snapshot (dups w/ 1)
                filler("z", 5) + " " + run_a,       # delta: dup w/ snapshot
                run_b + " " + filler("q", 6),       # delta: dup w/ delta 15
                filler("r", 7) + " " + run_b,       # delta: dup w/ delta 10
                filler("u", 30),                    # delta: unique
            ],
            "lang": ["en"] * 6,
            "source": ["s"] * 6,
            "n_chars": [0] * 6,
        }
    )
    docs.to_parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r.asDict()
        for r in specs()["dedup_exact_substring_incremental"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert set(out) == {5, 10, 15}
    for did in (5, 10, 15):
        assert out[did]["n_spans"] == 1
        assert out[did]["dup_tokens"] == 20
        assert out[did]["max_span_len"] == 20
