"""Constructed-case pin for the round-12 ADVICE Bradley-Terry item: a
corpus containing a ZERO-WIN QUALIFIED brand (its only win is against a
non-qualified brand, so the qual×qual filter strips it) is built
explicitly and run through BOTH the Spark query and its DuckDB oracle.
Before the r13 fix, the inner join on `wins` dropped such a brand from
the p2/p3 MM updates and the report; now both engines left-join wins and
carry it at p = 0."""

from __future__ import annotations

import duckdb
import pandas as pd

from lambda_arc_events_filter_spark.registry import specs
from lambda_arc_events_filter_spark.testing import rowset


def _oracle_rows(tmp_path, tables, name):
    con = duckdb.connect()
    for table in tables:
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{table}.parquet')"
        )
    rel = con.sql(specs()[name].oracle)
    return rel.columns, rel.fetchall()


def _spark_rows(spark, tmp_path, name):
    df = specs()[name].fn(spark, str(tmp_path))
    return df.columns, [tuple(r) for r in df.collect()]


def test_bradley_terry_zero_win_brand_parity(spark, tmp_path):
    """Games: A beats B, B beats D, C beats A, A beats C.
    winners={A,B,C}, losers={A,B,C,D} → qual={A,B,C}; D is filtered, and
    with it brand B's only win — B is qualified with ZERO post-filter
    wins.  Both engines must report B at wins=0, strength=0 (the MM
    numerator is 0 every round; the denominator stays positive because
    B's only opponent A has a round-1 rating > 0)."""
    brands = {1: "Brand#A", 2: "Brand#B", 3: "Brand#C", 4: "Brand#D"}
    part = pd.DataFrame(
        {
            "p_partkey": list(brands),
            "p_name": [f"part {k}" for k in brands],
            "p_brand": list(brands.values()),
            "p_type": "STANDARD",
            "p_size": pd.array([1] * len(brands), dtype="int32"),
            "p_retailprice": 1.0,
        }
    )
    # (orderkey, [(linenumber, partkey, qty)]): higher qty wins the pair
    orders = [
        (1, [(1, 1, 10.0), (2, 2, 5.0)]),  # A beats B
        (2, [(1, 2, 10.0), (2, 4, 5.0)]),  # B beats D (only win of B)
        (3, [(1, 3, 10.0), (2, 1, 5.0)]),  # C beats A
        (4, [(1, 1, 10.0), (2, 3, 5.0)]),  # A beats C
    ]
    rows = [
        (ok, pk, pk, ln, qty, 1.0, 0.0, 0.0, "N", "O",
         pd.Timestamp("2024-01-01"))
        for ok, lines in orders
        for ln, pk, qty in lines
    ]
    li = pd.DataFrame(
        rows,
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    )
    li["l_linenumber"] = li["l_linenumber"].astype("int32")
    part.to_parquet(str(tmp_path / "part.parquet"))
    li.to_parquet(str(tmp_path / "lineitem.parquet"))

    scols, srows = _spark_rows(spark, tmp_path, "parts_bradley_terry_strength")
    dcols, drows = _oracle_rows(
        tmp_path, ["lineitem", "part"], "parts_bradley_terry_strength"
    )
    by_brand = {dict(zip(scols, r))["brand"]: dict(zip(scols, r))
                for r in srows}
    # all three qualified brands present — B not dropped
    assert set(by_brand) == {"Brand#A", "Brand#B", "Brand#C"}
    b = by_brand["Brand#B"]
    assert b["wins"] == 0 and b["games"] == 1 and b["strength"] == 0.0
    # replay the three MM rounds by hand: c2 = {(A,B):1, (C,A):1, (A,C):1}
    wins = {"Brand#A": 2, "Brand#B": 0, "Brand#C": 1}
    games = {"Brand#A": 3, "Brand#B": 1, "Brand#C": 2}
    opp = {
        "Brand#A": {"Brand#B": 1, "Brand#C": 2},
        "Brand#B": {"Brand#A": 1},
        "Brand#C": {"Brand#A": 2},
    }
    p = {i: round(wins[i] * 2.0 / games[i], 9) for i in opp}
    for _ in range(2):
        p = {
            i: round(
                wins[i] / sum(k / (p[i] + p[j]) for j, k in opp[i].items()), 9
            )
            for i in opp
        }
    mean_p = sum(p.values()) / len(p)
    for brand, d in by_brand.items():
        assert d["wins"] == wins[brand] and d["games"] == games[brand]
        assert abs(d["strength"] - round(p[brand] / mean_p, 6)) < 2e-6, brand
    assert rowset(scols, srows) == rowset(dcols, drows)


def test_stream_dedup_exact_substring_arrival_order(spark, tmp_path):
    """Arrival-order pin for the streaming exact-substring dedup (BB5):
    doc 0 (batch 0) and doc 5 (batch 1) share a 20-token run found
    nowhere else — streaming emits ONCE, append-only, so doc 0 (nothing
    earlier holds the run) has no spans while doc 5 (the index absorbed
    doc 0's digests) is marked; doc 10 (batch 2) is marked against a
    SNAPSHOT doc's run; docs 15 and 30 (both batch 0) share a run and
    mark each other within-batch.  Dual-engine: the DuckDB oracle's
    RANGE-window arrival encoding must reproduce the identical rows."""
    import pandas as pd

    run1 = " ".join(f"r{i}" for i in range(20))
    run2 = " ".join(f"s{i}" for i in range(15))
    run3 = " ".join(f"t{i}" for i in range(15))

    def doc(did, shared):
        filler = " ".join(f"u{did}x{j}" for j in range(16))
        return (did, f"{filler} {shared}" if shared else filler)

    rows = [
        doc(0, run1),   # delta batch 0: first holder of run1
        doc(5, run1),   # delta batch 1: run1 now in the index
        doc(1, run2),   # snapshot holder of run2
        doc(10, run2),  # delta batch 2: marked vs snapshot
        doc(15, run3),  # delta batch 0 ─┐ same batch: window marks
        doc(30, run3),  # delta batch 0 ─┘ both symmetric
        doc(20, None),  # delta batch 1: clean, no spans
        doc(2, None),   # snapshot, clean
    ]
    docs = pd.DataFrame(rows, columns=["doc_id", "text"])
    docs["lang"], docs["source"] = "en", "s"
    docs["n_chars"] = docs["text"].str.len()
    docs.to_parquet(str(tmp_path / "documents.parquet"))

    name = "stream_dedup_exact_substring"
    scols, srows = _spark_rows(spark, tmp_path, name)
    by_doc = {dict(zip(scols, r))["doc_id"]: dict(zip(scols, r))
              for r in srows}
    assert set(by_doc) == {5, 10, 15, 30}  # doc 0 NOT re-marked
    assert by_doc[5]["n_spans"] == 1 and by_doc[5]["max_span_len"] == 20
    for did in (10, 15, 30):
        assert by_doc[did]["n_spans"] == 1
        assert by_doc[did]["max_span_len"] == 15
    dcols, drows = _oracle_rows(tmp_path, ["documents"], name)
    assert rowset(scols, srows) == rowset(dcols, drows)
