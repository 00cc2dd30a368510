"""Unit tests for the curation family: connected components semantics,
deterministic sampling, repetition metrics on constructed documents."""

from __future__ import annotations

import pyspark.sql.functions as F

from lambda_arc_events_filter_spark.operators.graph import connected_components
from lambda_arc_events_filter_spark.registry import specs


def _cc(spark, pairs):
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    out = connected_components(edges, src="src", dst="dst")
    return {r["node"]: r["label"] for r in out.collect()}


def test_cc_chain_collapses_to_min(spark):
    # 1-2, 2-3, 3-4: a diameter-3 chain — multiple propagation rounds
    labels = _cc(spark, [(1, 2), (2, 3), (3, 4)])
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1}


def test_cc_separate_components(spark):
    labels = _cc(spark, [(10, 20), (20, 11), (5, 6), (100, 7)])
    assert labels == {10: 10, 20: 10, 11: 10, 5: 5, 6: 5, 100: 7, 7: 7}


def test_cc_triangle_and_self_edge(spark):
    labels = _cc(spark, [(3, 2), (2, 1), (1, 3), (9, 9)])
    assert labels == {1: 1, 2: 1, 3: 1, 9: 9}


def test_cc_empty_edges(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert connected_components(edges, "src", "dst").count() == 0


def test_cluster_ids_are_component_minima(spark, sf_dir):
    """Every cluster_id must itself be a member of the cluster and its
    minimum — the deterministic-keeper contract."""
    out = specs()["dedup_connected_components"].fn(spark, sf_dir)
    rows = [(r["doc_id"], r["cluster_id"]) for r in out.collect()]
    by_cluster: dict[int, list[int]] = {}
    for doc, cl in rows:
        by_cluster.setdefault(cl, []).append(doc)
    for cl, members in by_cluster.items():
        assert cl == min(members)
        assert cl in members


def test_stratified_sampling_deterministic(spark, sf_dir):
    fn = specs()["corpus_sample_stratified"].fn
    a = sorted(map(tuple, fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert a == b
    # rates land near targets in aggregate (loose: small strata wobble)
    kept = {(r[0]): 0 for r in a}
    tot = dict(kept)
    for lang, _src, n_total, n_kept, _frac in a:
        tot[lang] = tot.get(lang, 0) + n_total
        kept[lang] = kept.get(lang, 0) + n_kept
    for lang, target in [("en", 0.8), ("zh", 0.5)]:
        if tot.get(lang, 0) >= 50:
            assert abs(kept[lang] / tot[lang] - target) < 0.25


def test_repetition_flags_constructed_docs(spark):
    import lambda_arc_events_filter_spark.queries.curation_q as Q

    docs = spark.createDataFrame(
        [
            # 30 distinct-ish tokens, no repeated bigram -> keep
            (1, " ".join(f"w{i}" for i in range(30))),
            # 'spam ham' repeated 15x -> dup_bigram_frac ~1, top ~0.5 -> drop
            (2, " ".join(["spam", "ham"] * 15)),
            # too short -> drop
            (3, "a b c"),
        ],
        ["doc_id", "text"],
    )
    orig = Q.load
    Q.load = lambda spark_, sf_, table: docs  # noqa: ARG005
    try:
        out = {
            r["doc_id"]: r["keep"]
            for r in Q.text_repetition_rules(spark, "ignored").collect()
        }
    finally:
        Q.load = orig
    assert out == {1: True, 2: False, 3: False}


# ---------------------------------------------------------------------------
# DSIR importance-resampling weights
# ---------------------------------------------------------------------------


def test_dsir_bigram_count_and_target_direction(spark, sf_dir):
    """Structural pins: n_bigrams = token_count - 1 per doc, and the
    DSIR direction guarantee — documents FROM the target slice ('en')
    must average a higher log importance weight than the rest, since the
    target distribution was estimated from them."""
    out = specs()["corpus_dsir_weights"].fn(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["n_tokens"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
        )
        .collect()
    }
    assert len(out) == len(docs)
    for r in out:
        assert r["n_bigrams"] == docs[r["doc_id"]] - 1
    en = [r["dsir_logweight"] for r in out if r["lang"] == "en"]
    rest = [r["dsir_logweight"] for r in out if r["lang"] != "en"]
    assert en and rest
    assert sum(en) / len(en) > sum(rest) / len(rest)


def test_dsir_weight_is_per_bucket_additive(spark, sf_dir):
    """The weight must equal sum_b c_db * log-ratio_b recomputed
    independently from the corpus bucket counts (add-1 smoothing,
    64 buckets)."""
    import math

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bg = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "if(size(split(text, ' ')) < 2, array(),"
                " transform(sequence(1, size(split(text, ' ')) - 1),"
                " i -> concat(split(text, ' ')[i-1], ' ', split(text, ' ')[i])))"
            )
        ).alias("bg"),
    ).withColumn(
        "b",
        F.expr(
            "pmod(aggregate(split(bg, ''), 0L,"
            " (a, c) -> pmod(a * 31 + ascii(c), 2147483647)), 64)"
        ),
    )
    rows = bg.groupBy("doc_id", "lang", "b").count().collect()
    r_b: dict[int, int] = {}
    t_b: dict[int, int] = {}
    for r in rows:
        r_b[r["b"]] = r_b.get(r["b"], 0) + r["count"]
        if r["lang"] == "en":
            t_b[r["b"]] = t_b.get(r["b"], 0) + r["count"]
    rr, tt = sum(r_b.values()), sum(t_b.values())
    expected: dict[int, float] = {}
    for r in rows:
        lr = (
            math.log(t_b.get(r["b"], 0) + 1)
            - math.log(tt + 64)
            - math.log(r_b[r["b"]] + 1)
            + math.log(rr + 64)
        )
        expected[r["doc_id"]] = expected.get(r["doc_id"], 0.0) + r["count"] * lr
    out = specs()["corpus_dsir_weights"].fn(spark, sf_dir).collect()
    for r in out:
        assert abs(r["dsir_logweight"] - round(expected[r["doc_id"]], 6)) < 2e-6


def test_char_entropy_matches_counter(spark, sf_dir):
    """Per-doc entropy must equal the Counter-based reference, and a
    constant-character string must score exactly 0 bits."""
    import math
    from collections import Counter

    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    out = specs()["text_char_entropy"].fn(spark, sf_dir).collect()
    assert {r["doc_id"] for r in out} == set(texts)
    for r in out:
        cnt = Counter(texts[r["doc_id"]])
        L = sum(cnt.values())
        h = (
            math.log(L) - sum(f * math.log(f) for f in cnt.values()) / L
        ) / math.log(2)
        assert r["n_chars_total"] == L
        assert r["n_distinct_chars"] == len(cnt)
        assert abs(r["char_entropy_bits"] - round(h, 6)) < 2e-6


def test_span_corruption_masks_structure(spark, sf_dir):
    """Spans must be disjoint, separated by at least one unmasked token,
    each at least 1 and at most bounded by merges; every span must cover
    every hash-selected start position, and every masked position must
    trace back to a start within 2 positions."""
    out = specs()["corpus_span_corruption_masks"].fn(spark, sf_dir).collect()
    assert out
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    texts = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }

    def rolling(s: str) -> int:
        a = 0
        for c in s:
            a = (a * 31 + ord(c)) % 2147483647
        return a

    for doc_id, spans in by_doc.items():
        spans.sort(key=lambda r: r["start_pos"])
        n = len(texts[doc_id])
        starts = {
            p for p in range(n) if rolling(f"{doc_id}:{p}") % 10 == 0
        }
        masked = set()
        prev_end = -2
        for i, s in enumerate(spans):
            assert s["span_id"] == i + 1
            assert s["span_len"] == s["end_pos"] - s["start_pos"] + 1
            assert s["start_pos"] > prev_end + 1  # disjoint, gap >= 1
            prev_end = s["end_pos"]
            assert s["end_pos"] < n
            masked.update(range(s["start_pos"], s["end_pos"] + 1))
            assert s["start_pos"] in starts  # span begins at a start
        expected = set()
        for p in starts:
            expected.update(range(p, min(p + 3, n)))
        assert masked == expected


def test_label_propagation_frozen_front_semantics(spark, sf_dir):
    """Seeds keep their brand; every labeled non-seed must have a
    neighbor labeled in an EARLIER round carrying the same label as its
    deterministic argmax; rounds are monotone (a node labeled in round r
    has no labeled neighbor before round r-1... i.e. wasn't reachable
    earlier)."""
    out = specs()["graph_label_propagation"].fn(spark, sf_dir).collect()
    assert out
    rounds = {r["p_partkey"]: r["labeled_round"] for r in out}
    labels = {r["p_partkey"]: r["label"] for r in out}
    seeds = [k for k, v in rounds.items() if v == 0]
    assert seeds and all(k % 3 == 0 for k in seeds)
    brand = {
        r["p_partkey"]: r["p_brand"]
        for r in spark.read.parquet(f"{sf_dir}/part.parquet")
        .select("p_partkey", "p_brand")
        .collect()
    }
    for k in seeds:
        assert labels[k] == brand[k]
    # labeled_round=1 nodes must touch a seed; =2 must touch a round<=1
    # labeled node and NO seed  (frozen-front: earliest reachable round)
    from lambda_arc_events_filter_spark.registry import specs as _s

    # rebuild edges the same way the query does, via its oracle parity —
    # here reuse the spark pipeline's pair construction directly
    from lambda_arc_events_filter_spark.catalog import load as _load

    li = _load(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct().collect()
    from collections import defaultdict

    basket = defaultdict(set)
    for r in op:
        basket[r["l_orderkey"]].add(r["l_partkey"])
    co = defaultdict(int)
    for parts in basket.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                co[(ps[i], ps[j])] += 1
    nbrs = defaultdict(set)
    for (x, y), c in co.items():
        if c >= 2:
            nbrs[x].add(y)
            nbrs[y].add(x)
    for k, rd in rounds.items():
        if rd is None:
            # never labeled ⇒ no neighbor was labeled in round 0 or 1
            # (such a neighbor would have labeled this node next round)
            assert not any(rounds.get(nb) in (0, 1) for nb in nbrs[k]), k
            continue
        if rd >= 1:
            prev = [nb for nb in nbrs[k] if rounds.get(nb) == rd - 1]
            assert prev, (k, rd)
            earlier = [
                nb for nb in nbrs[k]
                if rounds.get(nb) is not None and rounds[nb] < rd - 1
            ]
            assert not earlier, (k, rd)


def test_bigram_queries_survive_single_token_docs(spark, tmp_path):
    """Regression (r11 ADVICE): the bigram expr used by corpus_dsir_weights,
    text_pmi_bigrams and text_bigram_logprob built positions via
    ``sequence(1, greatest(size(tokens)-1, 0))`` — for a 1-token doc Spark's
    sequence(1, 0) is the DESCENDING [1, 0], so ``tokens[1]`` is out of
    bounds: an INVALID_ARRAY_INDEX crash under Spark 4 ANSI mode, or two
    spurious null-bucket rows with ANSI off.  The fixture corpus never has
    docs under 10 tokens, so the bug was latent; this pins the guarded
    rewrite on a corpus that DOES contain 1-token and empty-text docs."""
    import pandas as pd

    from lambda_arc_events_filter_spark.queries.corpus_stats_q import (
        text_bigram_logprob,
        text_pmi_bigrams,
    )
    from lambda_arc_events_filter_spark.queries.curation_q import (
        corpus_dsir_weights,
    )

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "word",  # 1 token: no bigrams
                "",  # split('', ' ') -> [''], also 1 element
                " ".join(["alpha beta"] * 25),
                " ".join(["beta gamma"] * 25),
            ],
            "lang": ["en", "en", "en", "fr"],
            "source": ["s"] * 4,
            "n_chars": [4, 0, 274, 274],
        }
    )
    docs.to_parquet(str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)

    dsir = corpus_dsir_weights(spark, sf).toPandas()
    # short docs contribute no bigrams => absent, and no null rows anywhere
    assert set(dsir["doc_id"]) == {3, 4}
    assert not dsir.isnull().any().any()

    pmi = text_pmi_bigrams(spark, sf).toPandas()
    assert len(pmi) > 0
    assert not pmi[["w1", "w2"]].isnull().any().any()

    lp = text_bigram_logprob(spark, sf).toPandas()
    id_col = "doc_id" if "doc_id" in lp.columns else lp.columns[0]
    assert 1 not in set(lp[id_col]) and 2 not in set(lp[id_col])


def test_sinkhorn_rebalance_marginals_converge(spark, sf_dir):
    """IPF/Sinkhorn invariants: the plan is a probability distribution;
    the COLUMN marginals hit the target bucket mixture exactly (the last
    scaling is a column projection); the ROW marginals converge toward
    uniform 1/20 (each within 20% after 3 iterations); and every resample
    weight is positive and finite."""
    df = specs()["corpus_sinkhorn_rebalance"].fn(spark, sf_dir).toPandas()
    assert len(df) == 60  # 20 sources x 3 buckets, every cell occupied
    assert abs(df["plan_share"].sum() - 1.0) < 1e-4
    col = df.groupby("bucket")["plan_share"].sum()
    for b, target in ((0, 0.25), (1, 0.35), (2, 0.40)):
        assert abs(col[b] - target) < 1e-5, (b, col[b])
    row = df.groupby("source")["plan_share"].sum()
    assert ((row - 0.05).abs() < 0.01).all(), row
    assert (df["resample_weight"] > 0).all()


def test_sft_assembly_accounting_matches_rendered_string(spark, sf_dir):
    """The token accounting must describe the ASSEMBLED artifact: for
    every conversation, whitespace-splitting the rendered template yields
    exactly total_tokens tokens, the turn count equals the <|eot|>
    marker count, loss <= total, and re-deriving the loss side from the
    rendered assistant segments reproduces loss_tokens."""
    rows = specs()["sft_conversation_assembly"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        toks = r["conversation"].split(" ")
        assert len(toks) == r["total_tokens"], r
        assert toks.count("<|eot|>") == r["n_turns"]
        assert 0 <= r["loss_tokens"] <= r["total_tokens"]
        # re-derive loss: per assistant segment, content tokens + eot
        loss = 0
        i = 0
        while i < len(toks):
            assert toks[i] in ("<|user|>", "<|assistant|>"), toks[i]
            j = toks.index("<|eot|>", i)
            if toks[i] == "<|assistant|>":
                loss += (j - i - 1) + 1  # content + eot, role header masked
            i = j + 1
        assert loss == r["loss_tokens"], r


def test_preference_pairs_invariants(spark, sf_dir):
    """DPO pair invariants: chosen dominates rejected by (value, id) with
    distinct event ids, neither side is a prompt-type event, margin is the
    rounded value gap, and every pair had >= 2 candidates and a prompt."""
    rows = specs()["events_preference_pairs"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_candidates"] >= 2 and r["n_prompt_turns"] >= 1
        assert r["chosen_event_id"] != r["rejected_event_id"]
        assert (r["chosen_value"], r["chosen_event_id"]) > (
            r["rejected_value"],
            r["rejected_event_id"],
        )
        assert r["chosen_type"] not in ("view", "click")
        assert r["rejected_type"] not in ("view", "click")
        assert abs(
            r["margin"] - round(r["chosen_value"] - r["rejected_value"], 6)
        ) < 1e-12


def test_curriculum_interleave_round_robin(spark, sf_dir):
    """Per shard: shard_pos is the permutation 1..n; walking it in order
    the (round, bucket) key strictly increases lexicographically (the
    round-robin invariant: a full cycle over buckets before the round
    advances); bucket sizes differ by at most 1 (ntile); and within a
    (shard, bucket) the round index follows the length ordering."""
    df = (
        specs()["corpus_curriculum_interleave"].fn(spark, sf_dir).toPandas()
    )
    assert len(df) > 0
    for shard, g in df.groupby("shard"):
        g = g.sort_values("shard_pos")
        assert list(g["shard_pos"]) == list(range(1, len(g) + 1))
        keys = list(zip(g["round_in_shard"], g["curriculum_bucket"]))
        assert keys == sorted(keys) and len(set(keys)) == len(keys)
        sizes = g["curriculum_bucket"].value_counts()
        assert sizes.max() - sizes.min() <= 1, (shard, dict(sizes))
        for _, gb in g.groupby("curriculum_bucket"):
            gb = gb.sort_values("round_in_shard")
            tok = list(zip(gb["n_tokens"], gb["doc_id"]))
            assert tok == sorted(tok)
