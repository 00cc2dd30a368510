"""Session-cache invariants: the bounded driver-side caches behind the
corpus indexes (postings, tf/lexicon, band bounds) must be build-once per
(application, sf_dir) and FIFO-bounded — an unbounded cache is a driver
leak on a long-lived session, and a cache that misses on repeat calls
silently re-runs the index build it exists to amortize."""

from __future__ import annotations

from lambda_arc_events_filter_spark.cache import bounded_put


def test_bounded_put_evicts_oldest_insertion():
    c: dict[str, int] = {}
    for i, k in enumerate("abcd"):
        bounded_put(c, k, i, 3)
    assert list(c) == ["b", "c", "d"]
    bounded_put(c, "b", 99, 3)  # re-insert moves to newest
    assert c["b"] == 99 and len(c) == 3


def test_tf_index_and_lexicon_build_once(spark, sf_dir):
    from lambda_arc_events_filter_spark.queries import text_index as TI

    tf1 = TI.tf_index(spark, sf_dir)
    tf2 = TI.tf_index(spark, sf_dir)
    assert tf1 is tf2, "second call must serve the cached index"
    v1 = TI.vocab_stats(spark, sf_dir)
    assert TI.vocab_stats(spark, sf_dir) is v1
    t1 = TI.corpus_totals(spark, sf_dir)
    assert TI.corpus_totals(spark, sf_dir) is t1
    # the artifacts agree with each other: Σ lexicon cf == totals n_tokens
    import pyspark.sql.functions as F

    n_tokens = t1.collect()[0]["n_tokens"]
    assert v1.agg(F.sum("cf")).collect()[0][0] == n_tokens
    assert tf1.agg(F.sum("tf")).collect()[0][0] == n_tokens


def test_postings_index_build_once(spark, sf_dir):
    from lambda_arc_events_filter_spark.queries.llm_q import _postings_index

    assert _postings_index(spark, sf_dir) is _postings_index(spark, sf_dir)
