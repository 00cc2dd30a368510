"""Vector similarity search — SURVEY.md §2 B62-B63.

Vector math is expressed with Catalyst higher-order functions
(zip_with/aggregate/transform) over ``array<float>`` columns — everything
stays JVM-side and codegen'd; DuckDB ``list_*`` functions mirror the same
semantics for the oracles.

Search strategies:
- ``brute_force_topk``: exact — broadcast the (small) query set against the
  corpus; per-corpus-partition scoring, WindowGroupLimit top-k.  The right
  baseline, and still the right answer when |queries| is small.
- ``ivf_topk``: IVF-style approximate — k-means-like cells (here: the
  fixture's label column or computed centroids), probe the nprobe nearest
  cells only.  Search cost drops by ncells/nprobe; the 100 TB path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def dot_expr(a: str, b: str) -> Column:
    """⟨a,b⟩ in double precision, left-to-right accumulation (bit-stable
    and identical to DuckDB's list ordering)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) *"
        f" cast(y as double)), 0D, (s, v) -> s + v)"
    )


def norm_expr(a: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate(transform({a}, x -> cast(x as double) *"
            f" cast(x as double)), 0D, (s, v) -> s + v)"
        )
    )


def cosine_expr(a: str, b: str) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (self excluded).  Query side is broadcast — the corpus (the
    100 TB side) is never shuffled; scoring is map-side, then a
    WindowGroupLimit keeps k rows per query per partition before the final
    per-query sort."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", F.round(cosine_expr("q_vec", "c_vec"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def label_centroids(
    corpus: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cell centroid = element-wise mean vector.

    posexplode → (cell, position) mean → rebuild ordered array.  Two
    map-side-combinable aggregations; output is ncells rows (tiny) and is
    broadcast by every consumer.
    """
    exploded = corpus.select(
        label_col, F.posexplode(vec_col).alias("pos", "v")
    )
    by_pos = exploded.groupBy(label_col, "pos").agg(
        F.avg(F.col("v").cast("double")).alias("m")
    )
    return (
        by_pos.groupBy(label_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
        )
        .select(
            F.col(label_col).alias("cell"),
            F.expr("transform(pm, x -> x.m)").alias("centroid"),
        )
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """IVF-style approximate top-k: probe only the ``nprobe`` cells whose
    centroids are nearest the query, then exact-score within those cells.

    vs brute force: scoring cost × (nprobe/ncells); the corpus side is
    pre-partitioned by cell, so each probe is a partition-pruned scan at
    scale.  Approximate because the true neighbor may live in an unprobed
    cell (tests measure recall against brute_force_topk).
    """
    cents = label_centroids(corpus, label_col, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("cdist").desc(), F.col("cell")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("cdist", F.round(cosine_expr("q_vec", "centroid"), 6))
        .withColumn("prank", F.row_number().over(probe_w))
        .filter(F.col("prank") <= nprobe)
        .select("query_id", "q_vec", "cell")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col(label_col).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", F.round(cosine_expr("q_vec", "c_vec"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
