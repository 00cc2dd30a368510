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


def unit_vector_expr(a: str) -> Column:
    """x / ‖x‖₂ as double array.  Computing unit vectors ONCE per vector
    turns every pairwise cosine into a plain dot product — without this,
    a top-k scorer recomputes both norms per PAIR (3× the HOF work;
    observed ~2× wall-clock on brute-force top-k)."""
    return F.expr(
        f"transform({a}, x -> cast(x as double) /"
        f" sqrt(aggregate(transform({a}, y -> cast(y as double) *"
        f" cast(y as double)), 0D, (s, v) -> s + v)))"
    )


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
        F.col(id_col).alias("query_id"),
        unit_vector_expr(vec_col).alias("q_vec"),
    )
    par = corpus.sparkSession.sparkContext.defaultParallelism
    c = corpus.repartition(par).select(
        F.col(id_col).alias("neighbor_id"),
        unit_vector_expr(vec_col).alias("c_vec"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", F.round(dot_expr("q_vec", "c_vec"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def cosine_pairs_exact(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, exact all-pairs.

    Unit vectors precomputed per side; the quadratic pair space makes this
    the small-corpus / verification tool — the scale path is
    ``cosine_pairs_rp_lsh`` below (same output contract).
    Output: (id_a, id_b, cosine) with id_a < id_b, cosine rounded to 6.
    """
    par = corpus.sparkSession.sparkContext.defaultParallelism
    u = corpus.repartition(par).select(
        F.col(id_col).alias("_id"), unit_vector_expr(vec_col).alias("_u")
    )
    a = u.select(F.col("_id").alias("id_a"), F.col("_u").alias("u_a"))
    b = u.select(F.col("_id").alias("id_b"), F.col("_u").alias("u_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(dot_expr("u_a", "u_b"), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _rp_hyperplanes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    import random

    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def cosine_pairs_rp_lsh(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 24,
    rows: int = 3,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via random-hyperplane (SimHash-style)
    LSH, exact-verified — the 100 TB path for what cosine_pairs_exact does
    quadratically.

    Signature bit = sign(⟨x, h⟩) for b·r fixed Gaussian hyperplanes; two
    vectors at angle θ agree per bit with p = 1 − θ/π, amplified by r-bit
    bands.  Candidates = bucket equi-join on (band, band-bits); each
    candidate is re-scored exactly, so precision is 1.0 and only recall is
    approximate (tests measure it against the exact operator).
    """
    planes = _rp_hyperplanes(bands * rows, dim, seed)
    plane_arr = (
        "array("
        + ",".join(
            "array(" + ",".join(f"{c}D" for c in p) + ")" for p in planes
        )
        + ")"
    )
    par = corpus.sparkSession.sparkContext.defaultParallelism
    sig = corpus.repartition(par).select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.expr(
            f"transform({plane_arr}, h -> cast(aggregate(zip_with(_v, h,"
            f" (x, w) -> cast(x as double) * w), 0D, (s, t) -> s + t) > 0D"
            f" as int))"
        ).alias("_bits"),
    )
    # band key = xxhash64 of the sliced bit run — an 8-byte integer key
    # instead of per-bit string casts + concat (the same replaced-for-cost
    # idiom dedup.shingle_postings documents).  A hash collision can only
    # MERGE buckets, i.e. add candidates that the exact re-score below
    # filters — recall is unaffected.
    banded = sig.select(
        "_id",
        "_v",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> struct(b as band,"
                f" xxhash64(slice(_bits, b * {rows} + 1, {rows})) as bits))"
            )
        ).alias("bb"),
    ).select("_id", "_v", "bb.band", "bb.bits")
    cand = (
        banded.select(F.col("_id").alias("id_a"), "band", "bits")
        .join(
            banded.select(F.col("_id").alias("id_b"), "band", "bits"),
            ["band", "bits"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    units = corpus.select(
        F.col(id_col).alias("_id"), unit_vector_expr(vec_col).alias("_u")
    )
    return (
        cand.join(
            units.select(F.col("_id").alias("id_a"), F.col("_u").alias("u_a")),
            "id_a",
        )
        .join(
            units.select(F.col("_id").alias("id_b"), F.col("_u").alias("u_b")),
            "id_b",
        )
        .withColumn("cosine", F.round(dot_expr("u_a", "u_b"), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
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
        F.round(F.avg(F.col("v").cast("double")), 6).alias("m")
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


# Session-lifetime IVF index cache: cache_key → (centroids, unit corpus).
# Keyed by Spark applicationId so stale DataFrames from a dead session are
# never served.  Bounded FIFO (cache.bounded_put) so a long-lived session
# over many corpora cannot grow driver references without limit.
_IVF_CACHE: dict[tuple, tuple[DataFrame, DataFrame]] = {}
_IVF_CACHE_MAX = 8


def corpus_units(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """The probe-side corpus layout: (neighbor_id, cell, unit vector),
    partitioned by cell — the shape every IVF consumer scores against."""
    return (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(label_col).alias("cell"),
            unit_vector_expr(vec_col).alias("c_unit"),
        )
        .repartition("cell")
    )


def ivf_cell_stats(
    corpus: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-(cell, position) sufficient statistics (component sum, count) —
    the incrementally-maintainable form of the centroid table.  Persist
    THESE, not the derived means: rounded centroids cannot absorb an
    append (the rounding error re-scales by the old count), while (s, n)
    merge associatively with any number of deltas and re-derive the same
    rounded means a full rebuild produces."""
    return (
        corpus.select(label_col, F.posexplode(vec_col).alias("pos", "v"))
        .groupBy(label_col, "pos")
        .agg(
            F.sum(F.col("v").cast("double")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def ivf_refresh_append(
    snapshot_stats: DataFrame,
    snapshot_units: DataFrame,
    delta: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> tuple[DataFrame, DataFrame]:
    """Fold an appended delta into a persisted IVF index WITHOUT
    rescanning the snapshot: stats-merge (union + re-aggregate over the
    tiny (cell, pos) relation) re-derives the centroids, and the delta's
    unit vectors append to the cell-partitioned corpus as new partitions
    — the snapshot side is never read, moved, or rewritten.  A delta
    introducing a brand-new cell just appears in the merged relations.
    Equivalence to a one-shot full rebuild is the operator's contract
    (oracle-checked by ``ann_ivf_incremental_refresh``)."""
    merged = (
        snapshot_stats.unionByName(ivf_cell_stats(delta, vec_col, label_col))
        .groupBy(label_col, "pos")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
    )
    cents = (
        merged.withColumn("m", F.round(F.col("s") / F.col("n"), 6))
        .groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(
            F.col(label_col).alias("cell"),
            F.expr("transform(pm, x -> x.m)").alias("centroid"),
        )
        .coalesce(1)
    )
    units = snapshot_units.unionByName(
        corpus_units(delta, id_col, vec_col, label_col)
    )
    return cents, units


def ivf_build_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    cache_key: tuple | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Build the IVF index ONCE: (tiny centroid table, corpus with
    precomputed unit vectors partitioned by cell), both materialized via
    localCheckpoint.

    Index build and probe are separate phases by design: at 100 TB the
    build is its own job writing parquet bucketed by cell (so a probe is a
    partition-pruned scan), and queries must not pay a full-corpus pass —
    round 1 rebuilt centroids inside every query execution, making the
    "approximate" path slower than brute force (1.29 s vs 0.46 s at
    sf0.1).  localCheckpoint is the local stand-in for the persisted
    artifact.  Pass ``cache_key`` to reuse the index across queries within
    a session.
    """
    if cache_key is not None:
        hit = _IVF_CACHE.get(cache_key)
        if hit is not None:
            return hit
    cents = label_centroids(corpus, label_col, vec_col).coalesce(1).localCheckpoint()
    units = corpus_units(corpus, id_col, vec_col, label_col).localCheckpoint()
    idx = (cents, units)
    if cache_key is not None:
        from lambda_arc_events_filter_spark.cache import (
            bless_resident,
            bounded_put,
            release_plans_for,
        )

        # session-resident index: consumers' prepared plans may pin it
        # (registry plan-cache blessing protocol)
        bless_resident(cents)
        bless_resident(units)
        bounded_put(
            _IVF_CACHE, cache_key, idx, _IVF_CACHE_MAX,
            on_evict=release_plans_for,
        )
    return idx


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame | None = None,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    index: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: probe only the ``nprobe`` cells whose
    centroids are nearest the query, then exact-score within those cells.

    Probe-only: takes a prebuilt ``index`` from :func:`ivf_build_index`
    (or builds one uncached from ``corpus`` as a convenience).  The probe
    touches the broadcast centroid table plus the probed cells' partitions
    of the materialized unit corpus — scoring cost × (nprobe/ncells) vs
    brute force, and no per-query HOF work on the corpus side at all.
    Approximate because the true neighbor may live in an unprobed cell
    (tests measure recall against brute_force_topk).
    """
    if index is None:
        if corpus is None:
            raise ValueError("ivf_topk needs either a corpus or a prebuilt index")
        index = ivf_build_index(corpus, id_col, vec_col, label_col)
    cents, units = index
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        unit_vector_expr(vec_col).alias("q_unit"),
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("cdist").desc(), F.col("cell")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("cdist", F.round(cosine_expr("q_vec", "centroid"), 6))
        .withColumn("prank", F.row_number().over(probe_w))
        .filter(F.col("prank") <= nprobe)
        .select("query_id", "q_unit", "cell")
    )
    scored = (
        units.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", F.round(dot_expr("q_unit", "c_unit"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


# --------------------------------------------------------------------------
# IVF-PQ: PQ-coded residuals probed per IVF cell with ADC scoring, exact
# re-rank of the shortlist — the composition FAISS-style billion-scale ANN
# serving uses (Jégou et al., "Product Quantization for Nearest Neighbor
# Search", TPAMI 2011 — public).
# --------------------------------------------------------------------------

_IVFPQ_SUBS = 4  # subspaces (embeddings are 64-wide → 4 × 16)
_IVFPQ_SUBDIM = 16
_IVFPQ_CODES = 16  # codes per subspace (deterministic fixture codebook)
_IVFPQ_SCALE = 1_000_000  # 6-decimal fixed point for ADC distance terms

_IVFPQ_CACHE: dict[tuple, tuple] = {}


def _sq_sub(vec: str, s: int) -> str:
    """SQL slice of subspace ``s`` from double-array ``vec``."""
    return f"slice({vec}, {s * _IVFPQ_SUBDIM + 1}, {_IVFPQ_SUBDIM})"


def _scaled_sqdist(a: str, b: str) -> str:
    """‖a−b‖² rounded to 6 decimals THEN scaled to an exact bigint — ADC
    sums integers so the 4-term addition is order-free on both engines
    (a double sum of rounded terms can differ in the last bit between
    engines and flip a shortlist tie)."""
    return (
        f"cast(round(round(aggregate(zip_with({a}, {b},"
        " (x, y) -> (x - y) * (x - y)), 0D, (acc, e) -> acc + e), 6)"
        f" * {_IVFPQ_SCALE}, 0) as bigint)"
    )


def ivfpq_build_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    cache_key: tuple | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Build the IVF-PQ index ONCE: (centroids, unit corpus, PQ residual
    codebook row, PQ-coded corpus partitioned by cell).

    Residuals (vector − own-cell centroid) are what PQ encodes — the
    residual distribution is far tighter than the raw vectors, which is
    why IVF-PQ composes instead of PQ alone.  The codebook is the
    deterministic fixture convention (residual slices of the first
    ``_IVFPQ_CODES`` ids, as ``embedding_pq_assign``/k-means seeding);
    it broadcasts as ONE row of per-subspace (code, slice) arrays sorted
    by code so probes can index LUTs positionally.  The coded corpus
    carries only (cell, id, 4 int codes) — the 32×-compressed form that
    is the entire point at 100 TB: the probe never touches full vectors
    until the exact re-rank of the shortlist."""
    if cache_key is not None:
        hit = _IVFPQ_CACHE.get(cache_key)
        if hit is not None:
            return hit
    cents = (
        label_centroids(corpus, label_col, vec_col).coalesce(1).localCheckpoint()
    )
    units = corpus_units(corpus, id_col, vec_col, label_col).localCheckpoint()
    resid = (
        corpus.select(
            F.col(id_col).alias("_rid"),
            F.col(label_col).alias("cell"),
            F.col(vec_col).alias("_v"),
        )
        .join(F.broadcast(cents), "cell")
        .withColumn(
            "_r",
            F.expr(
                "zip_with(transform(_v, x -> cast(x as double)), centroid,"
                " (x, c) -> x - c)"
            ),
        )
    )
    cb = (
        resid.filter(F.col("_rid") < _IVFPQ_CODES)
        .select(
            F.col("_rid").cast("int").alias("code"),
            *[F.expr(_sq_sub("_r", s)).alias(f"s{s}") for s in range(_IVFPQ_SUBS)],
        )
        .agg(
            *[
                F.expr(f"array_sort(collect_list(struct(code, s{s})))").alias(
                    f"cb{s}"
                )
                for s in range(_IVFPQ_SUBS)
            ]
        )
        .coalesce(1)
        .localCheckpoint()
    )
    code_cols = [
        F.expr(
            f"array_min(transform(cb{s}, c -> named_struct("
            f"'d', {_scaled_sqdist(_sq_sub('_r', s), f'c.s{s}')},"
            " 'code', c.code))).code"
        ).alias(f"code{s}")
        for s in range(_IVFPQ_SUBS)
    ]
    coded = (
        resid.crossJoin(F.broadcast(cb))
        .select(F.col("_rid").alias("neighbor_id"), "cell", *code_cols)
        .repartition("cell")
        .localCheckpoint()
    )
    idx = (cents, units, cb, coded)
    if cache_key is not None:
        from lambda_arc_events_filter_spark.cache import (
            bless_resident,
            bounded_put,
            release_plans_for,
        )

        for df in idx:
            bless_resident(df)
        bounded_put(
            _IVFPQ_CACHE, cache_key, idx, _IVF_CACHE_MAX,
            on_evict=release_plans_for,
        )
    return idx


def ivfpq_probes(
    queries: DataFrame,
    cents: DataFrame,
    cb: DataFrame,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The probe relation of :func:`ivfpq_topk`: per (query, probed
    cell), the query's unit vector plus the per-subspace ADC lookup
    tables (scaled-integer squared distances of the query RESIDUAL
    against each codebook entry).  Exposed separately so
    tools/scale_probe.py measures the operator's own candidate
    derivation instead of re-implementing it (the r12 ADVICE
    non-circularity discipline)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        unit_vector_expr(vec_col).alias("q_unit"),
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("cdist").desc(), F.col("cell")
    )
    lut_cols = [
        F.expr(
            f"transform(cb{s}, c -> {_scaled_sqdist(_sq_sub('_qr', s), f'c.s{s}')})"
        ).alias(f"lut{s}")
        for s in range(_IVFPQ_SUBS)
    ]
    return (
        q.crossJoin(F.broadcast(cents))
        .withColumn("cdist", F.round(cosine_expr("q_vec", "centroid"), 6))
        .withColumn("prank", F.row_number().over(probe_w))
        .filter(F.col("prank") <= nprobe)
        .withColumn(
            "_qr",
            F.expr(
                "zip_with(transform(q_vec, x -> cast(x as double)), centroid,"
                " (x, c) -> x - c)"
            ),
        )
        .crossJoin(F.broadcast(cb))
        .select("query_id", "q_unit", "cell", *lut_cols)
    )


def ivfpq_topk(
    queries: DataFrame,
    index: tuple[DataFrame, DataFrame, DataFrame, DataFrame],
    k: int = 5,
    nprobe: int = 2,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ probe with ADC scoring and exact re-rank.

    Per query: pick the ``nprobe`` nearest cells by centroid cosine,
    compute the query residual against EACH probed cell's centroid, and
    build a per-subspace lookup table of scaled-integer squared
    distances to the 16 codebook entries (4×16 bigints per (query,
    cell) — under a kilobyte).  The probed cells' CODED rows then score with
    4 positional array lookups + integer adds in codegen — no vector
    math on the corpus side at all (that is ADC).  The ``shortlist``
    best ADC candidates per query re-rank by exact cosine against the
    unit corpus, and the top ``k`` emit.

    Scale shape: probes (queries × nprobe × LUTs) broadcast; the coded
    corpus is cell-partitioned so the probe join is a broadcast-hash
    join touching only probed partitions; the only window ranks the
    per-query candidate stream; the exact re-rank joins a broadcast
    shortlist (queries × shortlist rows) against the unit corpus on
    (cell, neighbor_id).  No corpus shuffle anywhere in the probe path."""
    cents, units, cb, coded = index
    probes = ivfpq_probes(queries, cents, cb, nprobe, id_col, vec_col)
    adc_int = sum(
        F.element_at(f"lut{s}", F.col(f"code{s}") + 1)
        for s in range(_IVFPQ_SUBS)
    )
    sw = Window.partitionBy("query_id").orderBy(
        F.col("adc_int").asc(), F.col("neighbor_id")
    )
    short = (
        coded.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("adc_int", adc_int)
        .withColumn("srank", F.row_number().over(sw))
        .filter(F.col("srank") <= shortlist)
        .select("query_id", "q_unit", "cell", "neighbor_id", "adc_int")
    )
    rw = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        units.join(F.broadcast(short), ["cell", "neighbor_id"])
        .withColumn("score", F.round(dot_expr("q_unit", "c_unit"), 6))
        .withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("adc_int") / _IVFPQ_SCALE, 6).alias("adc_dist"),
            "score",
            "rank",
        )
    )


def kmeans_lloyd(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
    materialize: bool = False,
) -> DataFrame:
    """Deterministic Lloyd k-means on DataFrames: ``iters`` rounds of
    assign-then-update from a fixed seed (the first ``k`` vectors by id),
    returning the final (id, cluster, dist) assignment.

    The iterative-algorithm pattern on Spark: each round is one broadcast
    of the k×dim centroid table (a few KB — NEVER a shuffle of the corpus)
    + a narrow in-row squared-L2 over codegen'd zip_with/aggregate, then a
    map-side-combinable (cluster, dim) mean to refresh centroids.  Corpus
    rows are touched O(iters) times and never widen; at 100 TB each round
    is a scan + one tiny aggregate, the same shape MLlib's KMeans uses.
    Centroid coordinates round to 6 decimals between rounds so every
    engine re-running the recurrence sees identical inputs (floats enter
    each round exactly representable; only the final distance carries
    last-ulp summation drift).

    Determinism: seeds are id-ordered, not sampled; argmin ties break to
    the lowest cluster id via min over (dist, cluster) structs.  The
    distance entering that comparison is ROUNDED to 6 decimals (both here
    and in the oracle's ORDER BY): differently-ordered float summation
    across engines drifts by last-ulp amounts, so an un-rounded argmin
    could flip on a near-tie; after rounding, anything within 5e-7
    becomes an EXACT tie and breaks deterministically on cluster id.
    (Caveat for production: id<k seeding is the verifiable fixture
    choice — a skewed-id corpus gets degenerate seeds; k-means‖ sampling
    is the real-world seeding.)
    """
    # The corpus is read once per round (assignment) plus once for the
    # dims refresh — O(iters) scans.  ``materialize=True`` localCheckpoints
    # the input so rounds 2..n read executor-local blocks instead of
    # re-running the parquet scan each round (the same multi-pass move the
    # dedup postings use) — worth it for many-iteration cluster runs.
    # Default FALSE because it is unsafe under the prepared-plan cache:
    # a cached plan would bake in the checkpointed RDD and repeat
    # executions would skip the corpus scan entirely (result caching —
    # see registry.register); opting in requires plan_cache=False.
    if materialize:
        emb = emb.localCheckpoint()
    # In-row argmin: the k centroids broadcast as ONE row carrying an
    # array<struct<cluster, cent>>, and each corpus row folds over it
    # with a higher-order transform + array_min (struct ordering =
    # lexicographic (d, cluster) — exactly the oracle's argmin
    # tie-break).  No k× row fanout, no groupBy shuffle per assignment:
    # an assignment round is a MAP over the corpus, and the final round
    # produces output straight off the scan.  The lambda compiles once —
    # unlike the k×dim literal-centroid expression tree this replaced in
    # r2, which cost seconds of Catalyst compile.
    argmin = (
        "array_min(transform(cs, c -> named_struct("
        "'d', round(aggregate(zip_with({v}, c.cent, (x, y) ->"
        " (cast(x as double) - y) * (cast(x as double) - y)), 0D,"
        " (s, e) -> s + e), 6),"
        " 'cluster', c.cluster)))"
    ).format(v=vec_col)
    cs_row = (
        emb.filter(F.col(id_col) < k)
        .select(
            F.col(id_col).cast("int").alias("cluster"),
            F.expr(f"transform({vec_col}, x -> cast(x as double))").alias(
                "cent"
            ),
        )
        .agg(F.collect_list(F.struct("cluster", "cent")).alias("cs"))
    )
    # Refresh reshape (r14, guide §2 — one stage fewer in the serial
    # ladder): the per-(cluster, i) means collect straight into ONE
    # global row and the k×dim → k×struct regrouping happens in-row,
    # fusing the old groupBy(cluster).collect_list step (its own
    # exchange + two ObjectHashAggregates) into the final-assembly
    # aggregate that followed it.  The refresh chain is the serial
    # gate between rounds, so each exchange removed is a whole stage
    # barrier off the critical path; the reshape runs on k×dim values
    # (scale-independent).  array_sort on struct(cluster, i, cv) orders
    # lexicographically, so each cluster's cv list comes out in i
    # order; filter() preserves that order.  Measured (interleaved
    # prepared-plan A/B, sf0.1, 14 pairs): new wins 11/14, median
    # 0.786 → 0.758 s, identical assignments; exchanges 4 → 3
    # (plans/r14/embedding_kmeans_assign_*).
    reshape = (
        "transform(array_sort(array_distinct(transform(flat,"
        " x -> x.cluster))), c -> named_struct('cluster', c, 'cent',"
        " transform(filter(srt, p -> p.cluster = c), p -> p.cv)))"
    )
    for _ in range(iters - 1):
        assigned = (
            emb.crossJoin(F.broadcast(cs_row))
            .withColumn("best", F.expr(argmin))
        )
        # centroid refresh: explode the assigned rows (cluster carried
        # in-row — no join back to a |corpus|×dim relation, which
        # shuffled ~dim× the corpus bytes per round and was the measured
        # r3 bench regression on this operator)
        cs_row = (
            assigned.select(
                F.col("best.cluster").alias("cluster"),
                F.posexplode(
                    F.expr(f"transform({vec_col}, x -> cast(x as double))")
                ).alias("i", "v"),
            )
            .groupBy("cluster", "i")
            .agg(F.round(F.avg("v"), 6).alias("cv"))
            .agg(
                F.collect_list(F.struct("cluster", "i", "cv")).alias("flat")
            )
            .select(F.expr("array_sort(flat)").alias("srt"), F.col("flat"))
            .select(F.expr(reshape).alias("cs"))
        )
    return (
        emb.crossJoin(F.broadcast(cs_row))
        .withColumn("best", F.expr(argmin))
        .select(
            id_col,
            F.col("best.cluster").alias("cluster"),
            F.col("best.d").alias("dist"),
        )
    )
