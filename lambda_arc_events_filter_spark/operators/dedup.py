"""Deduplication operators — SURVEY.md §2 B60-B61 + driver mandate
(exact, MinHash+LSH, SimHash, n-gram Jaccard).

All candidate-generation math is Catalyst-native (HOFs + xxhash64): no
Python touches the data path, so whole-stage codegen applies end-to-end.

Scale design:
- shingling/minhash are per-row HOF expressions — embarrassingly parallel,
  zero shuffle;
- LSH banding turns the quadratic all-pairs problem into an equi-join on
  (band_index, band_hash) — shuffle-partitionable, skew handled by AQE;
- exact-Jaccard verification runs only on LSH candidates (or within an
  explicit blocking key for the exact variant), never all-pairs.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: Mersenne prime 2^31-1: (a·x + b) mod P stays within int64 when
#: a, b, x < P (product < 2^62).
MINHASH_P = 2_147_483_647


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("tokens", F.split(F.col(text_col), " "))


def with_shingles(df: DataFrame, n: int = 3, tokens_col: str = "tokens") -> DataFrame:
    """Distinct word n-gram shingles as an array column — pure HOF, no
    explode: ``slice`` over a position sequence, then ``array_distinct``.

    Repartitions to the cluster's parallelism FIRST: lambda HOFs are
    interpreted (not codegen'd), making shingling the CPU-heaviest narrow
    stage of every dedup pipeline — and the fixture corpus arrives as a
    single parquet row-group, which would otherwise pin it to one core.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    # guard: sequence(1, 0) in Spark is DESCENDING [1, 0], so a doc shorter
    # than n tokens must short-circuit to an empty shingle set explicitly
    expr = (
        f"if(size({tokens_col}) < {n}, array(),"
        f" array_distinct(transform(sequence(1, size({tokens_col}) - {n - 1}),"
        f" i -> concat_ws(' ', slice({tokens_col}, i, {n})))))"
    )
    return df.repartition(par).withColumn("shingles", F.expr(expr))


def minhash_params(num_hashes: int = 128, seed: int = 42) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(1, MINHASH_P), rng.randrange(0, MINHASH_P))
        for _ in range(num_hashes)
    ]


def with_minhash_signature(
    df: DataFrame,
    num_hashes: int = 128,
    seed: int = 42,
    shingles_col: str = "shingles",
    id_col: str | None = None,
) -> DataFrame:
    """128-permutation MinHash signature as ``array<bigint>``.

    sig_j = min over shingles s of (a_j · (xxhash64(s) mod P) + b_j) mod P.

    Two implementations with identical output:
    - HOF form (``id_col=None``): per-row nested transform/aggregate — no
      shuffle, but Catalyst evaluates lambda HOFs INTERPRETED, which costs
      ~10× at k=128.
    - explode+aggregate form (``id_col`` given): explode shingles, hash
      once, compute the k permutations as k codegen'd ``min()`` aggregate
      expressions, reassemble the array.  One extra (map-side-combinable)
      shuffle buys whole-stage-codegen arithmetic — ~5× faster at sf0.1
      and the form that scales (aggregation state is k longs per doc).
    """
    params = minhash_params(num_hashes, seed)
    if id_col is None:
        params_arr = (
            "array("
            + ",".join(f"struct({a}L as a, {b}L as b)" for a, b in params)
            + ")"
        )
        hashed = (
            f"transform({shingles_col}, s -> pmod(xxhash64(s), {MINHASH_P}))"
        )
        expr = (
            f"transform({params_arr}, h -> aggregate(_sh_hashed, {MINHASH_P}L,"
            f" (m, x) -> least(m, pmod(h.a * x + h.b, {MINHASH_P}))))"
        )
        return (
            df.withColumn("_sh_hashed", F.expr(hashed))
            .withColumn("minhash", F.expr(expr))
            .drop("_sh_hashed")
        )
    # group on the id only (never the wide text/shingle columns), then
    # join the signature back to the input rows
    exploded = df.select(
        F.col(id_col), F.explode(shingles_col).alias("_s")
    ).withColumn("_x", F.expr(f"pmod(xxhash64(_s), {MINHASH_P})"))
    aggs = [
        F.min(F.expr(f"pmod({a}L * _x + {b}L, {MINHASH_P})")).alias(f"_m{j}")
        for j, (a, b) in enumerate(params)
    ]
    sig_cols = [f"_m{j}" for j in range(num_hashes)]
    sig = (
        exploded.groupBy(id_col)
        .agg(*aggs)
        .withColumn("minhash", F.array(*sig_cols))
        .drop(*sig_cols)
    )
    return df.join(sig, id_col)


def lsh_band_explode(
    df: DataFrame,
    id_col: str,
    bands: int = 16,
    rows: int = 8,
    sig_col: str = "minhash",
) -> DataFrame:
    """Explode a signature into (id, band_index, band_hash) rows.

    Two documents land in the same (band_index, band_hash) bucket iff a
    whole band of their signatures agrees — the classic b·r LSH amplification
    (b=16, r=8 → ~50% recall at J≈0.78, ≈1.0 at J≥0.9).
    """
    band_expr = (
        f"transform(sequence(0, {bands - 1}), b -> struct(b as band_idx,"
        f" xxhash64(concat_ws(',', transform(slice({sig_col}, b * {rows} + 1,"
        f" {rows}), x -> cast(x as string)))) as band_hash))"
    )
    return df.select(
        F.col(id_col), F.explode(F.expr(band_expr)).alias("band")
    ).select(id_col, "band.band_idx", "band.band_hash")


def jaccard_expr(a: str, b: str) -> Column:
    """Exact Jaccard similarity of two distinct-element array columns.
    Two empty sets define J = 0 here (not NaN): empty docs are never
    near-duplicates of anything."""
    inter = F.size(F.array_intersect(F.col(a), F.col(b)))
    denom = F.size(F.col(a)) + F.size(F.col(b)) - inter
    return F.when(denom > 0, (inter / denom).cast("double")).otherwise(
        F.lit(0.0)
    )


def exact_jaccard_pairs(
    shingled: DataFrame,
    id_col: str,
    block_col: str,
    threshold: float,
) -> DataFrame:
    """Exact n-gram Jaccard pairs WITHIN a blocking key (e.g. lang), via a
    shingle INVERTED-INDEX join rather than all-pairs array intersection.

    explode shingles → self-equi-join on (shingle, block) → per-pair common
    count → jaccard from set sizes.  Only pairs sharing ≥1 shingle are ever
    materialized, so cost tracks the posting-list mass (Σ bucket²) instead
    of |block|² — the difference between 65s and 2s at sf0.1, and between
    feasible and not at 100 TB.  (The naive form scored every same-block
    pair with a 50-element array_intersect.)  Skewed hot shingles are
    AQE-split; a frequency cap on postings is the standard next lever at
    real scale.
    Output: (id_a, id_b, jaccard) with id_a < id_b.
    """
    # posting key = xxhash64(shingle): an 8-byte join key shuffles and
    # compares ~5x cheaper than the 3-word shingle strings; a 64-bit
    # collision between distinct shingles of one corpus is ~1e-9-improbable
    # (and deterministic -- the oracle gate would surface it).
    #
    # CRITICAL expression-evaluation detail: the shingles column is an
    # interpreted lambda-HOF expression, and every extra reference to it in
    # the same projection pipeline (a size() filter, an explode beside a
    # size()) re-evaluates the WHOLE expression per row after projection
    # collapse -- measured 10x (2.7s -> 0.26s at sf0.1).  So the postings
    # relation touches `shingles` exactly once, via posexplode, and per-doc
    # set sizes are re-derived FROM the postings (shingles are distinct, so
    # count == set size); empty shingle sets simply emit no postings.
    post = shingled.select(
        F.col(id_col).alias("_id"),
        F.col(block_col).alias("_blk"),
        F.posexplode("shingles").alias("_pos", "_s"),
    ).select("_id", "_blk", F.xxhash64("_s").alias("sk"))
    sizes = post.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    a = post.select(F.col("_id").alias("id_a"), "_blk", "sk")
    b = post.select(F.col("_id").alias("id_b"), "_blk", "sk")
    return (
        a.join(b, ["_blk", "sk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("c"))
        .join(
            sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("n_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("n_b")),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("c") / (F.col("n_a") + F.col("n_b") - F.col("c")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_pairs(
    shingled: DataFrame,
    id_col: str,
    threshold: float,
    num_hashes: int = 96,
    bands: int = 16,
    rows: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH, exact-verified.

    candidate generation (LSH bucket equi-join) -> distinct pairs ->
    exact-Jaccard verification >= threshold.  Output matches
    ``exact_jaccard_pairs`` whenever LSH recall covers every pair above
    threshold (P[miss] = (1-J^r)^b ~ 1e-5 at J=0.89 with b=16,r=6; tests
    verify it exactly on the fixtures).  k=96 on purpose: a 128-buffer
    aggregate exceeds spark.sql.codegen.maxFields (100) and silently drops
    the signature stage out of whole-stage codegen.

    Everything downstream derives from one single-touch postings relation
    (id, hashed shingle) — see the expression-evaluation note in
    ``exact_jaccard_pairs``; verification is an inverted-index count over
    the same postings, so Jaccard needs no shingle arrays at all past the
    explode.
    """
    params = minhash_params(num_hashes, seed)
    # single-touch postings (see exact_jaccard_pairs): posexplode is the
    # ONLY reference to the interpreted shingles HOF; per-doc set size is
    # re-derived from the postings; empty shingle sets emit no postings
    # (so no identity-signature pairing).  _h: raw 64-bit hash for the
    # verification join (collision-free in practice); _x: 31-bit reduction
    # for the permutation arithmetic.
    post = shingled.select(
        F.col(id_col).alias("_id"), F.posexplode("shingles").alias("_pos", "_s")
    ).select(
        "_id",
        F.xxhash64("_s").alias("_h"),
        F.expr(f"pmod(xxhash64(_s), {MINHASH_P})").alias("_x"),
    )
    sizes = post.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    aggs = [
        F.min(F.expr(f"pmod({a}L * _x + {b}L, {MINHASH_P})")).alias(f"_m{j}")
        for j, (a, b) in enumerate(params)
    ]
    sig_cols = [f"_m{j}" for j in range(num_hashes)]
    sig = (
        post.groupBy("_id")
        .agg(*aggs)
        .withColumn("minhash", F.array(*sig_cols))
        .select(F.col("_id").alias(id_col), "minhash")
    )
    bands_df = lsh_band_explode(sig, id_col, bands=bands, rows=rows)
    candidates = (
        bands_df.select(F.col(id_col).alias("id_a"), "band_idx", "band_hash")
        .join(
            bands_df.select(
                F.col(id_col).alias("id_b"), "band_idx", "band_hash"
            ),
            ["band_idx", "band_hash"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # exact verification from the same postings: |A ∩ B| = count of matching
    # hashed shingles per candidate pair; candidates are few, so broadcast
    # them into the postings scan
    pa = post.select(F.col("_id").alias("id_a"), "_h").join(
        F.broadcast(candidates), "id_a"
    )
    pb = post.select(F.col("_id").alias("id_b"), "_h")
    return (
        pa.join(pb, ["id_b", "_h"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("c"))
        .join(
            sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("n_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("n_b")),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("c") / (F.col("n_a") + F.col("n_b") - F.col("c")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def with_simhash(
    df: DataFrame, id_col: str, tokens_col: str = "tokens"
) -> DataFrame:
    """64-bit SimHash over term frequencies, fully columnar.

    Per (doc, token): contribution cnt·(±1) to each of 64 bit positions by
    the bits of xxhash64(token); bit k of the fingerprint is the sign of the
    summed contribution.  Implemented as explode → bit explode → two-level
    aggregate; at 100 TB the first aggregate is map-side combinable and the
    second is 64 rows per doc.
    """
    toks = (
        df.select(id_col, F.explode(F.col(tokens_col)).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("h", F.xxhash64("tok"))
    )
    bits = toks.select(
        id_col,
        F.explode(
            F.expr(
                "transform(sequence(0, 63), k -> struct(k as k,"
                " cnt * (cast(shiftright(h, k) & 1 as int) * 2 - 1) as contrib))"
            )
        ).alias("b"),
    ).select(id_col, "b.k", "b.contrib")
    return (
        bits.groupBy(id_col, "k")
        .agg(F.sum("contrib").alias("s"))
        .groupBy(id_col)
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.expr("shiftleft(1L, k)")).otherwise(
                    F.lit(0)
                )
            ).alias("simhash")
        )
    )


def simhash_near_pairs(
    simhashed: DataFrame, id_col: str, max_hamming: int = 6
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance.

    Candidate blocking on 16-bit fingerprint prefix (a ≤6-bit difference
    leaves at least one of the four 16-bit quarters intact — pigeonhole), so
    the join is equi on (quarter_idx, quarter_value), never all-pairs.
    """
    quarters = simhashed.select(
        id_col,
        "simhash",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), q -> struct(q as q,"
                " cast(shiftright(simhash, q * 16) & 65535 as int) as qv))"
            )
        ).alias("b"),
    ).select(id_col, "simhash", "b.q", "b.qv")
    a = quarters.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("h_a"), "q", "qv"
    )
    b = quarters.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("h_b"), "q", "qv"
    )
    return (
        a.join(b, ["q", "qv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
