"""Connected components over candidate-pair edges (dedup clustering).

Pair generators (MinHash-LSH, SimHash, n-gram Jaccard) emit EDGES; actual
deduplication needs the transitive closure — if A~B and B~C, one keeper
should survive for {A,B,C} even though A~C was never emitted.  This module
closes that gap with iterative min-label propagation, the standard
large-graph connected-components formulation (hash-join label exchange per
round, a.k.a. "hash-to-min"): every node starts labeled with itself and
repeatedly takes the minimum label over {self} ∪ neighbors until a
fixpoint.  Rounds needed ≤ graph diameter; near-dup components are
shallow (dup clusters are cliques-ish), so 2-4 rounds in practice.

Scale notes (100 TB): each round is one shuffle of the edge list joined
against the (node, label) relation — both keyed by node id, AQE-coalesced.
A giant component (e.g. boilerplate connecting millions of docs) makes the
label relation skew toward its minimum id only at the final aggregate,
which is map-side combinable; the posting-frequency cap upstream
(operators/dedup.py) is what prevents such components from forming out of
stop-shingles in the first place.  For web-scale graphs the
large-star/small-star variant halves round count; diameter-2 dup clusters
do not need it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of ``edges`` with the minimum node id reachable
    from it (undirected).  Returns (node, label); ``label`` is the
    component representative — the deterministic dedup keeper.

    Each iteration localCheckpoints the label relation: it feeds both the
    next join and the convergence check, and lineage would otherwise grow
    by one join per round (the classic iterative-algorithm lineage
    blow-up; MLlib checkpoints the same way).
    """
    sym = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    )
    sym = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    # Convergence test: Σ labels strictly decreases every round that
    # changes anything (labels only ever take minima), so one cheap global
    # aggregate per round replaces a per-node change join.
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(nbr_min, labels.node == nbr_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        new_sum = labels.agg(F.sum("label")).collect()[0][0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels
