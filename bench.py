"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The driver runs this per-round (BENCH_r{N}.json) against BASELINE.md.
Timing = full query wall-clock including result collection.  Protocol:
per query, one warm-up + ``BENCH_REPS`` back-to-back timed runs (the
locality a resident engine has: hot JIT, warm shuffle files); then ONE
extra interleaved pass over the whole list; report each query's minimum
across all timed runs.  The rescue pass matters on a shared host:
interference (GC pause, another process's CPU burst) arrives in
multi-second windows, and back-to-back reps all land inside one window,
poisoning even the median (seen: 0.25 s query → 5.4 s "median" — every
rep slow).  A query's rescue rep runs ~10 s of other work later, outside
the window, so the minimum reflects the engine, not the neighbor.

Canary protocol / how to READ a recording (r10-r12 rules, consolidated
here so a fresh round does not rediscover them):

- Run on an otherwise-quiet host, NEVER with another Spark/DuckDB
  process alive (a concurrent probe triples medians; seen 1.4 -> 10.5 s).
- Two DISJOINT DuckDB canary sets run same-session and each yields a
  host normalizer vs BASELINE_NUMBERS.json.  ``canary_split_pct`` is
  their disagreement; ``disturbed: true`` (split > 10%) means the host
  was disturbed DURING recording and the normalized reading is a band,
  not a point — re-record rather than interpret.  Four r12 attempts
  were auto-rejected at splits 360-462% (host throttling of
  multi-threaded DuckDB); the valid one agreed at 5.2%.
- ``value`` (raw wall) is the headline number; ``normalized_total``
  rescales it to the baseline-recording host; ``compute_only_total``
  and the per-query compute-only maps subtract the measured local-mode
  dispatch/collect floor.  Per-query WEAK-LINE classification reads
  compute-only ratios against a SAME-SESSION DuckDB re-measure
  (tools/weakline.py; BASELINE.md round-13 note), not the frozen
  recording — sub-100 ms recorded denominators carry enough protocol
  noise to flap a borderline query across the 2x line with zero code
  change (seen r11->r12 on four queries).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Shuffle width sized to the benched SF, not the core count: at sf0.1 the
# shuffled stages are single-digit MB, where 32 initial partitions cost
# more dispatch than AQE's coalesce can claw back (measured full-headline
# wall at local[16]: 32 -> 12.8 s, 16 -> 10.6 s, 8 -> 11.6 s).  On a real
# cluster SPARK_GRAFT_SHUFFLE is set to ~2-3x total cores (see SCALE.md).
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "16")
# Core count likewise: local[16] beats local[32] on the full headline
# (measured same-session A/B: 15.93 s vs 17.31 s — at sf0.1 most stages
# are dispatch-bound and 32 local threads add scheduling + GC pressure;
# only the two pair-join-heavy queries prefer 32).  A cluster submit
# overrides via SPARK_GRAFT_CPUS; setdefault never overrides the caller.
os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
# AQE off for the benched session: every adaptive exchange is a stage
# barrier, and at sf0.1 that barrier dominates sub-second queries
# (q01 0.42 -> 0.19 s measured; see session.py).  The plans are static
# here anyway — dims are explicitly broadcast and shuffle width is
# pre-sized — so AQE has nothing to re-plan.  Cluster runs keep the
# default (AQE on), where runtime re-planning earns its barriers.
os.environ.setdefault("SPARK_GRAFT_AQE", "false")
# Dedup pipeline width: 4 is the measured fixture-scale sweet spot (see
# operators/dedup.py); the library default is cluster parallelism, so the
# toy-scale value is an explicit harness opt-in here.
os.environ.setdefault("SPARK_GRAFT_DEDUP_PARTITIONS", "4")

from lambda_arc_events_filter_spark.registry import specs
from lambda_arc_events_filter_spark.session import fixture_conf, get_spark

#: Headline set — one per major operator family (extended as families land).
HEADLINE = [
    "q01_pricing_summary",
    "join_multiway_star",
    "join_inner_orders_customer",
    "join_range_theta",
    "asof_join_events",
    "agg_count_distinct",
    "agg_stats",
    "topk_orders",
    "dedup_keep_first_per_key",
    "window_topk_per_group",
    "fn_string_suite",
    "text_token_stats",
    "text_tfidf_top_terms",
    "dedup_exact_docs",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "embedding_topk_cosine",
    "ann_ivf_topk",
    "ts_user_similarity",
    "stream_tumbling_counts",
    "join_salted_skew",
    "partitioned_sink_dpp",
    "corpus_curation_pipeline",
    "text_unigram_logprob",
    "embedding_kmeans_assign",
    # round-3 second wave: one per new family
    "q06_forecast_revenue",
    "agg_regression_suite",
    "agg_bitmap_distinct",
    "events_anomaly_zscore",
    "events_resample_ffill",
    "interval_overlap_join",
    "lineitem_pareto_abc",
    "semdedup_cluster_prune",
    # round-4 wave: one per new family (E-addendum)
    "users_geo_radius_join",
    "text_rake_keyphrases",
    "embedding_pq_assign",
    "lineitem_moments_by_flag",
    # round-4 late waves: tokenizer training + the third dedup strategy
    "tokens_bpe_merge_rounds",
    "dedup_prefix_cosine_pairs",
]

REPS = int(os.environ.get("BENCH_REPS", "3"))

#: Queries whose sf0.1 result exceeds ~10 k rows.  Materialization is the
#: client's choice of result path, and the right one flips with result
#: cardinality (measured at sf0.1): row-at-a-time collect() pays ~0.5 s per
#: 100 k rows building Python objects (resample 0.99 → 0.38 s via Arrow),
#: while the Arrow→pandas path pays a flat ~60 ms of batch-collection setup
#: that DOMINATES small results (q01: 0.29 s collect vs 0.37 s toPandas —
#: the 6-row result costs more to box than to compute).  So: Arrow→pandas
#: for large results, plain collect for small — each query takes the path a
#: production client would, and the DuckDB baseline's fetchdf() keeps its
#: equivalent (pandas out of a columnar engine has no per-row boxing side).
_ARROW_RESULTS = frozenset(
    {
        "asof_join_events",
        "window_topk_per_group",
        "fn_string_suite",
        "events_resample_ffill",
        "interval_overlap_join",
        "lineitem_pareto_abc",
    }
)


def _materialize(name: str, df) -> None:
    if name in _ARROW_RESULTS:
        df.toPandas()
    else:
        df.collect()


#: Same-session DuckDB canary (VERDICT r8 ask #1).  Session-to-session host
#: variance (~1.3×, observed up to 1.8× between the driver's recording and a
#: same-tree local run) is the biggest error bar on the headline ratio the
#: gate reads.  Re-running a small DuckDB reference subset IN THIS SESSION
#: calibrates it out: host_normalizer = (canary wall now) / (canary wall when
#: BASELINE_NUMBERS.json was recorded), and normalized_total = value /
#: host_normalizer is the Spark total as-if run on the baseline-recording
#: host.  The subset mixes q01 with the three largest stable DuckDB line
#: items (~3.4 s of the 6.9 s recorded total) so the calibration signal
#: dwarfs per-query timer noise.
_CANARY = (
    "q01_pricing_summary",
    "tokens_bpe_merge_rounds",
    "dedup_minhash_lsh",
    "join_range_theta",
)

#: Second, DISJOINT canary set (r9 verdict ask #8): if a DuckDB-side plan
#: change, fixture quirk, or cache effect skews one canary query, the two
#: normalizers diverge and the artifact shows it — a single-set canary
#: would silently fold the skew into every normalized ratio.  Both sets
#: are emitted; ``host_normalizer`` (the gate input) stays the primary
#: set for cross-round continuity, ``host_normalizer_b`` is the
#: cross-check (~1.9 s of recorded DuckDB mass: the #2/#3/#6 line items).
_CANARY_B = (
    "dedup_prefix_cosine_pairs",
    "semdedup_cluster_prune",
    "dedup_ngram_jaccard",
    "text_rake_keyphrases",
)


def _duck_canary(sf_dir: str, all_specs, names=_CANARY) -> dict | None:
    """Run the canary oracles through DuckDB (same protocol as
    tools/baseline.py: warm + median of 3, pandas materialization) and
    return per-query seconds plus the normalizer vs BASELINE_NUMBERS.json.
    Returns None — normalization skipped, never faked — when the recorded
    file is missing or was recorded at a different scale factor."""
    import statistics

    from lambda_arc_events_filter_spark.testing import duck_connection

    root = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(root, "BASELINE_NUMBERS.json")) as f:
            recorded = json.load(f)
    except (OSError, ValueError):
        return None
    if os.path.normpath(recorded.get("sf_dir", "")) != os.path.normpath(
        sf_dir
    ):
        return None
    rec_q = recorded.get("queries", {})
    if any(n not in rec_q for n in names):
        return None
    # Any canary-side failure (fixture drift, DuckDB error, corrupt
    # recording) degrades to canary=None — it must never take down the
    # Spark bench whose artifact is the round's contract.
    try:
        con = duck_connection(sf_dir)
        session: dict[str, float] = {}
        for name in names:
            spec = all_specs.get(name)
            if spec is None or spec.oracle is None:
                return None
            con.sql(spec.oracle).fetchdf()  # warm
            reps = []
            for _ in range(3):
                t0 = time.time()
                con.sql(spec.oracle).fetchdf()
                reps.append(time.time() - t0)
            session[name] = round(statistics.median(reps), 4)
        con.close()
        recorded_total = round(sum(rec_q[n] for n in names), 4)
        if not recorded_total > 0:
            return None
        session_total = round(sum(session.values()), 4)
        return {
            "queries": session,
            "session_total": session_total,
            "recorded_total": recorded_total,
            "host_normalizer": round(session_total / recorded_total, 4),
        }
    except Exception:  # noqa: BLE001
        return None


def _measure_floor(spark) -> dict[str, float]:
    """Local-mode per-query floor: the wall cost of dispatching and
    collecting an EMPTY single-stage plan through each result path.
    This is the part of a sub-second query's wall time that measures the
    harness (DAG submit, scheduler round-trip, collect/Arrow setup), not
    the engine's compute — it amortizes to ~0 at real data volumes.
    Reported alongside wall so the artifact carries both the honest wall
    ratio and the compute-only ratio (wall − floor)."""
    floors: dict[str, float] = {}
    for path in ("collect", "toPandas"):
        empty = spark.range(0)
        getattr(empty, path)()  # warm the path
        ts = []
        for _ in range(5):
            t0 = time.time()
            getattr(spark.range(0), path)()
            ts.append(time.time() - t0)
        floors[path] = round(min(ts), 4)
    return floors


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    all_specs = specs()
    # DuckDB canary BEFORE the Spark JVM exists: both engines use every
    # core, and calibration must not be polluted by the other engine's
    # warm-up running concurrently.  Skipped on filtered local-iteration
    # runs — the normalizer is only meaningful against the full headline
    # total, and the ~3.5 s canary would tax every iteration loop.
    canary = _duck_canary(sf_dir, all_specs) if len(sys.argv) <= 1 else None
    canary_b = (
        _duck_canary(sf_dir, all_specs, _CANARY_B)
        if len(sys.argv) <= 1
        else None
    )
    spark = get_spark("bench", extra_conf=fixture_conf())
    names = [n for n in HEADLINE if n in all_specs]
    if len(sys.argv) > 1:  # optional substring filter for local iteration
        names = [n for n in names if any(f in n for f in sys.argv[1:])]
    # Result materialization: see _ARROW_RESULTS — Arrow→pandas for large
    # results, plain collect for small ones.
    #
    # GLOBAL warm pass first: one untimed run of the whole list.  The
    # protocol measures a RESIDENT engine (module docstring), and the
    # JVM's C2 compiler needs several executions across the operator mix
    # before shared codepaths (window sort, broadcast build, parquet
    # decode) are compiled — without this, whichever queries run FIRST
    # absorb the compile time into their minima (measured: q01 first-in-
    # list 0.32 s vs 0.20 s hot; agg_stats 0.85 vs 0.50).  The DuckDB
    # baseline is recorded warm-cache/median-of-3 under the same
    # residency assumption (tools/baseline.py, BASELINE.md protocol).
    for name in names:
        _materialize(name, all_specs[name].fn(spark, sf_dir))
    reps: dict[str, list[float]] = {n: [] for n in names}
    for name in names:
        fn = all_specs[name].fn
        _materialize(name, fn(spark, sf_dir))  # warm-up (plan + code cache)
        for _ in range(REPS):
            t0 = time.time()
            _materialize(name, fn(spark, sf_dir))
            reps[name].append(time.time() - t0)
    for name in names:  # interleaved rescue pass (see module docstring)
        t0 = time.time()
        _materialize(name, all_specs[name].fn(spark, sf_dir))
        reps[name].append(time.time() - t0)
    timings = {n: round(min(ts), 4) for n, ts in reps.items()}
    total = round(sum(timings.values()), 4)
    floors = _measure_floor(spark)
    compute_only = {
        n: round(
            max(
                0.0,
                timings[n]
                - floors["toPandas" if n in _ARROW_RESULTS else "collect"],
            ),
            4,
        )
        for n in names
    }
    # Two lines: a DETAIL line first (per-query compute-only seconds,
    # per-path floors, arrow-result list — everything a human or a later
    # tool wants), then the driver-contract line LAST.  The driver
    # captures only the final ~2000 chars of stdout and json-parses the
    # last line; rounds 4-5 lost their machine-readable artifact
    # ("parsed": null) because one combined line outgrew that window as
    # the headline set reached 39 queries.  The final line is therefore
    # compact (3-decimal seconds ≈ ms resolution, well below run-to-run
    # noise; separators without whitespace) and budget-guarded: if the
    # headline set ever grows it past the window, per-query seconds drop
    # to 2 decimals rather than overflowing (the DETAIL line always
    # keeps 4-decimal values).
    detail = {
        "detail": True,
        "floor": floors,
        "duck_canary": canary,
        "duck_canary_b": canary_b,
        "queries_compute_only": compute_only,
        # result materialization is per-query (Arrow→pandas for
        # >10k-row results, plain collect otherwise — see
        # _ARROW_RESULTS); recorded so the protocol is reproducible
        "arrow_results": sorted(_ARROW_RESULTS & set(names)),
    }
    print(json.dumps(detail, separators=(",", ":")))
    print(
        contract_line(
            timings, total, compute_only, sf, canary, canary_b,
            floors=floors, arrow=_ARROW_RESULTS & set(names),
        )
    )


def contract_line(
    timings, total, compute_only, sf, canary=None, canary_b=None,
    floors=None, arrow=None,
) -> str:
    """The driver-contract JSON line: guaranteed ≤1800 chars.

    Compute-only is FIRST-CLASS (r12 verdict ask #7: the gate and the
    weak line read floor-subtracted ratios, BASELINE.md r13 note) in two
    forms: ``compute_only_total`` plus the inputs that make the
    per-query map exactly derivable at any headline size — ``floor``
    (the two per-path dispatch/collect constants) and ``arrow`` (which
    queries take the toPandas path): compute_only[q] = max(0, queries[q]
    − floor[path(q)]).  The explicit ``queries_compute_only`` map is
    also emitted when it fits (filtered/local runs); at the full
    39-query headline two maps exceed the budget, so the ladder drops
    it first, then wall precision, then all maps (keeping
    metric/value/unit/sf/compute_only_total/floor) — the line can NEVER
    overflow the driver's ~2000-char tail window, and the detail line
    above always carries the full 4-decimal versions of both maps."""
    base = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # wall minus the measured local-mode dispatch/collect floor
        # (detail line carries the per-query breakdown); "value" stays
        # the honest wall total.
        "compute_only_total": round(sum(compute_only.values()), 4),
    }
    if floors is not None:
        # per-path dispatch/collect floors + the toPandas-path query
        # list: with these, compute_only[q] = max(0, queries[q] −
        # floor[path]) is exactly derivable even when the explicit
        # compute-only map degrades out of the budget below
        base["floor"] = floors
        base["arrow"] = sorted(arrow or ())
    if canary is not None:
        # Same-session host calibration (see _CANARY): normalized_total is
        # "value" rescaled to the BASELINE_NUMBERS-recording host's speed.
        # "value" is untouched — raw wall stays the headline number.
        base["host_normalizer"] = canary["host_normalizer"]
        base["normalized_total"] = round(
            total / canary["host_normalizer"], 4
        )
    if canary_b is not None:
        # Disjoint second canary set (r9 ask #8): a cross-check only —
        # the gate keeps reading host_normalizer; divergence between the
        # two flags a DuckDB-side skew in one set.
        base["host_normalizer_b"] = canary_b["host_normalizer"]
    if canary is not None and canary_b is not None:
        # Self-reported validity (r10 verdict ask #2): BASELINE.md's
        # round-10 stability rule — a >10% split between the two
        # independent canary normalizers means the host was disturbed
        # during recording and the normalized reading is a band, not a
        # point.  BENCH_r10 was recorded with a 21% split and nothing in
        # the artifact said so; now the reading rule lives IN the
        # artifact.
        a = canary["host_normalizer"]
        b = canary_b["host_normalizer"]
        split = round(abs(a - b) / min(a, b) * 100, 1)
        base["canary_split_pct"] = split
        base["disturbed"] = split > 10.0
    wall3 = {n: round(t, 3) for n, t in timings.items()}
    wall2 = {n: round(t, 2) for n, t in timings.items()}
    co3 = {n: round(t, 3) for n, t in compute_only.items()}
    co2 = {n: round(t, 2) for n, t in compute_only.items()}
    for queries, queries_co in (
        (wall3, co3),
        (wall3, co2),
        (wall2, co2),
        (wall3, None),
        (wall2, None),
        (None, None),
    ):
        payload = dict(base)
        if queries is not None:
            payload["queries"] = queries
        if queries_co is not None:
            payload["queries_compute_only"] = queries_co
        line = json.dumps(payload, separators=(",", ":"))
        if len(line) <= 1800:
            return line
    return line  # unreachable: the no-queries payload is ~150 chars


if __name__ == "__main__":
    main()
