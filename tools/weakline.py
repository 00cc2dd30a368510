"""Same-session per-query weak-line classifier (r12 verdict ask #2).

The per-query "weak set" (ratio vs DuckDB ≥ 2×) was defined on
normalized ratios against the FROZEN BASELINE_NUMBERS.json denominators.
For sub-100 ms denominators the recording carries enough protocol noise
(±15% normalizer slack, host-moment effects) that borderline queries
flap across the line with zero code change — r11→r12 flipped four this
way.  This tool pins the classification to quantities measured in ONE
session minutes apart on the same host:

  weak(q)  ⇔  compute_only_spark(q) / duck_same_session(q)  ≥  2.0

where compute_only = warm min-of-REPS Spark wall − the measured
empty-plan dispatch/collect floor for q's materialization path, and
duck_same_session = warm median-of-3 of q's oracle through DuckDB in
the same process envelope (tools/baseline.py protocol).  Both sides see
the same host moment, so the host term cancels exactly — no normalizer,
no slack band.

Usage:
  python tools/weakline.py [name ...]      # default: the r12 weak set
Prints one line per query + a JSON summary line.  Run on a quiet host
(bench.py docstring protocol); never alongside another Spark session.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # noqa: E402  (reuses headline env defaults + _ARROW_RESULTS)
from lambda_arc_events_filter_spark.registry import specs  # noqa: E402
from lambda_arc_events_filter_spark.session import (  # noqa: E402
    fixture_conf,
    get_spark,
)
from lambda_arc_events_filter_spark.testing import duck_connection  # noqa: E402

#: r12 weak set members with a DuckDB-comparable denominator (the two
#: accepted-by-construction rows partitioned_sink_dpp / stream_tumbling
#: stay decomposed in BASELINE.md, not re-litigated here).
DEFAULT = (
    "fn_string_suite",
    "interval_overlap_join",
    "corpus_curation_pipeline",
    "embedding_kmeans_assign",
    "agg_stats",
    "ts_user_similarity",
    "lineitem_pareto_abc",
    "text_rake_keyphrases",
)

REPS = int(os.environ.get("BENCH_REPS", "6"))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or list(DEFAULT)
    all_specs = specs()
    # DuckDB first, Spark second (bench.py discipline: never concurrent)
    duck: dict[str, float] = {}
    con = duck_connection(sf_dir)
    for n in names:
        spec = all_specs[n]
        if spec.oracle is None:
            continue
        con.sql(spec.oracle).fetchdf()  # warm
        reps = []
        for _ in range(3):
            t0 = time.time()
            con.sql(spec.oracle).fetchdf()
            reps.append(time.time() - t0)
        duck[n] = round(statistics.median(reps), 4)
    con.close()

    spark = get_spark("weakline", extra_conf=fixture_conf())
    for n in names:  # global warm pass (bench.py protocol)
        bench._materialize(n, all_specs[n].fn(spark, sf_dir))
    floors = bench._measure_floor(spark)
    out: dict[str, dict] = {}
    for n in names:
        fn = all_specs[n].fn
        bench._materialize(n, fn(spark, sf_dir))
        reps = []
        for _ in range(REPS):
            t0 = time.time()
            bench._materialize(n, fn(spark, sf_dir))
            reps.append(time.time() - t0)
        wall = round(min(reps), 4)
        floor = floors["toPandas" if n in bench._ARROW_RESULTS else "collect"]
        compute = round(max(0.0, wall - floor), 4)
        d = duck.get(n)
        row = {
            "wall_s": wall,
            "compute_s": compute,
            "duck_s": d,
            "ratio_wall": round(wall / d, 2) if d else None,
            "ratio_compute": round(compute / d, 2) if d else None,
            "weak": bool(d and compute / d >= 2.0),
        }
        out[n] = row
        print(
            f"{n:34s} wall {wall:7.3f}  compute {compute:7.3f}  "
            f"duck {d if d is not None else float('nan'):7.3f}  "
            f"ratio(compute) {row['ratio_compute']}  "
            f"{'WEAK' if row['weak'] else 'ok'}"
        )
    spark.stop()
    print(json.dumps({"sf_dir": sf_dir, "floors": floors, "queries": out},
                     separators=(",", ":")))
    return 0


if __name__ == "__main__":
    sys.exit(main())
