"""Record BASELINE numbers: DuckDB per-query wall-clock on the headline
oracles at sf0.1 (BASELINE.md's 'to be measured on first implementation
run').  Writes BASELINE_NUMBERS.json at the repo root.

DuckDB runs the ORACLE SQL of each headline query — the same computation
the Spark side performs — single process, warm cache, median of 3
(matching BASELINE.md's protocol).  Queries without oracles (rows-only)
are skipped.

Usage: PYTHONPATH=. python tools/baseline.py [sf_dir]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

from bench import HEADLINE

from lambda_arc_events_filter_spark.registry import specs
from lambda_arc_events_filter_spark.testing import duck_connection


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duck_connection(sf_dir)
    all_specs = specs()
    out: dict[str, float] = {}
    for name in HEADLINE:
        spec = all_specs.get(name)
        if spec is None or spec.oracle is None:
            continue
        con.sql(spec.oracle).fetchdf()  # warm
        reps = []
        for _ in range(3):
            t0 = time.time()
            con.sql(spec.oracle).fetchdf()
            reps.append(time.time() - t0)
        out[name] = round(statistics.median(reps), 4)
    payload = {
        "engine": "duckdb-1.0.0",
        "sf_dir": sf_dir,
        "protocol": "oracle SQL, single process, warm cache, median of 3, pandas materialization (fetchdf — mirrors bench.py toPandas)",
        "queries": out,
        "total": round(sum(out.values()), 4),
    }
    with open("BASELINE_NUMBERS.json", "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
