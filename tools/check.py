"""Local mirror of the driver's correctness gate.

Runs every registered query on Spark AND its DuckDB oracle on the same
parquet fixtures; compares row count, column names, and the
order-insensitive multiset of row values.

Usage:  python tools/check.py [sf_dir] [name_filter ...]
(the repo root is self-inserted on sys.path, no PYTHONPATH needed)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Fixture-scale dedup pipeline width (see operators/dedup.py — the
# library default is cluster parallelism; the toy value is a harness
# opt-in).
os.environ.setdefault("SPARK_GRAFT_DEDUP_PARTITIONS", "4")

from lambda_arc_events_filter_spark.registry import specs
from lambda_arc_events_filter_spark.session import fixture_conf, get_spark
from lambda_arc_events_filter_spark.testing import check_query, duck_connection


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]
    spark = get_spark("check", extra_conf=fixture_conf())
    con = duck_connection(sf_dir)

    all_specs = specs()
    names = [
        n for n in all_specs if not name_filter or any(f in n for f in name_filter)
    ]
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        s = all_specs[name]
        t0 = time.time()
        try:
            problems = check_query(s, spark, con, sf_dir)
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        took = time.time() - t0
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        elif s.oracle is None:
            print(f"rows  {name}: rows-only check ok [{took:.1f}s]")
            n_rows_only += 1
        else:
            print(f"PASS  {name} [{took:.1f}s]")
            n_pass += 1
    print(
        f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail "
        f"/ {len(names)} total @ {sf_dir}"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
