"""Time individual registered queries (Spark side only) at a given sf_dir.

Usage:  python tools/timeq.py [sf_dir] name [name ...]
Each query runs twice; both timings print (first = cold incl. any session
index build, second = warm).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DEDUP_PARTITIONS", "4")

from lambda_arc_events_filter_spark.registry import specs
from lambda_arc_events_filter_spark.session import fixture_conf, get_spark


def main() -> int:
    args = [a for a in sys.argv[1:]]
    # args[0] is the sf_dir when it IS a directory (including a bare
    # relative name like "sf0.1") or LOOKS like a path (contains a
    # separator).  A separator-containing non-directory is a mistyped
    # sf_dir and must error loudly, not be silently reinterpreted as a
    # query name with the remaining names running against the default
    # fixture dir (ADVICE r7; r8 review kept bare-dir invocations valid).
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    elif args and os.sep in args[0]:
        print(f"timeq: sf_dir {args[0]!r} is not a directory", file=sys.stderr)
        return 2
    else:
        sf_dir, names = "/root/testdata/sf0.1", args
    print(f"timeq: sf_dir={sf_dir}", file=sys.stderr)
    spark = get_spark("timeq", extra_conf=fixture_conf())
    all_specs = specs()
    # one throwaway action to absorb JVM/first-job warmup
    spark.range(1).count()
    for name in names:
        s = all_specs[name]
        for run in (1, 2):
            t0 = time.time()
            n = s.fn(spark, sf_dir).count()
            print(f"{name} run{run}: {time.time() - t0:.3f}s ({n} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
