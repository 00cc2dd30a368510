"""Registry-wide physical-plan audit → PLAN_AUDIT.json.

For every registered batch query, builds the DataFrame (no execution
beyond what plan construction itself requires — boundary probes,
broadcast size estimation) and extracts the scale-relevant plan facts:

- python_nodes: any Arrow/Pandas/Python eval operator in the plan
  (the deliberate Python boundaries — udf family, multimodal — and
  nothing else should carry one);
- single_partition_windows: windowspecdefinitions with an empty
  partition clause (every row to ONE task; allowlisted recurrences only);
- exchanges / range_exchanges / broadcasts: materialized shuffle and
  broadcast counts — the per-query shuffle budget at a glance;
- scans: parquet scans and whether any pushed filter reached them;
- take_ordered / window_group_limit: the two bounded-top-k operators;
- codegen_spans: WholeStageCodegen region count (JVM-compiled extent).

Usage:  PYTHONPATH=. python tools/plan_audit.py [sf_dir] [out_json]

The artifact is evidence, not a gate — tests/test_plans.py pins the
hard rules; this file makes the registry-wide picture inspectable in
one place per round.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DEDUP_PARTITIONS", "4")

from lambda_arc_events_filter_spark.registry import specs
from lambda_arc_events_filter_spark.session import fixture_conf, get_spark
from lambda_arc_events_filter_spark.plans import inspect as I

SKIP_TAGS = {"streaming"}  # streaming queries execute on construction

PY_MARKERS = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "PythonMapInArrow",
    "MapInArrow",
    "PythonUDTF",
)


def audit_one(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("Initial Plan")[0]
    formatted = I.formatted_plan(df)
    return {
        "python_nodes": sorted(
            {m for m in PY_MARKERS if m in plan or m in formatted}
        ),
        "single_partition_windows": len(
            I.empty_partition_window_specs(df)
        ),
        "exchanges": plan.count("Exchange hashpartitioning"),
        "range_exchanges": len(
            re.findall(r"Exchange rangepartitioning", plan)
        ),
        "broadcasts": plan.count("BroadcastExchange"),
        "reused_exchanges": plan.count("ReusedExchange"),
        "scans": plan.count("FileScan parquet"),
        "pushed_filters": "PushedFilters: [" in formatted
        and "PushedFilters: []" not in formatted,
        "take_ordered": "TakeOrderedAndProject" in plan,
        "window_group_limit": "WindowGroupLimit" in plan,
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "PLAN_AUDIT.json"
    spark = get_spark("plan-audit", extra_conf=fixture_conf())
    out: dict[str, dict] = {}
    skipped: list[str] = []
    errs: dict[str, str] = {}
    for name, s in specs().items():
        if SKIP_TAGS & set(s.tags):
            skipped.append(name)
            continue
        try:
            out[name] = audit_one(s.fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — record, keep auditing
            errs[name] = f"{type(e).__name__}: {e}"[:200]
    py_q = sorted(n for n, a in out.items() if a["python_nodes"])
    sp_q = sorted(
        n for n, a in out.items() if a["single_partition_windows"]
    )
    summary = {
        "sf_dir": sf_dir,
        "audited": len(out),
        "skipped_streaming": len(skipped),
        "errors": errs,
        "queries_with_python_nodes": py_q,
        "queries_with_single_partition_windows": sp_q,
        "total_exchanges": sum(a["exchanges"] for a in out.values()),
        "total_broadcasts": sum(a["broadcasts"] for a in out.values()),
        "queries_with_pushed_filters": sum(
            1 for a in out.values() if a["pushed_filters"]
        ),
    }
    with open(out_path, "w") as f:
        json.dump({"summary": summary, "queries": out}, f, indent=1)
    print(json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
