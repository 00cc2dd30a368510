"""Assertions over Catalyst physical plans (SURVEY.md §4).

The engine's scale posture — filters reach the parquet scan, dims
broadcast, top-k never sorts the world, Python stays off the hot path —
is checked by tests/test_plans.py using these helpers, so a regression in
plan shape fails CI rather than shipping as a silent 100× slowdown at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    """True if the parquet scan node advertises at least one pushed filter."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and "PushedFilters: []" not in line:
            return True
    return False


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names the parquet scan actually reads (pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols.extend(
                f.split(":")[0].strip() for f in inner.split(",") if ":" in f
            )
    return cols


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def uses_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in formatted_plan(df)


def uses_nested_loop_join(df: DataFrame) -> bool:
    return "BroadcastNestedLoopJoin" in formatted_plan(df)


def uses_window_group_limit(df: DataFrame) -> bool:
    return "WindowGroupLimit" in formatted_plan(df)


def uses_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in formatted_plan(df)


def whole_stage_codegen_ids(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans in the FINAL (executed) plan
    (more fused = fewer pipeline breaks; 0 means everything fell back to
    interpreted eval).  Under AQE codegen subtrees exist only after the
    adaptive plan finalizes, so this executes the query."""
    import re

    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    # codegen spans appear as "*(N) Operator" markers in the tree string
    return len(set(re.findall(r"\*\((\d+)\)", final)))


def has_python_in_plan(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return any(
        marker in plan
        for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas",
                       "MapInPandas", "PythonUDTF")
    )
