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


def empty_partition_window_specs(df: DataFrame) -> list[str]:
    """Window specs with NO partition columns — each one is a WindowExec
    over SinglePartition (the "No Partition Defined" warning): every row
    of its input relation moves to ONE task.  Legitimate only for
    relations bounded by construction (a ``limit(k)``, a calendar
    series); a scale cliff for anything that grows with the data.
    Returns one offending ``windowspecdefinition(...)`` snippet per hit.

    Parsing contract (pinned by test_rank_helpers): in formatted plans a
    window spec renders its partition columns first (bare expressions),
    then sort expressions (marked ``ASC``/``DESC``), then the
    ``specifiedwindowframe``.  A spec whose first argument is a sort
    expression or the frame itself has an empty partition spec.
    """
    plan = formatted_plan(df)
    bad: list[str] = []
    marker = "windowspecdefinition("
    idx = 0
    while True:
        at = plan.find(marker, idx)
        if at < 0:
            break
        idx = at + len(marker)
        # first argument: up to the first top-level comma
        depth = 0
        first_arg = ""
        for ch in plan[idx : idx + 400]:
            if ch == "(":
                depth += 1
            elif ch == ")" and depth == 0:
                break
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                break
            first_arg += ch
        if first_arg.startswith("specifiedwindowframe") or (
            " ASC" in first_arg or " DESC" in first_arg
        ):
            bad.append(plan[at : at + 160])
    return bad


def executed_range_exchanges(df: DataFrame) -> tuple[int, int]:
    """(materialized, reused) rangepartitioning exchange counts in the
    FINAL executed plan — pins the exchange-reuse invariant that
    ``functions/rank.py`` depends on for correctness.  Executes the query.
    """
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    # AQE's toString appends the initial plan after the final one; keep
    # only the final section (up to the "+- == Initial Plan ==" divider).
    final = final.split("Initial Plan")[0]
    mat = reused = 0
    for line in final.splitlines():
        if "rangepartitioning" not in line:
            continue
        if "ReusedExchange" in line:
            reused += 1
        elif "Exchange rangepartitioning" in line:
            mat += 1
    return mat, reused


def executed_hash_exchanges(df: DataFrame) -> int:
    """Count of materialized hashpartitioning exchanges in the FINAL
    executed plan.  Executes the query."""
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    final = final.split("Initial Plan")[0]
    return sum(
        1
        for line in final.splitlines()
        if "Exchange hashpartitioning" in line
    )


def has_python_in_plan(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return any(
        marker in plan
        for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas",
                       "MapInPandas", "PythonUDTF")
    )
