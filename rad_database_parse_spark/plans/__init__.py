"""Plan-inspection helpers — assert the physical plan is the one you want.

Used by tests to lock in scale-critical properties: filters reach the
parquet scan (PushedFilters), small dims broadcast, projections prune
columns (ReadSchema), and hot paths stay inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    plan = formatted_plan(df)
    return "PushedFilters" in plan and fragment in plan


def reads_only_columns(df: DataFrame, allowed: set[str]) -> bool:
    """True if every parquet ReadSchema in the plan projects ⊆ allowed."""
    import re

    plan = formatted_plan(df)
    ok = True
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {part.split(":")[0].strip() for part in m.group(1).split(",") if part.strip()}
        ok &= cols <= allowed
    return ok


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    return formatted_plan(df).count("WholeStageCodegen")


def unpartitioned_window_count(df: DataFrame) -> int:
    """Number of WindowExec nodes with an empty partitionSpec — each one
    funnels its entire input through a single task (the
    "No Partition Defined for Window operation" warning)."""
    count = [0]

    def rec(node):
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            count[0] += 1
        for i in range(node.children().size()):
            rec(node.children().apply(i))
        if node.nodeName() == "AdaptiveSparkPlan":
            rec(node.inputPlan())

    rec(df._jdf.queryExecution().executedPlan())
    return count[0]
