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
