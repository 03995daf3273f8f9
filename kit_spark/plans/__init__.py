"""Plan inspection & assertion helpers (SURVEY.md §4).

Used by tests and during tuning to check that Catalyst produced the plan we
designed for: filters pushed to the parquet scan, column pruning before
opaque pandas UDFs, broadcast joins where hinted, no accidental cartesian
products, whole-stage codegen over the relational spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted")


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    plan = formatted_plan(df)
    assert "PushedFilters" in plan and fragment in plan, \
        f"filter {fragment!r} not pushed down:\n{plan[:2000]}"


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, f"no broadcast join:\n{plan[:2000]}"


def assert_no_cartesian(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, \
        f"cartesian product in plan:\n{plan[:2000]}"


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the scan (ReadSchema) — for pruning checks."""
    plan = formatted_plan(df)
    out: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            out.extend(part.split(":")[0].strip() for part in inner.split(","))
    return out


def codegen_stage_count(df: DataFrame) -> int:
    return physical_plan(df).count("WholeStageCodegen")
