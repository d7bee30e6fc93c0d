"""Plan inspection helpers: the engine's equivalent of the reference's
golden-plan tests (fe/src/test/.../planner/PlannerTest.java against
testdata/workloads/functional-planner/) — assert that Catalyst produced the
physical plan the operator was designed for (pushdown reached the scan, the
small side broadcast, top-k became TakeOrderedAndProject, aggs are 2-phase).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "simple"
    )


def has_pushed_filter(df: DataFrame, column: str) -> bool:
    """True if the parquet scan carries a pushed filter on `column`
    (PushedFilters: [... IsNotNull(col), GreaterThan(col, ...) ...])."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and column in line:
            return True
    return False


def scan_read_schema(df: DataFrame, table_hint: str = "") -> list[str]:
    """Columns actually read from the (first matching) parquet scan —
    verifies column pruning (ReadSchema)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line and (table_hint in line or not table_hint):
            schema = line.split("ReadSchema:", 1)[1].strip()
            inner = schema.split("<", 1)[1].rsplit(">", 1)[0]
            return [f.split(":")[0] for f in inner.split(",")]
    return []


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in simple_plan(df) or "BroadcastNestedLoopJoin" in simple_plan(df)


def uses_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in simple_plan(df)


def has_partial_aggregate(df: DataFrame) -> bool:
    """2-phase (partial + final) hash aggregation — the reference's
    pre-agg/merge-agg split (DistributedPlanner.java:676-810)."""
    plan = formatted_plan(df)
    return "partial_" in plan or plan.count("HashAggregate") >= 2


def count_shuffles(df: DataFrame) -> int:
    return simple_plan(df).count("Exchange")


def codegen_operator_count(df: DataFrame) -> int:
    """Operators inside WholeStageCodegen spans (the `*`-starred nodes in the
    formatted plan). Under AQE the final plan only exists after execution, so
    materialize first."""
    import re

    df.collect()
    plan = formatted_plan(df)
    return len(re.findall(r"\*\s+\w", plan))
