"""Plan-inspection helpers: assert the physical plan has the properties the
engine is designed for (pushdown, broadcast, partial agg, codegen)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def plan_contains(df: DataFrame, *needles: str) -> dict[str, bool]:
    plan = formatted_plan(df)
    return {n: (n in plan) for n in needles}


def assert_pushed_filters(df: DataFrame) -> bool:
    """True when the parquet scan carries pushed filters."""
    plan = formatted_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def has_partial_aggregate(df: DataFrame) -> bool:
    """True when the plan contains a map-side partial HashAggregate (two
    HashAggregate nodes around the exchange)."""
    plan = formatted_plan(df)
    return plan.count("HashAggregate") >= 2


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)
