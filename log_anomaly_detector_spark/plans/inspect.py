"""Audit helpers over Catalyst physical plans.

Used by tests (and by hand during tuning) to assert the plans we *want*:
filters pushed to the parquet scan, columns pruned, small sides broadcast,
whole-stage codegen covering the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def plan_facts(df: DataFrame, execute: bool = False) -> dict[str, bool | int]:
    """Cheap structural facts about the physical plan.

    With AQE the codegen stages only appear in the *final* plan, so pass
    ``execute=True`` when asserting on WholeStageCodegen spans.
    """
    import re

    if execute:
        df.collect()
        # final AQE plan: `*(n)` prefixes mark whole-stage-codegen spans
        exec_plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        codegen = len(set(re.findall(r"\*\((\d+)\)", exec_plan)))
    else:
        codegen = 0
    plan = formatted_plan(df)
    return {
        "pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        "broadcast_join": "BroadcastHashJoin" in plan,
        "sort_merge_join": "SortMergeJoin" in plan,
        "shuffle_exchanges": plan.count("Exchange (") - plan.count("BroadcastExchange ("),
        "codegen_stages": codegen,
        "partial_agg": "partial_" in plan or "HashAggregate" in plan,
    }
