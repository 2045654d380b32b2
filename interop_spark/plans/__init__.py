"""Plan inspection utilities: extract the scale-relevant facts from a
DataFrame's executed physical plan (shuffle count, join strategies,
pushed filters, pruned read schemas). Used by PLANS.md generation and by
tests that assert plan shape (e.g. bucketed joins must not shuffle).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def plan_facts(df: DataFrame) -> dict:
    plan = executed_plan(df)
    return {
        "shuffles": plan.count("Exchange hashpartitioning"),
        "broadcast_joins": plan.count("BroadcastHashJoin")
        + plan.count("BroadcastNestedLoopJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "pushed_filters": [
            p for p in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if p
        ],
        "read_schemas": re.findall(r"ReadSchema: struct<([^>]*)", plan),
    }
