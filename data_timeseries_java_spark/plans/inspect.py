"""Helpers to read a DataFrame's executed (physical) plan as text."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan (column-pruning evidence)."""
    plan = formatted_plan(df)
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan)


def broadcast_join_count(df: DataFrame) -> int:
    return formatted_plan(df).count("BroadcastHashJoin")


def exchange_count(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (lower = fewer cluster-wide moves).
    BroadcastExchange is excluded — broadcasting a dim is the point."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def codegen_stage_count(df: DataFrame) -> int:
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", formatted_plan(df))))


def has_python_eval(df: DataFrame) -> bool:
    """True if the plan crosses into Python row evaluation (slow path).
    Arrow-batched pandas operators (FlatMapGroupsInPandas etc.) are
    reported separately by name in the plan and excluded here."""
    plan = formatted_plan(df)
    return "BatchEvalPython" in plan
