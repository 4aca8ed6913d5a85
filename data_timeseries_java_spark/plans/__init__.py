"""Physical-plan introspection and assertions.

The reference hand-optimizes its DAG (combiner lifting, manual
partitioning, broadcast side inputs — SURVEY.md §4); here Catalyst does
that, and this module is how we PROVE it: tests assert that filters
reach the parquet scan, projections prune the read schema, small dims
broadcast, and hot paths stay inside whole-stage codegen with no Python
UDFs.
"""

from data_timeseries_java_spark.plans.inspect import (
    broadcast_join_count,
    codegen_stage_count,
    exchange_count,
    formatted_plan,
    has_python_eval,
    pushed_filters,
    read_schemas,
)
from data_timeseries_java_spark.plans.materialize import (
    TrackingPolicy,
    active_policy,
    cache_policy,
    checkpoint_policy,
    materialization,
    materialize,
    noop_policy,
    persist_policy,
)

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "read_schemas",
    "broadcast_join_count",
    "exchange_count",
    "codegen_stage_count",
    "has_python_eval",
    "materialize",
    "materialization",
    "active_policy",
    "cache_policy",
    "noop_policy",
    "persist_policy",
    "checkpoint_policy",
    "TrackingPolicy",
]
