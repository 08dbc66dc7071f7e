"""Physical-plan inspection utilities.

The engine's performance contract is stated in terms of the plans
Catalyst produces (SURVEY.md §4): fused aggregations must not Expand,
violation filters must push into the parquet scan, small dimension
sides must broadcast, hot paths must stay inside whole-stage codegen
with no Python UDFs. These helpers turn those statements into
assertions so tests/test_plans.py can fail when a refactor silently
regresses the plan (the "explain and iterate" discipline, automated).
"""

from pandera_forge_spark.plans.inspect import (
    executed_plan,
    has_broadcast_hash_join,
    has_expand,
    has_python_udf,
    plan_summary,
    pushed_filters,
    scan_read_schema,
    whole_stage_codegen_spans,
)

__all__ = [
    "executed_plan",
    "has_broadcast_hash_join",
    "has_expand",
    "has_python_udf",
    "plan_summary",
    "pushed_filters",
    "scan_read_schema",
    "whole_stage_codegen_spans",
]
