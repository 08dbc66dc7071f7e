"""Constraint → Spark SQL expression compiler.

Every check compiles to a Boolean ``Column`` evaluated JVM-side inside
whole-stage codegen — never per-row Python (north rule / BASELINE.json
``input_hint``). The reference instead ``exec``s generated Pandera code
on a driver-side pandas frame (reference: validator.py:43-78) and skips
validation on Spark entirely (reference: spark/spark_generator.py:101-109);
this module is the core of that "driver one-shot → distributed
assertions" rewrite.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pandera_forge_spark.schema import Check

ROW_LEVEL_KINDS = (
    "not_null",
    "ge",
    "le",
    "isin",
    "str_matches",
    "min_length",
    "max_length",
    "starts_with",
    "ends_with",
    "custom_sql",
    "custom_pandas",
    "implies",
)
# "unique" is table-level (needs a shuffle) — handled by
# validator.duplicate_keys, not compiled here.


def compile_check(check: Check) -> Column:
    """Return a Boolean Column that is True where the row SATISFIES the
    check. Null semantics: for value checks, a null value passes (the
    separate not_null check owns null enforcement — mirroring pandera,
    where Field(ge=...) checks ignore NA and nullable controls NA)."""
    col = F.col(check.column)
    k = check.kind
    if k == "not_null":
        return col.isNotNull()
    if k == "ge":
        return col.isNull() | (col >= F.lit(check.value))
    if k == "le":
        return col.isNull() | (col <= F.lit(check.value))
    if k == "isin":
        return col.isNull() | col.isin(*check.value)
    if k == "str_matches":
        # pandas str.match(case=False) semantics via (?i) + the
        # patterns' own anchors (see patterns.py module docstring)
        return col.isNull() | col.cast("string").rlike("(?i)" + check.value)
    if k == "min_length":
        return col.isNull() | (F.length(col.cast("string")) >= F.lit(check.value))
    if k == "max_length":
        return col.isNull() | (F.length(col.cast("string")) <= F.lit(check.value))
    if k == "starts_with":
        return col.isNull() | col.cast("string").startswith(check.value)
    if k == "ends_with":
        return col.isNull() | col.cast("string").endswith(check.value)
    if k == "implies":
        # conditional (cross-field) contract: WHEN holds → THEN must
        # hold. value = {"when": <bool SQL>, "then": <bool SQL>}; rows
        # where WHEN is false or null vacuously pass (standard
        # implication with SQL three-valued logic coalesced on the
        # antecedent). Serializes through the contract JSON as a plain
        # dict; still pure JVM codegen.
        cond = F.coalesce(F.expr(check.value["when"]), F.lit(False))
        then = F.coalesce(F.expr(check.value["then"]), F.lit(False))
        return ~cond | then
    if k == "custom_sql":
        # arbitrary boolean SQL over the row — still JVM/codegen; the
        # expression owns its null semantics
        return F.expr(check.value)
    if k == "custom_pandas":
        # the sanctioned escape hatch for semantics SQL can't express:
        # an Arrow-vectorized pandas UDF (Series -> bool Series), never
        # row-at-a-time Python (north_star: "constraint predicates
        # compile to Spark SQL expressions or vectorized pandas/Arrow
        # UDFs"). Null rows pass, mirroring the value checks above.
        from pyspark.sql.functions import pandas_udf

        fn = check.value
        udf = pandas_udf(fn, "boolean")
        return col.isNull() | F.coalesce(udf(col), F.lit(False))
    raise ValueError(f"not a row-level check kind: {k}")


def row_level(checks: list[Check]) -> list[Check]:
    return [c for c in checks if c.kind in ROW_LEVEL_KINDS]


def table_level(checks: list[Check]) -> list[Check]:
    return [c for c in checks if c.kind == "unique"]
