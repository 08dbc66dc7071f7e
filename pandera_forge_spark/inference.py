"""Profile → constraint inference.

Implements the reference's inference rules exactly (SURVEY.md §2.13;
reference: field_analyzer.py:34-76, code_generator.py:39-75,
spark/spark_type_mapper.py:26-57), so that the generated constraint set
— and therefore every downstream pass/fail verdict — matches the
reference's observable behavior.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame

from pandera_forge_spark.profiler import ISIN_MAX_DISTINCT, profile_table
from pandera_forge_spark.sanitizer import sanitize_class_name, sanitize_column_name
from pandera_forge_spark.schema import (
    ColumnProfile,
    ColumnSpec,
    StringConstraints,
    TableSchema,
)

# Spark simpleString → pandera type name
# (reference: spark/spark_type_mapper.py:26-57, including the lossy
# decimal → Float64 mapping commented "Approximate mapping" at :39 and
# complex types → Object at :53-56).
SPARK_TO_PANDERA: dict[str, str] = {
    "byte": "Int8",
    "tinyint": "Int8",
    "short": "Int16",
    "smallint": "Int16",
    "int": "Int32",
    "integer": "Int32",
    "long": "Int64",
    "bigint": "Int64",
    "float": "Float32",
    "real": "Float32",
    "double": "Float64",
    "decimal": "Float64",
    "string": "String",
    "varchar": "String",
    "char": "String",
    "boolean": "Bool",
    "bool": "Bool",
    "date": "Timestamp",
    "timestamp": "Timestamp",
    "timestamp_ntz": "Timestamp",
    "timestamp_ltz": "Timestamp",
    "binary": "Object",
    "array": "Object",
    "map": "Object",
    "struct": "Object",
}

_NUMERIC_PANDERA = {"Int8", "Int16", "Int32", "Int64", "Float32", "Float64"}


def normalize_type(spark_type: str) -> str:
    """decimal(10,2) → decimal, array<string> → array
    (reference: spark/spark_type_mapper.py:106-112)."""
    t = spark_type.strip().lower()
    for sep in ("(", "<"):
        if sep in t:
            t = t.split(sep, 1)[0]
    return t


def pandera_type(spark_type: str) -> Optional[str]:
    """Map a Spark type string to a pandera type name; None when
    unmappable (such columns are skipped with a warning, not errors —
    reference: core/base_generator.py:130-134)."""
    return SPARK_TO_PANDERA.get(normalize_type(spark_type))


def spec_from_profile(profile: ColumnProfile) -> ColumnSpec:
    """Apply inference rules §2.13 to one column profile."""
    name, was_valid = sanitize_column_name(profile.name)
    ptype = pandera_type(profile.spark_type)
    spec = ColumnSpec(
        name=profile.name,
        sanitized_name=name,
        name_was_valid=was_valid,
        spark_type=profile.spark_type,
        pandera_type=ptype,
        nullable=profile.is_nullable,  # rule 2
        unique=profile.is_unique,  # rule 1
        examples=list(profile.examples),
        distinct_count=profile.distinct_count,
    )

    # rule 3: ge/le only for numeric pandera types, both bounds non-null
    # (reference: code_generator.py:39-45)
    if (
        ptype in _NUMERIC_PANDERA
        and profile.min_value is not None
        and profile.max_value is not None
    ):
        spec.ge = profile.min_value
        spec.le = profile.max_value

    # rule 4: isin only when distinct <= 10; nulls are never in the list
    # because examples come from non-null values only
    # (reference: code_generator.py:57-75)
    if (
        profile.distinct_count is not None
        and profile.distinct_is_exact
        and 0 < profile.distinct_count <= ISIN_MAX_DISTINCT
        and profile.examples
    ):
        spec.isin = list(profile.examples)

    # rules 6-7: string constraints
    if ptype == "String":
        sc = StringConstraints(
            min_length=profile.min_length,
            max_length=profile.max_length,
            pattern=profile.pattern,
            pattern_name=profile.pattern_name,
            starts_with=profile.starts_with,
            ends_with=profile.ends_with,
        )
        if not sc.is_empty():
            spec.string_constraints = sc
    return spec


# Ordered (first match wins) name-substring -> semantic type rules,
# matching the reference's heuristic fallback exactly
# (reference: llm_enricher.py:217-250; the LLM call itself is out of
# engine scope — SURVEY.md §2.12 V4 keeps only this pure heuristic).
_SEMANTIC_RULES: list[tuple[tuple[str, ...], str]] = [
    (("id", "identifier", "key"), "identifier"),
    (("name", "title"), "name"),
    (("email", "mail"), "email"),
    (("phone", "tel", "mobile"), "phone"),
    (("date", "time", "timestamp"), "temporal"),
    (("price", "cost", "amount", "total"), "monetary"),
    (("count", "quantity", "number"), "quantity"),
    (("url", "link", "website"), "url"),
    (("address", "street", "city", "zip"), "address"),
    (("description", "comment", "note"), "text"),
    (("status", "state", "type", "category"), "categorical"),
    (("flag", "is_", "has_", "enabled"), "boolean"),
]


def infer_semantic_type(column_name: str) -> str:
    """Name-based semantic type ('unknown' when nothing matches)."""
    low = column_name.lower()
    for needles, semantic in _SEMANTIC_RULES:
        if any(n in low for n in needles):
            return semantic
    return "unknown"


def schema_from_profiles(
    name: str, profiles: dict[str, ColumnProfile]
) -> TableSchema:
    schema = TableSchema(name=sanitize_class_name(name))
    for prof in profiles.values():
        spec = spec_from_profile(prof)
        if spec.pandera_type is None:
            # rule 9: unmappable dtypes are skipped, not errors
            continue
        schema.columns.append(spec)
    return schema


def infer_schema(
    df: DataFrame,
    name: str = "GeneratedModel",
    columns: Optional[Sequence[str]] = None,
    exact_distinct="auto",
    detect_patterns: bool = True,
    semantic_types: bool = False,
    with_examples: bool = True,
    pattern_sample: Optional[int] = None,
) -> TableSchema:
    """Profile ``df`` and infer its constraint schema — the distributed
    replacement for the reference's ``ModelGenerator.generate``
    lifecycle (SURVEY.md §3). ``semantic_types=True`` annotates each
    column with the name-heuristic semantic type (V4's non-LLM half).

    Default ``exact_distinct="auto"`` is the warehouse-scale path:
    HLL everywhere, exact distinct counts only for HLL-small domains
    (the only ones the isin rule can fire on), and uniqueness settled
    by an exact duplicate-existence probe instead of materializing a
    near-unique column's entire distinct set through a shuffle. Pass
    ``True`` for full exact parity (every column melted, top-5
    examples even for high-cardinality columns)."""
    profiles = profile_table(
        df,
        columns=columns,
        exact_distinct=exact_distinct,
        detect_patterns=detect_patterns,
        with_examples=with_examples,
        pattern_sample=pattern_sample,
    )
    schema = schema_from_profiles(name, profiles)
    if semantic_types:
        for spec in schema.columns:
            sem = infer_semantic_type(spec.name)
            if sem != "unknown":
                spec.description = sem
    return schema


def infer_and_validate(
    df: DataFrame,
    name: str = "GeneratedModel",
    partition_cols: Optional[Sequence[str]] = None,
    check_unique: bool = False,
    persist: bool = True,
    **infer_kwargs,
):
    """Infer a schema AND validate the same frame against it, sharing
    ONE materialization of the input across every pass.

    The combined flow is inherently multi-pass — the fused stats agg,
    the small-domain melt, the uniqueness-existence probes, then the
    validation agg — and each pass otherwise re-evaluates ``df``'s full
    lineage. When that lineage is more than a bare columnar scan (a
    repartition, a join, a decoded view), re-evaluation dominates:
    ``persist=True`` (MEMORY_AND_DISK) computes it once and serves the
    remaining passes from storage, then unpersists eagerly.

    Pass ``persist=False`` when the input IS a bare parquet/Iceberg
    scan bigger than cluster storage memory — the passes are all
    streaming aggregates, so re-scanning N× is the correct 100-TB
    trade against evicting the working set. Returns
    ``(TableSchema, ValidationResult)``; the verdicts frame is local
    (already computed), so consuming it never re-scans."""
    from pyspark import StorageLevel

    from pandera_forge_spark.validator import validate_table

    target = df
    if persist:
        target = df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        schema = infer_schema(target, name, **infer_kwargs)
        result = validate_table(
            target,
            schema,
            partition_cols=partition_cols,
            check_unique=check_unique,
        )
    finally:
        if persist:
            target.unpersist()
    return schema, result
