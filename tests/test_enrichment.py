"""Pluggable enrichment (enrichment.py) — pure metadata, no Spark."""

from pandera_forge_spark.enrichment import (
    HeuristicEnricher,
    enrich_schema,
    generate_documentation,
)
from pandera_forge_spark.schema import ColumnSpec, TableSchema


def _schema():
    return TableSchema(
        name="Orders",
        columns=[
            ColumnSpec(
                name="customer_id", sanitized_name="customer_id",
                name_was_valid=True, spark_type="bigint", pandera_type="Int64",
                ge=1, le=9999, examples=[1, 2, 3],
            ),
            ColumnSpec(
                name="note", sanitized_name="note", name_was_valid=True,
                spark_type="string", pandera_type="String", nullable=True,
            ),
        ],
    )


def test_heuristic_enricher_is_reference_fallback_shape():
    out = HeuristicEnricher().analyze_column("customer_id", [1, 2], "bigint", {})
    assert set(out) == {
        "description", "semantic_type", "suggested_validations", "business_rules",
    }
    assert out["semantic_type"] == "identifier"


def test_enrich_schema_default_and_custom():
    s = enrich_schema(_schema())
    by = {c.name: c.description for c in s.columns}
    assert "identifier" in by["customer_id"]

    class Custom:
        def analyze_column(self, column_name, sample_values, dtype, properties):
            assert properties["ge"] == 1 or column_name == "note"
            return {"description": f"DOC:{column_name}", "semantic_type": "unknown"}

    s2 = enrich_schema(_schema(), Custom())
    assert {c.description for c in s2.columns} == {"DOC:customer_id", "DOC:note"}


def test_enricher_failure_degrades_to_heuristic():
    class Broken:
        def analyze_column(self, *a, **k):
            raise RuntimeError("LLM down")

    s = enrich_schema(_schema(), Broken())
    assert all(c.description for c in s.columns)  # heuristic filled in


def test_generate_documentation_markdown():
    md = generate_documentation(enrich_schema(_schema()))
    assert md.startswith("# Orders")
    assert "| customer_id | Int64 | no |" in md
    assert "≥ 1; ≤ 9999" in md
