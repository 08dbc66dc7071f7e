"""Pluggable schema enrichment — the reference's LLM-enricher CONTRACT
without the network call.

The reference enriches each column with an LLM
(`/root/reference/pandera_forge/llm_enricher.py:86-123`:
``analyze_column(column_name, sample_values, dtype, properties)`` →
``{description, semantic_type, suggested_validations, business_rules}``,
falling back to a name heuristic on failure, `:117-123`) and renders a
markdown data dictionary (`:252`). Shipping an actual LLM call is out
of scope here (SURVEY §2.12 V4 — no credentials, no network in the
target environment, and validation must not depend on a remote
service), but the PLUGGABILITY is in scope: this module defines the
same per-column contract, applies any user-supplied enricher over an
inferred ``TableSchema``, and defaults to the ported heuristic — so a
user with an LLM client implements one method and gets the reference's
enrichment flow end to end.

Enrichment is driver-side metadata work over O(columns) specs (the
sample values come from the profile's existing top-k examples — no
extra Spark job), so a remote call here never touches the data path.
"""

from __future__ import annotations

from typing import Any, Optional, Protocol, runtime_checkable

from pandera_forge_spark.inference import infer_semantic_type
from pandera_forge_spark.schema import TableSchema


@runtime_checkable
class ColumnEnricher(Protocol):
    """The reference's per-column analysis contract
    (llm_enricher.py:86-105). Implementations may call an LLM, a data
    catalog, or anything else; they must be pure metadata → metadata."""

    def analyze_column(
        self,
        column_name: str,
        sample_values: list,
        dtype: str,
        properties: dict,
    ) -> dict[str, Any]:
        ...


class HeuristicEnricher:
    """Default enricher: the reference's own no-LLM fallback
    (llm_enricher.py:117-123) — a name-pattern semantic type plus a
    typed description. Deterministic, offline, always available."""

    def analyze_column(
        self, column_name: str, sample_values: list, dtype: str, properties: dict
    ) -> dict[str, Any]:
        sem = infer_semantic_type(column_name)
        return {
            "description": f"Column '{column_name}' of type {dtype}",
            "semantic_type": sem,
            "suggested_validations": [],
            "business_rules": [],
        }


def enrich_schema(
    schema: TableSchema, enricher: Optional[ColumnEnricher] = None
) -> TableSchema:
    """Run the enricher over every column spec, recording
    ``semantic_type``/``description`` on the spec (the description
    feeds codegen comments and the JSON contract). Enricher failures
    fall back per column to the heuristic — the reference's
    degrade-don't-fail behavior (llm_enricher.py:112-123). Returns the
    same schema object for chaining."""
    chosen = enricher or HeuristicEnricher()
    fallback = HeuristicEnricher()
    for spec in schema.columns:
        props = {
            "nullable": spec.nullable,
            "unique": spec.unique,
            "ge": spec.ge,
            "le": spec.le,
            "isin": spec.isin,
        }
        try:
            out = chosen.analyze_column(
                spec.name, list(spec.examples), spec.spark_type, props
            ) or {}
        except Exception:  # noqa: BLE001 — degrade to heuristic, never fail
            out = fallback.analyze_column(
                spec.name, list(spec.examples), spec.spark_type, props
            )
        sem = out.get("semantic_type")
        desc = out.get("description")
        if desc:
            spec.description = desc if not sem or sem == "unknown" else f"{desc} [{sem}]"
        elif sem and sem != "unknown":
            spec.description = sem
    return schema


def generate_documentation(schema: TableSchema) -> str:
    """Markdown data dictionary for an (enriched) schema — the
    reference's ``generate_documentation`` surface
    (llm_enricher.py:252-...), rendered from the spec fields."""
    lines = [
        f"# {schema.name}",
        "",
        "| Column | Type | Nullable | Constraints | Description |",
        "|---|---|---|---|---|",
    ]
    for s in schema.columns:
        cons = []
        if s.unique:
            cons.append("unique")
        if s.ge is not None:
            cons.append(f"≥ {s.ge}")
        if s.le is not None:
            cons.append(f"≤ {s.le}")
        if s.isin is not None:
            cons.append(f"∈ {s.isin}")
        sc = s.string_constraints
        if sc is not None and sc.pattern is not None:
            cons.append(f"~ /{sc.pattern}/")
        lines.append(
            "| {} | {} | {} | {} | {} |".format(
                s.name,
                s.pandera_type or s.spark_type,
                "yes" if s.nullable else "no",
                "; ".join(cons) or "—",
                s.description or "",
            )
        )
    return "\n".join(lines) + "\n"
