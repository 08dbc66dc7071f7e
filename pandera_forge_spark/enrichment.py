"""Pluggable schema enrichment — the reference's LLM-enricher CONTRACT
without the network call.

The reference enriches each column with an LLM
(`/root/reference/pandera_forge/llm_enricher.py:86-123`:
``analyze_column(column_name, sample_values, dtype, properties)`` →
``{description, semantic_type, suggested_validations, business_rules}``,
falling back to a name heuristic on failure, `:117-123`) and renders a
markdown data dictionary (`:252`). This module defines the same
per-column contract, applies any user-supplied enricher over an
inferred ``TableSchema``, defaults to the ported heuristic, and ships
``HttpEnricher`` — the reference's endpoint contract (prompt build,
OpenAI-chat-shaped POST, JSON-extraction parse, degrade-to-heuristic)
executable against any compatible HTTP endpoint, gated behind the
``PFS_ENRICH_ENDPOINT`` env var so validation never depends on a remote
service implicitly (SURVEY §2.12 V4 scopes the hosted-LLM dependency
out; the gate keeps that guarantee while making the network path real
and testable against a local mock).

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


class HttpEnricher:
    """The reference's LLM endpoint contract, executable: build the
    analysis prompt (llm_enricher.py:124-141 verbatim structure), POST
    it to an OpenAI-chat-shaped HTTP endpoint (the reference's
    requests/ollama fallback, llm_enricher.py:185-199: ``/api/chat``
    with system+user messages, ``stream: false``, temperature 0.1),
    extract the first JSON object from the reply
    (llm_enricher.py:203-209: ``\\{.*\\}`` DOTALL then loads). stdlib
    urllib only — no client SDK in this container.

    Gated by environment: ``from_env()`` returns None unless
    ``PFS_ENRICH_ENDPOINT`` is set (optional ``PFS_ENRICH_MODEL``),
    so enrichment NEVER calls a network implicitly; a failing or
    malformed endpoint degrades per column to the heuristic inside
    ``enrich_schema`` — the reference's degrade-don't-fail behavior."""

    SYSTEM = "You are a data analyst expert. Provide JSON responses only."

    def __init__(self, endpoint: str, model: str = "default", timeout: float = 10.0):
        self.endpoint = endpoint.rstrip("/")
        self.model = model
        self.timeout = float(timeout)

    @classmethod
    def from_env(cls) -> Optional["HttpEnricher"]:
        import os

        ep = os.environ.get("PFS_ENRICH_ENDPOINT")
        if not ep:
            return None
        return cls(ep, os.environ.get("PFS_ENRICH_MODEL", "default"))

    def _prompt(
        self, column_name: str, sample_values: list, dtype: str, properties: dict
    ) -> str:
        import json

        samples = ", ".join(str(v) for v in sample_values[:10])
        return (
            "Analyze this data column and provide insights:\n\n"
            f"Column Name: {column_name}\n"
            f"Data Type: {dtype}\n"
            f"Sample Values: {samples}\n"
            f"Properties: {json.dumps(properties, indent=2, default=str)}\n\n"
            "Please provide a JSON response with:\n"
            '1. "description": A clear, concise description of what this column represents\n'
            '2. "semantic_type": The semantic meaning (e.g., "customer_id", "email", "price", "timestamp")\n'
            '3. "suggested_validations": List of additional validation rules that should be applied\n'
            '4. "business_rules": List of potential business rules or constraints\n\n'
            "Respond with valid JSON only."
        )

    def _call(self, prompt: str) -> str:
        import json
        import urllib.request

        body = json.dumps(
            {
                "model": self.model,
                "messages": [
                    {"role": "system", "content": self.SYSTEM},
                    {"role": "user", "content": prompt},
                ],
                "stream": False,
                "options": {"temperature": 0.1},
            }
        ).encode()
        req = urllib.request.Request(
            f"{self.endpoint}/api/chat",
            data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return json.loads(resp.read().decode())["message"]["content"]

    @staticmethod
    def _parse(response: str) -> dict[str, Any]:
        import json
        import re

        m = re.search(r"\{.*\}", response, re.DOTALL)
        return json.loads(m.group() if m else response)

    def analyze_column(
        self, column_name: str, sample_values: list, dtype: str, properties: dict
    ) -> dict[str, Any]:
        return self._parse(
            self._call(self._prompt(column_name, sample_values, dtype, properties))
        )


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
