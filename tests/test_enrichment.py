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


# --------------------------------------------------- HTTP endpoint path


def _mock_llm_server(reply_body: bytes, status: int = 200):
    """A one-shot local HTTP server speaking the reference's /api/chat
    shape (llm_enricher.py:185-199). Returns (server, port, requests)."""
    import http.server
    import json
    import threading

    captured = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            captured.append(
                (self.path, json.loads(self.rfile.read(n).decode()))
            )
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(reply_body)

        def log_message(self, *a):  # silence
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1], captured


def test_http_enricher_against_local_mock(monkeypatch):
    """The gated network path end-to-end: prompt built with the
    reference's structure, POSTed in the /api/chat shape, the JSON
    object extracted from a chatty reply (regex-extraction parity),
    and the result applied to the schema."""
    import json

    from pandera_forge_spark.enrichment import HttpEnricher

    reply = json.dumps(
        {
            "message": {
                "content": "Sure! Here is the analysis:\n"
                '{"description": "Unique customer key", '
                '"semantic_type": "customer_id", '
                '"suggested_validations": ["ge(1)"], "business_rules": []}'
                "\nLet me know if you need more."
            }
        }
    ).encode()
    srv, port, captured = _mock_llm_server(reply)
    try:
        monkeypatch.setenv("PFS_ENRICH_ENDPOINT", f"http://127.0.0.1:{port}")
        monkeypatch.setenv("PFS_ENRICH_MODEL", "test-model")
        enricher = HttpEnricher.from_env()
        assert enricher is not None and enricher.model == "test-model"

        out = enricher.analyze_column(
            "customer_id", [1, 2, 3], "bigint", {"ge": 1}
        )
        assert out["semantic_type"] == "customer_id"
        assert out["suggested_validations"] == ["ge(1)"]

        path, body = captured[0]
        assert path == "/api/chat"
        assert body["model"] == "test-model" and body["stream"] is False
        assert body["messages"][0]["role"] == "system"
        user = body["messages"][1]["content"]
        assert "Column Name: customer_id" in user
        assert "Sample Values: 1, 2, 3" in user
        assert '"semantic_type"' in user  # reference prompt structure

        s = enrich_schema(_schema(), enricher)
        by = {c.name: c.description for c in s.columns}
        assert by["customer_id"] == "Unique customer key [customer_id]"
    finally:
        srv.shutdown()


def test_http_enricher_gate_and_degrade(monkeypatch):
    """Without the env var the gate yields None (no implicit network);
    an unreachable endpoint degrades per column to the heuristic."""
    from pandera_forge_spark.enrichment import HttpEnricher

    monkeypatch.delenv("PFS_ENRICH_ENDPOINT", raising=False)
    assert HttpEnricher.from_env() is None

    dead = HttpEnricher("http://127.0.0.1:1", timeout=0.5)
    s = enrich_schema(_schema(), dead)  # must not raise
    by = {c.name: c.description for c in s.columns}
    assert "identifier" in by["customer_id"]  # heuristic fallback applied
