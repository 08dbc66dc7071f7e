"""PII scan / flag / redact operators (operators/pii.py)."""

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.operators.pii import (
    PII_PATTERNS,
    pii_flagged_rows,
    pii_scan,
    redact,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "clean text about nothing in particular"),
        (2, "contact me at alice@example.com for details"),
        (3, "my ssn is 123-45-6789 do not share"),
        (4, "card 4111 1111 1111 1111 expired"),
        (5, "server at 10.0.0.1 and backup 192.168.1.254"),
        (6, "call (555) 123-4567 or 555-987-6543"),
        (7, "bob@mail.org said ping 8.8.8.8"),
        (8, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_scan_counts(corpus):
    out = {
        (r["column"], r["pattern"]): (r["rows"], r["hits"])
        for r in pii_scan(corpus, ["text"]).collect()
    }
    assert out[("text", "email")] == (8, 2)
    assert out[("text", "ssn")] == (8, 1)
    assert out[("text", "credit_card")] == (8, 1)
    assert out[("text", "phone_us")] == (8, 1)
    assert out[("text", "ipv4")] == (8, 2)


def test_pii_flagged_rows(corpus):
    got = {
        r["doc_id"]: list(r["pii_kinds"])
        for r in pii_flagged_rows(corpus, "doc_id", "text").collect()
    }
    assert 1 not in got and 8 not in got
    assert got[2] == ["email"]
    assert got[3] == ["ssn"]
    assert got[7] == ["email", "ipv4"]
    assert got[5] == ["ipv4"]


def test_redact_scrubs_all_patterns(corpus):
    red = redact(corpus, ["text"])
    texts = {r["doc_id"]: r["text"] for r in red.collect()}
    assert texts[2] == "contact me at [PII:email] for details"
    assert texts[3] == "my ssn is [PII:ssn] do not share"
    assert texts[4] == "card [PII:credit_card] expired"
    assert texts[6] == "call [PII:phone_us] or [PII:phone_us]"
    assert texts[1] == "clean text about nothing in particular"
    assert texts[8] is None
    # redacted corpus re-scans clean
    rescan = pii_scan(red, ["text"])
    assert rescan.agg(F.sum("hits")).collect()[0][0] == 0


def test_redact_is_projection_only(corpus):
    plan = redact(corpus, ["text"])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_flagged_rows_no_shuffle_no_udf(corpus):
    plan = (
        pii_flagged_rows(corpus, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_patterns_are_re2_safe():
    # the oracle runs the same strings under DuckDB's RE2 — no
    # backreferences / lookaround, which RE2 rejects
    import re

    for rx in PII_PATTERNS.values():
        re.compile(rx)
        assert "(?=" not in rx and "(?!" not in rx and "\\1" not in rx
