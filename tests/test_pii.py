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


# -------------------------------------------------------------- redact_spans


def _spans_fixture(spark):
    rows = [
        (
            1,
            [
                ("text", "mail me at bob@corp.io now", None, 0),
                ("image", None, "media://abc/1", 100),
                ("text", "ssn 123-45-6789 end", None, 200),
            ],
        ),
        (2, [("text", "clean text", None, 0)]),
        (3, [("image", None, "media://xyz/1", 0)]),
    ]
    return spark.createDataFrame(
        rows,
        "doc_id long, spans array<struct<kind string, text string, "
        "media_ref string, offset int>>",
    )


def test_redact_spans_scrubs_text_preserves_sequence(spark):
    from pandera_forge_spark.operators.pii import redact_spans
    from pandera_forge_spark.spans import span_sequence_mismatches

    df = _spans_fixture(spark)
    out = redact_spans(df)
    got = {r["doc_id"]: r["spans"] for r in out.collect()}
    assert got[1][0]["text"] == "mail me at [PII:email] now"
    assert got[1][2]["text"] == "ssn [PII:ssn] end"
    # kind / media_ref / offset bit-identical; media span untouched
    assert got[1][1] == ("image", None, "media://abc/1", 100)
    assert [s["offset"] for s in got[1]] == [0, 100, 200]
    assert got[2][0]["text"] == "clean text"
    assert got[3][0] == ("image", None, "media://xyz/1", 0)
    # the sequence invariant flags exactly the docs whose TEXT changed
    mism = span_sequence_mismatches(df, out, "doc_id")
    assert sorted(r["doc_id"] for r in mism.collect()) == [1]


def test_redact_spans_contracts(spark):
    import pytest

    from pandera_forge_spark.operators.pii import redact_spans
    from pandera_forge_spark.plans.inspect import executed_plan, has_python_udf

    df = _spans_fixture(spark)
    out = redact_spans(df)
    assert not has_python_udf(out)
    assert "Generate" not in executed_plan(out)  # no explode anywhere
    with pytest.raises(ValueError, match="missing"):
        redact_spans(df, "nope")
    flat = spark.createDataFrame([("x",)], "spans string")
    with pytest.raises(ValueError, match="array<struct"):
        redact_spans(flat)
    nk = spark.createDataFrame(
        [(1, [("a",)])], "doc_id long, spans array<struct<other string>>"
    )
    with pytest.raises(ValueError, match="lacks field"):
        redact_spans(nk)
