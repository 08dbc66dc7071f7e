"""Parity with reference tests/test_pattern_detector.py (driver-side
helpers) — the distributed equivalents are covered in test_profiler.py."""

from pandera_forge_spark.patterns import (
    NAMED_PATTERNS,
    detect_pattern_pandas,
    induce_custom_regex,
)


def test_email():
    vals = ["user@example.com", "admin@test.org", "j.doe+x@sub.domain.co"]
    assert detect_pattern_pandas(vals)[0] == "email"


def test_url():
    vals = ["https://example.com", "http://test.org/path?q=1"]
    assert detect_pattern_pandas(vals)[0] == "url"


def test_uuid():
    vals = ["123e4567-e89b-12d3-a456-426614174000", "00000000-0000-0000-0000-000000000000"]
    assert detect_pattern_pandas(vals)[0] == "uuid"


def test_ipv4():
    vals = ["192.168.1.1", "10.0.0.1", "255.255.255.0"]
    assert detect_pattern_pandas(vals)[0] == "ipv4"


def test_date_iso():
    vals = ["2023-01-01", "1999-12-31"]
    assert detect_pattern_pandas(vals)[0] == "date_iso"


def test_numeric_string():
    vals = ["12345", "67890"]
    assert detect_pattern_pandas(vals)[0] == "numeric_string"


def test_alphanumeric():
    vals = ["ABC123", "XYZ789"]
    assert detect_pattern_pandas(vals)[0] == "alphanumeric"


def test_no_pattern():
    vals = ["random string 1", "totally different!", "yet another, thing"]
    assert detect_pattern_pandas(vals) is None


def test_threshold():
    vals = ["user@example.com", "nope", "also nope", "still nope"]
    assert detect_pattern_pandas(vals, min_match_ratio=0.9) is None
    assert detect_pattern_pandas(vals, min_match_ratio=0.2)[0] == "email"


def test_nulls_ignored():
    vals = ["user@example.com", None, "admin@test.org", None]
    assert detect_pattern_pandas(vals)[0] == "email"


def test_empty():
    assert detect_pattern_pandas([]) is None
    assert detect_pattern_pandas([None, None]) is None


def test_order_first_hit_wins():
    # digits match numeric_string AND postal_code_us AND alphanumeric;
    # numeric_string is declared first → wins
    names = list(NAMED_PATTERNS)
    assert names.index("numeric_string") < names.index("alphanumeric")
    assert detect_pattern_pandas(["12345", "54321"])[0] == "numeric_string"


def test_custom_regex():
    rx = induce_custom_regex(["A-123", "B-456", "C-789"])
    assert rx == r"^[A-Z]\-\d\d\d$"


def test_custom_regex_contains_classes():
    rx = induce_custom_regex(["X1", "Y2", "Z3"])
    assert "[A-Z]" in rx and r"\d" in rx


def test_custom_regex_inconsistent():
    assert induce_custom_regex(["abc", "123", "a1", "!!", "zz9"]) is None
