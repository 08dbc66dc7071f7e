"""Property-based tests (hypothesis) for the pure driver-side
functions, plus a seeded cross-backend differential: the Spark profile
must equal pandas-computed truth on the same data (SURVEY.md §5, our
test-strategy items 1 and 3 — the reference has no property tests and
mocks Spark entirely)."""

import keyword
import re

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from pandera_forge_spark.drift import psi_of
from pandera_forge_spark.patterns import induce_custom_regex
from pandera_forge_spark.sanitizer import sanitize_class_name, sanitize_column_name


@given(st.one_of(st.text(max_size=40), st.integers(), st.floats(allow_nan=False)))
@settings(max_examples=300, deadline=None)
def test_sanitize_column_name_always_valid_identifier(name):
    out, was_valid = sanitize_column_name(name)
    assert out.isidentifier() and not keyword.iskeyword(out)
    # idempotent: sanitizing a sanitized name changes nothing
    again, ok2 = sanitize_column_name(out)
    assert again == out and ok2
    # was_valid=True implies the input WAS the output
    if was_valid:
        assert out == name


@given(st.text(max_size=40))
@settings(max_examples=300, deadline=None)
def test_sanitize_class_name_always_valid(name):
    out = sanitize_class_name(name)
    assert out.isidentifier()
    assert sanitize_class_name(out) == out


@given(st.lists(st.text(alphabet="abcXYZ019.-_ #", min_size=1, max_size=12),
                min_size=1, max_size=30))
@settings(max_examples=200, deadline=None)
def test_induced_regex_matches_its_inputs(values):
    pattern = induce_custom_regex(values)
    if pattern is None:
        return
    rx = re.compile(pattern)
    # the induced pattern must fully match >= 80% of the inputs (the
    # consensus set it was induced from)
    hits = sum(1 for v in values if v and rx.fullmatch(v))
    non_empty = sum(1 for v in values if v)
    assert non_empty == 0 or hits / non_empty >= 0.5


@given(
    st.lists(st.floats(min_value=0.001, max_value=1.0), min_size=2, max_size=10)
)
@settings(max_examples=200, deadline=None)
def test_psi_nonnegative_and_zero_on_self(weights):
    total = sum(weights)
    p = [w / total for w in weights]
    assert abs(psi_of(p, p)) < 1e-12
    q = list(reversed(p))
    assert psi_of(p, q) >= -1e-12


def test_cross_backend_differential(spark):
    """Spark profile == pandas truth on the same random frame."""
    import numpy as np

    rng = np.random.default_rng(42)
    n = 2000
    pdf = pd.DataFrame(
        {
            "i": rng.integers(-1000, 1000, n),
            "f": rng.normal(10, 3, n).round(6),
            "s": [f"v{int(x)}" for x in rng.integers(0, 7, n)],
        }
    )
    pdf.loc[rng.choice(n, 50, replace=False), "f"] = None

    from pandera_forge_spark.profiler import profile_table

    # Arrow conversion preserves pandas NA as Spark NULL; the classic
    # converter would smuggle them in as NaN (NaN != NULL in Spark —
    # SURVEY.md §7 hard-parts #4)
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    df = spark.createDataFrame(pdf)
    p = profile_table(df, exact_distinct=True, detect_patterns=False)

    assert p["i"].null_count == int(pdf["i"].isna().sum())
    assert p["i"].distinct_count == pdf["i"].nunique()
    assert p["i"].min_value == int(pdf["i"].min())
    assert p["i"].max_value == int(pdf["i"].max())

    assert p["f"].null_count == int(pdf["f"].isna().sum())
    assert abs(p["f"].mean - pdf["f"].mean()) < 1e-9
    assert abs(p["f"].stddev - pdf["f"].std(ddof=1)) < 1e-9

    assert p["s"].distinct_count == pdf["s"].nunique()
    vc = pdf["s"].value_counts()
    top = dict(
        (v, c) for v, c in zip(vc.index, vc.values)
    )
    got = {v: None for v in [e for e in p["s"].examples]}
    assert set(got) == set(top)  # 7 distinct <= 10 -> all values listed
