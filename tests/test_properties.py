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


# ---- round-4 session operators: properties of the pure references
# the Spark implementations are separately proven equal to
# (tests/test_text.py::_winnow_local, test_layout.py::_morton_local),
# chaining hypothesis coverage onto the distributed paths.

def _winnow_ref(text, k=8, w=4):
    import hashlib
    import re as _re

    s = _re.sub(r"[^A-Za-z0-9]+", "", text or "").lower()
    if not s:
        return set()
    m = max(len(s) - k + 1, 1)
    grams = [
        int(hashlib.md5(s[i : i + k].encode()).hexdigest()[:12], 16)
        for i in range(m)
    ]
    nwin = max(len(grams) - w + 1, 1)
    return {min(grams[j : j + w]) for j in range(nwin)}


@given(
    st.text(alphabet="abcdefgh ", min_size=0, max_size=60),
    st.text(alphabet="abcdefgh ", min_size=0, max_size=60),
    st.text(alphabet="qrstuvwx", min_size=11, max_size=40),
)
@settings(max_examples=200, deadline=None)
def test_winnow_shared_substring_always_shares_a_fingerprint(pre, post, shared):
    """The winnowing guarantee (k=8, w=4): any shared substring of
    length >= k + w - 1 = 11 in normalized space yields at least one
    shared fingerprint, regardless of context. The contexts use a
    disjoint alphabet so they cannot accidentally extend the match."""
    a = _winnow_ref(pre + shared + post)
    b = _winnow_ref(post + shared + pre)
    assert a & b


@given(st.text(alphabet="abcd0 .!", max_size=120))
@settings(max_examples=300, deadline=None)
def test_winnow_density_bounds(text):
    import re as _re

    fps = _winnow_ref(text)
    s = _re.sub(r"[^A-Za-z0-9]+", "", text or "").lower()
    if not s:
        assert fps == set()
        return
    m = max(len(s) - 8 + 1, 1)
    assert 1 <= len(fps) <= max(m - 4 + 1, 1)


def _morton(codes, bits):
    z = 0
    for d, c in enumerate(codes):
        for i in range(bits):
            z |= ((c >> i) & 1) << (i * len(codes) + d)
    return z


@given(
    st.integers(min_value=0, max_value=1023),
    st.integers(min_value=0, max_value=1023),
    st.integers(min_value=0, max_value=1023),
)
@settings(max_examples=300, deadline=None)
def test_morton_is_injective_and_decodable(a, b, c):
    z = _morton([a, b, c], 10)
    # decode by de-interleaving: bijectivity means no two coordinate
    # triples collide
    got = [0, 0, 0]
    for i in range(10):
        for d in range(3):
            got[d] |= ((z >> (i * 3 + d)) & 1) << i
    assert got == [a, b, c]
    assert 0 <= z < 1 << 30


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=16,
    )
)
@settings(max_examples=300, deadline=None)
def test_int8_quantization_roundtrip_property(vec):
    """Mirror of similarity.quantize_embeddings algebra: codes stay in
    [-127, 127] and reconstruction is within scale/2 per component."""
    import math

    ma = max(abs(x) for x in vec)
    scale = ma / 127.0
    # subnormal max-abs underflows the scale to 0: the operator
    # quantizes such vectors to zeros (guard on scale, not max-abs)
    if scale == 0:
        return
    raw = [math.floor(x / scale + 0.5) for x in vec]
    codes = [max(-127, min(127, c)) for c in raw]
    smallest_normal = 2.2250738585072014e-308
    for x, q, r in zip(vec, codes, raw):
        if q != r:
            # the clamp may only ever BIND when the scale is subnormal
            # (its relative rounding error is what lets x/scale blow
            # past the code range); for any normal scale, raw codes
            # must already be in [-127, 127]
            assert scale < smallest_normal, (x, scale, r)
        else:
            # and every unclamped component keeps the scale/2
            # reconstruction bound
            assert abs(q * scale - x) <= scale / 2 * (1 + 1e-12)


@given(
    st.integers(min_value=1, max_value=10**9),
    st.integers(min_value=0, max_value=10**9),
)
@settings(max_examples=300, deadline=None)
def test_bm25_idf_nonnegative(n_docs, df_raw):
    """The ln(1 + (N-df+0.5)/(df+0.5)) idf form must be non-negative
    for every df <= N (the property the Lucene form exists for)."""
    import math

    df = min(df_raw, n_docs)
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    assert idf >= 0.0
