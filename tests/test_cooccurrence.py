"""cooccurrence_pmi — python replay, fences, discipline asserts."""

import math
from collections import Counter
from itertools import combinations

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.operators.text import cooccurrence_pmi


DOCS = [
    (0, "tokyo yen market"),
    (1, "tokyo yen bank"),
    (2, "tokyo yen market crash"),
    (3, "london pound market"),
    (4, "london pound bank"),
    (5, "tokyo pound noodle"),
    (6, "yen yen yen tokyo"),  # within-doc repeats count ONCE
    (7, ""),
]


def _replay(docs, min_count):
    docsets = [set(t.lower().split()) for _, t in docs]
    docsets = [s for s in docsets if s]
    n = len(docsets)
    tf = Counter(t for s in docsets for t in s)
    cab = Counter()
    for s in docsets:
        for a, b in combinations(sorted(s), 2):
            cab[(a, b)] += 1
    out = {}
    for (a, b), c in cab.items():
        if c < min_count:
            continue
        pmi = (
            math.log(float(n))
            - math.log(float(tf[a]))
            - math.log(float(tf[b]))
            + math.log(float(c))
        )
        out[(a, b)] = (c, math.floor(pmi * 1e6))
    return out


def test_pmi_matches_replay(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    for mc in (1, 2):
        got = {
            (r["t1"], r["t2"]): (r["c_ab"], r["pmi_micro"])
            for r in cooccurrence_pmi(df, min_count=mc).collect()
        }
        assert got == _replay(DOCS, mc), mc


def test_pmi_association_ordering(spark):
    """(tokyo, yen) co-occur 4/4 of tokyo's docs -> top association;
    (market, tokyo) is weaker."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r["t1"], r["t2"]): r["pmi_micro"]
        for r in cooccurrence_pmi(df, min_count=2).collect()
    }
    assert got[("tokyo", "yen")] > got[("market", "tokyo")]


def test_pmi_fences(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="min_count"):
        cooccurrence_pmi(df, min_count=0)
    with pytest.raises(ValueError, match="max_terms_per_doc"):
        cooccurrence_pmi(df, max_terms_per_doc=1)
    with pytest.raises(ValueError, match="lacks columns"):
        cooccurrence_pmi(df, text_col="nope")
    big = spark.createDataFrame(
        [(0, " ".join(f"w{i}" for i in range(30)))], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="exceeds max_terms_per_doc"):
        cooccurrence_pmi(big, max_terms_per_doc=10, min_count=1).collect()


def test_pmi_no_udf_no_window_partition_independent(spark):
    from pandera_forge_spark.plans.inspect import executed_plan, has_python_udf

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = cooccurrence_pmi(df, min_count=1)
    assert not has_python_udf(out)
    assert "Window" not in executed_plan(out)
    one = sorted(map(tuple, cooccurrence_pmi(df.repartition(1), min_count=1).collect()))
    many = sorted(map(tuple, cooccurrence_pmi(df.repartition(7), min_count=1).collect()))
    assert one == many


def test_pmi_null_text_and_ids(spark):
    """NULL text tokenizes to empty (tokens() coalesces via split of
    trim(lower(NULL)) -> NULL -> filter keeps NULL array) — document
    actual behavior: NULL text rows contribute nothing."""
    df = spark.createDataFrame(
        [(0, "a b"), (1, None), (2, "a b")], "doc_id long, text string"
    )
    got = {
        (r["t1"], r["t2"]): r["c_ab"]
        for r in cooccurrence_pmi(df, min_count=1).collect()
    }
    assert got == {("a", "b"): 2}
