"""Value-level association lift (profiler.association_pairs)."""

import math

import pytest

from pandera_forge_spark.plans.inspect import has_python_udf
from pandera_forge_spark.profiler import association_pairs


def _collect(out):
    return [
        (
            r["val_a"],
            r["val_b"],
            r["n_ab"],
            r["n_a"],
            r["n_b"],
            r["n"],
            r["lift_micro"],
            r["lift"],
        )
        for r in out.collect()
    ]


def _replay(pairs, min_support=2, top_n=20):
    from collections import Counter

    joint = Counter(pairs)
    ca = Counter(a for a, _ in pairs)
    cb = Counter(b for _, b in pairs)
    n = len(pairs)
    rows = []
    for (a, b), c in joint.items():
        if c < min_support:
            continue
        lift = (c * float(n)) / (ca[a] * float(cb[b]))
        micro = math.floor(lift * 1e6 + 0.5)
        rows.append((a, b, c, ca[a], cb[b], n, micro, micro / 1e6))
    rows.sort(key=lambda r: (-r[6], (r[0] is not None, r[0]), (r[1] is not None, r[1])))
    return rows[:top_n]


def test_matches_python_replay(spark):
    import random

    rng = random.Random(11)
    pairs = [
        (
            rng.choice("abcd"),
            rng.choice("uv") if rng.random() < 0.6 else rng.choice("wxyz"),
        )
        for _ in range(400)
    ]
    df = spark.createDataFrame(pairs, "a string, b string")
    got = _collect(association_pairs(df, "a", "b", min_support=2, top_n=10))
    assert got == _replay(pairs, min_support=2, top_n=10)


def test_independence_lift_one(spark):
    rows = [(a, b) for a in "xy" for b in "uv" for _ in range(6)]
    df = spark.createDataFrame(rows, "a string, b string")
    got = _collect(association_pairs(df, "a", "b", min_support=1, top_n=10))
    assert len(got) == 4
    assert all(r[6] == 1000000 for r in got)


def test_planted_association_tops(spark):
    # ("src1", "de") co-occur far above independence
    rows = [("src1", "de")] * 20 + [("src2", "en")] * 20
    rows += [("src1", "en"), ("src2", "de")] * 2
    df = spark.createDataFrame(rows, "a string, b string")
    got = _collect(association_pairs(df, "a", "b", min_support=2, top_n=2))
    top_pairs = {(r[0], r[1]) for r in got}
    assert top_pairs == {("src1", "de"), ("src2", "en")}
    assert all(r[7] > 1.5 for r in got)


def test_min_support_drops_singletons(spark):
    rows = [("x", "u")] * 5 + [("loner", "once")]
    df = spark.createDataFrame(rows, "a string, b string")
    got = _collect(association_pairs(df, "a", "b", min_support=2, top_n=10))
    assert [(r[0], r[1]) for r in got] == [("x", "u")]


def test_topn_tiebreak_is_value_order(spark):
    # four cells with identical lift: cut must take val_a/val_b ASC
    rows = [(a, b) for a in "pq" for b in "st" for _ in range(3)]
    df = spark.createDataFrame(rows, "a string, b string")
    got = _collect(association_pairs(df, "a", "b", min_support=1, top_n=2))
    assert [(r[0], r[1]) for r in got] == [("p", "s"), ("p", "t")]


def test_nulls_as_category_and_dropped(spark):
    rows = [("x", None)] * 3 + [("x", "u")] + [(None, "u")] * 2
    df = spark.createDataFrame(rows, "a string, b string")
    with_nulls = _collect(
        association_pairs(df, "a", "b", min_support=2, top_n=10)
    )
    assert {(r[0], r[1]) for r in with_nulls} == {("x", None), (None, "u")}
    replay = _replay(
        [("x", "<N>")] * 3 + [("x", "u")] + [("<N>", "u")] * 2, 2, 10
    )
    assert [(r[2], r[6]) for r in with_nulls] == [(r[2], r[6]) for r in replay]
    dropped = _collect(
        association_pairs(
            df, "a", "b", min_support=1, top_n=10, include_nulls=False
        )
    )
    assert [(r[0], r[1], r[5]) for r in dropped] == [("x", "u", 1)]


def test_fences(spark):
    df = spark.createDataFrame([("x", "u")], "a string, b string")
    with pytest.raises(ValueError, match="not in frame"):
        association_pairs(df, "a", "zzz")
    with pytest.raises(ValueError, match="min_support"):
        association_pairs(df, "a", "b", min_support=0)
    with pytest.raises(ValueError, match="top_n"):
        association_pairs(df, "a", "b", top_n=0)


def test_partition_independent(spark):
    rows = [(f"a{i % 5}", f"b{i % 3}") for i in range(120)]
    df = spark.createDataFrame(rows, "a string, b string")
    x = _collect(association_pairs(df.repartition(7), "a", "b"))
    y = _collect(association_pairs(df.coalesce(1), "a", "b"))
    assert x == y == _replay(rows)


def test_no_python_udf(spark):
    df = spark.createDataFrame([("x", "u")], "a string, b string")
    assert not has_python_udf(association_pairs(df, "a", "b"))
