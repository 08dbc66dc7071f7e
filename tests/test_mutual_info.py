"""Pairwise mutual information (profiler.mutual_information)."""

import math

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.plans.inspect import has_python_udf
from pandera_forge_spark.profiler import mutual_information


def _mi(out):
    return {
        (r["col_a"], r["col_b"]): (r["n"], r["cells"], r["mi_micro"], r["mi_nats"])
        for r in out.collect()
    }


def _expected_micro(pairs):
    # python replay of the quantized per-cell sum
    from collections import Counter

    joint = Counter(pairs)
    ca = Counter(a for a, _ in pairs)
    cb = Counter(b for _, b in pairs)
    n = len(pairs)
    total = 0
    for (a, b), c in joint.items():
        term = (c / n) * (math.log(c) + math.log(n) - math.log(ca[a]) - math.log(cb[b]))
        total += math.floor(term * 1e6 + 0.5)
    return total


def test_mi_exact_independence_is_zero(spark):
    # balanced 2x2 grid: counts factorize exactly -> every term ln(1)=0
    rows = [(a, b) for a in "xy" for b in "uv" for _ in range(5)]
    df = spark.createDataFrame(rows, "a string, b string")
    got = _mi(mutual_information(df, ["a", "b"]))
    n, cells, micro, nats = got[("a", "b")]
    assert (n, cells, micro, nats) == (20, 4, 0, 0.0)


def test_mi_perfect_dependence_equals_entropy(spark):
    # b is a bijection of a -> MI = H(a) = ln 2 for a balanced binary a
    rows = [("x", "u")] * 8 + [("y", "v")] * 8
    df = spark.createDataFrame(rows, "a string, b string")
    got = _mi(mutual_information(df, ["a", "b"]))
    _, _, micro, nats = got[("a", "b")]
    # per-cell quantization: each cell rounds individually, so compare
    # against the replay, and the float answer to ln 2 within quantum
    assert micro == _expected_micro(rows)
    assert nats == pytest.approx(math.log(2), abs=2e-6)


def test_mi_matches_python_replay(spark):
    import random

    rng = random.Random(5)
    pairs = [
        (rng.choice("abc"), rng.choice("uvwx") if rng.random() < 0.7 else "u")
        for _ in range(500)
    ]
    df = spark.createDataFrame(pairs, "a string, b string")
    got = _mi(mutual_information(df, ["a", "b"]))
    assert got[("a", "b")][2] == _expected_micro(pairs)


def test_mi_nulls_as_category_vs_dropped(spark):
    rows = [("x", "u"), ("x", None), (None, "u"), ("y", "v")]
    df = spark.createDataFrame(rows, "a string, b string")
    with_nulls = _mi(mutual_information(df, ["a", "b"]))
    dropped = _mi(mutual_information(df, ["a", "b"], include_nulls=False))
    assert with_nulls[("a", "b")][0] == 4
    assert dropped[("a", "b")][0] == 2
    # python replay with NULL as a category
    assert with_nulls[("a", "b")][2] == _expected_micro(
        [("x", "u"), ("x", "<N>"), ("<N>", "u"), ("y", "v")]
    )


def test_mi_multi_pair_output(spark):
    rows = [("x", "u", "1"), ("y", "v", "2")] * 3
    df = spark.createDataFrame(rows, "a string, b string, c string")
    got = _mi(mutual_information(df, ["a", "b", "c"]))
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}


def test_mi_fences(spark):
    df = spark.createDataFrame([("x",)], "a string")
    with pytest.raises(ValueError, match="two columns"):
        mutual_information(df, ["a"])
    with pytest.raises(ValueError, match="not in frame"):
        mutual_information(df, ["a", "zzz"])


def test_mi_partition_independent(spark):
    rows = [("x", "u"), ("x", "v"), ("y", "u"), ("y", "u"), ("z", "w")] * 7
    df = spark.createDataFrame(rows, "a string, b string")
    a = _mi(mutual_information(df.repartition(9), ["a", "b"]))
    b = _mi(mutual_information(df.coalesce(1), ["a", "b"]))
    assert a == b


def test_mi_no_python_udf(spark):
    df = spark.createDataFrame([("x", "u")], "a string, b string")
    assert not has_python_udf(mutual_information(df, ["a", "b"]))


def test_mi_zero_surviving_rows_is_zero_not_null(spark):
    # review fix: all rows NULL on one side + include_nulls=False ->
    # (n=0, cells=0, mi 0), never NULL
    df = spark.createDataFrame([("x", None), ("y", None)], "a string, b string")
    got = _mi(mutual_information(df, ["a", "b"], include_nulls=False))
    assert got[("a", "b")] == (0, 0, 0, 0.0)
