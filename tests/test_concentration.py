"""Key-concentration profile (profiler.concentration_profile)."""

import math

import pytest

from pandera_forge_spark.plans.inspect import has_python_udf
from pandera_forge_spark.profiler import concentration_profile


def _rows(out):
    return {
        (r["metric"], r["k"]): (
            r["n_rows"],
            r["n_keys"],
            r["covered_rows"],
            r["value_micro"],
            r["value"],
        )
        for r in out.collect()
    }


def _replay(keys, top_ks=(1, 10, 100)):
    """Python replay: exact integer counts -> shares + Gini -> quantize."""
    from collections import Counter

    counts = Counter(keys)
    n_rows = len(keys)
    n_keys = len(counts)
    out = {}
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], (kv[0] is not None, kv[0])))
    for k in top_ks:
        covered = sum(c for _, c in ordered[:k])
        micro = math.floor(covered / n_rows * 1e6 + 0.5)
        out[("topk_share", k)] = (n_rows, n_keys, covered, micro, micro / 1e6)
    asc = sorted(counts.values())
    s = sum((i + 1) * c for i, c in enumerate(asc))
    gini = (2.0 * s - (n_keys + 1) * n_rows) / (n_keys * n_rows)
    micro = math.floor(gini * 1e6 + 0.5)
    out[("gini", None)] = (n_rows, n_keys, None, micro, micro / 1e6)
    return out


def test_uniform_distribution_gini_zero(spark):
    keys = [f"k{i}" for i in range(8) for _ in range(5)]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = _rows(concentration_profile(df, "key", top_ks=(1, 4)))
    assert got[("gini", None)][3] == 0
    # top-1 of 8 uniform keys owns 1/8 of rows
    assert got[("topk_share", 1)] == (40, 8, 5, 125000, 0.125)
    assert got[("topk_share", 4)][2] == 20


def test_concentrated_distribution_matches_replay(spark):
    # Zipf-ish: key i gets ~ N/i rows
    keys = [f"d{i}" for i in range(1, 30) for _ in range(300 // i)]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = _rows(concentration_profile(df, "key", top_ks=(1, 10)))
    assert got == _replay(keys, top_ks=(1, 10))
    # heavy head: top-10 must own well over half
    assert got[("topk_share", 10)][4] > 0.5


def test_boundary_ties_break_by_key_asc(spark):
    # four keys all with count 2: top-2 must take the two smallest keys
    keys = ["b", "b", "a", "a", "d", "d", "c", "c"]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = _rows(concentration_profile(df, "key", top_ks=(2,)))
    assert got[("topk_share", 2)][2] == 4  # deterministic cut size
    assert got == _replay(keys, top_ks=(2,))


def test_null_is_a_key(spark):
    keys = ["x", "x", "x", None, None, "y"]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = _rows(concentration_profile(df, "key", top_ks=(1,)))
    assert got[("gini", None)][1] == 3  # x, NULL, y
    assert got[("topk_share", 1)][2] == 3  # x owns 3 rows
    assert got == _replay(keys, top_ks=(1,))


def test_single_key_degenerate(spark):
    df = spark.createDataFrame([("only",)] * 7, "key string")
    got = _rows(concentration_profile(df, "key", top_ks=(1,)))
    assert got[("topk_share", 1)] == (7, 1, 7, 1000000, 1.0)
    assert got[("gini", None)][3] == 0  # equality among one key


def test_k_larger_than_key_count(spark):
    keys = ["a", "a", "b"]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = _rows(concentration_profile(df, "key", top_ks=(100,)))
    assert got[("topk_share", 100)][2] == 3


def test_partition_independent(spark):
    keys = [f"k{i % 11}" for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    a = _rows(concentration_profile(df.repartition(13), "key"))
    b = _rows(concentration_profile(df.coalesce(1), "key"))
    assert a == b == _replay(keys)


def test_fences(spark):
    df = spark.createDataFrame([("x",)], "key string")
    with pytest.raises(ValueError, match="positive"):
        concentration_profile(df, "key", top_ks=(0,))
    with pytest.raises(ValueError, match="not in frame"):
        concentration_profile(df, "zzz")


def test_no_python_udf_lazy_plan(spark):
    df = spark.createDataFrame([("x",), ("y",)], "key string")
    lazy = concentration_profile(df, "key", top_ks=(1,), eager=False)
    assert not has_python_udf(lazy)
