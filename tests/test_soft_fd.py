"""Graded functional dependency (validator.soft_fd_report)."""

import math

import pytest

from pandera_forge_spark.plans.inspect import has_python_udf
from pandera_forge_spark.validator import soft_fd_report


def _row(out):
    rows = out.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def _replay(pairs, include_nulls=True):
    from collections import Counter, defaultdict

    if not include_nulls:
        pairs = [(l, r) for l, r in pairs if r is not None]
    cells = Counter(pairs)
    groups = defaultdict(list)
    for (l, r), c in cells.items():
        groups[l].append(c)
    n_rows = sum(cells.values())
    n_conf = sum(max(cs) for cs in groups.values())
    micro = (
        math.floor(n_conf / n_rows * 1e6 + 0.5) if n_rows else None
    )
    return {
        "n_rows": n_rows,
        "n_groups": len(groups),
        "n_cells": len(cells),
        "n_conforming": n_conf,
        "n_exact_groups": sum(
            1 for cs in groups.values() if max(cs) == sum(cs)
        ),
        "conformance_micro": micro,
    }


def _check(got, exp):
    for k, v in exp.items():
        assert got[k] == v, (k, got[k], v)


def test_exact_fd_conformance_one(spark):
    rows = [("a", "x")] * 3 + [("b", "y")] * 2
    df = spark.createDataFrame(rows, "l string, r string")
    got = _row(soft_fd_report(df, ["l"], "r"))
    _check(got, _replay(rows))
    assert got["conformance_micro"] == 1000000
    assert got["n_exact_groups"] == 2


def test_soft_fd_majority_fraction(spark):
    # group a: 4 of 5 conform; group b: 2 of 2 -> 6/7 conforming
    rows = [("a", "x")] * 4 + [("a", "y")] + [("b", "z")] * 2
    df = spark.createDataFrame(rows, "l string, r string")
    got = _row(soft_fd_report(df, ["l"], "r"))
    _check(got, _replay(rows))
    assert got["n_conforming"] == 6
    assert got["conformance_micro"] == math.floor(6 / 7 * 1e6 + 0.5)
    assert got["n_exact_groups"] == 1


def test_null_dependent_modes(spark):
    rows = [("a", None), ("a", None), ("a", "x"), ("b", "y")]
    df = spark.createDataFrame(rows, "l string, r string")
    with_nulls = _row(soft_fd_report(df, ["l"], "r"))
    _check(with_nulls, _replay(rows))
    assert with_nulls["n_conforming"] == 3  # NULL majority counts
    dropped = _row(soft_fd_report(df, ["l"], "r", include_nulls=False))
    _check(dropped, _replay(rows, include_nulls=False))
    assert dropped["n_rows"] == 2 and dropped["conformance_micro"] == 1000000


def test_null_determinant_is_a_group(spark):
    rows = [(None, "x"), (None, "x"), (None, "y"), ("a", "z")]
    df = spark.createDataFrame(rows, "l string, r string")
    got = _row(soft_fd_report(df, ["l"], "r"))
    assert got["n_groups"] == 2 and got["n_conforming"] == 3


def test_multi_column_determinant(spark):
    rows = [("a", "p", "x"), ("a", "q", "y"), ("a", "q", "y"), ("a", "q", "z")]
    df = spark.createDataFrame(rows, "l1 string, l2 string, r string")
    got = _row(soft_fd_report(df, ["l1", "l2"], "r"))
    assert got["determinant"] == "l1,l2"
    assert got["n_groups"] == 2 and got["n_conforming"] == 3


def test_ties_still_count_majority_once(spark):
    rows = [("a", "x"), ("a", "y")]  # tie: majority count is 1
    df = spark.createDataFrame(rows, "l string, r string")
    got = _row(soft_fd_report(df, ["l"], "r"))
    assert got["n_conforming"] == 1 and got["n_exact_groups"] == 0


def test_random_replay(spark):
    import random

    rng = random.Random(3)
    rows = [
        (f"g{rng.randrange(6)}", rng.choice(["x", "y", None]))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "l string, r string")
    _check(_row(soft_fd_report(df, ["l"], "r")), _replay(rows))
    _check(
        _row(soft_fd_report(df.repartition(9), ["l"], "r", include_nulls=False)),
        _replay(rows, include_nulls=False),
    )


def test_fences(spark):
    df = spark.createDataFrame([("x", "y")], "l string, r string")
    with pytest.raises(ValueError, match="non-empty"):
        soft_fd_report(df, [], "r")
    with pytest.raises(ValueError, match="not in frame"):
        soft_fd_report(df, ["l"], "zzz")


def test_no_python_udf(spark):
    df = spark.createDataFrame([("x", "y")], "l string, r string")
    assert not has_python_udf(soft_fd_report(df, ["l"], "r"))
