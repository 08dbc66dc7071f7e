"""Pre-flight join cardinality audit (validator.join_cardinality_report)."""

import math

import pytest

from pandera_forge_spark.plans.inspect import has_python_udf
from pandera_forge_spark.validator import join_cardinality_report


def _row(out):
    rows = out.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def test_prediction_matches_actual_join(spark):
    left = spark.createDataFrame(
        [(i % 7, i) for i in range(100)], "k bigint, v bigint"
    )
    right = spark.createDataFrame(
        [(i % 5, i) for i in range(40)], "k bigint, w bigint"
    )
    got = _row(join_cardinality_report(left, right, ["k"]))
    actual = left.join(right, "k").count()
    assert int(got["output_rows"]) == actual
    assert got["n_left"] == 100 and got["n_right"] == 40


def test_fanout_and_share(spark):
    # hot key 0: 50 x 30 pairs; key 1: 2 x 1
    left = spark.createDataFrame(
        [(0,)] * 50 + [(1,)] * 2 + [(9,)], "k bigint"
    )
    right = spark.createDataFrame([(0,)] * 30 + [(1,)] + [(8,)], "k bigint")
    got = _row(join_cardinality_report(left, right, ["k"]))
    assert int(got["output_rows"]) == 50 * 30 + 2
    assert int(got["max_key_fanout"]) == 1500
    exp = math.floor(1500 / 1502 * 1e6 + 0.5)
    assert got["max_fanout_share_micro"] == exp
    assert got["n_matched_keys"] == 2
    assert got["n_left_only_keys"] == 1  # key 9
    assert got["n_right_only_keys"] == 1  # key 8


def test_null_keys_never_match(spark):
    left = spark.createDataFrame(
        [(None, 1), (None, 2), (3, 3)], "k bigint, v bigint"
    )
    right = spark.createDataFrame([(None, 9), (3, 9)], "k bigint, w bigint")
    got = _row(join_cardinality_report(left, right, ["k"]))
    assert got["left_null_key_rows"] == 2
    assert got["right_null_key_rows"] == 1
    assert int(got["output_rows"]) == 1
    assert got["n_left"] == 1 and got["n_right"] == 1  # non-null-key rows
    actual = left.join(right, "k").count()
    assert int(got["output_rows"]) == actual


def test_multi_key_and_renamed(spark):
    left = spark.createDataFrame(
        [(1, "a", 10), (1, "a", 11), (2, "b", 12)], "x bigint, y string, v bigint"
    )
    right = spark.createDataFrame(
        [(1, "a", 7), (2, "c", 8)], "p bigint, q string, w bigint"
    )
    got = _row(
        join_cardinality_report(left, right, ["x", "y"], ["p", "q"])
    )
    assert int(got["output_rows"]) == 2
    actual = left.join(
        right, (left.x == right.p) & (left.y == right.q)
    ).count()
    assert actual == 2


def test_empty_join_share_null(spark):
    left = spark.createDataFrame([(1,)], "k bigint")
    right = spark.createDataFrame([(2,)], "k bigint")
    got = _row(join_cardinality_report(left, right, ["k"]))
    assert int(got["output_rows"]) == 0
    assert got["max_fanout_share_micro"] is None
    assert got["max_fanout_share"] is None


def test_random_differential(spark):
    import random

    rng = random.Random(7)
    lrows = [(rng.randrange(12) if rng.random() < 0.9 else None,) for _ in range(300)]
    rrows = [(rng.randrange(15) if rng.random() < 0.9 else None,) for _ in range(200)]
    left = spark.createDataFrame(lrows, "k bigint")
    right = spark.createDataFrame(rrows, "k bigint")
    got = _row(join_cardinality_report(left, right, ["k"]))
    assert int(got["output_rows"]) == left.join(right, "k").count()


def test_fences(spark):
    df = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError, match="same-length"):
        join_cardinality_report(df, df, ["k"], ["k", "k"])
    with pytest.raises(ValueError, match="not in frame"):
        join_cardinality_report(df, df, ["zzz"])


def test_no_python_udf(spark):
    df = spark.createDataFrame([(1,)], "k bigint")
    assert not has_python_udf(join_cardinality_report(df, df, ["k"]))
