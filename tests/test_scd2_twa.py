"""SCD2 history building (operators/cdc.scd2_history) and time-weighted
averages (operators/temporal.time_weighted_average) — both over the
shared ``_with_next`` lead kernel, incl. split==unsplit differentials."""

import random

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.operators.cdc import scd2_history
from pandera_forge_spark.operators.temporal import time_weighted_average
from pandera_forge_spark.plans.inspect import has_python_udf


@pytest.fixture(scope="module")
def changelog(spark):
    # k1: three upserts; k2: upsert then delete; k3: single upsert;
    # k4: delete with NO prior row; k5: NULL op (= upsert) then upsert
    rows = [
        ("k1", 10.0, 1, "U", 100),
        ("k1", 30.0, 3, "U", 300),
        ("k1", 20.0, 2, "U", 200),
        ("k2", 5.0, 4, "U", 50),
        ("k2", 9.0, 5, "D", None),
        ("k3", 1.0, 6, "U", 99),
        ("k4", 2.0, 7, "D", None),
        ("k5", 4.0, 8, None, 40),
        ("k5", 6.0, 9, "U", 60),
    ]
    return spark.createDataFrame(
        rows, "key string, ts double, seq int, op string, val int"
    )


def _hist(df, **kw):
    out = scd2_history(
        df, ["key"], "ts", tiebreak_cols=["seq"], op_col="op", **kw
    )
    return {
        (r["key"], r["valid_from"]): (r["val"], r["valid_to"], r["is_current"])
        for r in out.collect()
    }


def test_scd2_intervals_and_deletes(changelog):
    got = _hist(changelog)
    # k1 chain: each interval closed by the next change
    assert got[("k1", 10.0)] == (100, 20.0, False)
    assert got[("k1", 20.0)] == (200, 30.0, False)
    assert got[("k1", 30.0)] == (300, None, True)
    # k2: the delete closes the interval and emits no row of its own
    assert got[("k2", 5.0)] == (50, 9.0, False)
    assert ("k2", 9.0) not in got
    # k3: single upsert stays open
    assert got[("k3", 1.0)] == (99, None, True)
    # k4: lone delete emits nothing
    assert not any(k == "k4" for k, _ in got)
    # k5: NULL op is an upsert, not a silent delete
    assert got[("k5", 4.0)] == (40, 6.0, False)
    assert got[("k5", 6.0)] == (60, None, True)
    assert len(got) == 7


def test_scd2_without_op_col(changelog):
    out = scd2_history(changelog.drop("op"), ["key"], "ts", tiebreak_cols=["seq"])
    # every change row becomes an interval row
    assert out.count() == changelog.count()
    cur = {r["key"] for r in out.where("is_current").collect()}
    assert cur == {"k1", "k2", "k3", "k4", "k5"}


def test_scd2_payload_and_columns(changelog):
    out = scd2_history(changelog, ["key"], "ts", tiebreak_cols=["seq"], op_col="op")
    assert out.columns == ["key", "val", "valid_from", "valid_to", "is_current"]
    out2 = scd2_history(
        changelog, ["key"], "ts", tiebreak_cols=["seq"], op_col="op",
        payload_cols=["val", "op"],
    )
    assert out2.columns == ["key", "val", "op", "valid_from", "valid_to", "is_current"]


def test_scd2_collision_fence(changelog):
    with pytest.raises(ValueError, match="valid_to"):
        scd2_history(
            changelog.withColumn("valid_to", F.lit(1)), ["key"], "ts", ["seq"]
        )


def test_scd2_no_python_udf(changelog):
    assert not has_python_udf(scd2_history(changelog, ["key"], "ts", ["seq"], "op"))


def _random_changelog(spark, seed, n=400, keys=5):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append(
            (
                f"k{rng.randrange(keys)}",
                float(rng.randrange(0, 1000)),
                i,
                rng.choice(["U", "U", "U", "D"]),
                rng.randrange(-50, 50),
            )
        )
    # one hot key: half the rows pile onto k0
    for i in range(n, n + n // 2):
        rows.append(("k0", float(rng.randrange(0, 1000)), i, "U", rng.randrange(50)))
    return spark.createDataFrame(
        rows, "key string, ts double, seq int, op string, val int"
    )


def test_scd2_split_equals_unsplit(spark):
    df = _random_changelog(spark, seed=7)
    plain = scd2_history(df, ["key"], "ts", ["seq"], "op")
    split = scd2_history(df, ["key"], "ts", ["seq"], "op", split_every=100.0)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, split.collect()))


def test_scd2_split_equals_unsplit_no_op(spark):
    df = _random_changelog(spark, seed=11)
    plain = scd2_history(df.drop("op"), ["key"], "ts", ["seq"])
    split = scd2_history(df.drop("op"), ["key"], "ts", ["seq"], split_every=50.0)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, split.collect()))


# ---------------------------------------------------------------- TWA


@pytest.fixture(scope="module")
def signal(spark):
    rows = [
        ("a", 0.0, 1, 10.0),
        ("a", 10.0, 2, 20.0),
        ("a", 30.0, 3, 0.0),
        ("b", 0.0, 4, 10.0),
        ("b", 10.0, 5, None),
        ("b", 20.0, 6, 30.0),
        ("c", 5.0, 7, 42.0),
    ]
    return spark.createDataFrame(
        rows, "key string, ts double, seq int, v double"
    )


def _twa(df, **kw):
    out = time_weighted_average(df, ["key"], "ts", "v", ["ts", "seq"], **kw)
    return {r["key"]: (r["weighted_sum"], r["covered_seconds"], r["twa"]) for r in out.collect()}


def test_twa_basic(signal):
    got = _twa(signal)
    # a: 10*(10-0) + 20*(30-10) = 500 over 30 s
    assert got["a"] == (500.0, 30.0, 500.0 / 30.0)
    # b: NULL value masks its segment from BOTH sums
    assert got["b"] == (100.0, 10.0, 10.0)
    # c: single observation, no horizon -> nothing covered
    assert got["c"] == (None, None, None)


def test_twa_end_ts_extends_last_segment(signal):
    got = _twa(signal, end_ts=40.0)
    assert got["a"] == (500.0, 40.0, 12.5)
    # b: 30 holds 20->40
    assert got["b"] == (100.0 + 30.0 * 20.0, 30.0, 700.0 / 30.0)
    # c: 42 holds 5->40
    assert got["c"] == (42.0 * 35.0, 35.0, 42.0)


def test_twa_end_ts_before_last_masks_segment(signal):
    # horizon at 20: a's last obs (ts=30) would be a NEGATIVE segment —
    # masked out, earlier segments keep their real durations
    got = _twa(signal, end_ts=20.0)
    assert got["a"] == (500.0, 30.0, 500.0 / 30.0)


def test_twa_order_fence(signal):
    with pytest.raises(ValueError, match="lead with ts_col"):
        time_weighted_average(signal, ["key"], "ts", "v", ["seq", "ts"])


def test_twa_collision_fence(signal):
    with pytest.raises(ValueError, match="__next_ts"):
        time_weighted_average(
            signal.withColumn("__next_ts", F.lit(1)), ["key"], "ts", "v"
        )


def test_twa_split_equals_unsplit(spark):
    rng = random.Random(13)
    rows = []
    for i in range(600):
        rows.append(
            (
                f"k{rng.randrange(4)}",
                float(rng.randrange(0, 2000)),
                i,
                float(rng.randrange(-20, 20)) if rng.random() > 0.1 else None,
            )
        )
    df = spark.createDataFrame(rows, "key string, ts double, seq int, v double")
    plain = time_weighted_average(df, ["key"], "ts", "v", ["ts", "seq"], end_ts=2500.0)
    split = time_weighted_average(
        df, ["key"], "ts", "v", ["ts", "seq"], end_ts=2500.0, split_every=250.0
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, split.collect()))


def test_twa_no_python_udf(signal):
    assert not has_python_udf(time_weighted_average(signal, ["key"], "ts", "v"))
