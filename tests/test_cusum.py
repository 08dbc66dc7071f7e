"""CUSUM changepoint scores (operators/temporal.cusum_scores)."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.operators.temporal import cusum_scores
from pandera_forge_spark.plans.inspect import has_python_udf


def _py_cusum(values, target, slack):
    """Reference recurrence, row at a time."""
    sh = sl = 0.0
    out = []
    for v in values:
        if v is not None:
            sh = max(0.0, sh + (v - target - slack))
            sl = max(0.0, sl + (target - slack - v))
        out.append((sh, sl))
    return out


def _frame(spark, values, key="m"):
    t0 = datetime(2024, 1, 1)
    rows = [
        (key, t0 + timedelta(seconds=i), float(v) if v is not None else None, i)
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double, event_id long"
    )


def test_matches_recurrence(spark):
    # quiet band around 10, sustained +5 shift from index 20
    vals = [10.0 + (i % 3) for i in range(20)] + [15.0 + (i % 2) for i in range(15)]
    df = _frame(spark, vals)
    got = (
        cusum_scores(df, target=10.0, slack=1.0, threshold=20.0, order_col="event_id")
        .orderBy("event_id")
        .collect()
    )
    want = _py_cusum(vals, target=10.0, slack=1.0)
    for row, (sh, sl) in zip(got, want):
        assert row["cusum_high"] == pytest.approx(sh, abs=0)
        assert row["cusum_low"] == pytest.approx(sl, abs=0)
    # the shift accumulates: the last rows alert high, none alert low
    assert got[-1]["is_alert"] and got[-1]["cusum_high"] > 20.0
    assert all(r["cusum_low"] == 0.0 for r in got[20:])
    # before the shift the statistic resets to band — no alert
    assert not any(r["is_alert"] for r in got[:20])


def test_downward_shift_alerts_low(spark):
    vals = [10.0] * 10 + [2.0] * 10
    got = (
        cusum_scores(
            _frame(spark, vals), target=10.0, slack=1.0, threshold=30.0,
            order_col="event_id",
        )
        .orderBy("event_id")
        .collect()
    )
    assert got[-1]["cusum_low"] == pytest.approx((10.0 - 1.0 - 2.0) * 10)
    assert got[-1]["is_alert"]


def test_null_values_ignored_and_never_null_stats(spark):
    vals = [None, 12.0, None, 12.0]
    got = (
        cusum_scores(
            _frame(spark, vals), target=10.0, slack=0.0, threshold=100.0,
            order_col="event_id",
        )
        .orderBy("event_id")
        .collect()
    )
    # leading NULL reads the starting state 0, later NULL reads the
    # running statistic of the observed prefix
    assert (got[0]["cusum_high"], got[0]["cusum_low"]) == (0.0, 0.0)
    assert got[1]["cusum_high"] == 2.0
    assert got[2]["cusum_high"] == 2.0  # NULL row carries the statistic
    assert got[3]["cusum_high"] == 4.0
    assert all(r["cusum_high"] is not None for r in got)


def test_null_ts_dropped_and_keys_independent(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        ("a", t0, 100.0, 0),
        ("a", None, 1000.0, 1),  # dropped: no timeline position
        ("b", t0, 0.0, 2),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double, event_id long"
    )
    got = {
        r["event_type"]: r
        for r in cusum_scores(
            df, target=0.0, slack=0.0, threshold=50.0, order_col="event_id"
        ).collect()
    }
    assert len(got) == 2 and 1 not in [r["event_id"] for r in got.values()]
    assert got["a"]["cusum_high"] == 100.0 and got["a"]["is_alert"]
    assert got["b"]["cusum_high"] == 0.0 and not got["b"]["is_alert"]


def test_split_equals_unsplit(spark):
    # deterministic pseudo-random series with shifts, two keys, ties
    # in ts (pinned by order_col), negative timestamps included
    import hashlib

    def h(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 13

    t0 = datetime(1969, 12, 31, 23, 0)  # negative epoch seconds
    rows = []
    for i in range(300):
        key = "k" + str(i % 2)
        ts = t0 + timedelta(seconds=(i // 4) * 37)  # many ts ties
        v = None if i % 29 == 0 else float(h(i) + (6 if i > 200 else 0))
        rows.append((key, ts, v, i))
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double, event_id long"
    )
    kw = dict(target=6.0, slack=1.0, threshold=15.0, order_col="event_id")
    plain = {
        r["event_id"]: (r["cusum_high"], r["cusum_low"], r["is_alert"])
        for r in cusum_scores(df, **kw).collect()
    }
    split = {
        r["event_id"]: (r["cusum_high"], r["cusum_low"], r["is_alert"])
        for r in cusum_scores(df, split_every=120.0, **kw).collect()
    }
    assert plain == split


def test_split_output_drops_internals(spark):
    df = _frame(spark, [1.0, 2.0, 3.0])
    out = cusum_scores(df, split_every=3600.0, order_col="event_id")
    assert set(out.columns) == {
        "event_type", "ts", "value", "event_id",
        "cusum_high", "cusum_low", "is_alert",
    }
    assert not has_python_udf(out)


def test_reserved_and_missing_column_fences(spark):
    df = _frame(spark, [1.0]).withColumn("cusum_high", F.lit(0))
    with pytest.raises(ValueError, match="collide"):
        cusum_scores(df)
    with pytest.raises(ValueError, match="missing"):
        cusum_scores(_frame(spark, [1.0]), value_col="nope")
    with pytest.raises(ValueError, match="split_every"):
        cusum_scores(_frame(spark, [1.0]), split_every=-5)
