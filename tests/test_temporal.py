"""Temporal operators (operators/temporal.py)."""

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.operators.temporal import (
    asof_join,
    interval_join,
    session_stats,
    sessionize,
    time_rollup,
)


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        ("A", 10.0), ("A", 20.0), ("A", 25.0), ("A", 100.0),
        ("B", 15.0), ("B", 16.0),
        ("C", 5.0),
    ]
    return spark.createDataFrame(rows, "sym string, ts double")


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        ("A", 5.0, 1.0), ("A", 20.0, 2.0), ("A", 30.0, 3.0),
        ("B", 14.0, 9.0),
        # no quotes for C
    ]
    return spark.createDataFrame(rows, "sym string, ts double, px double")


def test_asof_backward_inclusive(trades, quotes):
    out = asof_join(trades, quotes, "ts", ["sym"], ["px"])
    got = {(r["sym"], r["ts"]): r["px"] for r in out.collect()}
    assert got[("A", 10.0)] == 1.0
    assert got[("A", 20.0)] == 2.0  # tie matches inclusively
    assert got[("A", 25.0)] == 2.0
    assert got[("A", 100.0)] == 3.0
    assert got[("B", 15.0)] == 9.0 and got[("B", 16.0)] == 9.0
    assert got[("C", 5.0)] is None
    assert out.count() == trades.count()  # left rows preserved exactly


def test_asof_tolerance(trades, quotes):
    out = asof_join(trades, quotes, "ts", ["sym"], ["px"], tolerance=10.0)
    got = {(r["sym"], r["ts"]): r["px"] for r in out.collect()}
    assert got[("A", 25.0)] == 2.0  # 5s old: within tolerance
    assert got[("A", 100.0)] is None  # 70s old: nulled
    assert got[("B", 15.0)] == 9.0


def test_asof_null_value_stays_null(spark):
    """pandas merge_asof parity: a matched right row whose value is NULL
    yields NULL — the carry must not skip it and resurrect an older
    row's value (round-3 advisor repro: right (1,10),(5,NULL), left
    ts=6 -> NULL, not 10.0)."""
    left = spark.createDataFrame([("k", 6.0)], "sym string, ts double")
    right = spark.createDataFrame(
        [("k", 1.0, 10.0), ("k", 5.0, None)], "sym string, ts double, px double"
    )
    out = asof_join(left, right, "ts", ["sym"], ["px"]).collect()
    assert len(out) == 1 and out[0]["px"] is None

    # tolerance must gate on the MATCHED row (ts=5, 1s old: inside a 2s
    # tolerance) — not on the older row the value would have come from
    out = asof_join(left, right, "ts", ["sym"], ["px"], tolerance=2.0).collect()
    assert out[0]["px"] is None
    # and a left row at ts=5.5 matching the null row exactly: still null
    left2 = spark.createDataFrame([("k", 5.5)], "sym string, ts double")
    out = asof_join(left2, right, "ts", ["sym"], ["px"], tolerance=10.0).collect()
    assert out[0]["px"] is None


def test_asof_plan_has_no_nested_loop(trades, quotes):
    plan = (
        asof_join(trades, quotes, "ts", ["sym"], ["px"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan


def test_interval_join_exact(spark):
    points = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0.0, 10.0, 55.0, 99.9, 100.0, 250.0])],
        "pid long, x double",
    )
    intervals = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 50.0, 120.0), (3, 90.0, 105.0), (4, 400.0, 500.0)],
        "iid long, lo double, hi double",
    )
    out = interval_join(points, intervals, "x", "lo", "hi", bucket_width=30.0)
    got = {(r["pid"], r["iid"]) for r in out.collect()}
    expected = {
        (0, 1), (1, 1),          # 0 and 10 in [0,10]
        (2, 2),                  # 55 in [50,120]
        (3, 2), (3, 3),          # 99.9
        (4, 2), (4, 3),          # 100
    }
    assert got == expected


def test_interval_join_matches_cross_filter(spark):
    points = spark.range(500).select(
        F.col("id").alias("pid"), (F.col("id") % 97 * 3.7).alias("x")
    )
    intervals = spark.range(40).select(
        F.col("id").alias("iid"),
        (F.col("id") * 9.0).alias("lo"),
        (F.col("id") * 9.0 + 31.0).alias("hi"),
    )
    fast = {
        (r["pid"], r["iid"])
        for r in interval_join(points, intervals, "x", "lo", "hi", 16.0).collect()
    }
    slow = {
        (r["pid"], r["iid"])
        for r in points.crossJoin(intervals)
        .where((F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi")))
        .collect()
    }
    assert fast == slow and len(fast) > 0


def test_interval_join_rejects_fanout_bomb(spark):
    points = spark.createDataFrame([(1, 5.0)], "pid long, x double")
    intervals = spark.createDataFrame([(1, 0.0, 1e9)], "iid long, lo double, hi double")
    with pytest.raises(ValueError, match="wider than"):
        interval_join(points, intervals, "x", "lo", "hi", 1.0, max_buckets_per_interval=100)


def test_sessionize_gaps(spark):
    rows = [
        ("u1", 0.0), ("u1", 100.0), ("u1", 4000.0), ("u1", 4100.0), ("u1", 9000.0),
        ("u2", 50.0),
    ]
    ev = spark.createDataFrame(rows, "user string, ts double")
    out = sessionize(ev, "user", "ts", gap_seconds=3600.0)
    got = {(r["user"], r["ts"]): (r["session_idx"], r["session_id"]) for r in out.collect()}
    assert got[("u1", 0.0)] == (0, "u1#0")
    assert got[("u1", 100.0)] == (0, "u1#0")
    assert got[("u1", 4000.0)] == (1, "u1#1")
    assert got[("u1", 4100.0)] == (1, "u1#1")
    assert got[("u1", 9000.0)] == (2, "u1#2")
    assert got[("u2", 50.0)] == (0, "u2#0")


def test_session_stats(spark):
    rows = [("u1", 0.0), ("u1", 100.0), ("u1", 4000.0)]
    ev = spark.createDataFrame(rows, "user string, ts double")
    out = {
        (r["user"], r["session_idx"]): (r["n_events"], r["start_ts"], r["end_ts"], r["duration_secs"])
        for r in session_stats(ev, "user", "ts", 3600.0).collect()
    }
    assert out[("u1", 0)] == (2, 0.0, 100.0, 100.0)
    assert out[("u1", 1)] == (1, 4000.0, 4000.0, 0.0)


def test_time_rollup(spark):
    ev = spark.createDataFrame(
        [("2024-01-01 10:05:00", "a", 1.0), ("2024-01-01 10:55:00", "a", 2.0),
         ("2024-01-01 11:05:00", "a", 4.0), ("2024-01-01 10:30:00", "b", 8.0)],
        "ts string, k string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = time_rollup(
        ev, "ts", "hour",
        [F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")],
        extra_keys=["k"],
    )
    got = {(str(r["bucket"]), r["k"]): (r["n"], r["sv"]) for r in out.collect()}
    assert got[("2024-01-01 10:00:00", "a")] == (2, 3.0)
    assert got[("2024-01-01 11:00:00", "a")] == (1, 4.0)
    assert got[("2024-01-01 10:00:00", "b")] == (1, 8.0)
