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


def _hot_events(spark, n_hot=400, n_cold=30):
    """One pathological key ('hot') with events every ~37s across many
    chunks, plus a few normal keys; gaps planted so sessions straddle
    chunk boundaries."""
    rows = [("hot", float(i * 37 % 7919 + (i // 97) * 9000)) for i in range(n_hot)]
    rows += [(f"u{i % 5}", float(i * 211)) for i in range(n_cold)]
    return spark.createDataFrame(rows, "user string, ts double").dropDuplicates(
        ["user", "ts"]
    )


def test_asof_split_stitch_identical(spark):
    """split_every bounds per-task rows for a hot key and must produce
    EXACTLY the unsplit output — including chunks with no right rows
    (carry-in from earlier chunks), tolerance gating, and null matches
    before the first right row."""
    ev = _hot_events(spark)
    left = ev
    right = ev.where(F.col("ts") % 5 == 0).withColumn("px", F.col("ts") * 2)

    for tol in (None, 500.0):
        base = asof_join(left, right, "ts", ["user"], ["px"], tolerance=tol)
        split = asof_join(
            left, right, "ts", ["user"], ["px"], tolerance=tol,
            split_every=1000.0,
        )
        b = sorted(map(tuple, base.select("user", "ts", "px").collect()))
        s = sorted(map(tuple, split.select("user", "ts", "px").collect()))
        assert b == s and len(b) == left.count()

    # the hot key's rows really are bounded per (key, chunk)
    chunked = left.withColumn("__chunk", F.floor(F.col("ts") / 1000.0))
    per_task = (
        chunked.groupBy("user", "__chunk").count().agg(F.max("count")).first()[0]
    )
    assert per_task < left.where(F.col("user") == "hot").count()


def test_asof_split_null_value_semantics(spark):
    """The merge_asof null-carry fix holds on the split path too."""
    left = spark.createDataFrame([("k", 6.0), ("k", 2500.0)], "sym string, ts double")
    right = spark.createDataFrame(
        [("k", 1.0, 10.0), ("k", 5.0, None), ("k", 2000.0, 7.0)],
        "sym string, ts double, px double",
    )
    out = {
        r["ts"]: r["px"]
        for r in asof_join(
            left, right, "ts", ["sym"], ["px"], split_every=1000.0
        ).collect()
    }
    assert out[6.0] is None      # matched null row stays null (cross-check)
    assert out[2500.0] == 7.0    # carry-in from an earlier chunk


def test_sessionize_split_stitch_identical(spark):
    """Sessions that straddle chunk boundaries merge exactly as the
    unsplit path numbers them; session counts and ids match per row."""
    ev = _hot_events(spark)
    for gap in (40.0, 300.0):
        base = sessionize(ev, "user", "ts", gap)
        split = sessionize(ev, "user", "ts", gap, split_every=1000.0)
        b = sorted(map(tuple, base.select("user", "ts", "session_id").collect()))
        s = sorted(map(tuple, split.select("user", "ts", "session_id").collect()))
        assert b == s and len(b) == ev.count()


def test_sessionize_split_boundary_merge(spark):
    """Closed-form boundary case: events at 990 and 1010 (chunks 0/1,
    gap 20 <= 30) are ONE session; 1010 -> 2500 breaks."""
    ev = spark.createDataFrame(
        [("u", 990.0), ("u", 1010.0), ("u", 2500.0)], "user string, ts double"
    )
    out = {
        r["ts"]: r["session_idx"]
        for r in sessionize(ev, "user", "ts", 30.0, split_every=1000.0).collect()
    }
    assert out == {990.0: 0, 1010.0: 0, 2500.0: 1}


def test_split_stitch_null_keys_and_ts(spark):
    """Null keys and null timestamps group like any other value: the
    split path must keep them and match the unsplit output row-for-row
    (the stitch joins are null-safe, not name-list equi-joins)."""
    left = spark.createDataFrame(
        [("k", 6.0), (None, 6.0), (None, 2500.0), ("k", None)],
        "sym string, ts double",
    )
    right = spark.createDataFrame(
        [("k", 1.0, 10.0), (None, 100.0, 5.0)],
        "sym string, ts double, px double",
    )
    base = asof_join(left, right, "ts", ["sym"], ["px"])
    split = asof_join(left, right, "ts", ["sym"], ["px"], split_every=1000.0)
    b = sorted(map(tuple, base.select("sym", "ts", "px").collect()),
               key=lambda t: (str(t[0]), str(t[1])))
    s = sorted(map(tuple, split.select("sym", "ts", "px").collect()),
               key=lambda t: (str(t[0]), str(t[1])))
    assert b == s and len(s) == 4
    # the null-key row in a later chunk still gets its carry-in
    got = {(r["sym"], r["ts"]): r["px"] for r in split.collect()}
    assert got[(None, 2500.0)] == 5.0

    ev = spark.createDataFrame(
        [("u", 10.0), ("u", 990.0), ("u", 1010.0), (None, 50.0),
         (None, 1020.0), ("u", None)],
        "user string, ts double",
    )
    base = sessionize(ev, "user", "ts", 30.0)
    split = sessionize(ev, "user", "ts", 30.0, split_every=1000.0)
    key = lambda r: (str(r["user"]), str(r["ts"]))
    b = sorted(((str(r["user"]), str(r["ts"]), r["session_id"])
                for r in base.collect()))
    s = sorted(((str(r["user"]), str(r["ts"]), r["session_id"])
                for r in split.collect()))
    assert b == s and len(s) == ev.count()


def test_split_stitch_plans_stay_equi_join(spark):
    """The null-safe stitch joins (`<=>`) must still plan as shuffled
    equi-joins — a planner regression to BroadcastNestedLoop/cartesian
    would be silent data-scale death on 10^12 rows."""
    ev = _hot_events(spark, n_hot=60, n_cold=12)
    right = ev.where(F.col("ts") % 5 == 0).withColumn("px", F.col("ts") * 2)
    for df in (
        asof_join(ev, right, "ts", ["user"], ["px"], split_every=1000.0),
        sessionize(ev, "user", "ts", 40.0, split_every=1000.0),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan
        assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
                or "BroadcastHashJoin" in plan)


def test_event_funnel_strict_ordering(spark):
    """Funnel semantics: steps must be strictly increasing in time —
    a purchase BEFORE the click doesn't count, equal timestamps don't
    advance, keys without step events don't appear, and completion
    carries the final step's time."""
    import pytest as _pytest

    from pandera_forge_spark.operators.temporal import event_funnel

    rows = [
        # u1: full funnel in order
        (1, 10.0, "view"), (1, 20.0, "click"), (1, 30.0, "purchase"),
        # u2: purchase precedes click -> stuck at 2 (view, click)
        (2, 10.0, "view"), (2, 15.0, "purchase"), (2, 20.0, "click"),
        # u3: click at the SAME ts as view -> strict > blocks it
        (3, 10.0, "view"), (3, 10.0, "click"),
        # u4: only a later-step event -> 0 steps but still reported
        (4, 5.0, "purchase"),
        # u5: no step events at all -> absent
        (5, 5.0, "error"),
        # u6: repeated steps pick the EARLIEST qualifying occurrence
        (6, 1.0, "view"), (6, 2.0, "click"), (6, 9.0, "click"),
        (6, 3.0, "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts double, event_type string")
    got = {
        r["user_id"]: (r["steps_completed"], r["completed_ts"])
        for r in event_funnel(
            df, "user_id", "ts", "event_type", ["view", "click", "purchase"]
        ).collect()
    }
    assert got[1] == (3, 30.0)
    assert got[2] == (2, None)
    assert got[3] == (1, None)
    assert got[4] == (0, None)
    assert 5 not in got
    assert got[6] == (3, 3.0)  # click@2 then purchase@3, not click@9

    with _pytest.raises(ValueError):
        event_funnel(df, "user_id", "ts", "event_type", [])


def test_event_funnel_plan_single_shuffle_udf_free(spark):
    from pandera_forge_spark.operators.temporal import event_funnel
    from pandera_forge_spark.plans.inspect import has_python_udf

    df = spark.createDataFrame(
        [(1, 1.0, "view")], "user_id long, ts double, event_type string"
    )
    out = event_funnel(df, "user_id", "ts", "event_type", ["view", "click"])
    assert not has_python_udf(out)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan  # one shuffle, not one per step


def test_retention_cohorts_closed_form(spark):
    """Two cohorts with planted churn: counts per (cohort, offset)
    match the closed form; multiple events in one period count a key
    once; invalid period raises."""
    import pytest as _pytest

    from pandera_forge_spark.operators.temporal import retention_cohorts

    rows = [
        # cohort 0: users 1,2 start period 0; user 1 returns p1, p2;
        # user 2 returns p2 only (twice in-period -> still one)
        (1, 5.0), (1, 15.0), (1, 25.0),
        (2, 7.0), (2, 21.0), (2, 23.0),
        # cohort 1: user 3 starts p1, returns p2
        (3, 11.0), (3, 29.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts double")
    got = {
        (r["cohort_period"], r["periods_since"]): r["n_active"]
        for r in retention_cohorts(df, "user_id", "ts", period_seconds=10.0).collect()
    }
    assert got == {
        (0, 0): 2,  # users 1, 2
        (0, 1): 1,  # user 1
        (0, 2): 2,  # users 1, 2
        (1, 0): 1,  # user 3
        (1, 1): 1,  # user 3 at p2
    }
    with _pytest.raises(ValueError):
        retention_cohorts(df, "user_id", "ts", period_seconds=0)


def test_retention_cohorts_keeps_null_keys(spark):
    """NULL keys (anonymous traffic) are a real cohort group — the
    null-safe join-back must keep them in the matrix."""
    from pandera_forge_spark.operators.temporal import retention_cohorts

    df = spark.createDataFrame(
        [(None, 5.0), (None, 15.0), (1, 5.0)], "user_id long, ts double"
    )
    got = {
        (r["cohort_period"], r["periods_since"]): r["n_active"]
        for r in retention_cohorts(df, "user_id", "ts", period_seconds=10.0).collect()
    }
    assert got == {(0, 0): 2, (0, 1): 1}


def test_event_funnel_split_stitch_identical(spark):
    """split_every bounds a hot key's per-task step events at one time
    chunk and must reproduce the unsplit funnel EXACTLY — including
    funnels whose steps straddle chunk boundaries, steps completing in
    a later chunk, same-ts ties inside a chunk, and keys whose only
    events sit in one chunk."""
    from pandera_forge_spark.operators.temporal import event_funnel

    steps = ["view", "click", "purchase"]
    rows = []
    # hot key: 600 step events across 6 chunks (W=1000); the funnel
    # completes across chunks -- view@5, click@1205, purchase@3405
    # planted among decoys (wrong-order and repeated steps everywhere)
    for i in range(600):
        t = float(i * 10 + 5)
        rows.append(("hot", t, steps[(i * 7) % 3]))
    # boundary straddler: view@990 -> click@1010 (chunks 0/1)
    rows += [("edge", 990.0, "view"), ("edge", 1010.0, "click")]
    # tie inside a chunk: click at same ts as view must not advance
    rows += [("tie", 500.0, "view"), ("tie", 500.0, "click")]
    # single-chunk key, full completion
    rows += [("one", 10.0, "view"), ("one", 20.0, "click"),
             ("one", 30.0, "purchase")]
    # later-step-only key
    rows += [("zero", 42.0, "purchase")]
    # null key and non-step noise
    rows += [(None, 100.0, "view"), (None, 1100.0, "click"),
             ("hot", 50.0, "error")]
    df = spark.createDataFrame(rows, "user string, ts double, event_type string")

    base = event_funnel(df, "user", "ts", "event_type", steps)
    split = event_funnel(df, "user", "ts", "event_type", steps,
                         split_every=1000.0)
    key = lambda t: (str(t[0]),)
    b = sorted(map(tuple, base.collect()), key=key)
    s = sorted(map(tuple, split.collect()), key=key)
    assert b == s and len(b) == 6  # hot, edge, tie, one, zero, null

    # the hot key's step events really are bounded per (key, chunk)
    per_task = (
        df.where(F.col("event_type").isin(steps))
        .groupBy("user", F.floor(F.col("ts") / 1000.0))
        .count().agg(F.max("count")).first()[0]
    )
    hot_total = df.where(
        (F.col("user") == "hot") & F.col("event_type").isin(steps)
    ).count()
    assert per_task < hot_total

    # split path stays UDF-free and equi-join/aggregate shaped
    from pandera_forge_spark.plans.inspect import has_python_udf

    assert not has_python_udf(split)
    plan = split._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan


def _rz_frame(spark):
    from datetime import datetime

    # key 'a': 10 quiet points then one spike inside one hour;
    # key 'b': too thin (3 points)
    rows = []
    for i in range(10):
        rows.append((i, datetime(2024, 1, 1, 12, 0, i), "a", 10.0 + (i % 2)))
    rows.append((99, datetime(2024, 1, 1, 12, 0, 30), "a", 500.0))
    for i in range(3):
        rows.append((200 + i, datetime(2024, 1, 1, 12, 0, i), "b", 1.0))
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def test_rolling_zscore_flags_planted_spike(spark):
    from pandera_forge_spark.operators.temporal import rolling_zscore

    out = rolling_zscore(
        _rz_frame(spark), frame_seconds=3600.0, z_threshold=4.0, min_points=8
    )
    flagged = {r.event_id for r in out.where("is_anomaly").collect()}
    assert flagged == {99}
    by_id = {r.event_id: r for r in out.collect()}
    # the spike saw the 10 quiet peers before (and at) its timestamp
    assert by_id[99].n_window == 10
    # thin key: z NULL, never anomalous
    assert by_id[200].z is None and by_id[200].is_anomaly is False
    # quiet rows have a z once enough peers exist, all small
    assert abs(by_id[9].z) < 4.0


def test_rolling_zscore_split_equals_unsplit(spark):
    from pandera_forge_spark.operators.temporal import rolling_zscore

    df = _rz_frame(spark)
    cols = ["event_id", "n_window", "z", "is_anomaly"]
    plain = sorted(
        rolling_zscore(df, frame_seconds=120.0).select(*cols).collect()
    )
    split = sorted(
        rolling_zscore(df, frame_seconds=120.0, split_every=120.0)
        .select(*cols)
        .collect()
    )
    assert plain == split
    # and with a chunk boundary cutting the data
    split2 = sorted(
        rolling_zscore(df, frame_seconds=60.0, split_every=61.0)
        .select(*cols)
        .collect()
    )
    plain2 = sorted(
        rolling_zscore(df, frame_seconds=60.0).select(*cols).collect()
    )
    assert plain2 == split2


def test_rolling_zscore_guards(spark):
    from pandera_forge_spark.operators.temporal import rolling_zscore

    df = _rz_frame(spark)
    with pytest.raises(ValueError, match="min_points"):
        rolling_zscore(df, min_points=1)
    with pytest.raises(ValueError, match="split_every"):
        rolling_zscore(df, frame_seconds=100.0, split_every=50.0)


def test_rolling_zscore_null_value_is_peer_neutral(spark):
    from datetime import datetime

    from pandera_forge_spark.operators.temporal import rolling_zscore

    rows = [
        (i, datetime(2024, 1, 1, 12, 0, i), "a", float(i % 2))
        for i in range(9)
    ] + [(50, datetime(2024, 1, 1, 12, 0, 30), "a", None)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = {r.event_id: r for r in rolling_zscore(df, min_points=8).collect()}
    # a null value contributes nothing and is itself unflaggable,
    # but its peers still count it out correctly
    assert out[50].z is None and out[50].is_anomaly is False
    assert out[50].n_window == 9


def test_rolling_zscore_no_python_udf(spark):
    from pandera_forge_spark.operators.temporal import rolling_zscore
    from pandera_forge_spark.plans.inspect import has_python_udf

    assert not has_python_udf(rolling_zscore(_rz_frame(spark)))


def test_rolling_zscore_split_negative_ts(spark):
    """Regression: the carry filter must use pmod — Spark's % keeps the
    dividend's sign, so negative (pre-1970 / numeric) timestamps would
    silently lose their context rows and diverge from unsplit."""
    from pandera_forge_spark.operators.temporal import rolling_zscore

    rows = [
        (i, float(t), "a", float(i % 3))
        for i, t in enumerate(range(-120, 120, 7))
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts double, event_type string, value double"
    )
    cols = ["event_id", "n_window", "z", "is_anomaly"]
    plain = sorted(
        rolling_zscore(df, frame_seconds=50, min_points=3).select(*cols).collect()
    )
    split = sorted(
        rolling_zscore(df, frame_seconds=50, min_points=3, split_every=50.0)
        .select(*cols)
        .collect()
    )
    assert plain == split


# -------------------------------------------------- survival_table (r5)

def _surv_rows():
    # timeline seconds; cutoff = max ts = 1000.
    # horizon 200: death iff last_ts <= 800.
    return [
        # user 1: cohort a (first event), lifetime 0-500 -> day 5, dead
        (1, "a", 0.0), (1, "b", 500.0),
        # user 2: cohort a, lifetime 900-1000 -> day 1, censored
        (2, "a", 900.0), (2, "a", 1000.0),
        # user 3: cohort b, single event at 100 -> day 0, dead
        (3, "b", 100.0),
        # user 4: cohort b, single event at 950 -> day 0, censored
        (4, "b", 950.0),
        # user 5: cohort a, lifetime 100-600 -> day 5, dead
        (5, "a", 100.0), (5, "a", 600.0),
    ]


def _surv_df(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        _surv_rows(), "user_id long, channel string, sec double"
    )
    return df.withColumn("ts", F.timestamp_seconds(F.col("sec"))).withColumn(
        "event_id", F.monotonically_increasing_id()
    )


def test_survival_table_hand_computed(spark):
    from pandera_forge_spark.operators.temporal import survival_table

    out = sorted(
        tuple(r)
        for r in survival_table(
            _surv_df(spark), ["user_id"], "ts", horizon_seconds=200.0,
            cohort_col="channel", order_cols=["ts", "event_id"],
            bucket_seconds=100.0,
        ).collect()
    )
    # cohort a: users 1 (day 5 dead), 2 (day 1 cens), 5 (day 5 dead)
    #   day 1: d=0 c=1 at_risk=3; day 5: d=2 c=0 at_risk=2
    # cohort b: users 3 (day 0 dead), 4 (day 0 cens)
    #   day 0: d=1 c=1 at_risk=2
    assert out == [
        ("a", 1, 0, 1, 3),
        ("a", 5, 2, 0, 2),
        ("b", 0, 1, 1, 2),
    ]


def test_survival_table_censor_boundary_and_no_cohort(spark):
    from pandera_forge_spark.operators.temporal import survival_table

    # last_ts == cutoff - horizon is a DEATH (<=, documented)
    out = {
        (r["cohort"], r["day"]): (r["n_deaths"], r["n_censored"], r["n_at_risk"])
        for r in survival_table(
            _surv_df(spark), ["user_id"], "ts", horizon_seconds=500.0,
            bucket_seconds=100.0,
        ).collect()
    }
    # cutoff-horizon = 500: user1 (last 500) dead, user5 (600) censored
    assert out[("", 5)] == (1, 1, 2)
    # single cohort '' and n_at_risk telescopes to the user count at day 0
    assert sum(d + c for d, c in ((v[0], v[1]) for v in out.values())) == 5


def test_survival_table_guards_and_plan(spark):
    import pytest
    from pandera_forge_spark.operators.temporal import survival_table
    from pandera_forge_spark.plans.inspect import has_python_udf

    df = _surv_df(spark)
    with pytest.raises(ValueError, match="horizon_seconds"):
        survival_table(df, ["user_id"], "ts", -1.0)
    with pytest.raises(ValueError, match="bucket_seconds"):
        survival_table(df, ["user_id"], "ts", 1.0, bucket_seconds=0.0)
    out = survival_table(df, ["user_id"], "ts", 200.0, cohort_col="channel")
    assert not has_python_udf(out)
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "string", "bigint", "bigint", "bigint", "bigint"
    ]


def test_survival_table_null_ts_dropped_and_at_risk_monotone(spark):
    from pyspark.sql import functions as F
    from pandera_forge_spark.operators.temporal import survival_table

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev = ev.unionByName(
        ev.limit(2).withColumn("ts", F.lit(None).cast("timestamp"))
    )
    out = survival_table(
        ev, ["user_id"], "ts", 43200.0, cohort_col="event_type",
        order_cols=["ts", "event_id"],
    ).orderBy("cohort", "day").collect()
    # at-risk decreases monotonically within a cohort and always covers
    # that day's exits
    by_cohort = {}
    for r in out:
        by_cohort.setdefault(r["cohort"], []).append(r)
    for rows in by_cohort.values():
        prev = None
        for r in rows:
            assert r["n_at_risk"] >= r["n_deaths"] + r["n_censored"]
            if prev is not None:
                assert r["n_at_risk"] <= prev["n_at_risk"] - (
                    prev["n_deaths"] + prev["n_censored"]
                ) or r["n_at_risk"] <= prev["n_at_risk"]
            prev = r


# ------------------------------------------------------ theil_sen (r5)

def _ts_df(spark, rows):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "key string, sec long, value double")
    return df.withColumn("ts", F.timestamp_seconds("sec")).drop("sec")


def test_theil_sen_hand_computed_and_outlier_robust(spark):
    from pandera_forge_spark.operators.temporal import theil_sen, trend_slope

    # key a: perfect slope 2 except one wild outlier at t=3
    rows = [
        ("a", 0, 0.0), ("a", 1, 2.0), ("a", 2, 4.0),
        ("a", 3, 1000.0), ("a", 4, 8.0),
    ]
    out = {r["key"]: r for r in theil_sen(_ts_df(spark, rows), ["key"], "ts", "value").collect()}
    r = out["a"]
    assert r["n_points"] == 5 and r["n_pairs"] == 10
    # sorted pairwise slopes: the median pair straddles 2.0 exactly
    # (10 pairs -> lo = rank 5, hi = rank 6); 6 of 10 slopes are 2.0
    assert r["slope_lo_micro"] == 2_000_000
    assert r["slope_hi_micro"] == 2_000_000
    # OLS on the same data is dragged far off by the outlier
    ols = trend_slope(_ts_df(spark, rows), ["key"], "ts", "value").collect()[0]
    assert abs(ols["slope"] - 2.0) > 10


def test_theil_sen_odd_pairs_and_equal_ts_skipped(spark):
    from pandera_forge_spark.operators.temporal import theil_sen

    # 3 points, one pair shares a timestamp -> dx=0 pair skipped:
    # slopes from (0,0)-(1,3): 3; (0,0)-(1,7): 7; (1,3)-(1,7): skipped
    rows = [("a", 0, 0.0), ("a", 1, 3.0), ("a", 1, 7.0)]
    r = theil_sen(_ts_df(spark, rows), ["key"], "ts", "value").collect()[0]
    assert r["n_pairs"] == 2
    assert (r["slope_lo_micro"], r["slope_hi_micro"]) == (3_000_000, 7_000_000)
    # a key whose points ALL share one timestamp emits no row
    lone = [("b", 5, 1.0), ("b", 5, 2.0)]
    assert theil_sen(_ts_df(spark, lone), ["key"], "ts", "value").collect() == []


def test_theil_sen_null_rows_ignored_and_null_key_kept(spark):
    from pyspark.sql import functions as F
    from pandera_forge_spark.operators.temporal import theil_sen

    rows = [
        (None, 0, 0.0), (None, 10, 5.0),
        ("a", 0, 0.0), ("a", 1, None), ("a", 2, 4.0),
    ]
    df = spark.createDataFrame(rows, "key string, sec long, value double")
    df = df.withColumn("ts", F.timestamp_seconds("sec")).drop("sec")
    out = {r["key"]: r for r in theil_sen(df, ["key"], "ts", "value").collect()}
    assert out[None]["slope_lo_micro"] == 500_000
    assert out["a"]["n_points"] == 2  # the NULL-value row never counts
    assert out["a"]["slope_lo_micro"] == 2_000_000


def test_theil_sen_fence_and_guards(spark):
    import pytest
    from pandera_forge_spark.operators.temporal import theil_sen

    rows = [("a", i, float(i)) for i in range(6)]
    df = _ts_df(spark, rows)
    with pytest.raises(Exception, match="max_points"):
        theil_sen(df, ["key"], "ts", "value", max_points=5).collect()
    # under the fence the same frame computes
    assert theil_sen(df, ["key"], "ts", "value", max_points=6).count() == 1
    with pytest.raises(ValueError, match="key_cols"):
        theil_sen(df, [], "ts", "value")
    with pytest.raises(ValueError, match="max_points"):
        theil_sen(df, ["key"], "ts", "value", max_points=1)


def test_theil_sen_no_python_udf(spark):
    from pandera_forge_spark.plans.inspect import has_python_udf
    from pandera_forge_spark.operators.temporal import theil_sen

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = theil_sen(ev, ["user_id"], "ts", "value")
    assert not has_python_udf(out)
    assert [f.dataType.simpleString() for f in out.schema.fields][-4:] == [
        "bigint", "bigint", "bigint", "bigint"
    ]


# ---------------------------------------------------------- decayed_counts


def test_decayed_counts_hand_computed(spark):
    from datetime import datetime, timedelta

    from pandera_forge_spark.operators.temporal import decayed_counts

    t0 = datetime(2026, 1, 31, 12, 0, 0)
    rows = []
    # key 'fresh': 3 events at ages 0, 1, 2 half-lives (hl = 1 day)
    for d in (0, 1, 2):
        rows.append(("fresh", t0 - timedelta(days=d)))
    # key 'stale': 6 events all 50 days old (clamped past horizon 10)
    for _ in range(6):
        rows.append(("stale", t0 - timedelta(days=50)))
    rows.append(("fresh", None))
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = {
        r["k"]: r
        for r in decayed_counts(
            df, ["k"], "ts", half_life_days=1.0, horizon=10
        ).collect()
    }
    h = 10
    assert got["fresh"]["n_events"] == 3
    assert got["fresh"]["decayed_units"] == (1 << h) + (1 << (h - 1)) + (
        1 << (h - 2)
    )
    assert got["fresh"]["decayed_now"] == 1.0 + 0.5 + 0.25
    # stale: every event clamps to weight 1
    assert got["stale"]["decayed_units"] == 6
    assert got["stale"]["decayed_now"] == 6 / 1024
    # the burst of 6 stale events is worth less than ONE fresh event
    assert got["stale"]["decayed_now"] < 1.0 < got["fresh"]["decayed_now"]


def test_decayed_counts_reference_is_max_ts(spark):
    from datetime import datetime, timedelta

    from pandera_forge_spark.operators.temporal import decayed_counts

    # shifting the WHOLE table by a year changes nothing: the
    # reference instant rides the data, not the wall clock
    t0 = datetime(2025, 6, 1)
    rows = [("k", t0 - timedelta(days=d)) for d in (0, 3, 9)]
    shifted = [("k", t - timedelta(days=365)) for _, t in rows]
    df1 = spark.createDataFrame(rows, "k string, ts timestamp")
    df2 = spark.createDataFrame(shifted, "k string, ts timestamp")
    a = decayed_counts(df1, ["k"], "ts", half_life_days=3.0, horizon=5).first()
    b = decayed_counts(df2, ["k"], "ts", half_life_days=3.0, horizon=5).first()
    assert a["decayed_units"] == b["decayed_units"] == (1 << 5) + (1 << 4) + (1 << 2)


def test_decayed_counts_contracts_and_plan(spark):
    from pandera_forge_spark.operators.temporal import decayed_counts
    from pandera_forge_spark.plans.inspect import executed_plan, has_python_udf

    df = spark.createDataFrame(
        [("k", 1000.0 * i) for i in range(20)], "k string, ts double"
    )
    with pytest.raises(ValueError, match="group_cols"):
        decayed_counts(df, [], "ts")
    with pytest.raises(ValueError, match="half_life"):
        decayed_counts(df, ["k"], "ts", half_life_days=0)
    with pytest.raises(ValueError, match="horizon"):
        decayed_counts(df, ["k"], "ts", horizon=0)
    with pytest.raises(ValueError, match="horizon"):
        decayed_counts(df, ["k"], "ts", horizon=41)
    with pytest.raises(ValueError, match="lacks"):
        decayed_counts(df, ["k"], "nope")
    out = decayed_counts(df, ["k"], "ts", half_life_days=1.0, horizon=20)
    assert not has_python_udf(out)
    plan = executed_plan(out)
    assert "BroadcastNestedLoopJoin" in plan and "Window" not in plan, plan


# -------------------------------------------------------------- silent_keys


def test_silent_keys_detects_went_dark(spark):
    from datetime import datetime, timedelta

    from pandera_forge_spark.operators.temporal import silent_keys

    t0 = datetime(2026, 4, 1)
    rows = []
    # 'alive': active every day through the last
    for d in range(10):
        rows.append(("alive", t0 + timedelta(days=d)))
    # 'dark': active days 0-6, silent 7-9 (3 buckets)
    for d in range(7):
        rows.append(("dark", t0 + timedelta(days=d)))
    # 'retired': last active 40 days before the end -> beyond lookback
    for d in range(5):
        rows.append(("retired", t0 - timedelta(days=40) + timedelta(days=d)))
    # 'oneoff': a single event ever -> no cadence, not reported
    rows.append(("oneoff", t0 + timedelta(days=2)))
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = {r["k"]: r for r in silent_keys(df, ["k"], "ts", lookback_buckets=28).collect()}
    assert set(got) == {"dark"}
    r = got["dark"]
    assert r["buckets_silent"] == 3 and r["n_events"] == 7
    assert r["last_seen_bucket_start"] == int(
        (t0 + timedelta(days=6)).timestamp()
    ) // 86400 * 86400
    assert r["n_active_buckets"] == 7


def test_silent_keys_bounds_and_contracts(spark):
    import pytest

    from pandera_forge_spark.operators.temporal import silent_keys

    # numeric ts path; key silent exactly at the lookback edge stays in
    rows = (
        [("edge", 0.0), ("edge", 86400.0)]
        + [("now", 86400.0 * d) for d in range(29)]
        + [("edge", 86400.0 * 2)]
    )
    df = spark.createDataFrame(rows, "k string, ts double")
    got = {r["k"]: r for r in silent_keys(df, ["k"], "ts", min_events=2).collect()}
    assert set(got) == {"edge"}
    assert got["edge"]["buckets_silent"] == 26
    with pytest.raises(ValueError, match="key_cols"):
        silent_keys(df, [], "ts")
    with pytest.raises(ValueError, match="silence_buckets"):
        silent_keys(df, ["k"], "ts", silence_buckets=0)
    with pytest.raises(ValueError, match="lookback"):
        silent_keys(df, ["k"], "ts", silence_buckets=5, lookback_buckets=4)
    with pytest.raises(ValueError, match="lacks"):
        silent_keys(df, ["nope"], "ts")


def test_silent_keys_plan(spark):
    from pandera_forge_spark.operators.temporal import silent_keys
    from pandera_forge_spark.plans.inspect import executed_plan, has_python_udf

    df = spark.createDataFrame(
        [("k%d" % (i % 5), 86400.0 * (i % 9)) for i in range(100)],
        "k string, ts double",
    )
    out = silent_keys(df, ["k"], "ts")
    assert not has_python_udf(out)
    plan = executed_plan(out)
    assert "BroadcastNestedLoopJoin" in plan and "Window" not in plan, plan


def test_cross_correlation_detects_lag(spark):
    """b is a copy of a shifted one bucket later: corr at lag 1 must
    be exactly 1.0; lag 0 matches numpy's Pearson on the aligned
    series."""
    import datetime as dt

    import numpy as np

    from pandera_forge_spark.operators.temporal import cross_correlation

    base = dt.datetime(2024, 1, 1)
    a_counts = [3, 1, 4, 1, 5, 9, 2, 6]
    rows = []
    for h, c in enumerate(a_counts):
        ts = base + dt.timedelta(hours=h)
        rows += [(ts, "a")] * c
        if h >= 1:
            rows += [(ts, "b")] * a_counts[h - 1]
    df = spark.createDataFrame(rows, "ts timestamp, kind string")
    out = {r.lag: r for r in cross_correlation(
        df, "ts", F.col("kind") == "a", F.col("kind") == "b", max_lag=2
    ).collect()}
    # sqrt(va*vb) can differ from va by 1 ulp when va == vb, so the
    # perfect correlation lands within one ulp of 1.0 (identically on
    # every engine — the inputs to sqrt are bit-identical)
    assert abs(out[1].corr - 1.0) < 1e-12
    # lag 0 reference: all 8 buckets exist (hour 0 holds a-rows, so
    # its b-count is 0, not missing)
    a = np.array(a_counts, dtype=float)
    b = np.array([0] + a_counts[:-1], dtype=float)
    expect = float(np.corrcoef(a, b)[0, 1])
    assert abs(out[0].corr - expect) < 1e-12
    assert out[0].n_pairs == 8 and out[1].n_pairs == 7


def test_cross_correlation_constant_stream_is_null(spark):
    import datetime as dt

    from pandera_forge_spark.operators.temporal import cross_correlation

    base = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(4):
        rows += [(base + dt.timedelta(hours=h), "a")] * 2   # constant a
        rows += [(base + dt.timedelta(hours=h), "b")] * (h + 1)
    df = spark.createDataFrame(rows, "ts timestamp, kind string")
    out = cross_correlation(
        df, "ts", F.col("kind") == "a", F.col("kind") == "b", max_lag=0
    ).collect()
    assert out[0].corr is None


def test_cross_correlation_validates_args(spark):
    import pytest

    from pandera_forge_spark.operators.temporal import cross_correlation

    df = spark.createDataFrame([], "ts timestamp, kind string")
    with pytest.raises(ValueError, match="max_lag"):
        cross_correlation(df, "ts", F.lit(True), F.lit(True), max_lag=-1)
    with pytest.raises(ValueError, match="bucket_seconds"):
        cross_correlation(df, "ts", F.lit(True), F.lit(True), bucket_seconds=0)
    with pytest.raises(ValueError, match="missing"):
        cross_correlation(df, "when", F.lit(True), F.lit(True))


def test_runs_test_clumped_vs_alternating(spark):
    """counts [5,5,5,1,1,1]: median 3, runs 2, mu=4, var=1.2 ->
    z = -2/sqrt(1.2); alternating [5,1,5,1,5,1]: runs 6 -> +2/sqrt(1.2)."""
    import datetime as dt
    import math

    from pandera_forge_spark.operators.temporal import runs_test

    base = dt.datetime(2024, 1, 1)
    rows = []
    for grp, counts in (
        ("clump", [5, 5, 5, 1, 1, 1]),
        ("alt", [5, 1, 5, 1, 5, 1]),
    ):
        for h, c in enumerate(counts):
            rows += [(grp, base + dt.timedelta(hours=h), 1.0)] * c
    df = spark.createDataFrame(rows, "grp string, ts timestamp, v double")
    out = {r.grp: r for r in runs_test(df, "ts", "v", ["grp"]).collect()}
    zc = out["clump"]
    assert (zc.n_buckets, zc.n_above, zc.n_below, zc.runs) == (6, 3, 3, 2)
    assert abs(zc.z - (2 - 4) / math.sqrt(1.2)) < 1e-12
    za = out["alt"]
    assert za.runs == 6
    assert abs(za.z - (6 - 4) / math.sqrt(1.2)) < 1e-12


def test_runs_test_median_ties_dropped_and_degenerate(spark):
    import datetime as dt

    from pandera_forge_spark.operators.temporal import runs_test

    base = dt.datetime(2024, 1, 1)
    rows = []
    # counts [3,2,1]: median 2 -> middle bucket dropped, seq [1,0]
    for h, c in enumerate([3, 2, 1]):
        rows += [("t", base + dt.timedelta(hours=h), 1.0)] * c
    # constant counts -> every bucket AT median -> empty sequence
    for h in range(3):
        rows += [("const", base + dt.timedelta(hours=h), 1.0)] * 2
    df = spark.createDataFrame(rows, "grp string, ts timestamp, v double")
    out = {r.grp: r for r in runs_test(df, "ts", "v", ["grp"]).collect()}
    assert (out["t"].n_buckets, out["t"].runs) == (2, 2)
    assert "const" not in out       # all ties -> no sequence rows at all


def test_runs_test_validates_args(spark):
    import pytest

    from pandera_forge_spark.operators.temporal import runs_test

    df = spark.createDataFrame([], "grp string, ts timestamp, v double")
    with pytest.raises(ValueError, match="bucket_seconds"):
        runs_test(df, "ts", "v", ["grp"], bucket_seconds=0)
    with pytest.raises(ValueError, match="group_cols"):
        runs_test(df, "ts", "v", [])
    with pytest.raises(ValueError, match="missing"):
        runs_test(df, "ts", "ghost", ["grp"])


def test_sprt_monitor_decides_h1_and_h0(spark):
    """Degraded group: 50% success vs p0=0.1/p1=0.5 -> crosses the h1
    boundary; healthy group at 10% -> crosses h0; a 2-bucket ambiguous
    group -> continue. The decided bucket and final LLR are replayed
    in python exactly."""
    import datetime as dt
    import math

    from pandera_forge_spark.operators.temporal import sprt_monitor

    base = dt.datetime(2024, 1, 1)
    rows = []
    # bad: each hour 10 trials, 5 successes
    # good: each hour 10 trials, 1 success
    for h in range(6):
        ts = base + dt.timedelta(hours=h)
        rows += [("bad", ts, 1)] * 5 + [("bad", ts, 0)] * 5
        rows += [("good", ts, 1)] * 1 + [("good", ts, 0)] * 9
    rows += [("ambig", base, 1), ("ambig", base, 0)]
    df = spark.createDataFrame(rows, "grp string, ts timestamp, ok int")
    out = {r.grp: r for r in sprt_monitor(
        df, "ts", ["grp"], F.col("ok") == 1, p0=0.1, p1=0.5
    ).collect()}
    assert out["bad"].decision == "h1"
    assert out["good"].decision == "h0"
    assert out["ambig"].decision == "continue"
    # python replay of the bad group's crossing
    ws, wf = math.log(0.5 / 0.1), math.log(0.5 / 0.9)
    hi = math.log(0.95 / 0.05)
    llr, decided = 0.0, None
    for i in range(1, 7):
        llr = (5 * i) * ws + (5 * i) * wf
        if llr >= hi and decided is None:
            decided = i
    assert out["bad"].decided_bucket == decided
    assert abs(out["bad"].llr_final - llr) < 1e-12
    assert out["bad"].trials == 60 and out["bad"].successes == 30


def test_sprt_monitor_validates_args(spark):
    import pytest

    from pandera_forge_spark.operators.temporal import sprt_monitor

    df = spark.createDataFrame([], "grp string, ts timestamp, ok int")
    p = F.lit(True)
    with pytest.raises(ValueError, match="p0/p1"):
        sprt_monitor(df, "ts", ["grp"], p, p0=0.0, p1=0.5)
    with pytest.raises(ValueError, match="must differ"):
        sprt_monitor(df, "ts", ["grp"], p, p0=0.3, p1=0.3)
    with pytest.raises(ValueError, match="group_cols"):
        sprt_monitor(df, "ts", [], p, p0=0.1, p1=0.5)
    with pytest.raises(ValueError, match="missing"):
        sprt_monitor(df, "when", ["grp"], p, p0=0.1, p1=0.5)


def test_seasonal_strength_planted_daily_shape(spark):
    """A perfect 4-hour-period series repeated over days: with
    season=4 the seasonal-naive error is 0 -> strength exactly 1;
    with season=3 (wrong period) the seasonal error is comparable to
    naive -> strength collapses toward 0 instead of 1."""
    import datetime as dt

    from pandera_forge_spark.operators.temporal import seasonal_strength

    base = dt.datetime(2024, 1, 1)
    pattern = [2, 8, 3, 5]
    rows = []
    for h in range(24):
        rows += [("s", base + dt.timedelta(hours=h), 1)] * pattern[h % 4]
    df = spark.createDataFrame(rows, "grp string, ts timestamp, x int")
    r = seasonal_strength(df, "ts", ["grp"], season=4).collect()[0]
    assert r.n_seasonal_pairs == 20 and r.mae_seasonal == 0.0
    assert r.strength == 1.0
    r3 = seasonal_strength(df, "ts", ["grp"], season=3).collect()[0]
    assert r3.strength < 0.2


def test_seasonal_strength_degenerate_and_fences(spark):
    import datetime as dt

    import pytest

    from pandera_forge_spark.operators.temporal import seasonal_strength

    base = dt.datetime(2024, 1, 1)
    # constant series: MAE_naive = 0 -> NULL strength, loudly
    rows = [("c", base + dt.timedelta(hours=h), 1) for h in range(30)]
    df = spark.createDataFrame(rows, "grp string, ts timestamp, x int")
    r = seasonal_strength(df, "ts", ["grp"], season=24).collect()[0]
    assert r.mae_naive == 0.0 and r.strength is None
    with pytest.raises(ValueError, match="season"):
        seasonal_strength(df, "ts", ["grp"], season=1)
    with pytest.raises(ValueError, match="group_cols"):
        seasonal_strength(df, "ts", [])


def test_mann_kendall_trends_and_reference(spark):
    """Strictly rising counts -> S = n(n-1)/2, trend increasing;
    falling -> decreasing; a tied flat series -> var corrected, no
    trend; S/var/z replayed in python on the mixed group."""
    import datetime as dt
    import math

    from pandera_forge_spark.operators.temporal import mann_kendall

    base = dt.datetime(2024, 1, 1)
    series = {
        "up": [1, 2, 3, 4, 5, 6, 7, 8],
        "down": [8, 7, 6, 5, 4, 3, 2, 1],
        "flat": [3, 3, 3, 3, 3, 3],
        "mixed": [2, 5, 3, 6, 4, 7, 5, 8],
    }
    rows = []
    for g, counts in series.items():
        for h, c in enumerate(counts):
            rows += [(g, base + dt.timedelta(hours=h))] * c
    df = spark.createDataFrame(rows, "grp string, ts timestamp")
    got = {r.grp: r for r in mann_kendall(df, "ts", ["grp"]).collect()}
    assert got["up"].s == 28 and got["up"].trend == "increasing"
    assert got["down"].s == -28 and got["down"].trend == "decreasing"
    assert got["flat"].z is None and got["flat"].trend == "none"

    cs = series["mixed"]
    s = sum(
        (1 if cs[j] > cs[i] else -1 if cs[j] < cs[i] else 0)
        for i in range(len(cs))
        for j in range(i + 1, len(cs))
    )
    from collections import Counter

    n = len(cs)
    tie = sum(t * (t - 1) * (2 * t + 5) for t in Counter(cs).values() if t > 1)
    var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
    z = (s - 1) / math.sqrt(var) if s > 0 else (s + 1) / math.sqrt(var)
    r = got["mixed"]
    assert r.s == s and abs(r.var_s - var) < 1e-12
    assert abs(r.z - z) < 1e-12


def test_mann_kendall_validates_args(spark):
    import pytest

    from pandera_forge_spark.operators.temporal import mann_kendall

    df = spark.createDataFrame([], "grp string, ts timestamp")
    with pytest.raises(ValueError, match="bucket_seconds"):
        mann_kendall(df, "ts", ["grp"], bucket_seconds=0)
    with pytest.raises(ValueError, match="group_cols"):
        mann_kendall(df, "ts", [])
    with pytest.raises(ValueError, match="missing"):
        mann_kendall(df, "when", ["grp"])
