"""Label-quality operators (operators/labels.py) and the per-key OLS
trend (operators/temporal.py trend_slope)."""

import math

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.operators.labels import (
    annotator_agreement,
    label_conflicts,
    majority_label,
)
from pandera_forge_spark.operators.temporal import trend_slope
from pandera_forge_spark.plans.inspect import executed_plan, has_python_udf


@pytest.fixture(scope="module")
def annotations(spark):
    # item 1: unanimous 'x' (3 votes); item 2: 2-1 split; item 3: 1-1
    # tie -> lexicographic winner; item 4: single null label (ignored);
    # item 5: one annotator only
    rows = [
        (1, "a", "x"),
        (1, "b", "x"),
        (1, "c", "x"),
        (2, "a", "x"),
        (2, "b", "y"),
        (2, "c", "y"),
        (3, "a", "z"),
        (3, "b", "w"),
        (4, "a", None),
        (5, "c", "x"),
    ]
    return spark.createDataFrame(rows, "item int, ann string, label string")


def test_label_conflicts(annotations):
    out = label_conflicts(annotations, ["item"], "label")
    got = {r["item"]: (r["labels"], r["n_labels"], r["n_rows"]) for r in out.collect()}
    assert set(got) == {2, 3}
    assert got[2] == (["x", "y"], 2, 3)
    assert got[3] == (["w", "z"], 2, 2)


def test_label_conflicts_fence_trips(annotations):
    with pytest.raises(Exception, match="max_labels"):
        label_conflicts(annotations, ["item"], "label", max_labels=1).collect()


def test_majority_label(annotations):
    out = majority_label(annotations, ["item"], "label")
    got = {
        r["item"]: (r["label"], r["votes"], r["total"], r["n_labels"])
        for r in out.collect()
    }
    assert got[1] == ("x", 3, 3, 1)
    assert got[2] == ("y", 2, 3, 2)
    # 1-1 tie: lexicographically smallest label wins, deterministically
    assert got[3] == ("w", 1, 2, 2)
    assert got[5] == ("x", 1, 1, 1)
    assert 4 not in got  # null-only item has no votes


def test_majority_no_window_no_udf(annotations):
    out = majority_label(annotations, ["item"], "label")
    assert not has_python_udf(out)
    assert "Window" not in executed_plan(out)


def test_annotator_agreement_exact(annotations):
    out = annotator_agreement(annotations, "item", "ann", "label")
    got = {(r["ann_a"], r["ann_b"]): r for r in out.collect()}
    # a-b co-annotate items 1,2,3: agree on 1 only
    r = got[("a", "b")]
    assert (r["n_items"], r["n_agree"]) == (3, 1)
    # marginals over shared items: a: x2 z1, b: x1 y1 w1 -> nanb = 2
    # kappa = (1*3 - 2) / (9 - 2) = 1/7
    assert r["kappa"] == (1 * 3 - 2) / (3 * 3 - 2)
    # a-c co-annotate items 1,2: agree on 1; a: x2, c: x1 y1 -> nanb=2
    r = got[("a", "c")]
    assert (r["n_items"], r["n_agree"]) == (2, 1)
    assert r["kappa"] == (1 * 2 - 2) / (4 - 2)
    # b-c co-annotate items 1,2 and agree on both; marginals x1 y1 both
    # sides -> nanb=2, kappa = (2*2-2)/(4-2) = 1.0
    r = got[("b", "c")]
    assert (r["n_items"], r["n_agree"], r["kappa"]) == (2, 2, 1.0)


def test_annotator_agreement_constant_label_null_kappa(spark):
    df = spark.createDataFrame(
        [(1, "a", "x"), (1, "b", "x"), (2, "a", "x"), (2, "b", "x")],
        "item int, ann string, label string",
    )
    [r] = annotator_agreement(df, "item", "ann", "label").collect()
    assert r["n_agree"] == 2 and r["kappa"] is None


def test_annotator_agreement_disjoint_labels_kappa_zero(spark):
    # a always 'x', b always 'y': no common label, empty marginal
    # intersection — the pair must still be reported, kappa 0
    df = spark.createDataFrame(
        [(1, "a", "x"), (1, "b", "y"), (2, "a", "x"), (2, "b", "y")],
        "item int, ann string, label string",
    )
    [r] = annotator_agreement(df, "item", "ann", "label").collect()
    assert (r["n_items"], r["n_agree"], r["kappa"]) == (2, 0, 0.0)


def test_annotator_agreement_duplicate_row_fence(spark):
    df = spark.createDataFrame(
        [(1, "a", "x"), (1, "a", "y"), (1, "b", "x")],
        "item int, ann string, label string",
    )
    with pytest.raises(Exception, match="duplicate"):
        annotator_agreement(df, "item", "ann", "label").collect()


def test_labels_collision_fences(annotations):
    # only KEY columns can collide with output names — non-key columns
    # don't survive the groupBy, and a label_col named "label" is fine
    with pytest.raises(ValueError, match="collide"):
        label_conflicts(
            annotations.withColumnRenamed("item", "labels"), ["labels"], "label"
        )
    with pytest.raises(ValueError, match="collide"):
        majority_label(
            annotations.withColumnRenamed("item", "votes"), ["votes"], "label"
        )
    # a non-key column named like an output must NOT trip the fence
    ok = label_conflicts(
        annotations.withColumn("n_rows_src", F.lit(1)), ["item"], "label"
    )
    assert ok.count() == 2


# ---------------------------------------------------------------- trend


@pytest.fixture(scope="module")
def series(spark):
    # key 'lin': exact line v = 2t + 5 -> slope 2, r2 1
    # key 'flat': constant -> slope 0, r2 NULL (zero y-variance)
    # key 'noisy': hand-computable 3 points
    # key 'one_t': all points at one timestamp -> dropped (zero x-var)
    # key 'thin': below min_points -> dropped
    rows = (
        [("lin", float(t), 2.0 * t + 5.0) for t in range(10)]
        + [("flat", float(t), 7.0) for t in range(5)]
        + [("noisy", 0.0, 0.0), ("noisy", 1.0, 2.0), ("noisy", 2.0, 1.0)]
        + [("one_t", 4.0, 1.0), ("one_t", 4.0, 2.0), ("one_t", 4.0, 3.0)]
        + [("thin", 0.0, 0.0), ("thin", 1.0, 1.0)]
    )
    return spark.createDataFrame(rows, "k string, ts double, v double")


def test_trend_slope_exact_line(series):
    out = trend_slope(series, ["k"], "ts", "v", min_points=3)
    got = {r["k"]: r for r in out.collect()}
    assert set(got) == {"lin", "flat", "noisy"}
    assert got["lin"]["slope"] == 2.0
    assert got["lin"]["intercept"] == 5.0
    assert got["lin"]["r2"] == 1.0
    assert got["flat"]["slope"] == 0.0
    assert got["flat"]["r2"] is None
    # noisy: n=3 sx=3 sy=3 sxx=5 sxy=4 syy=5
    # num = 12-9 = 3; den_x = 15-9 = 6; den_y = 15-9 = 6
    assert got["noisy"]["slope"] == 0.5
    assert math.isclose(got["noisy"]["r2"], 0.25)
    assert got["noisy"]["n_points"] == 3


def test_trend_slope_matches_python_ols(series):
    out = {r["k"]: r for r in trend_slope(series, ["k"], "ts", "v").collect()}
    pts = [(0.0, 0.0), (1.0, 2.0), (2.0, 1.0)]
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] ** 2 for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert out["noisy"]["slope"] == slope
    assert out["noisy"]["intercept"] == (sy - slope * sx) / n


def test_trend_slope_timestamp_input_and_null_handling(spark):
    df = spark.createDataFrame(
        [
            ("k", "2024-01-01 00:00:00", 1.0),
            ("k", "2024-01-01 00:00:10", 21.0),
            ("k", "2024-01-01 00:00:20", 41.0),
            ("k", None, 9999.0),
            ("k", "2024-01-01 00:00:30", None),
        ],
        "k string, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    [r] = trend_slope(df, ["k"], "ts", "v").collect()
    assert r["n_points"] == 3
    assert r["slope"] == 2.0  # 20 units / 10 seconds
    assert r["intercept"] == 1.0
    assert r["t0"] == 1704067200


def test_trend_slope_partition_independent(series):
    a = trend_slope(series.repartition(7), ["k"], "ts", "v").collect()
    b = trend_slope(series.coalesce(1), ["k"], "ts", "v").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_trend_slope_single_exchange_no_udf(series):
    out = trend_slope(series, ["k"], "ts", "v")
    assert not has_python_udf(out)
    plan = executed_plan(out)
    # window min + groupBy share the hash partitioning on the key
    assert plan.count("Exchange hashpartitioning") == 1


def test_trend_slope_fences(series):
    with pytest.raises(ValueError, match="min_points"):
        trend_slope(series, ["k"], "ts", "v", min_points=1)
    with pytest.raises(ValueError, match="collide"):
        trend_slope(series.withColumnRenamed("k", "slope"), ["slope"], "ts", "v")
    with pytest.raises(ValueError, match="collide"):
        trend_slope(series.withColumn("__xp", F.lit(1)), ["k"], "ts", "v")


# ---------------------------------------------------------------------------
# autocorr_by_key
# ---------------------------------------------------------------------------

from pandera_forge_spark.operators.temporal import autocorr_by_key


def _acf_replay(vals, lag):
    """Same fixed IEEE tree as the engine: pairs (v_i, v_{i+lag})."""
    pairs = [(vals[i], vals[i + lag]) for i in range(len(vals) - lag)]
    n = float(len(pairs))
    sx = sum(p[0] for p in pairs)
    sy = sum(p[1] for p in pairs)
    sxx = sum(p[0] * p[0] for p in pairs)
    syy = sum(p[1] * p[1] for p in pairs)
    sxy = sum(p[0] * p[1] for p in pairs)
    den_x = n * sxx - sx * sx
    den_y = n * syy - sy * sy
    if not (den_x > 0 and den_y > 0):
        return len(pairs), None
    return len(pairs), (n * sxy - sx * sy) / (
        math.sqrt(den_x) * math.sqrt(den_y)
    )


@pytest.fixture(scope="module")
def acf_series(spark):
    # ramp: 0..9 -> strong positive lag-1 ACF (pairs replayed exactly)
    # alt:  +1/-1 alternation -> ACF -1 at lag 1, +1 at lag 2
    # flat: constant -> zero variance -> acf NULL, row kept
    # thin: 3 points -> 2 pairs < min_pairs=3 -> dropped
    rows = (
        [("ramp", float(t), float(t * t % 7)) for t in range(10)]
        + [("alt", float(t), float(1 if t % 2 else -1)) for t in range(8)]
        + [("flat", float(t), 5.0) for t in range(6)]
        + [("thin", float(t), float(t)) for t in range(3)]
    )
    return spark.createDataFrame(rows, "k string, ts double, v double")


def test_autocorr_matches_python_replay(acf_series):
    out = {r["k"]: r for r in autocorr_by_key(
        acf_series, ["k"], "ts", "v", lag=1, min_pairs=3).collect()}
    assert set(out) == {"ramp", "alt", "flat"}
    for k, vals in {
        "ramp": [float(t * t % 7) for t in range(10)],
        "alt": [float(1 if t % 2 else -1) for t in range(8)],
    }.items():
        n, acf = _acf_replay(vals, 1)
        assert out[k]["n_pairs"] == n
        assert out[k]["acf"] == acf, k  # bit-identical
    assert math.isclose(out["alt"]["acf"], -1.0)
    assert out["flat"]["acf"] is None
    assert out["flat"]["n_pairs"] == 5


def test_autocorr_lag2_pairing(acf_series):
    out = {r["k"]: r for r in autocorr_by_key(
        acf_series, ["k"], "ts", "v", lag=2, min_pairs=3).collect()}
    # alternating series realigns at lag 2: perfect +1
    assert math.isclose(out["alt"]["acf"], 1.0)
    assert out["alt"]["n_pairs"] == 6
    n, acf = _acf_replay([float(t * t % 7) for t in range(10)], 2)
    assert (out["ramp"]["n_pairs"], out["ramp"]["acf"]) == (n, acf)


def test_autocorr_null_handling_and_tiebreak(spark):
    df = spark.createDataFrame(
        [
            ("k", 0.0, 0, 1.0),
            ("k", 1.0, 1, 2.0),
            ("k", None, 2, 99.0),   # NULL ts ignored
            ("k", 2.0, 3, None),    # NULL value ignored
            ("k", 3.0, 4, 3.0),
            ("k", 3.0, 5, 4.0),     # tie on ts -> id breaks it
            ("k", 4.0, 6, 5.0),
        ],
        "k string, ts double, id long, v double",
    )
    [r] = autocorr_by_key(
        df, ["k"], "ts", "v", lag=1, min_pairs=2, order_cols=["id"]
    ).collect()
    n, acf = _acf_replay([1.0, 2.0, 3.0, 4.0, 5.0], 1)
    assert (r["n_pairs"], r["acf"]) == (n, acf)


def test_autocorr_single_exchange_no_udf(acf_series):
    out = autocorr_by_key(acf_series, ["k"], "ts", "v")
    assert not has_python_udf(out)
    assert executed_plan(out).count("Exchange hashpartitioning") == 1


def test_autocorr_partition_independent(acf_series):
    a = autocorr_by_key(acf_series.repartition(7), ["k"], "ts", "v").collect()
    b = autocorr_by_key(acf_series.coalesce(1), ["k"], "ts", "v").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_autocorr_fences(acf_series):
    with pytest.raises(ValueError, match="lag must be >= 1"):
        autocorr_by_key(acf_series, ["k"], "ts", "v", lag=0)
    with pytest.raises(ValueError, match="min_pairs"):
        autocorr_by_key(acf_series, ["k"], "ts", "v", min_pairs=1)
    with pytest.raises(ValueError, match="collide"):
        autocorr_by_key(
            acf_series.withColumnRenamed("k", "acf"), ["acf"], "ts", "v"
        )
    with pytest.raises(ValueError, match="internal working"):
        autocorr_by_key(
            acf_series.withColumn("__x", F.lit(1)), ["k"], "ts", "v"
        )
    with pytest.raises(ValueError, match="lacks columns"):
        autocorr_by_key(acf_series, ["k"], "ts", "missing")


# ---------------------------------------------------------------------------
# lateness_census
# ---------------------------------------------------------------------------

from pandera_forge_spark.operators.temporal import lateness_census


def _late_df(spark):
    # arrival order 0..7; event seconds chosen to plant exact lateness:
    # hw:      10 10 30 30 30 100 100 100
    # late(s):  0  5  0 25  1   0  95  0
    rows = [
        ("k", 0, 10.0), ("k", 1, 5.0), ("k", 2, 30.0), ("k", 3, 5.0),
        ("k", 4, 29.0), ("k", 5, 100.0), ("k", 6, 5.0), ("k", 7, 100.0),
        ("q", 0, 1.0), ("q", 1, 2.0),  # fully in order
        ("q", 2, None), (None if False else "q", None, 3.0),  # ignored rows
    ]
    return spark.createDataFrame(rows, "k string, arr long, ts double")


def test_lateness_planted(spark):
    out = {
        r["k"]: r
        for r in lateness_census(
            _late_df(spark), "ts", "arr", ["k"], thresholds=[1, 10, 60]
        ).collect()
    }
    k = out["k"]
    assert k["n_events"] == 8
    assert k["max_late_us"] == 95_000_000
    # late > 1s: {5, 25, 95}; > 10s: {25, 95}; > 60s: {95}
    assert (k["late_1s"], k["late_10s"], k["late_60s"]) == (3, 2, 1)
    q = out["q"]
    assert q["n_events"] == 2  # NULL ts / NULL arrival excluded
    assert q["max_late_us"] == 0
    assert (q["late_1s"], q["late_10s"], q["late_60s"]) == (0, 0, 0)


def test_lateness_global_and_timestamp_input(spark):
    from datetime import datetime

    df = spark.createDataFrame(
        [
            (0, datetime(2024, 1, 1, 0, 0, 10)),
            (1, datetime(2024, 1, 1, 0, 0, 5)),   # 5 s late
            (2, datetime(2024, 1, 1, 0, 1, 0)),
        ],
        "arr long, ts timestamp",
    )
    [r] = lateness_census(df, "ts", "arr", thresholds=[1, 30]).collect()
    assert r["n_events"] == 3
    assert r["max_late_us"] == 5_000_000
    assert (r["late_1s"], r["late_30s"]) == (1, 0)


def test_lateness_single_exchange_and_partition_independence(spark):
    df = _late_df(spark)
    out = lateness_census(df, "ts", "arr", ["k"], thresholds=[1])
    assert not has_python_udf(out)
    assert executed_plan(out).count("Exchange hashpartitioning") == 1
    a = lateness_census(df.repartition(7), "ts", "arr", ["k"]).collect()
    b = lateness_census(df.coalesce(1), "ts", "arr", ["k"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_lateness_fences(spark):
    df = _late_df(spark)
    with pytest.raises(ValueError, match="non-empty"):
        lateness_census(df, "ts", "arr", thresholds=[])
    with pytest.raises(ValueError, match=">= 0"):
        lateness_census(df, "ts", "arr", thresholds=[-1])
    with pytest.raises(ValueError, match="duplicate thresholds"):
        lateness_census(df, "ts", "arr", thresholds=[5, 5])
    with pytest.raises(ValueError, match="collide"):
        lateness_census(
            df.withColumnRenamed("k", "n_events"), "ts", "arr", ["n_events"]
        )
    with pytest.raises(ValueError, match="lacks columns"):
        lateness_census(df, "ts", "missing")
    with pytest.raises(ValueError, match="internal working"):
        lateness_census(
            df.withColumn("__late", F.lit(1)), "ts", "arr", ["k"]
        )


# ---------------------------------------------------------------------------
# cadence_profile
# ---------------------------------------------------------------------------

from pandera_forge_spark.operators.temporal import cadence_profile


def _cadence_replay(secs):
    ts = sorted(int(math.floor(s)) for s in secs)
    gaps = [b - a for a, b in zip(ts, ts[1:])]
    n = len(gaps)
    sg = sum(gaps)
    sgg = sum(x * x for x in gaps)
    mean = float(sg) / float(n)
    cv = (
        math.sqrt(float(n) * float(sgg) - float(sg) * float(sg)) / float(sg)
        if sg > 0
        else None
    )
    return {
        "n_gaps": n, "min_gap": min(gaps), "max_gap": max(gaps),
        "n_zero_gaps": sum(1 for x in gaps if x == 0),
        "mean_gap": mean, "cv_gap": cv,
    }


def test_cadence_planted(spark):
    # bot: exact 60 s metronome -> cv 0; human: irregular; burst: all
    # at the same second -> cv NULL; thin: dropped by min_gaps
    rows = (
        [("bot", 60.0 * i) for i in range(10)]
        + [("human", s) for s in (0.0, 7.0, 9.0, 100.0, 101.0, 350.0)]
        + [("burst", 5.0), ("burst", 5.2), ("burst", 5.9), ("burst", 5.4)]
        + [("thin", 0.0), ("thin", 50.0)]
    )
    df = spark.createDataFrame(rows, "k string, ts double")
    out = {
        r["k"]: r
        for r in cadence_profile(df, ["k"], "ts", min_gaps=3).collect()
    }
    assert set(out) == {"bot", "human", "burst"}
    b = out["bot"]
    assert (b["n_gaps"], b["min_gap"], b["max_gap"], b["n_zero_gaps"]) == (
        9, 60, 60, 0,
    )
    assert b["cv_gap"] == 0.0 and b["mean_gap"] == 60.0
    h = out["human"]
    want = _cadence_replay([0, 7, 9, 100, 101, 350])
    for k, v in want.items():
        assert h[k] == v, k  # bit-identical tree
    assert h["cv_gap"] > 0.5
    bu = out["burst"]
    assert bu["cv_gap"] is None and bu["n_zero_gaps"] == 3
    assert bu["mean_gap"] == 0.0


def test_cadence_timestamp_and_nulls(spark):
    from datetime import datetime

    df = spark.createDataFrame(
        [
            ("k", datetime(2024, 1, 1, 0, 0, 0)),
            ("k", datetime(2024, 1, 1, 0, 1, 0)),
            ("k", None),
            ("k", datetime(2024, 1, 1, 0, 3, 0)),
        ],
        "k string, ts timestamp",
    )
    [r] = cadence_profile(df, ["k"], "ts", min_gaps=2).collect()
    assert (r["n_gaps"], r["min_gap"], r["max_gap"]) == (2, 60, 120)


def test_cadence_plan_and_fences(spark):
    rows = [("k", float(i * i % 31)) for i in range(20)]
    df = spark.createDataFrame(rows, "k string, ts double")
    out = cadence_profile(df, ["k"], "ts")
    assert not has_python_udf(out)
    assert executed_plan(out).count("Exchange hashpartitioning") == 1
    a = cadence_profile(df.repartition(7), ["k"], "ts").collect()
    b = cadence_profile(df.coalesce(1), ["k"], "ts").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    with pytest.raises(ValueError, match="min_gaps"):
        cadence_profile(df, ["k"], "ts", min_gaps=0)
    with pytest.raises(ValueError, match="non-empty"):
        cadence_profile(df, [], "ts")
    with pytest.raises(ValueError, match="collide"):
        cadence_profile(df.withColumnRenamed("k", "cv_gap"), ["cv_gap"], "ts")
    with pytest.raises(ValueError, match="lacks columns"):
        cadence_profile(df, ["k"], "missing")
    with pytest.raises(ValueError, match="internal working"):
        cadence_profile(df.withColumn("__g", F.lit(1)), ["k"], "ts")


# ---------------------------------------------------------------------------
# constancy_runs
# ---------------------------------------------------------------------------

from pandera_forge_spark.operators.temporal import constancy_runs


def test_constancy_planted(spark):
    rows = (
        # stuck: 5 then SIX 7s then 9           -> max run 6 of value 7
        [("stuck", float(t), v) for t, v in enumerate([5, 7, 7, 7, 7, 7, 7, 9])]
        # healthy: alternating                   -> max run 1 (dropped at min_run=2)
        + [("ok", float(t), t % 2) for t in range(6)]
        # nulls: a 3-run of NULLs                -> null-safe runs count
        + [("nul", 0.0, 1), ("nul", 1.0, None), ("nul", 2.0, None),
           ("nul", 3.0, None), ("nul", 4.0, 2)]
        # tie: two 2-runs -> earliest wins
        + [("tie", float(t), v) for t, v in enumerate([4, 4, 8, 8, 1])]
    )
    df = spark.createDataFrame(rows, "k string, ts double, v long")
    out = {r["k"]: r for r in constancy_runs(df, ["k"], "ts", "v").collect()}
    assert set(out) == {"stuck", "nul", "tie"}
    s = out["stuck"]
    assert (s["n_obs"], s["n_runs"], s["max_run_len"], s["max_run_value"]) == (
        8, 3, 6, 7,
    )
    assert (s["max_run_start"], s["max_run_end"]) == (1.0, 6.0)
    n = out["nul"]
    assert (n["max_run_len"], n["max_run_value"]) == (3, None)
    t = out["tie"]
    assert (t["max_run_len"], t["max_run_value"], t["max_run_start"]) == (
        2, 4, 0.0,  # earliest 2-run wins the tie deterministically
    )
    # min_run=1 keeps the healthy key too
    all_keys = {r["k"] for r in constancy_runs(df, ["k"], "ts", "v", min_run=1).collect()}
    assert all_keys == {"stuck", "ok", "nul", "tie"}


def test_constancy_plan_and_fences(spark):
    df = spark.createDataFrame(
        [("k", float(i), i % 3) for i in range(12)], "k string, ts double, v long"
    )
    out = constancy_runs(df, ["k"], "ts", "v", min_run=1)
    assert not has_python_udf(out)
    # windows + (key,run) agg + key agg: two Exchanges total (windows
    # and the final agg share the key hash prefix)
    assert executed_plan(out).count("Exchange hashpartitioning") <= 2
    a = constancy_runs(df.repartition(7), ["k"], "ts", "v", min_run=1).collect()
    b = constancy_runs(df.coalesce(1), ["k"], "ts", "v", min_run=1).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    with pytest.raises(ValueError, match="min_run"):
        constancy_runs(df, ["k"], "ts", "v", min_run=0)
    with pytest.raises(ValueError, match="non-empty"):
        constancy_runs(df, [], "ts", "v")
    with pytest.raises(ValueError, match="collide"):
        constancy_runs(df.withColumnRenamed("k", "n_runs"), ["n_runs"], "ts", "v")
    with pytest.raises(ValueError, match="lacks columns"):
        constancy_runs(df, ["k"], "ts", "missing")
    with pytest.raises(ValueError, match="quantize"):
        constancy_runs(
            df.withColumn("v", F.col("v").cast("double")), ["k"], "ts", "v"
        )
    with pytest.raises(ValueError, match="internal working"):
        constancy_runs(df.withColumn("__run", F.lit(1)), ["k"], "ts", "v")


# ---------------------------------------------------------------------------
# interval_coverage
# ---------------------------------------------------------------------------

from pandera_forge_spark.operators.temporal import interval_coverage

W0, W1 = "2024-01-01 00:00:00", "2024-01-01 01:00:00"  # 3600 s window


def _iv(spark, rows):
    from datetime import datetime, timedelta

    def t(m, s=0):
        return datetime(2024, 1, 1) + timedelta(minutes=m, seconds=s)

    data = [(k, t(*a), t(*b)) for k, a, b in rows]
    return spark.createDataFrame(data, "k string, s timestamp, e timestamp")


def test_interval_coverage_planted(spark):
    rows = [
        # key 'a': [0,10) + [5,20) merge -> [0,20); [30,40) separate;
        # duplicate [30,40) must not double-count
        ("a", (0,), (10,)), ("a", (5,), (20,)),
        ("a", (30,), (40,)), ("a", (30,), (40,)),
        # key 'b': one interval clipped by the window end
        ("b", (50,), (70,)),
        # key 'c': fully outside the window -> no row
        ("c", (61,), (62,)),
    ]
    out = {
        r["k"]: r
        for r in interval_coverage(
            _iv(spark, rows), ["k"], "s", "e", W0, W1
        ).collect()
    }
    assert set(out) == {"a", "b"}
    a = out["a"]
    assert (a["n_intervals"], a["n_islands"]) == (4, 2)
    assert a["covered_us"] == (20 + 10) * 60 * 1_000_000
    assert a["coverage_share"] == (30 * 60) / 3600.0
    # gaps: interior 20->30 = 10 min; tail 40->60 = 20 min (largest)
    assert a["largest_gap_us"] == 20 * 60 * 1_000_000
    b = out["b"]
    assert b["covered_us"] == 10 * 60 * 1_000_000  # clipped at 60
    assert b["largest_gap_us"] == 50 * 60 * 1_000_000  # head gap


def test_interval_coverage_full_window_and_replay(spark):
    # wall-to-wall coverage: share exactly 1.0, largest gap 0
    rows = [("k", (0,), (30,)), ("k", (30,), (59, 59))]
    # note: [30, 59:59) then [59:59, 60:00) missing -> 1s tail gap
    out = interval_coverage(_iv(spark, rows), ["k"], "s", "e", W0, W1)
    [r] = out.collect()
    assert r["covered_us"] == 3599 * 1_000_000
    assert r["largest_gap_us"] == 1_000_000
    assert r["n_islands"] == 1  # touching intervals merge (s == prev end)


def test_interval_coverage_fences(spark):
    df = _iv(spark, [("k", (0,), (10,))])
    with pytest.raises(ValueError, match="non-empty"):
        interval_coverage(df, [], "s", "e", W0, W1)
    with pytest.raises(ValueError, match="lacks columns"):
        interval_coverage(df, ["k"], "s", "nope", W0, W1)
    with pytest.raises(ValueError, match="must be after"):
        interval_coverage(df, ["k"], "s", "e", W1, W0)
    with pytest.raises(ValueError, match="ISO timestamps"):
        interval_coverage(df, ["k"], "s", "e", "not-a-ts", W1)
    with pytest.raises(ValueError, match="collide"):
        interval_coverage(
            df.withColumnRenamed("k", "covered_us"), ["covered_us"],
            "s", "e", W0, W1,
        )
    inverted = _iv(spark, [("k", (10,), (5,))])
    with pytest.raises(Exception, match="inverted or zero-length"):
        interval_coverage(inverted, ["k"], "s", "e", W0, W1).collect()


def test_interval_coverage_partition_independence_no_udf(spark):
    rows = [("k%d" % (i % 3), (i % 50,), (i % 50 + 5,)) for i in range(40)]
    df = _iv(spark, rows)
    out = interval_coverage(df, ["k"], "s", "e", W0, W1)
    assert not has_python_udf(out)
    a = sorted(map(tuple, interval_coverage(df.repartition(7), ["k"], "s", "e", W0, W1).collect()))
    b = sorted(map(tuple, interval_coverage(df.coalesce(1), ["k"], "s", "e", W0, W1).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# transition_predictability
# ---------------------------------------------------------------------------

from pandera_forge_spark.operators.temporal import transition_predictability


def test_transitions_planted(spark):
    rows = (
        # bot: a->b->a->b... : one dominant edge each way; 7 transitions,
        # a->b 4x, b->a 3x -> top (a,b) share 4/7
        [("bot", float(t), "a" if t % 2 == 0 else "b") for t in range(8)]
        # human: varied path v->c->v->p->x->v : 5 distinct transitions
        + [("hum", float(t), s) for t, s in enumerate("vcvpxv")]
        # tie: a->b 1x, b->a 1x -> lexicographic (a,b) wins
        + [("tie", 0.0, "a"), ("tie", 1.0, "b"), ("tie", 2.0, "a"),
           ("tie", 3.0, None)]  # NULL state row excluded
        # thin: 1 transition -> dropped at min 2
        + [("thin", 0.0, "x"), ("thin", 1.0, "y")]
    )
    df = spark.createDataFrame(rows, "k string, ts double, s string")
    out = {
        r["k"]: r
        for r in transition_predictability(
            df, ["k"], "ts", "s", min_transitions=2
        ).collect()
    }
    assert set(out) == {"bot", "hum", "tie"}
    b = out["bot"]
    assert (b["n_transitions"], b["n_distinct_transitions"]) == (7, 2)
    assert (b["top_from"], b["top_to"], b["top_count"]) == ("a", "b", 4)
    assert b["top_share"] == 4 / 7
    h = out["hum"]
    assert h["n_distinct_transitions"] == 5 and h["top_share"] == 1 / 5
    t = out["tie"]
    assert (t["top_from"], t["top_to"]) == ("a", "b")  # lexicographic
    assert t["n_transitions"] == 2  # NULL state row contributed nothing


def test_transitions_plan_and_fences(spark):
    df = spark.createDataFrame(
        [("k", float(i), str(i % 3)) for i in range(12)],
        "k string, ts double, s string",
    )
    out = transition_predictability(df, ["k"], "ts", "s")
    assert not has_python_udf(out)
    a = sorted(map(tuple, transition_predictability(
        df.repartition(7), ["k"], "ts", "s").collect()))
    b = sorted(map(tuple, transition_predictability(
        df.coalesce(1), ["k"], "ts", "s").collect()))
    assert a == b
    with pytest.raises(ValueError, match="min_transitions"):
        transition_predictability(df, ["k"], "ts", "s", min_transitions=0)
    with pytest.raises(ValueError, match="non-empty"):
        transition_predictability(df, [], "ts", "s")
    with pytest.raises(ValueError, match="collide"):
        transition_predictability(
            df.withColumnRenamed("k", "top_from"), ["top_from"], "ts", "s"
        )
    with pytest.raises(ValueError, match="lacks columns"):
        transition_predictability(df, ["k"], "ts", "missing")
    with pytest.raises(ValueError, match="internal working"):
        transition_predictability(
            df.withColumn("__to", F.lit(1)), ["k"], "ts", "s"
        )


def test_interval_coverage_null_key_group_kept(spark):
    """A NULL key is a real group — the unattributed feed is usually
    the broken one; the gap join must be null-safe."""
    rows = [(None, (0,), (10,)), (None, (20,), (30,)), ("k", (0,), (5,))]
    out = {
        r["k"]: r
        for r in interval_coverage(
            _iv(spark, rows), ["k"], "s", "e", W0, W1
        ).collect()
    }
    assert set(out) == {None, "k"}
    n = out[None]
    assert n["n_islands"] == 2
    assert n["covered_us"] == 20 * 60 * 1_000_000
    assert n["largest_gap_us"] == 30 * 60 * 1_000_000  # tail 30->60


# ------------------------------------------------------ reliability_table


def _rel_replay(rows, bins=10):
    """Exact Python replay of the reliability_table integer tree."""
    import math
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0, 0])
    for s, l in rows:
        if s is None or l is None:
            continue
        b = min(math.floor(s * bins), bins - 1)
        cell = agg[b]
        cell[0] += 1
        cell[1] += int(l)
        cell[2] += math.floor(s * 1000000.0)
    return {
        b: (n, np, sm, abs(np * 1000000 - sm))
        for b, (n, np, sm) in agg.items()
    }


def test_reliability_table_matches_replay_and_ece(spark):
    import random

    from pandera_forge_spark.operators.labels import (
        expected_calibration_error,
        reliability_table,
    )

    rng = random.Random(11)
    # overconfident scorer: claims s but true rate is s*0.6
    rows = []
    for _ in range(400):
        s = rng.random()
        rows.append((s, 1 if rng.random() < s * 0.6 else 0))
    rows += [(None, 1), (0.5, None), (1.0, 1), (0.0, 0)]
    df = spark.createDataFrame(rows, "score double, label long")
    got = {
        r["bin"]: (r["n"], r["n_pos"], r["conf_sum_micro"], r["gap_micro"])
        for r in reliability_table(df, "score", "label", bins=10).collect()
    }
    assert got == _rel_replay(rows, bins=10)
    # score exactly 1.0 joined bin 9, not a phantom bin 10
    assert 10 not in got and 9 in got
    # ECE fold: exact integer sums through one final division
    ece = expected_calibration_error(
        reliability_table(df, "score", "label", bins=10)
    ).first()
    n_tot = sum(v[0] for v in got.values())
    gap_sum = sum(v[3] for v in got.values())
    assert ece["n_total"] == n_tot and ece["gap_sum_micro"] == gap_sum
    assert abs(ece["ece"] - gap_sum / (n_tot * 1e6)) < 1e-12
    # the overconfident scorer shows a LARGE ece; a perfect one small
    assert ece["ece"] > 0.1


def test_reliability_table_grouped_and_calibrated(spark):
    import random

    from pandera_forge_spark.operators.labels import (
        expected_calibration_error,
        reliability_table,
    )

    rng = random.Random(3)
    rows = []
    for _ in range(2000):
        s = rng.random()
        rows.append(("good", s, 1 if rng.random() < s else 0))
        rows.append(("bad", s, 1 if rng.random() < 0.2 else 0))
    df = spark.createDataFrame(rows, "model string, score double, label long")
    tab = reliability_table(df, "score", "label", bins=10, group_cols=["model"])
    ece = {
        r["model"]: r["ece"]
        for r in expected_calibration_error(tab, ["model"]).collect()
    }
    # the calibrated model beats the miscalibrated one by a wide margin
    assert ece["good"] < 0.08 < ece["bad"]


def test_reliability_table_fences(spark):
    from pandera_forge_spark.operators.labels import (
        expected_calibration_error,
        reliability_table,
    )

    df = spark.createDataFrame([(1.5, 1)], "score double, label long")
    with pytest.raises(Exception, match="outside"):
        reliability_table(df, "score", "label").collect()
    df2 = spark.createDataFrame([(0.5, 7)], "score double, label long")
    with pytest.raises(Exception, match="non-binary"):
        reliability_table(df2, "score", "label").collect()
    ok = spark.createDataFrame([(0.5, 1)], "score double, label long")
    with pytest.raises(ValueError, match="bins"):
        reliability_table(ok, "score", "label", bins=1)
    with pytest.raises(ValueError, match="lacks"):
        reliability_table(ok, "nope", "label")
    with pytest.raises(ValueError, match="pass reliability_table"):
        expected_calibration_error(ok)


def test_reliability_table_plan(spark):
    from pandera_forge_spark.operators.labels import reliability_table
    from pandera_forge_spark.plans.inspect import executed_plan, has_python_udf

    df = spark.createDataFrame(
        [(i / 100.0, i % 2) for i in range(100)], "score double, label long"
    )
    out = reliability_table(df, "score", "label")
    assert not has_python_udf(out)
    plan = executed_plan(out)
    # one aggregate pass: no window, no join anywhere in the plan
    assert "Window" not in plan and "Join" not in plan, plan


# ------------------------------------------------- weighted_majority_label


def test_weighted_majority_downweights_the_spammer(spark):
    from pandera_forge_spark.operators.labels import weighted_majority_label

    rows = []
    # 10 calibration items: careful annotators a1/a2 agree, spammer
    # always says "ok" and is wrong on all of them
    for i in range(10):
        rows += [
            (f"cal{i}", "a1", "bad"),
            (f"cal{i}", "a2", "bad"),
            (f"cal{i}", "spam", "ok"),
        ]
    # disputed item: a1 says bad, spam says ok — unweighted is a 1-1
    # tie (lexicographic picks 'bad' anyway), so use TWO spammers to
    # make the unweighted majority actually WRONG
    for i in range(10):
        rows.append((f"cal{i}", "spam2", "ok"))
    rows += [
        ("disputed", "a1", "bad"),
        ("disputed", "spam", "ok"),
        ("disputed", "spam2", "ok"),
    ]
    df = spark.createDataFrame(rows, "item string, ann string, lab string")
    got = {
        r["item"]: r
        for r in weighted_majority_label(df, "item", "ann", "lab").collect()
    }
    d = got["disputed"]
    # unweighted majority on 'disputed' is ok (2-1); weighting flips it:
    # a1's weight 10 vs the spammers' 1 each (their only agreement IS
    # the disputed item's own round-1 majority)
    assert d["label"] == "bad" and d["changed"]
    assert d["weight"] == 10 and d["weight_total"] == 12
    assert d["n_voters"] == 3
    # calibration items keep their majority, unflipped
    assert all(not got[f"cal{i}"]["changed"] for i in range(10))
    assert all(got[f"cal{i}"]["label"] == "bad" for i in range(10))


def test_weighted_majority_exact_python_replay(spark):
    import random
    from collections import Counter, defaultdict

    from pandera_forge_spark.operators.labels import weighted_majority_label

    rng = random.Random(13)
    anns = [f"a{j}" for j in range(6)]
    rows = []
    for i in range(60):
        truth = rng.choice(["x", "y", "z"])
        for ann in anns:
            wrong = rng.random() < (0.5 if ann == "a5" else 0.15)
            lab = rng.choice([l for l in ("x", "y", "z") if l != truth]) if wrong else truth
            rows.append((f"i{i}", ann, lab))
    df = spark.createDataFrame(rows, "item string, ann string, lab string")
    got = {
        r["item"]: (r["label"], r["weight"], r["weight_total"])
        for r in weighted_majority_label(df, "item", "ann", "lab").collect()
    }

    # python replay
    by_item = defaultdict(list)
    for it, ann, lab in rows:
        by_item[it].append((ann, lab))
    maj = {}
    for it, vs in by_item.items():
        c = Counter(l for _, l in vs)
        maj[it] = min(c, key=lambda l: (-c[l], l))
    w = Counter()
    for it, vs in by_item.items():
        for ann, lab in vs:
            if lab == maj[it]:
                w[ann] += 1
    expect = {}
    for it, vs in by_item.items():
        wv = defaultdict(int)
        for ann, lab in vs:
            wv[lab] += w[ann]
        win = min(wv, key=lambda l: (-wv[l], l))
        expect[it] = (win, wv[win], sum(wv.values()))
    assert got == expect


def test_weighted_majority_contracts(spark):
    import pytest

    from pandera_forge_spark.operators.labels import weighted_majority_label
    from pandera_forge_spark.plans.inspect import has_python_udf

    df = spark.createDataFrame(
        [("i", "a", "x")], "item string, ann string, lab string"
    )
    with pytest.raises(ValueError, match="lacks"):
        weighted_majority_label(df, "nope", "ann", "lab")
    with pytest.raises(ValueError, match="min_overlap"):
        weighted_majority_label(df, "item", "ann", "lab", min_overlap=0)
    assert not has_python_udf(
        weighted_majority_label(df, "item", "ann", "lab")
    )


def _alpha_brute(ratings):
    """Reference nominal alpha from (item, ann, label) triples."""
    from collections import Counter, defaultdict

    by_item = defaultdict(list)
    for item, _, lab in ratings:
        by_item[item].append(lab)
    pairable = {u: ls for u, ls in by_item.items() if len(ls) >= 2}
    n = sum(len(ls) for ls in pairable.values())
    sum_diag = 0.0
    nc = Counter()
    for ls in pairable.values():
        m = len(ls)
        cnt = Counter(ls)
        nc.update(cnt)
        sum_diag += sum(v * (v - 1) for v in cnt.values()) / (m - 1)
    d_o = (n - sum_diag) / n
    d_e = (n * n - sum(v * v for v in nc.values())) / (n * (n - 1))
    return len(pairable), n, d_o, d_e, 1 - d_o / d_e


def test_krippendorff_alpha_matches_bruteforce(spark):
    """Mixed 1/2/3-rater items with disagreements: the distributed
    aggregation must equal the textbook coincidence-matrix reference
    exactly (divisors 1 and 2 are powers of two -> bit-exact)."""
    from pandera_forge_spark.operators.labels import krippendorff_alpha

    ratings = [
        (1, "a", "x"), (1, "b", "x"), (1, "c", "y"),
        (2, "a", "x"), (2, "b", "x"),
        (3, "a", "y"), (3, "b", "y"),
        (4, "a", "z"), (4, "b", "y"), (4, "c", "z"),
        (5, "a", "x"),                      # unpairable -> excluded
        (6, "a", "y"), (6, "b", "x"),
    ]
    df = spark.createDataFrame(ratings, "item long, ann string, label string")
    r = krippendorff_alpha(df, "item", "ann", "label").collect()[0]
    n_items, n, d_o, d_e, alpha = _alpha_brute(ratings)
    assert (r.n_items, r.n_ratings) == (n_items, n)
    assert abs(r.d_o - d_o) < 1e-12
    assert abs(r.d_e - d_e) < 1e-12
    assert abs(r.alpha - alpha) < 1e-12


def test_krippendorff_alpha_perfect_and_degenerate(spark):
    from pandera_forge_spark.operators.labels import krippendorff_alpha

    perfect = spark.createDataFrame(
        [(1, "a", "x"), (1, "b", "x"), (2, "a", "y"), (2, "b", "y")],
        "item long, ann string, label string",
    )
    r = krippendorff_alpha(perfect, "item", "ann", "label").collect()[0]
    assert r.alpha == 1.0
    # every rating identical -> D_e = 0 -> NULL alpha, loudly
    onecat = spark.createDataFrame(
        [(1, "a", "x"), (1, "b", "x")], "item long, ann string, label string"
    )
    r2 = krippendorff_alpha(onecat, "item", "ann", "label").collect()[0]
    assert r2.alpha is None and r2.d_e == 0.0


def test_krippendorff_alpha_validates_columns(spark):
    import pytest

    from pandera_forge_spark.operators.labels import krippendorff_alpha

    df = spark.createDataFrame([(1, "a", "x")], "item long, ann string, label string")
    with pytest.raises(ValueError, match="missing"):
        krippendorff_alpha(df, "item", "ann", "verdict")


def test_auc_score_matches_sklearn_style_reference(spark):
    """Ties included: verify against a direct python Mann-Whitney
    average-rank AUC; perfect / inverted / random-ish cases."""
    from pandera_forge_spark.operators.labels import auc_score

    cases = {
        "perfect": [(1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)],
        "invert": [(1.0, 1), (2.0, 1), (3.0, 0), (4.0, 0)],
        "tied": [(1.0, 0), (2.0, 1), (2.0, 0), (2.0, 1), (3.0, 0), (4.0, 1)],
    }
    rows = [
        (g, float(s), int(l)) for g, data in cases.items() for s, l in data
    ]
    df = spark.createDataFrame(rows, "grp string, score double, y int")
    got = {r.grp: r for r in auc_score(
        df, "score", F.col("y") == 1, ["grp"]
    ).collect()}

    def ref_auc(data):
        vals = [s for s, _ in data]
        ranks = {}
        svals = sorted(vals)
        i = 0
        rk = {}
        while i < len(svals):
            j = i
            while j < len(svals) and svals[j] == svals[i]:
                j += 1
            rk[svals[i]] = (i + 1 + j) / 2.0
            i = j
        rpos = sum(rk[s] for s, l in data if l == 1)
        n1 = sum(1 for _, l in data if l == 1)
        n0 = len(data) - n1
        return (rpos - n1 * (n1 + 1) / 2.0) / (n1 * n0)

    assert got["perfect"].auc == 1.0
    assert got["invert"].auc == 0.0
    assert abs(got["tied"].auc - ref_auc(cases["tied"])) < 1e-12
    assert (got["tied"].n_pos, got["tied"].n_neg) == (3, 3)


def test_auc_score_degenerate_and_fences(spark):
    import pytest

    from pandera_forge_spark.operators.labels import auc_score

    df = spark.createDataFrame(
        [("g", 1.0, 1), ("g", 2.0, 1), ("h", None, 0)],
        "grp string, score double, y int",
    )
    rows = {r.grp: r for r in auc_score(
        df, "score", F.col("y") == 1, ["grp"]
    ).collect()}
    assert rows["g"].auc is None and rows["g"].n_neg == 0
    assert "h" not in rows      # null score dropped -> empty group gone
    with pytest.raises(ValueError, match="missing"):
        auc_score(df, "ghost", F.col("y") == 1, ["grp"])


def test_lift_table_hand_computed(spark):
    """20 rows, scores 20..1, positives exactly the top 5 scores,
    5 bins: bin 1 catches all 5 positives -> rate 1.0, lift 4.0,
    cum_gain 1.0 from bin 1 on; later bins rate 0."""
    from pandera_forge_spark.operators.labels import lift_table

    rows = [(float(s), 1 if s > 15 else 0) for s in range(20, 0, -1)]
    df = spark.createDataFrame(rows, "score double, y int")
    out = {r.bin: r for r in lift_table(
        df, "score", F.col("y") == 1, n_bins=5
    ).collect()}
    assert out[1].n == 4 and out[1].positives == 4
    assert out[1].rate == 1.0 and out[1].lift == 4.0
    assert out[2].positives == 1 and out[2].cum_gain == 1.0
    assert out[5].rate == 0.0 and out[5].cum_n == 20
    assert abs(out[1].cum_gain - 0.8) < 1e-12


def test_lift_table_atomic_ties_and_fences(spark):
    import pytest

    from pandera_forge_spark.operators.labels import lift_table

    # 10 rows all the same score: one atomic tie group -> ONE bin row
    # holding everything (midpoint bin), not a 10-way split
    df = spark.createDataFrame(
        [(5.0, i % 2) for i in range(10)], "score double, y int"
    )
    out = lift_table(df, "score", F.col("y") == 1, n_bins=5).collect()
    assert len(out) == 1 and out[0].n == 10
    assert out[0].lift == 1.0
    with pytest.raises(ValueError, match="n_bins"):
        lift_table(df, "score", F.col("y") == 1, n_bins=1)
    with pytest.raises(ValueError, match="missing"):
        lift_table(df, "ghost", F.col("y") == 1)


def test_pr_curve_hand_computed(spark):
    """Scores 10..1, positives = top 3 scores, 5 grid points (every 2
    rows): point 1 -> threshold 9, tp 2, fp 0, P=1.0, R=2/3;
    point 2 -> threshold 7, tp 3, fp 1; point 5 -> everything."""
    from pandera_forge_spark.operators.labels import pr_curve

    rows = [(float(s), 1 if s > 7 else 0) for s in range(10, 0, -1)]
    df = spark.createDataFrame(rows, "score double, y int")
    out = {r.point: r for r in pr_curve(
        df, "score", F.col("y") == 1, n_points=5
    ).collect()}
    p1 = out[1]
    assert (p1.threshold, p1.tp, p1.fp, p1.fn) == (9.0, 2, 0, 1)
    assert p1.precision == 1.0 and abs(p1.recall - 2 / 3) < 1e-12
    p2 = out[2]
    assert (p2.threshold, p2.tp, p2.fp) == (7.0, 3, 1)
    assert out[5].recall == 1.0 and out[5].fp == 7
    assert abs(p1.f1 - 2 * 1.0 * (2 / 3) / (1.0 + 2 / 3)) < 1e-12


def test_pr_curve_ties_and_fences(spark):
    import pytest

    from pandera_forge_spark.operators.labels import pr_curve

    # one atomic tie group covers every grid point with the same row
    df = spark.createDataFrame(
        [(5.0, i % 2) for i in range(8)], "score double, y int"
    )
    out = pr_curve(df, "score", F.col("y") == 1, n_points=4).collect()
    assert len(out) == 4
    assert all(r.threshold == 5.0 and r.recall == 1.0 for r in out)
    with pytest.raises(ValueError, match="n_points"):
        pr_curve(df, "score", F.col("y") == 1, n_points=1)
    with pytest.raises(ValueError, match="missing"):
        pr_curve(df, "ghost", F.col("y") == 1)


def test_cronbach_alpha_matches_reference(spark):
    """Three correlated items replayed against a direct python
    computation; perfectly parallel items -> alpha exactly 1."""
    from pandera_forge_spark.operators.labels import cronbach_alpha

    rows = [
        (2.0, 3.0, 2.5), (4.0, 5.0, 4.5), (1.0, 1.5, 1.0),
        (5.0, 4.5, 5.5), (3.0, 3.5, 3.0), (2.5, 2.0, 2.0),
    ]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    r = cronbach_alpha(df, ["a", "b", "c"]).collect()[0]

    import statistics

    cols = list(zip(*rows))
    n = len(rows)
    pvar = lambda xs: statistics.pvariance(xs)  # noqa: E731
    item = sum(pvar(c) for c in cols)
    tot = pvar([sum(t) for t in rows])
    expect = 3 / 2 * (1 - item / tot)
    assert r.n_rows == n and r.k_items == 3
    assert abs(r.alpha - expect) < 1e-9
    # identical items -> item var k*v, total var k^2*v -> alpha 1
    par = spark.createDataFrame(
        [(v, v) for v in (1.0, 2.0, 5.0)], "a double, b double"
    )
    rp = cronbach_alpha(par, ["a", "b"]).collect()[0]
    assert abs(rp.alpha - 1.0) < 1e-12


def test_cronbach_alpha_degenerate_and_fences(spark):
    import pytest

    from pandera_forge_spark.operators.labels import cronbach_alpha

    const = spark.createDataFrame(
        [(1.0, 1.0), (1.0, 1.0)], "a double, b double"
    )
    r = cronbach_alpha(const, ["a", "b"]).collect()[0]
    assert r.alpha is None and r.total_var == 0.0
    with pytest.raises(ValueError, match="at least 2"):
        cronbach_alpha(const, ["a"])
    with pytest.raises(ValueError, match="missing"):
        cronbach_alpha(const, ["a", "ghost"])


def test_label_will_return_boundaries(spark):
    """Half-open window semantics exactly: an event AT the cutoff is
    NOT before it and NOT in the window; one at cutoff+horizon IS in
    the window; post-window activity never leaks; units born inside
    the window are excluded."""
    import datetime as dt

    from pandera_forge_spark.operators.labels import label_will_return

    cut = dt.datetime(2024, 1, 10)
    h = 86400  # one day
    rows = [
        (1, cut - dt.timedelta(days=2)),                    # before only -> 0
        (2, cut - dt.timedelta(days=1)),
        (2, cut + dt.timedelta(hours=3)),                   # returns -> 1
        (3, cut - dt.timedelta(days=3)),
        (3, cut + dt.timedelta(days=1)),                    # AT horizon -> 1
        (4, cut - dt.timedelta(days=3)),
        (4, cut + dt.timedelta(days=1, seconds=1)),         # past window -> 0
        (5, cut),                                           # AT cutoff: excluded
        (6, cut + dt.timedelta(hours=1)),                   # born in window: excluded
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    got = {r.u: r for r in label_will_return(
        df, "u", "ts", "2024-01-10 00:00:00", h
    ).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1].label == 0 and got[2].label == 1
    assert got[3].label == 1            # inclusive right edge
    assert got[4].label == 0            # exclusive beyond horizon
    assert got[2].n_before == 1 and got[2].n_in_window == 1
    import pytest

    with pytest.raises(ValueError, match="horizon"):
        label_will_return(df, "u", "ts", "2024-01-10", 0)
    with pytest.raises(ValueError, match="missing"):
        label_will_return(df, "ghost", "ts", "2024-01-10", h)
