"""Gap-fill resampling (operators/temporal.resample_ffill)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.operators.temporal import resample_ffill
from pandera_forge_spark.plans.inspect import has_python_udf


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def series(spark):
    # user 1: hours 0, 1, 4 (two-bucket hole), two rows inside hour 1;
    # user 2: single observation; user 3: NULL timestamp only.
    rows = [
        (1, _ts(0, 10), 10.0, 100),
        (1, _ts(1, 5), 20.0, 101),
        (1, _ts(1, 55), 25.0, 102),  # later event wins hour 1
        (1, _ts(4, 0), 40.0, 103),
        (2, _ts(2, 30), 7.0, 104),
        (3, None, 99.0, 105),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_id long"
    )


def test_ffill_grid(series):
    out = {
        (r["user_id"], r["bucket_epoch"]): (r["value"], r["is_filled"])
        for r in resample_ffill(
            series, ["user_id"], "ts", "value", 3600, order_col="event_id"
        ).collect()
    }
    # Session TZ is UTC in conftest; compute epoch directly.
    import calendar

    base = calendar.timegm((2024, 1, 1, 0, 0, 0))
    # user 1: hours 0..4 — 5 rows, holes at hours 2 and 3 carry 25.0.
    assert out[(1, base + 0 * 3600)] == (10.0, False)
    assert out[(1, base + 1 * 3600)] == (25.0, False)  # max event_id in bucket
    assert out[(1, base + 2 * 3600)] == (25.0, True)
    assert out[(1, base + 3 * 3600)] == (25.0, True)
    assert out[(1, base + 4 * 3600)] == (40.0, False)
    # user 2: one bucket, no fill; user 3 absent (NULL ts dropped).
    assert out[(2, base + 2 * 3600)] == (7.0, False)
    assert len(out) == 6


def test_no_backfill_no_extrapolation(series):
    out = resample_ffill(series, ["user_id"], "ts", "value", 3600, "event_id")
    agg = out.groupBy("user_id").agg(
        F.min("bucket_epoch").alias("lo"), F.max("bucket_epoch").alias("hi")
    ).collect()
    got = {r["user_id"]: (r["lo"], r["hi"]) for r in agg}
    import calendar

    base = calendar.timegm((2024, 1, 1, 0, 0, 0))
    assert got[1] == (base, base + 4 * 3600)
    assert got[2] == (base + 2 * 3600, base + 2 * 3600)


def test_max_fill_fence_raises_in_band(series):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    with pytest.raises((SparkRuntimeException, Py4JJavaError), match="max_fill"):
        resample_ffill(
            series, ["user_id"], "ts", "value", 3600, "event_id", max_fill=2
        ).collect()


def test_fences(series):
    with pytest.raises(ValueError, match="positive int"):
        resample_ffill(series, ["user_id"], "ts", "value", 0)
    with pytest.raises(ValueError, match="missing"):
        resample_ffill(series, ["nope"], "ts", "value", 3600)
    with pytest.raises(ValueError, match="order column"):
        resample_ffill(series, ["user_id"], "ts", "value", 3600, "nope")
    with pytest.raises(ValueError, match="at least one key"):
        resample_ffill(series, [], "ts", "value", 3600)
    clash = series.withColumn("bucket_epoch", F.lit(1))
    with pytest.raises(ValueError, match="collide"):
        resample_ffill(clash, ["user_id"], "ts", "value", 3600)


def test_plan_udf_and_join_free(series):
    out = resample_ffill(series, ["user_id"], "ts", "value", 3600, "event_id")
    assert not has_python_udf(out)
    from pandera_forge_spark.plans.inspect import executed_plan

    plan = executed_plan(out)
    assert "Join" not in plan  # grid synthesized row-locally, never joined


def test_numeric_epoch_column_supported(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 1.0), (1, 25.0, 2.0)], "k long, sec double, v double"
    )
    out = resample_ffill(df, ["k"], "sec", "v", 10).collect()
    got = {r["bucket_epoch"]: (r["v"], r["is_filled"]) for r in out}
    assert got == {0: (1.0, False), 10: (1.0, True), 20: (2.0, False)}


# --- resample_interpolate -------------------------------------------------

from pandera_forge_spark.operators.temporal import resample_interpolate


def test_interpolate_values(spark, series):
    import calendar

    base = calendar.timegm((2024, 1, 1, 0, 0, 0))
    out = {
        (r["user_id"], r["bucket_epoch"]): (r["value"], r["is_filled"])
        for r in resample_interpolate(
            series, ["user_id"], "ts", "value", 3600, order_col="event_id"
        ).collect()
    }
    # user 1 observed: hour0=10.0, hour1=25.0 (max event_id), hour4=40.0;
    # hours 2 and 3 interpolate linearly 25 -> 40 over 3 steps
    assert out[(1, base + 0 * 3600)] == (10.0, False)
    assert out[(1, base + 1 * 3600)] == (25.0, False)
    assert out[(1, base + 2 * 3600)] == (25.0 + (40.0 - 25.0) * (1.0 / 3.0), True)
    assert out[(1, base + 3 * 3600)] == (25.0 + (40.0 - 25.0) * (2.0 / 3.0), True)
    assert out[(1, base + 4 * 3600)] == (40.0, False)
    # single observation: one bucket, untouched; NULL-ts user absent
    assert out[(2, base + 2 * 3600)] == (7.0, False)
    assert sum(1 for (u, _) in out if u == 2) == 1
    assert not any(u == 3 for (u, _) in out)


def test_interpolate_null_bracket_yields_null(spark):
    from datetime import datetime

    rows = [
        (1, datetime(2024, 1, 1, 0), 10.0, 1),
        (1, datetime(2024, 1, 1, 2), None, 2),  # right bracket NULL
        (1, datetime(2024, 1, 1, 4), 30.0, 3),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_id long"
    )
    out = {
        r["bucket_epoch"]: r["value"]
        for r in resample_interpolate(
            df, ["user_id"], "ts", "value", 3600, order_col="event_id"
        ).collect()
    }
    import calendar

    base = calendar.timegm((2024, 1, 1, 0, 0, 0))
    assert out[base + 1 * 3600] is None  # 10 -> NULL gap: no silent hold
    assert out[base + 2 * 3600] is None  # the NULL observation itself
    assert out[base + 3 * 3600] is None  # NULL -> 30 gap: v0 is NULL
    assert out[base + 4 * 3600] == 30.0


def test_interpolate_fence_and_no_udf(spark, series):
    from pandera_forge_spark.plans.inspect import has_python_udf

    out = resample_interpolate(
        series, ["user_id"], "ts", "value", 3600, order_col="event_id"
    )
    assert not has_python_udf(out)
    with pytest.raises(ValueError, match="max_fill"):
        resample_interpolate(
            series, ["user_id"], "ts", "value", 3600, max_fill=0
        )
    with pytest.raises(Exception, match="max_fill"):
        resample_interpolate(
            series, ["user_id"], "ts", "value", 60, max_fill=10,
            order_col="event_id",
        ).collect()
