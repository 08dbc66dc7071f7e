"""Sequence validators: monotonic_violations and sequence_gaps
(operators/temporal.py), including the split_every stitch."""

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.operators.temporal import (
    interval_overlaps,
    monotonic_violations,
    sequence_gaps,
)
from pandera_forge_spark.plans.inspect import has_python_udf


@pytest.fixture(scope="module")
def meter(spark):
    # (key, t, seq, v): k1 has a counter reset at t=30 and a plateau at
    # t=40; k2 is clean; k3 has a NULL value mid-sequence and a NULL
    # timestamp first
    rows = [
        ("k1", 10.0, 1, 100.0),
        ("k1", 20.0, 2, 150.0),
        ("k1", 30.0, 3, 50.0),
        ("k1", 40.0, 4, 50.0),
        ("k1", 50.0, 5, 60.0),
        ("k2", 10.0, 6, 1.0),
        ("k2", 9000.0, 7, 2.0),
        ("k3", None, 8, 5.0),
        ("k3", 15.0, 9, None),
        ("k3", 25.0, 10, 3.0),
    ]
    return spark.createDataFrame(rows, "key string, t double, seq int, v double")


def test_monotonic_basic(meter):
    out = monotonic_violations(meter, ["key"], ["t", "seq"], "v")
    got = {(r["key"], r["t"]): r["prev_v"] for r in out.collect()}
    # only the reset violates non-strict; the plateau passes; NULL value
    # and NULL-neighbored rows never violate
    assert got == {("k1", 30.0): 150.0}


def test_monotonic_strict_flags_plateau(meter):
    out = monotonic_violations(meter, ["key"], ["t", "seq"], "v", strict=True)
    keys = {(r["key"], r["t"]) for r in out.collect()}
    assert keys == {("k1", 30.0), ("k1", 40.0)}


def test_monotonic_decreasing(meter):
    out = monotonic_violations(meter, ["key"], ["t", "seq"], "v", decreasing=True)
    keys = {(r["key"], r["t"]) for r in out.collect()}
    # now every INCREASE violates
    assert keys == {("k1", 20.0), ("k1", 50.0), ("k2", 9000.0)}


def test_monotonic_split_equals_unsplit(meter):
    a = monotonic_violations(meter, ["key"], ["t", "seq"], "v")
    b = monotonic_violations(
        meter, ["key"], ["t", "seq"], "v", split_every=25.0
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # strict mode too (plateau straddles nothing; reset crosses chunk 1->1)
    a2 = monotonic_violations(meter, ["key"], ["t", "seq"], "v", strict=True)
    b2 = monotonic_violations(
        meter, ["key"], ["t", "seq"], "v", strict=True, split_every=25.0
    )
    assert sorted(map(tuple, a2.collect())) == sorted(map(tuple, b2.collect()))


def test_monotonic_split_boundary_violation(spark):
    # the violating pair straddles the chunk boundary: prev must carry
    rows = [("k", 9.0, 1, 100.0), ("k", 11.0, 2, 99.0)]
    df = spark.createDataFrame(rows, "key string, t double, seq int, v double")
    out = monotonic_violations(df, ["key"], ["t", "seq"], "v", split_every=10.0)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["prev_v"] == 100.0 and rows[0]["t"] == 11.0


def test_monotonic_split_needs_orderable_chunk_col(spark):
    df = spark.createDataFrame([("k", "a", 1.0)], "key string, o string, v double")
    with pytest.raises(ValueError, match="numeric/timestamp"):
        monotonic_violations(df, ["key"], ["o"], "v", split_every=10.0)


def test_gaps_basic(meter):
    out = sequence_gaps(meter, ["key"], "t", 15.0, order_cols=["t", "seq"])
    got = {(r["key"], r["gap_start"], r["gap_end"]): r["gap_seconds"] for r in out.collect()}
    # k2's 10 -> 9000 hole; k3's null ts doesn't emit and doesn't break
    # the chain (15 -> 25 is only 10s)
    assert got == {("k2", 10.0, 9000.0): 8990.0}


def test_gaps_threshold_exclusive(spark):
    df = spark.createDataFrame(
        [("k", 0.0), ("k", 10.0), ("k", 30.0)], "key string, t double"
    )
    assert sequence_gaps(df, ["key"], "t", 10.0).count() == 1  # 20 > 10; 10 == 10 not
    assert sequence_gaps(df, ["key"], "t", 9.0).count() == 2


def test_gaps_timestamp_dtype(spark):
    df = spark.createDataFrame(
        [("k", "2024-01-01 00:00:00"), ("k", "2024-01-02 00:00:30")],
        "key string, s string",
    ).select("key", F.col("s").cast("timestamp").alias("ts"))
    out = sequence_gaps(df, ["key"], "ts", 86400.0).collect()
    assert len(out) == 1 and out[0]["gap_seconds"] == 86430.0
    # bracketing timestamps keep their dtype
    assert str(out[0]["gap_start"]) == "2024-01-01 00:00:00"


def test_gaps_split_equals_unsplit(spark):
    import random

    rng = random.Random(7)
    rows = [("hot", float(rng.randrange(0, 1000))) for _ in range(400)]
    rows += [("cold", 5.0), ("cold", 900.0)]
    # dedupe ts so the order is total (split summary and lag agree on
    # ties anyway, but row identity stays unique for the comparison)
    rows = list({(k, t) for k, t in rows})
    df = spark.createDataFrame(rows, "key string, t double").repartition(8)
    a = sequence_gaps(df, ["key"], "t", 3.0)
    b = sequence_gaps(df, ["key"], "t", 3.0, split_every=100.0)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # sparse key: the hole spans MANY empty chunks and still stitches
    got = {r["key"]: r["gap_seconds"] for r in b.where(F.col("key") == "cold").collect()}
    assert got == {"cold": 895.0}


def test_gaps_split_tie_on_boundary(spark):
    # equal timestamps always share a chunk: ties at the cut can't
    # fabricate or hide a gap
    df = spark.createDataFrame(
        [("k", 100.0), ("k", 100.0), ("k", 130.0)], "key string, t double"
    )
    a = sequence_gaps(df, ["key"], "t", 20.0)
    b = sequence_gaps(df, ["key"], "t", 20.0, split_every=100.0)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert a.count() == 1


@pytest.fixture(scope="module")
def bookings(spark):
    # k1: clean chain, then an umbrella interval (10..100) that a LAG
    # check would miss for the (40, 50) row; k2 touching intervals;
    # k3 NULL end mid-chain
    rows = [
        ("k1", 0.0, 5.0, 1),
        ("k1", 10.0, 100.0, 2),  # umbrella
        ("k1", 40.0, 50.0, 3),  # inside the umbrella, not its lag-prev
        ("k1", 200.0, 210.0, 4),
        ("k2", 0.0, 10.0, 5),
        ("k2", 10.0, 20.0, 6),  # touching
        ("k3", 0.0, None, 7),
        ("k3", 5.0, 9.0, 8),
    ]
    return spark.createDataFrame(rows, "key string, s double, e double, id int")


def test_overlaps_running_max_not_lag(bookings):
    out = interval_overlaps(bookings, ["key"], "s", "e", order_cols=["s", "e", "id"])
    got = {r["id"]: r["prev_end"] for r in out.collect()}
    # the umbrella catches id=3 (prev_end=100 > 40) AND id=4? 200 > 100? no.
    assert got == {3: 100.0}


def test_overlaps_touching_flag(bookings):
    strict = interval_overlaps(
        bookings, ["key"], "s", "e", order_cols=["s", "e", "id"], touching_ok=False
    )
    ids = {r["id"] for r in strict.collect()}
    assert ids == {3, 6}  # the touch at k2 now counts


def test_overlaps_null_end_never_violates(bookings):
    out = interval_overlaps(bookings, ["key"], "s", "e", order_cols=["s", "e", "id"])
    # k3's NULL end contributes nothing to the running max, and the
    # following interval doesn't violate against it
    assert not [r for r in out.collect() if r["key"] == "k3"]


def test_overlaps_timestamp_dtype(spark):
    df = spark.createDataFrame(
        [("k", "2024-01-01 00:00:00", "2024-01-01 02:00:00", 1),
         ("k", "2024-01-01 01:00:00", "2024-01-01 03:00:00", 2)],
        "key string, s string, e string, id int",
    ).select(
        "key",
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
        "id",
    )
    out = interval_overlaps(df, ["key"], "s", "e", order_cols=["s", "e", "id"])
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["id"] == 2
    assert str(rows[0]["prev_end"]) == "2024-01-01 02:00:00"


def test_overlaps_null_start_never_accuses(spark):
    """review-found: a NULL-start interval's (huge) end entered the
    running max and flagged every later interval of the key."""
    df = spark.createDataFrame(
        [("k", None, 1e9, 1), ("k", 5.0, 10.0, 2), ("k", 20.0, 30.0, 3)],
        "key string, s double, e double, id int",
    )
    assert interval_overlaps(df, ["key"], "s", "e", order_cols=["s", "id"]).count() == 0


def test_overlaps_order_must_lead_with_start(bookings):
    """review-found: a non-start-major order makes the running-max test
    invalid (a disjoint earlier-by-id interval gets accused)."""
    with pytest.raises(ValueError, match="lead with start_col"):
        interval_overlaps(bookings, ["key"], "s", "e", order_cols=["id"])


def test_overlaps_prev_end_collision_is_loud(bookings):
    with pytest.raises(ValueError, match="prev_end"):
        interval_overlaps(
            bookings.withColumn("prev_end", F.lit(0.0)), ["key"], "s", "e"
        )


def test_overlaps_split_equals_unsplit(spark, bookings):
    a = interval_overlaps(bookings, ["key"], "s", "e", order_cols=["s", "id"])
    b = interval_overlaps(
        bookings, ["key"], "s", "e", order_cols=["s", "id"], split_every=50.0
    )
    assert sorted(map(tuple, a.collect()), key=repr) == sorted(
        map(tuple, b.collect()), key=repr
    )
    # umbrella spanning MANY chunks: carry must hold the max, not the last
    rows = [("k", 0.0, 1000.0, 1), ("k", 300.0, 310.0, 2), ("k", 700.0, 710.0, 3)]
    df = spark.createDataFrame(rows, "key string, s double, e double, id int")
    out = interval_overlaps(
        df, ["key"], "s", "e", order_cols=["s", "id"], split_every=100.0
    )
    got = {r["id"]: r["prev_end"] for r in out.collect()}
    assert got == {2: 1000.0, 3: 1000.0}


def test_overlaps_split_nonpositive_raises(bookings):
    with pytest.raises(ValueError, match="split_every"):
        interval_overlaps(bookings, ["key"], "s", "e", split_every=0.0)


def test_overlaps_no_udf(bookings):
    from pandera_forge_spark.plans.inspect import has_python_udf

    assert not has_python_udf(
        interval_overlaps(bookings, ["key"], "s", "e")
    )


def test_nonpositive_split_every_raises(meter):
    """review-found: a negative split_every made floor(t/split) DECREASE
    in time, so the stitch ran backwards and silently missed violations;
    zero divided by zero — both now loud, across every split operator."""
    from pandera_forge_spark.operators.temporal import sessionize

    for bad in (0.0, -10.0):
        with pytest.raises(ValueError, match="split_every"):
            monotonic_violations(meter, ["key"], ["t", "seq"], "v", split_every=bad)
        with pytest.raises(ValueError, match="split_every"):
            sequence_gaps(meter, ["key"], "t", 5.0, split_every=bad)
        with pytest.raises(ValueError, match="split_every"):
            sessionize(meter, "key", "t", 5.0, split_every=bad)


def test_sequence_checks_no_udf(meter):
    assert not has_python_udf(monotonic_violations(meter, ["key"], ["t", "seq"], "v"))
    assert not has_python_udf(
        sequence_gaps(meter, ["key"], "t", 15.0, split_every=100.0)
    )


def test_split_nan_chunk_is_loud(spark):
    """review-found: Spark floors NaN into chunk 0 while NaN sorts
    LAST — a NaN order value would silently corrupt the stitch; every
    split operator now raises in-band."""
    df = spark.createDataFrame(
        [("k", float("nan"), 1000.0, 1), ("k", 50.0, 51.0, 2)],
        "key string, s double, e double, id int",
    )
    with pytest.raises(Exception, match="NaN"):
        interval_overlaps(
            df, ["key"], "s", "e", order_cols=["s", "id"], split_every=10.0
        ).collect()
    df2 = spark.createDataFrame(
        [("k", float("nan"), 1.0), ("k", 5.0, 2.0)], "key string, t double, v double"
    )
    with pytest.raises(Exception, match="NaN"):
        monotonic_violations(df2, ["key"], ["t"], "v", split_every=10.0).collect()
    # unsplit paths keep Spark's native NaN-sorts-last semantics
    assert interval_overlaps(df, ["key"], "s", "e", order_cols=["s", "id"]).count() == 0


def test_split_reserved_names_are_loud(spark, meter, bookings):
    for col in ("__chunk", "__rn", "__carry"):
        with pytest.raises(ValueError, match="collide"):
            monotonic_violations(
                meter.withColumn(col, F.lit(1)), ["key"], ["t", "seq"], "v",
                split_every=25.0,
            )
    with pytest.raises(ValueError, match="collide"):
        interval_overlaps(
            bookings.withColumn("__inmax", F.lit(1)), ["key"], "s", "e",
            split_every=50.0,
        )


def test_prev_and_gap_column_collisions_are_loud(meter):
    """review-found: monotonic/gaps silently overwrote a pre-existing
    prev_<value>/gap_start input column while interval_overlaps fenced
    the identical collision — now all three are loud."""
    with pytest.raises(ValueError, match="collide"):
        monotonic_violations(
            meter.withColumn("prev_v", F.lit(0.0)), ["key"], ["t", "seq"], "v"
        )
    with pytest.raises(ValueError, match="collide"):
        sequence_gaps(meter.withColumn("gap_start", F.lit(0.0)), ["key"], "t", 5.0)
