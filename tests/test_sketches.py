"""Mergeable partition sketches: merged estimates track exact answers,
exact fields merge exactly, and incremental update == full reprofile."""

from pyspark.sql import functions as F

from pandera_forge_spark.sketches import (
    merge_sketches,
    partition_sketches,
    update_sketches,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        (F.col("id") % 13).alias("part"),
        (F.col("id") % 2000).alias("key"),
        (F.col("id") % 500).cast("double").alias("price"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.concat(F.lit("u"), F.col("id") % 300))
        .alias("user"),
    )


def test_merged_sketches_track_exact(spark):
    df = _df(spark, 0, 20000)
    sk = partition_sketches(df, ["part"])
    assert sk.count() == 13

    row = merge_sketches(sk).collect()[0]
    assert row["__rows"] == 20000
    # exact algebraic fields merge exactly
    assert row["user__nulls"] == 2000
    assert row["price__min"] == 0.0 and row["price__max"] == 499.0
    # HLL estimates within published error (~2% at default lgk)
    assert abs(row["key__distinct_est"] - 2000) / 2000 < 0.05
    # id%10==0 nulls every u<k> with k%10==0 (10 divides 300), so the
    # non-null domain is exactly 270 values
    assert abs(row["user__distinct_est"] - 270) / 270 < 0.05
    # KLL median of uniform 0..499 ~ 249.5 (rank error ~2%)
    assert abs(row["price__q50"] - 249.5) < 25


def test_incremental_update_equals_full_reprofile(spark):
    """Sketch day-1, append day-2's sketch rows only (day-1 data is
    never rescanned), and the merged profile equals sketching the full
    table in one shot."""
    day1, day2 = _df(spark, 0, 10000), _df(spark, 10000, 20000)
    full = _df(spark, 0, 20000)

    sk1 = partition_sketches(day1, ["part"])
    incr = update_sketches(sk1, day2, ["part"])
    # duplicate partition rows coexist (13 parts x 2 arrivals)
    assert incr.count() == 26

    a = merge_sketches(incr).collect()[0]
    b = merge_sketches(partition_sketches(full, ["part"])).collect()[0]
    assert a["__rows"] == b["__rows"] == 20000
    assert a["user__nulls"] == b["user__nulls"]
    assert a["price__min"] == b["price__min"]
    assert a["price__max"] == b["price__max"]
    # HLL union is a register-wise max — order-independent, so the
    # estimate is IDENTICAL however the rows arrived
    assert a["key__distinct_est"] == b["key__distinct_est"]
    # KLL compaction depends on arrival grouping (26 small sketches vs
    # 13 larger ones), so quantiles agree within rank error, not bitwise
    assert abs(a["price__q50"] - b["price__q50"]) <= 500 * 0.02


def test_subset_merge(spark):
    """Any partition subset merges without touching data — the
    'profile last N days' query shape."""
    df = _df(spark, 0, 20000)
    sk = partition_sketches(df, ["part"])
    row = merge_sketches(sk.where(F.col("part") < 3)).collect()[0]
    exact = df.where(F.col("part") < 3)
    assert row["__rows"] == exact.count()
    nref = exact.where(F.col("user").isNull()).count()
    assert row["user__nulls"] == nref
