"""Z-order clustering (operators/layout.py)."""

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.operators.layout import (
    cluster_by_zorder,
    file_minmax_stats,
    pruned_file_fraction,
    quantize_dim,
    zorder_value,
)


def _morton_local(codes, bits):
    z = 0
    for d, c in enumerate(codes):
        for i in range(bits):
            z |= ((c >> i) & 1) << (i * len(codes) + d)
    return z


def test_zorder_matches_local_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255), (1023, 7)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = [
        r["z"]
        for r in df.select(
            zorder_value([F.col("a"), F.col("b")], 10).alias("z")
        ).collect()
    ]
    assert got == [_morton_local(c, 10) for c in rows]


def test_zorder_validation(spark):
    with pytest.raises(ValueError):
        zorder_value([F.col("a")], 10)
    with pytest.raises(ValueError):
        zorder_value([F.col("a"), F.col("b")], 32)  # 64 bits > 62
    with pytest.raises(ValueError):
        quantize_dim(F.col("a"), 5.0, 5.0)


def test_quantize_dim_clamps(spark):
    df = spark.createDataFrame(
        [(-10.0,), (0.0,), (50.0,), (100.0,), (999.0,)], "x double"
    )
    got = [
        r["c"]
        for r in df.select(quantize_dim(F.col("x"), 0.0, 100.0, 4).alias("c")).collect()
    ]
    # 16 codes over [0, 100): -10 clamps to 0, 100+ clamps to 15
    assert got == [0, 0, 8, 15, 15]


def test_zorder_layout_prunes_box_queries(spark, tmp_path):
    """The payoff assertion: on a two-dimensional box query, the
    Z-ordered layout lets min/max pruning skip most files while the
    single-column (id-ordered) layout skips almost none."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    codes = [
        quantize_dim(F.col("user_id"), 0.0, 150.0, 10),
        quantize_dim(F.col("value"), 0.0, 500.0, 10),
    ]

    p_id = str(tmp_path / "by_id")
    ev.repartitionByRange(8, "event_id").write.parquet(p_id)
    p_z = str(tmp_path / "by_z")
    cluster_by_zorder(ev, codes, 8, bits=10).write.parquet(p_z)

    box = {"user_id": (10.0, 20.0), "value": (50.0, 100.0)}
    frac_id = pruned_file_fraction(
        file_minmax_stats(spark, p_id, ["user_id", "value"]), box
    )
    frac_z = pruned_file_fraction(
        file_minmax_stats(spark, p_z, ["user_id", "value"]), box
    )
    # id-ordered files span the whole (user, value) plane -> ~0 pruned;
    # z-ordered files cover disjoint curve segments -> most pruned
    assert frac_id < 0.25
    assert frac_z >= 0.5
    assert frac_z > frac_id

    # clustering only reorders: same rows both layouts
    assert (
        spark.read.parquet(p_z).orderBy("event_id").collect()
        == spark.read.parquet(p_id).orderBy("event_id").collect()
    )


def test_zorder_plan_udf_free(spark):
    from pandera_forge_spark.plans.inspect import has_python_udf

    df = spark.createDataFrame([(1, 2.0)], "a long, b double")
    out = df.select(
        zorder_value(
            [quantize_dim(F.col("a"), 0.0, 10.0, 8), quantize_dim(F.col("b"), 0.0, 10.0, 8)],
            8,
        ).alias("z")
    )
    assert not has_python_udf(out)


def test_quantize_dim_null_propagates(spark):
    """NULL inputs must stay NULL — Spark's least/greatest skip nulls,
    so an unguarded clamp would silently map nulls to the TOP code and
    cluster them as if they equaled hi."""
    df = spark.createDataFrame([(None,), (5.0,)], "x double")
    got = [
        r["c"]
        for r in df.select(quantize_dim(F.col("x"), 0.0, 10.0, 4).alias("c")).collect()
    ]
    assert got == [None, 8]
    # and a null code nulls the whole Morton value
    z = df.select(
        zorder_value(
            [quantize_dim(F.col("x"), 0.0, 10.0, 4), F.lit(3).cast("long")], 4
        ).alias("z")
    ).collect()
    assert z[0]["z"] is None and z[1]["z"] is not None


def test_zorder_out_of_range_code_raises(spark):
    """Raw out-of-range codes interleave garbage silently; the runtime
    guard must fail loudly instead."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = spark.createDataFrame([(1024, 1)], "a long, b long")  # 1024 >= 2^10
    bad = df.select(zorder_value([F.col("a"), F.col("b")], 10).alias("z"))
    with pytest.raises(SparkRuntimeException):
        bad.collect()
    neg = spark.createDataFrame([(-1, 1)], "a long, b long").select(
        zorder_value([F.col("a"), F.col("b")], 10).alias("z")
    )
    with pytest.raises(SparkRuntimeException):
        neg.collect()


def test_cluster_by_zorder_zcol_collision_raises(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, __z long")
    with pytest.raises(ValueError):
        cluster_by_zorder(df, [F.col("a"), F.col("b")], 2, bits=4)
