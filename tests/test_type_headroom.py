"""Narrowest-safe-type audit (profiler.type_headroom_report)."""

import pytest

from pandera_forge_spark.plans.inspect import has_python_udf
from pandera_forge_spark.profiler import type_headroom_report


def _rows(out):
    return {r["column"]: r.asDict() for r in out.collect()}


def test_integer_narrowing_ladder(spark):
    df = spark.createDataFrame(
        [(1, 100, 40000, 3000000000), (2, -5, -200, 7)],
        "a bigint, b bigint, c bigint, d bigint",
    )
    got = _rows(type_headroom_report(df))
    assert got["a"]["suggested_type"] == "tinyint"
    assert got["b"]["suggested_type"] == "tinyint"
    assert got["c"]["suggested_type"] == "int"  # 40000 exceeds smallint
    # d: 7..3000000000 exceeds int32 -> bigint
    assert got["d"]["suggested_type"] == "bigint"
    assert got["a"]["dtype"] == "bigint"


def test_integer_valued_double_narrows(spark):
    df = spark.createDataFrame(
        [(1.0, 1.5), (50.0, 2.25)], "q double, p double"
    )
    got = _rows(type_headroom_report(df))
    assert got["q"]["suggested_type"] == "tinyint"
    assert got["q"]["n_non_integer"] == 0
    assert got["p"]["suggested_type"] == "double"
    assert got["p"]["n_non_integer"] == 2


def test_nan_inf_block_narrowing(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (float("nan"), float("inf"))], "a double, b double"
    )
    got = _rows(type_headroom_report(df))
    assert got["a"]["n_nan"] == 1 and got["a"]["suggested_type"] == "double"
    assert got["b"]["n_inf"] == 1 and got["b"]["suggested_type"] == "double"


def test_beyond_2p53_stays_double(spark):
    # 2^60 is integer-valued but a double cannot certify exactness there
    df = spark.createDataFrame([(2.0**60,), (1.0,)], "v double")
    got = _rows(type_headroom_report(df))
    assert got["v"]["n_non_integer"] == 0
    assert got["v"]["suggested_type"] == "double"


def test_all_null_keeps_declared(spark):
    df = spark.createDataFrame([(None,), (None,)], "v bigint")
    got = _rows(type_headroom_report(df, ["v"]))
    assert got["v"]["n_nonnull"] == 0
    assert got["v"]["suggested_type"] == "bigint"


def test_int64_edge_classifies_exactly(spark):
    # native comparison, not the double-rendered report values
    df = spark.createDataFrame(
        [(9223372036854775807,), (-9223372036854775808,)], "v bigint"
    )
    got = _rows(type_headroom_report(df))
    assert got["v"]["suggested_type"] == "bigint"


def test_default_cols_numeric_only_and_fences(spark):
    df = spark.createDataFrame([(1, "s")], "n int, s string")
    got = _rows(type_headroom_report(df))
    assert set(got) == {"n"}
    with pytest.raises(ValueError, match="not numeric"):
        type_headroom_report(df, ["s"])
    with pytest.raises(ValueError, match="not in frame"):
        type_headroom_report(df, ["zzz"])
    with pytest.raises(ValueError, match="no numeric"):
        type_headroom_report(df.select("s"))


def test_partition_independent_single_scan(spark):
    df = spark.createDataFrame(
        [(i, i * 1.5) for i in range(100)], "a int, b double"
    )
    x = _rows(type_headroom_report(df.repartition(7)))
    y = _rows(type_headroom_report(df.coalesce(1)))
    assert x == y
    out = type_headroom_report(df)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("logicalrdd") <= 1
    assert not has_python_udf(out)


def test_float_column_keeps_float_never_widens(spark):
    # review fix: a float column that cannot narrow must stay 'float',
    # not widen to 'double'; an integral float still narrows
    df = spark.createDataFrame([(1.5, 3.0), (2.5, 7.0)], "a float, b float")
    got = _rows(type_headroom_report(df))
    assert got["a"]["dtype"] == "float"
    assert got["a"]["suggested_type"] == "float"
    assert got["b"]["suggested_type"] == "tinyint"
    # all-NULL float keeps its declared type too
    df2 = spark.createDataFrame([(None,), (None,)], "v float")
    assert _rows(type_headroom_report(df2, ["v"]))["v"]["suggested_type"] == "float"
