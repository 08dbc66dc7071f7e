"""Dirty-string census (profiler.string_hygiene_report)."""

import pytest

from pandera_forge_spark.plans.inspect import has_python_udf
from pandera_forge_spark.profiler import string_hygiene_report


def _rows(out):
    return {r["column"]: r.asDict() for r in out.collect()}


PLANTED = [
    "clean",
    " lead",
    "trail ",
    "",
    "   ",
    "ctl\x01here",
    "two  spaces",
    "uniécode",
    None,
    "\tతab",  # tab = control (NOT untrimmed: trim strips spaces only)
]


def test_planted_census(spark):
    df = spark.createDataFrame([(v,) for v in PLANTED], "s string")
    got = _rows(string_hygiene_report(df, ["s"]))["s"]
    assert got == {
        "column": "s",
        "n_rows": 10,
        "n_nonnull": 9,
        "n_untrimmed": 3,  # " lead", "trail ", "   " (trim = spaces only)
        "n_empty": 1,
        "n_ws_only": 1,  # "   "
        "n_control": 2,  # \x01, \t
        "n_multispace": 2,  # "   ", "two  spaces"
        "n_nonascii": 2,  # unicode e-acute, telugu char
    }


def test_all_clean_is_zero(spark):
    df = spark.createDataFrame([("ok",), ("fine",)], "s string")
    got = _rows(string_hygiene_report(df, ["s"]))["s"]
    assert (
        got["n_untrimmed"],
        got["n_empty"],
        got["n_ws_only"],
        got["n_control"],
        got["n_multispace"],
        got["n_nonascii"],
    ) == (0, 0, 0, 0, 0, 0)


def test_multi_column_single_scan(spark):
    df = spark.createDataFrame(
        [(" a", "b"), ("c", "d ")], "x string, y string"
    )
    out = string_hygiene_report(df, ["x", "y"])
    got = _rows(out)
    assert got["x"]["n_untrimmed"] == 1 and got["y"]["n_untrimmed"] == 1
    # one aggregate, melted — not one scan per column
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("relation") <= 1


def test_non_string_column_casts(spark):
    df = spark.createDataFrame([(1,), (None,)], "v int")
    got = _rows(string_hygiene_report(df, ["v"]))["v"]
    assert got["n_nonnull"] == 1 and got["n_untrimmed"] == 0


def test_fences(spark):
    df = spark.createDataFrame([("x",)], "s string")
    with pytest.raises(ValueError, match="non-empty"):
        string_hygiene_report(df, [])
    with pytest.raises(ValueError, match="not in frame"):
        string_hygiene_report(df, ["zzz"])


def test_partition_independent(spark):
    vals = PLANTED * 5
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    a = _rows(string_hygiene_report(df.repartition(7), ["s"]))
    b = _rows(string_hygiene_report(df.coalesce(1), ["s"]))
    assert a == b


def test_no_python_udf(spark):
    df = spark.createDataFrame([("x",)], "s string")
    assert not has_python_udf(string_hygiene_report(df, ["s"]))
