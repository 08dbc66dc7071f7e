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


# --------------------------------------------- timestamp_hygiene_report


from datetime import datetime

from pandera_forge_spark.profiler import timestamp_hygiene_report

AS_OF = "2026-06-01 00:00:00"

TS_PLANTED = [
    datetime(2025, 3, 4, 10, 30, 5),      # clean
    datetime(2027, 1, 1, 8, 0, 1),        # future of as_of
    datetime(1975, 6, 1, 12, 0, 0),       # pre-1980
    datetime(1970, 1, 1, 0, 0, 0),        # epoch zero (also pre-1980, midnight)
    datetime(2024, 5, 5, 0, 0, 0),        # midnight (date cast as ts)
    datetime(2045, 7, 1, 1, 2, 3),        # past 2038 rollover (also future)
    None,
]


def test_ts_planted_census(spark):
    df = spark.createDataFrame([(v,) for v in TS_PLANTED], "ts timestamp")
    got = _rows(timestamp_hygiene_report(df, ["ts"], as_of=AS_OF))["ts"]
    assert got == {
        "column": "ts",
        "n_rows": 7,
        "n_null": 1,
        "n_future": 2,       # 2027 and 2045 — overlaps counted independently
        "n_pre_1980": 2,     # 1975 and the epoch
        "n_epoch_zero": 1,
        "n_midnight": 2,     # the epoch and the date-cast row
        "n_past_2038": 1,
        "min_ts": datetime(1970, 1, 1, 0, 0, 0),
        "max_ts": datetime(2045, 7, 1, 1, 2, 3),
    }


def test_ts_clean_column_all_zero(spark):
    df = spark.createDataFrame(
        [(datetime(2025, 1, 1, 9, 30, 0),), (datetime(2025, 1, 2, 17, 45, 59),)],
        "ts timestamp",
    )
    got = _rows(timestamp_hygiene_report(df, ["ts"], as_of=AS_OF))["ts"]
    for k in ("n_null", "n_future", "n_pre_1980", "n_epoch_zero",
              "n_midnight", "n_past_2038"):
        assert got[k] == 0, k


def test_ts_multi_column_single_scan(spark):
    df = spark.createDataFrame(
        [(datetime(2027, 1, 1), datetime(1971, 1, 1, 5, 0))],
        "a timestamp, b timestamp",
    )
    out = timestamp_hygiene_report(df, ["a", "b"], as_of=AS_OF)
    got = _rows(out)
    assert got["a"]["n_future"] == 1 and got["b"]["n_pre_1980"] == 1
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("relation") <= 1


def test_ts_fences(spark):
    df = spark.createDataFrame(
        [(datetime(2025, 1, 1), 1)], "ts timestamp, n long"
    )
    with pytest.raises(ValueError, match="non-empty"):
        timestamp_hygiene_report(df, [], as_of=AS_OF)
    with pytest.raises(ValueError, match="not in frame"):
        timestamp_hygiene_report(df, ["nope"], as_of=AS_OF)
    with pytest.raises(ValueError, match="non-timestamp"):
        timestamp_hygiene_report(df, ["n"], as_of=AS_OF)
    with pytest.raises(ValueError, match="as_of is required"):
        timestamp_hygiene_report(df, ["ts"], as_of="")
    dated = spark.createDataFrame([("2025-01-01",)], "d string").select(
        pytest.importorskip("pyspark.sql.functions").col("d").cast("date").alias("d")
    )
    with pytest.raises(ValueError, match="non-timestamp"):
        timestamp_hygiene_report(dated, ["d"], as_of=AS_OF)


def test_ts_partition_independent_and_no_udf(spark):
    df = spark.createDataFrame([(v,) for v in TS_PLANTED], "ts timestamp")
    a = _rows(timestamp_hygiene_report(df.repartition(1), ["ts"], as_of=AS_OF))
    b = _rows(timestamp_hygiene_report(df.repartition(5), ["ts"], as_of=AS_OF))
    assert a == b
    assert not has_python_udf(timestamp_hygiene_report(df, ["ts"], as_of=AS_OF))


# ---------------------------------------------------------------------------
# null_pattern_census
# ---------------------------------------------------------------------------

from pandera_forge_spark.profiler import null_pattern_census


def _census(spark):
    rows = []
    for i in range(60):
        a = None if i % 3 == 0 else i
        b = None if i % 6 == 0 else f"s{i}"
        c = float(i)
        rows.append((a, b, c))
    return spark.createDataFrame(rows, "a long, b string, c double")


def test_null_patterns_planted(spark):
    out = {
        r["null_cols"]: r
        for r in null_pattern_census(_census(spark), ["a", "b", "c"]).collect()
    }
    # i%6==0 (10 rows): a AND b null; i%3==0 and not %6 (10 rows): a only;
    # remaining 40: complete
    assert set(out) == {"", "a", "a,b"}
    assert out["a,b"]["n_rows"] == 10 and out["a,b"]["n_null_cols"] == 2
    assert out["a"]["n_rows"] == 10 and out["a"]["n_null_cols"] == 1
    assert out[""]["n_rows"] == 40 and out[""]["n_null_cols"] == 0
    assert out[""]["share"] == 40 / 60  # one raw IEEE division
    assert abs(sum(r["share"] for r in out.values()) - 1.0) < 1e-12


def test_null_patterns_all_complete_and_subset_cols(spark):
    df = _census(spark)
    [r] = null_pattern_census(df, ["c"]).collect()
    assert (r["null_cols"], r["n_null_cols"], r["n_rows"], r["share"]) == (
        "", 0, 60, 1.0,
    )
    # censusing only b: the a-only rows count as complete
    out = {r["null_cols"]: r for r in null_pattern_census(df, ["b"]).collect()}
    assert out["b"]["n_rows"] == 10 and out[""]["n_rows"] == 50


def test_null_patterns_single_scan_no_udf(spark):
    out = null_pattern_census(_census(spark), ["a", "b"])
    assert not has_python_udf(out)
    # physically ONE scan of the input: the share-total branch reads
    # the ReusedExchange of the pattern aggregate, never a rescan
    out.collect()  # let AQE finalize
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE echoes the pre-plan
    assert final.count("Scan ExistingRDD") == 1
    assert "ReusedExchange" in final


def test_null_patterns_fences_and_partition_independence(spark):
    df = _census(spark)
    with pytest.raises(ValueError, match="non-empty"):
        null_pattern_census(df, [])
    with pytest.raises(ValueError, match="not in frame"):
        null_pattern_census(df, ["nope"])
    wide = df
    for i in range(25):
        wide = wide.withColumn(f"w{i}", df.a)
    with pytest.raises(ValueError, match="24 columns"):
        null_pattern_census(wide, [f"w{i}" for i in range(25)])
    one = sorted(map(tuple, null_pattern_census(df.repartition(1), ["a", "b"]).collect()))
    many = sorted(map(tuple, null_pattern_census(df.repartition(7), ["a", "b"]).collect()))
    assert one == many


# ---------------------------------------------------------------------------
# duplicate_column_report
# ---------------------------------------------------------------------------

from pandera_forge_spark.profiler import duplicate_column_report


def _dupcols(spark):
    rows = []
    for i in range(50):
        s = f"v{i % 5}"
        rows.append((
            s,                                  # a: base
            s,                                  # b: exact copy of a
            s if i % 10 else "MUT",             # c: near-copy (5 diffs)
            None if i % 7 == 0 else s,          # d: copy with extra nulls
            i,                                  # x: long
            i,                                  # y: long copy
            float(i),                           # z: double (no same-type twin)
        ))
    return spark.createDataFrame(
        rows, "a string, b string, c string, d string, x long, y long, z double"
    )


def test_dupcols_planted(spark):
    out = {
        (r["col_a"], r["col_b"]): r
        for r in duplicate_column_report(_dupcols(spark)).collect()
    }
    # string pairs: (a,b) (a,c) (a,d) (b,c) (b,d) (c,d); long pair (x,y)
    assert len(out) == 7
    ab = out[("a", "b")]
    assert ab["identical"] and ab["n_diff"] == 0 and ab["dtype"] == "string"
    assert out[("x", "y")]["identical"]
    ac = out[("a", "c")]
    assert ac["n_diff"] == 5 and not ac["identical"]
    assert ac["diff_share"] == 5 / 50
    # NULL vs value differs; NULL==NULL would count equal
    ad = out[("a", "d")]
    assert ad["n_diff"] == 8  # i in {0,7,14,21,28,35,42,49}
    assert out[("c", "d")]["n_diff"] == 12  # 8 nulls + 5 MUT - overlap i=35? no: MUT at %10==0 -> {0,10,20,30,40}; nulls {0,7,...}; i=0 in both
    assert not has_python_udf(duplicate_column_report(_dupcols(spark)))


def test_dupcols_single_scan_and_partition_independence(spark):
    df = _dupcols(spark)
    out = duplicate_column_report(df, ["a", "b", "c"])
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("logicalrdd") == 1
    one = sorted(map(tuple, duplicate_column_report(df.repartition(1)).collect()))
    many = sorted(map(tuple, duplicate_column_report(df.repartition(7)).collect()))
    assert one == many


def test_dupcols_no_pairs_empty_and_fences(spark):
    df = _dupcols(spark)
    out = duplicate_column_report(df, ["a", "x", "z"])  # all dtypes differ
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "col_a", "col_b", "dtype", "n_rows", "n_diff", "diff_share",
        "identical",
    ]
    with pytest.raises(ValueError, match="non-empty"):
        duplicate_column_report(df, [])
    with pytest.raises(ValueError, match="not in frame"):
        duplicate_column_report(df, ["nope"])
    with pytest.raises(ValueError, match="duplicate names"):
        duplicate_column_report(df, ["a", "a"])
    wide = df
    for i in range(41):
        wide = wide.withColumn(f"w{i}", df.a)
    with pytest.raises(ValueError, match="40 columns"):
        duplicate_column_report(wide, [f"w{i}" for i in range(41)])


# ---------------------------------------------------------------------------
# shape_census
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F

from pandera_forge_spark.profiler import shape_census


def _shapes(spark):
    rows = [
        ("Clerk#000000382",),
        ("Clerk#000000999",),
        ("clerk#42",),       # lowercased variant
        ("AB-12 x",),
        ("née Müller",),     # non-ASCII -> U
        (None,),
    ]
    return spark.createDataFrame(rows, "v string")


def test_shape_census_collapsed(spark):
    out = {r["shape"]: r for r in shape_census(_shapes(spark), "v").collect()}
    assert set(out) == {"Aa#9", "a#9", "A-9 a", "aUa AUa"}
    c = out["Aa#9"]
    assert c["n_rows"] == 2
    assert c["example"] == "Clerk#000000382"  # binary min, not first-seen
    assert c["share"] == 2 / 5  # NULL excluded from the total
    assert out["aUa AUa"]["n_rows"] == 1  # é->U, ü->U


def test_shape_census_raw_runs(spark):
    out = {
        r["shape"]: r["n_rows"]
        for r in shape_census(_shapes(spark), "v", collapse_runs=False).collect()
    }
    assert out["Aaaaa#999999999"] == 2
    assert out["aaaaa#99"] == 1
    assert out["AA-99 a"] == 1


def test_shape_census_plan_and_fences(spark):
    df = _shapes(spark)
    out = shape_census(df, "v")
    assert not has_python_udf(out)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # one scan of the input: the share total is a window over the
    # already-aggregated census frame, not a rescan
    assert final.count("Scan ExistingRDD") == 1
    with pytest.raises(ValueError, match="not in frame"):
        shape_census(df, "nope")
    with pytest.raises(ValueError, match="engine artifacts"):
        shape_census(df.select(F.length("v").alias("n")), "n")
    one = sorted(map(tuple, shape_census(df.repartition(1), "v").collect()))
    many = sorted(map(tuple, shape_census(df.repartition(5), "v").collect()))
    assert one == many


# ---------------------------------------------------------------------------
# json_health_report / json_key_census
# ---------------------------------------------------------------------------

from pandera_forge_spark.profiler import json_health_report, json_key_census

JSON_PLANTED = [
    '{"k": 1, "m": "x"}', '{"k": 2}', '{}', '[1,2]', '5', '"s"',
    'null', 'true', '{bad', '', '   ', None,
]


def test_json_health_planted(spark):
    df = spark.createDataFrame([(v,) for v in JSON_PLANTED], "s string")
    [r] = json_health_report(df, "s").collect()
    assert r.asDict() == {
        "n_rows": 12,
        "n_null": 1,
        "n_invalid": 3,   # '{bad', '', '   '
        "n_valid": 8,     # incl. bare null/true/number/string scalars
        "n_objects": 3,
        "n_arrays": 1,
        "n_scalars": 4,
    }
    assert not has_python_udf(json_health_report(df, "s"))


def test_json_key_census(spark):
    df = spark.createDataFrame([(v,) for v in JSON_PLANTED], "s string")
    out = {r["key"]: r for r in json_key_census(df, "s").collect()}
    assert set(out) == {"k", "m"}
    assert out["k"]["n_present"] == 2
    assert out["k"]["share"] == 2 / 3  # 3 objects ('{}' counts)
    assert out["m"]["share"] == 1 / 3
    # explicit denominator: one-scan mode, same numbers
    out2 = {r["key"]: r for r in json_key_census(df, "s", n_objects=3).collect()}
    assert {k: (v["n_present"], v["share"]) for k, v in out.items()} == {
        k: (v["n_present"], v["share"]) for k, v in out2.items()
    }


def test_json_fences_and_partition_independence(spark):
    df = spark.createDataFrame([(v,) for v in JSON_PLANTED * 3], "s string")
    with pytest.raises(ValueError, match="not in frame"):
        json_health_report(df, "nope")
    with pytest.raises(ValueError, match="not in frame"):
        json_key_census(df, "nope")
    with pytest.raises(ValueError, match="n_objects"):
        json_key_census(df, "s", n_objects=0)
    a = json_health_report(df.repartition(7), "s").collect()
    b = json_health_report(df.coalesce(1), "s").collect()
    assert list(map(tuple, a)) == list(map(tuple, b))
    c = sorted(map(tuple, json_key_census(df.repartition(7), "s").collect()))
    d = sorted(map(tuple, json_key_census(df.coalesce(1), "s").collect()))
    assert c == d


# ---------------------------------------------------------------------------
# script_mixing_report
# ---------------------------------------------------------------------------

from pandera_forge_spark.profiler import script_mixing_report

SPOOF_PLANTED = [
    "plain latin",
    "привет",                 # pure cyrillic
    "pаypal",                 # latin with cyrillic 'а' -> MIXED
    "αβγ",                    # pure greek
    "alphα",                  # latin + greek -> MIXED
    "zero​width",        # ZWSP
    "bidi‮evil",         # RLO control
    "café",                   # extended latin: NOT mixing by design
    None,
]


def test_script_mixing_planted(spark):
    df = spark.createDataFrame([(v,) for v in SPOOF_PLANTED], "s string")
    [r] = script_mixing_report(df, ["s"]).collect()
    assert r.asDict() == {
        "column": "s",
        "n_rows": 9,
        "n_nonnull": 8,
        "n_latin": 6,        # all ascii-letter carriers
        "n_cyrillic": 2,     # привет, pаypal
        "n_greek": 2,        # αβγ, alphα
        "n_mixed_script": 2, # pаypal, alphα
        "n_zero_width": 1,
        "n_bidi": 1,
    }


def test_script_mixing_clean_and_plan(spark):
    df = spark.createDataFrame(
        [("ok", "fine"), ("café", "naïve")], "x string, y string"
    )
    out = {r["column"]: r for r in script_mixing_report(df, ["x", "y"]).collect()}
    for c in ("x", "y"):
        assert out[c]["n_mixed_script"] == 0
        assert out[c]["n_zero_width"] == 0 and out[c]["n_bidi"] == 0
    rep = script_mixing_report(df, ["x", "y"])
    assert not has_python_udf(rep)
    plan = rep._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("relation") <= 1  # one fused scan


def test_script_mixing_fences_and_partition_independence(spark):
    df = spark.createDataFrame([(v,) for v in SPOOF_PLANTED * 3], "s string")
    with pytest.raises(ValueError, match="non-empty"):
        script_mixing_report(df, [])
    with pytest.raises(ValueError, match="not in frame"):
        script_mixing_report(df, ["nope"])
    a = list(map(tuple, script_mixing_report(df.repartition(7), ["s"]).collect()))
    b = list(map(tuple, script_mixing_report(df.coalesce(1), ["s"]).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# salt_plan
# ---------------------------------------------------------------------------

from pandera_forge_spark.validator import salt_plan


def test_salt_plan_planted(spark):
    rows = (
        [("hot", i) for i in range(1000)]
        + [("warm", i) for i in range(150)]
        + [("cold", i) for i in range(10)]
        + [(None, i) for i in range(200)]  # NULL is a key too
    )
    df = spark.createDataFrame(rows, "k string, x long")
    out = {r["k"]: r for r in salt_plan(df, ["k"], 100).collect()}
    assert set(out) == {"hot", "warm", None}
    assert (out["hot"]["n_rows"], out["hot"]["salt_factor"]) == (1000, 10)
    assert (out["warm"]["n_rows"], out["warm"]["salt_factor"]) == (150, 2)
    assert out[None]["salt_factor"] == 2
    # exact boundary: exactly rows_per_task rows is NOT hot
    assert salt_plan(df.where("k = 'warm'"), ["k"], 150).count() == 0
    # ceil exactness at the boundary: 101 rows / 100 -> 2
    [b] = salt_plan(df.limit(0).union(
        spark.createDataFrame([("b", i) for i in range(101)], "k string, x long")
    ), ["k"], 100).collect()
    assert b["salt_factor"] == 2


def test_salt_plan_fences_and_no_udf(spark):
    df = spark.createDataFrame([("k", 1)], "k string, x long")
    with pytest.raises(ValueError, match="rows_per_task"):
        salt_plan(df, ["k"], 0)
    with pytest.raises(ValueError, match="non-empty"):
        salt_plan(df, [], 10)
    with pytest.raises(ValueError, match="lacks columns"):
        salt_plan(df, ["nope"], 10)
    with pytest.raises(ValueError, match="collide"):
        salt_plan(df.withColumnRenamed("k", "n_rows"), ["n_rows"], 10)
    assert not has_python_udf(salt_plan(df, ["k"], 10))


# ------------------------------------------------------------ vocab_coverage


def test_vocab_coverage_oov_rates(spark):
    from pandera_forge_spark.operators.text import vocab_coverage

    rows = [
        (1, "the cat and the dog and the cat"),   # all head tokens
        (2, "the cat xylophone quux"),              # 2/4 OOV at k=4
        (3, ""),                                     # empty doc
        (4, "zzz qqq"),                              # fully OOV
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # corpus counts: the=4, and=2, cat=3, dog=1, xylophone=1, quux=1,
    # zzz=1, qqq=1 -> top-4 by (count desc, token asc): the, cat, and, dog
    got = {r["doc_id"]: r for r in vocab_coverage(df, vocab_k=4).collect()}
    assert got[1]["n_oov"] == 0 and got[1]["oov_ratio"] == 0.0
    assert got[2]["n_tokens"] == 4 and got[2]["n_oov"] == 2
    assert got[2]["oov_ratio"] == 0.5
    assert got[3]["n_tokens"] == 0 and got[3]["oov_ratio"] is None
    assert got[4]["oov_ratio"] == 1.0
    # deterministic tie-break: at k=5, 'dog' beat the 1-count ties
    # lexicographically larger than it would lose; verify stability
    a = vocab_coverage(df, vocab_k=5).collect()
    b = vocab_coverage(df.repartition(7), vocab_k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_vocab_coverage_contracts(spark):
    import pytest

    from pandera_forge_spark.operators.text import vocab_coverage
    from pandera_forge_spark.plans.inspect import has_python_udf

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    assert not has_python_udf(vocab_coverage(df))
    with pytest.raises(ValueError, match="vocab_k"):
        vocab_coverage(df, vocab_k=0)
    with pytest.raises(ValueError, match="missing"):
        vocab_coverage(df, text_col="nope")
