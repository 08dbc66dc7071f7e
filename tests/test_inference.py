import datetime

from pandera_forge_spark.inference import infer_schema, normalize_type, pandera_type
from pandera_forge_spark.profiler import profile_table


def test_type_map():
    # reference: spark/spark_type_mapper.py:26-57 and tests at
    # tests/spark/test_spark_components.py:15-42
    assert pandera_type("int") == "Int32"
    assert pandera_type("bigint") == "Int64"
    assert pandera_type("timestamp") == "Timestamp"
    assert pandera_type("decimal(10,2)") == "Float64"
    assert pandera_type("array<string>") == "Object"
    assert pandera_type("struct<a:int>") == "Object"
    assert pandera_type("wat") is None
    assert normalize_type("DECIMAL(10,2)") == "decimal"
    assert normalize_type("map<string,int>") == "map"


def test_customers_inference(spark):
    rows = [
        (1, "user1@example.com", 25, True, datetime.datetime(2023, 1, 1)),
        (2, "user2@test.org", 30, False, datetime.datetime(2023, 1, 2)),
        (3, "user3@demo.net", 35, True, datetime.datetime(2023, 1, 3)),
        (4, "user4@site.io", 40, True, datetime.datetime(2023, 1, 4)),
    ]
    df = spark.createDataFrame(
        rows,
        "customer_id long, email string, age long, is_active boolean, signup_date timestamp",
    )
    schema = infer_schema(df, "customers")
    assert schema.name == "customers"

    cid = schema.column("customer_id")
    assert cid.unique and not cid.nullable
    assert cid.ge == 1 and cid.le == 4
    assert sorted(cid.isin) == [1, 2, 3, 4]

    em = schema.column("email")
    assert em.unique
    assert em.string_constraints.pattern_name == "email"

    sd = schema.column("signup_date")
    assert sd.unique
    assert sd.ge is None and sd.le is None  # ge/le only for numerics

    act = schema.column("is_active")
    assert sorted(act.isin) == [False, True]


def test_isin_threshold_11(spark):
    df = spark.range(1, 12).selectExpr("id as v")
    spec = infer_schema(df, "t").column("v")
    assert spec.isin is None  # 11 distinct > 10 (code_generator.py:57-58)
    assert len(spec.examples) == 5

    df10 = spark.range(1, 11).selectExpr("id as v")
    spec10 = infer_schema(df10, "t").column("v")
    assert sorted(spec10.isin) == list(range(1, 11))


def test_unique_with_null_not_unique(spark):
    df = spark.createDataFrame([(1,), (2,), (None,)], "v long")
    spec = infer_schema(df, "t").column("v")
    assert not spec.unique
    assert spec.nullable
    # nulls never appear in isin
    assert spec.isin is not None and None not in spec.isin


def test_approx_distinct_no_isin(spark):
    # HLL estimates must not drive exact-membership constraints
    df = spark.createDataFrame([(1,), (2,)], "v long")
    spec = infer_schema(df, "t", exact_distinct=False).column("v")
    assert spec.isin is None


def test_messy_names(spark):
    df = spark.createDataFrame(
        [(1, "x", 2.0)], ["I have spaces", "class", "123col"]
    )
    schema = infer_schema(df, "messy")
    names = {c.name: c.sanitized_name for c in schema.columns}
    assert names["I have spaces"] == "I_have_spaces"
    assert names["class"] == "col_class"
    assert names["123col"] == "col_123col"
    assert all(not c.name_was_valid for c in schema.columns)


def test_empty_table_end_to_end(spark):
    """Empty partitions are routine at warehouse scale — the whole
    profile -> infer -> validate -> render chain must handle 0 rows.
    unique=True on an empty column mirrors the reference's
    nunique()==len rule (field_analyzer.py:34-38)."""
    import pandera_forge_spark as pfs

    empty = spark.createDataFrame([], "a long, s string")
    profiles = pfs.profile_table(empty)
    assert profiles["a"].total_count == 0 and profiles["a"].examples == []

    schema = pfs.infer_schema(empty, "E")
    specs = {c.name: c for c in schema.columns}
    assert specs["a"].unique and not specs["a"].nullable
    assert specs["a"].isin is None and specs["a"].ge is None

    res = pfs.validate_table(empty, schema)
    assert res.ok and res.total_rows == 0

    assert pfs.ModelGenerator().generate(empty, model_name="E") is not None


def test_schema_json_roundtrip(spark):
    """Infer once, persist, validate a later snapshot with the loaded
    contract: round-tripped schema produces identical checks and
    identical validation counts, including typed date bounds."""
    import datetime

    import pandera_forge_spark as pfs
    from pandera_forge_spark.schema import Check, TableSchema

    df = spark.range(500).selectExpr(
        "id as k",
        "cast(id % 50 as double) as v",
        "date_add(date'2026-01-01', cast(id % 30 as int)) as d",
        "concat('u', id % 7) as s",
    )
    schema = pfs.infer_schema(df, "Snap")
    schema.extra_checks.append(Check("v", "custom_sql", "v >= 0", label="v_nonneg"))

    text = schema.to_json()
    loaded = TableSchema.from_json(text)
    assert loaded == schema  # dataclass equality, incl. typed values
    # date values survive as real dates, not strings (rule 3 gives
    # dates no ge/le — numeric-only, like the reference — so the typed
    # round trip shows up in the examples list)
    assert all(isinstance(v, datetime.date) for v in loaded.column("d").examples)

    bad = df.selectExpr("k", "v - 100 as v", "d", "s")
    r1 = pfs.validate_table(bad, schema)
    r2 = pfs.validate_table(bad, loaded)
    assert r1.counts == r2.counts and not r2.ok

    # callables refuse to serialize, loudly
    import pytest

    schema.extra_checks.append(
        Check("v", "custom_pandas", lambda s: s >= 0, label="cb")
    )
    with pytest.raises(ValueError, match="custom_pandas"):
        schema.to_json()


def test_infer_and_validate_matches_separate_calls(spark):
    """The shared-materialization flow must be semantically identical
    to infer_schema + validate_table called separately, and its
    verdicts frame must be consumable repeatedly without re-scanning
    (it is a local frame)."""
    from pandera_forge_spark.inference import infer_and_validate, infer_schema
    from pandera_forge_spark.validator import validate_table

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    schema_sep = infer_schema(li, "Lineitem", detect_patterns=False)
    res_sep = validate_table(
        li, schema_sep, partition_cols=["l_returnflag"], check_unique=False
    )

    schema, res = infer_and_validate(
        li, "Lineitem", partition_cols=["l_returnflag"], detect_patterns=False
    )
    assert schema.to_json() == schema_sep.to_json()
    assert res.counts == res_sep.counts
    assert res.total_rows == res_sep.total_rows
    a = sorted(map(tuple, res.verdicts.collect()))
    b = sorted(map(tuple, res_sep.verdicts.collect()))
    assert a == b
    # input is unpersisted again after the call
    assert not li.is_cached

    # persist=False path: same results
    _, res2 = infer_and_validate(
        li, "Lineitem", partition_cols=["l_returnflag"],
        persist=False, detect_patterns=False,
    )
    assert sorted(map(tuple, res2.verdicts.collect())) == a
