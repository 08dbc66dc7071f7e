"""Contract drift (schema.schema_diff) — pure dataclass logic."""

from pandera_forge_spark.schema import (
    ColumnSpec,
    StringConstraints,
    TableSchema,
    schema_diff,
)


def _col(name, **kw):
    base = dict(
        name=name, sanitized_name=name, name_was_valid=True,
        spark_type="bigint", pandera_type="Int64",
    )
    base.update(kw)
    return ColumnSpec(**base)


def _schema(*cols):
    return TableSchema(name="T", columns=list(cols))


def test_schema_diff_directions():
    old = _schema(
        _col("a", ge=0, le=100, nullable=True),
        _col("b", isin=[1, 2, 3]),
        _col("gone"),
        _col(
            "s", spark_type="string", pandera_type="String",
            string_constraints=StringConstraints(min_length=1, max_length=10),
        ),
    )
    new = _schema(
        _col("a", ge=10, le=200, nullable=False),          # ge/nullable tighten, le loosens
        _col("b", isin=[1, 2]),                            # subset domain tightens
        _col("added"),
        _col(
            "s", spark_type="string", pandera_type="String",
            string_constraints=StringConstraints(
                min_length=1, max_length=10, pattern="[a-z]+"
            ),
        ),
    )
    d = schema_diff(old, new)
    assert d.added_columns == ["added"]
    assert d.removed_columns == ["gone"]
    got = {(c.column, c.constraint): c.direction for c in d.changes}
    assert got == {
        ("a", "ge"): "tightened",
        ("a", "le"): "loosened",
        ("a", "nullable"): "tightened",
        ("b", "isin"): "tightened",
        ("s", "pattern"): "tightened",
    }
    assert {(c.column, c.constraint) for c in d.breaking} == {
        ("a", "ge"), ("a", "nullable"), ("b", "isin"), ("s", "pattern"),
    }


def test_schema_diff_identical_is_empty():
    s = _schema(_col("a", ge=0), _col("b"))
    t = _schema(_col("a", ge=0), _col("b"))
    assert schema_diff(s, t).empty


def test_schema_diff_type_change_and_rows():
    old = _schema(_col("a"))
    new = _schema(_col("a", pandera_type="Float64", spark_type="double"))
    d = schema_diff(old, new)
    assert [(c.constraint, c.direction) for c in d.changes] == [("type", "changed")]
    rows = d.to_rows()
    assert rows == [("a", "type", "Int64", "Float64", "changed")]


def test_schema_diff_roundtrip_inferred(spark):
    """Diffing a schema against its JSON round-trip is empty; diffing
    against a re-inference of mutated data reports the drift."""
    from pyspark.sql import functions as F

    from pandera_forge_spark.inference import infer_schema
    from pandera_forge_spark.schema import TableSchema as TS

    df = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    s1 = infer_schema(df, "Region")
    assert schema_diff(s1, TS.from_json(s1.to_json())).empty

    s2 = infer_schema(
        df.withColumn("r_regionkey", F.col("r_regionkey") + 100), "Region"
    )
    d = schema_diff(s1, s2)
    assert any(c.column == "r_regionkey" and c.constraint == "ge" for c in d.changes)
