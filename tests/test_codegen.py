"""Parity with reference tests/test_code_generator.py and
test_validator.py (syntax path)."""

import math

from pandera_forge_spark.codegen import (
    render_class,
    render_field,
    render_model,
    validate_model_code,
)
from pandera_forge_spark.inference import infer_schema
from pandera_forge_spark.schema import ColumnSpec, StringConstraints, TableSchema


def _spec(**kw):
    base = dict(
        name="x", sanitized_name="x", name_was_valid=True,
        spark_type="bigint", pandera_type="Int64",
    )
    base.update(kw)
    return ColumnSpec(**base)


def test_basic_field():
    s = _spec(ge=1, le=4, unique=True)
    assert render_field(s) == "\tx: Series[Int64] = Field(ge=1, le=4, unique=True)"


def test_nan_skipped_in_isin():
    s = _spec(pandera_type="Float64", isin=[1.0, float("nan"), 2.0])
    out = render_field(s)
    assert "isin=[1.0, 2.0]" in out and "nan" not in out


def test_numeric_alias_unquoted():
    s = _spec(name="0", sanitized_name="col_0", name_was_valid=False)
    assert "alias=0" in render_field(s)
    assert 'alias="0"' not in render_field(s)


def test_string_alias_quoted():
    s = _spec(name="I have spaces", sanitized_name="I_have_spaces", name_was_valid=False)
    assert 'alias="I have spaces"' in render_field(s)


def test_string_isin_quoted_and_pattern_comment():
    s = _spec(
        pandera_type="String",
        isin=["N", "R"],
        string_constraints=StringConstraints(pattern="^x$", pattern_name="email"),
    )
    out = render_field(s)
    assert 'isin=["N", "R"]' in out
    assert out.endswith("# pattern: email")


def test_empty_class_pass():
    assert render_class(TableSchema(name="Empty")) == "class Empty(DataFrameModel):\n\tpass"


def test_imports_present():
    code = render_model(TableSchema(name="M", columns=[_spec()]))
    assert "from pandera import DataFrameModel, Field" in code
    assert "Series" in code


def test_validate_model_code():
    code = render_model(TableSchema(name="M", columns=[_spec(ge=1, le=2)]))
    ok, err = validate_model_code(code, "M")
    assert ok and err is None
    ok2, err2 = validate_model_code(code, "Missing")
    assert not ok2 and "Missing" in err2
    ok3, err3 = validate_model_code("class Broken(:\n pass", "Broken")
    assert not ok3 and "Syntax" in err3


def test_end_to_end_render(spark):
    df = spark.createDataFrame(
        [(1, "a@b.co"), (2, "c@d.io")], ["customer id", "email"]
    )
    schema = infer_schema(df, "my customers!")
    code = render_model(schema)
    assert "class my_customers_(DataFrameModel):" in code
    assert 'alias="customer id"' in code
    assert "# pattern: email" in code
    ok, err = validate_model_code(code, "my_customers_")
    assert ok, err
