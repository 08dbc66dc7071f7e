"""ModelGenerator facade: the reference's one-call API over the
distributed engine (generate / from_csv / from_parquet / from_table,
pandas input acceptance, validation wired in instead of skipped)."""

from pyspark.sql import functions as F

from pandera_forge_spark.generator import ModelGenerator


def _clean_df(spark):
    return spark.range(200).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 4).cast("int").alias("tier"),
        F.concat(F.lit("u"), F.col("id"), F.lit("@example.com")).alias("email"),
    )


def test_generate_spark_df_with_validation(spark):
    code = ModelGenerator().generate(
        _clean_df(spark), model_name="Users", validate=True
    )
    assert code is not None
    assert "class Users(DataFrameModel):" in code
    assert "user_id: Series[Int64] = Field(ge=0, le=199, unique=True" in code
    assert "tier: Series[Int32] = Field(ge=0, le=3, isin=[0, 1, 2, 3])" in code
    assert "# pattern: email" in code
    # reference file layout: imports, two blank lines, class
    assert "from typing import Optional\n\n\n\nclass" in code


def test_generate_accepts_pandas(spark):
    import pandas as pd

    pdf = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    code = ModelGenerator().generate(pdf, model_name="Tiny", validate=True)
    assert code is not None and "class Tiny(DataFrameModel):" in code
    assert "a: Series[Int64]" in code


def test_generate_sanitizes_model_name(spark):
    code = ModelGenerator().generate(
        _clean_df(spark), model_name="123 bad name!", validate=False
    )
    assert code is not None
    # digit-start class names get the reference's Model prefix
    assert "class Model123_bad_name_(DataFrameModel):" in code


def test_from_csv_stem_name_and_trailer(spark, tmp_path):
    p = tmp_path / "my-users file.csv"
    p.write_text("user_id,score\n1,0.5\n2,0.9\n3,0.1\n")
    code = ModelGenerator().from_csv(spark, p, validate=False)
    assert code is not None
    # stem-derived names keep the reference's sanitizer verbatim (no
    # capitalization: name_sanitizer.py:51-64 only fixes \W and
    # digit-start)
    assert "class my_users_file(DataFrameModel):" in code
    assert "# Example implementation" in code
    assert str(p.absolute()) in code
    assert "my_users_file.validate(df)" in code


def test_from_parquet_and_from_table(spark, tmp_path):
    df = _clean_df(spark)
    pq = str(tmp_path / "users.parquet")
    df.write.parquet(pq)
    gen = ModelGenerator()

    code = gen.from_parquet(pq, spark)
    assert code is not None and "class users(DataFrameModel):" in code

    df.createOrReplaceTempView("users_view")
    code2 = gen.from_table("users_view", spark)
    assert code2 is not None and "class users_view(DataFrameModel):" in code2

    assert gen.from_table("no_such_table_anywhere", spark) is None


def test_validation_failure_returns_none(spark, capsys):
    """Mirrors the reference's contract: a model that fails validation
    against its own frame returns None with a printed warning. An
    inferred pattern constraint at a 90-99% match ratio is exactly
    such a case (detection threshold 0.9 < enforcement at 100%)."""
    df = spark.range(100).select(
        F.when(F.col("id") % 20 == 0, F.lit("not-an-email"))
        .otherwise(F.concat(F.lit("u"), F.col("id"), F.lit("@x.io")))
        .alias("email")
    )
    code = ModelGenerator().generate(df, model_name="M", validate=True)
    assert code is None
    assert "validation against DataFrame failed" in capsys.readouterr().out

    # validate=False still returns the (honestly imperfect) model
    assert ModelGenerator().generate(df, model_name="M", validate=False)
