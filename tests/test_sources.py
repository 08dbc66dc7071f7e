"""Source readers (SURVEY.md §2.1 S1/S4/M1): CSV with latin-1
fallback, min-partitions parquet fan-out, seeded sampling."""

from pyspark.sql import functions as F

from pandera_forge_spark.sources.readers import (
    read_csv,
    read_parquet,
    sample_for_analysis,
)


def test_read_csv_utf8(spark, tmp_path):
    p = tmp_path / "ok.csv"
    p.write_text("a,b\n1,x\n2,y\n", encoding="utf-8")
    df = read_csv(spark, str(p))
    assert df.count() == 2
    assert set(df.columns) == {"a", "b"}


def test_read_csv_latin1_fallback(spark, tmp_path):
    # bytes that are invalid UTF-8 but valid latin-1 (0xE9 = é)
    p = tmp_path / "latin.csv"
    p.write_bytes(b"name,v\ncaf\xe9,1\nr\xe9sum\xe9,2\n")
    df = read_csv(spark, str(p))
    rows = sorted(r["name"] for r in df.collect())
    assert rows == ["café", "résumé"]


def test_read_parquet_min_partitions(spark):
    df = read_parquet(
        spark, "/root/testdata/sf0.001/lineitem.parquet", min_partitions=6
    )
    assert df.rdd.getNumPartitions() >= 6
    # row content unchanged by the fan-out
    assert df.count() == read_parquet(
        spark, "/root/testdata/sf0.001/lineitem.parquet"
    ).count()


def test_sample_for_analysis_seeded(spark):
    df = spark.range(100000)
    s1 = sample_for_analysis(df, sample_size=1000)
    s2 = sample_for_analysis(df, sample_size=1000)
    # seeded -> deterministic across calls (the reference samples
    # UNseeded, spark/spark_field_analyzer.py:171-192)
    assert sorted(r[0] for r in s1.collect()) == sorted(r[0] for r in s2.collect())
    assert 500 <= s1.count() <= 2000
    # under the cap -> returned as-is
    small = spark.range(10)
    assert sample_for_analysis(small, sample_size=1000).count() == 10
