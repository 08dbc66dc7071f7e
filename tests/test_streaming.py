"""Streaming validation: file-source micro-batches through the batch
check compiler; verdicts and violation rows land in the audit sinks."""

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.schema import ColumnSpec, TableSchema
from pandera_forge_spark.streaming import stream_verdicts, validate_stream


def _schema():
    return TableSchema(
        name="Events",
        columns=[
            ColumnSpec(
                name="value", sanitized_name="value", name_was_valid=True,
                spark_type="double", pandera_type="Float64", nullable=True,
                ge=0.0, le=100.0,
            )
        ],
    )


@pytest.fixture()
def src(spark, tmp_path):
    """Two parquet 'arrivals' with planted out-of-range values."""
    p = str(tmp_path / "src")
    df1 = spark.range(0, 500).select(
        F.col("id"), (F.col("id") % 100).cast("double").alias("value"),
        (F.col("id") % 4).alias("part"),
    )
    # 5 violations: value 150 planted where id % 100 == 7
    df2 = spark.range(500, 1000).select(
        F.col("id"),
        F.when(F.col("id") % 100 == 7, F.lit(150.0))
        .otherwise((F.col("id") % 100).cast("double"))
        .alias("value"),
        (F.col("id") % 4).alias("part"),
    )
    df1.write.parquet(p, mode="overwrite")
    df2.write.mode("append").parquet(p)
    return p


def test_validate_stream_available_now(spark, src, tmp_path):
    stream = (
        spark.readStream.schema("id long, value double, part long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    verdicts = str(tmp_path / "verdicts")
    violations = str(tmp_path / "violations")
    writer = validate_stream(
        stream, _schema(), verdicts, violations, id_cols=["id"],
        partition_cols=["part"], checkpoint=str(tmp_path / "ckpt"),
    )
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)

    v = spark.read.parquet(verdicts)
    assert v.agg(F.sum("__rows__")).collect()[0][0] == 1000
    assert v.agg(F.sum("value__le")).collect()[0][0] == 5

    bad = spark.read.parquet(violations)
    rows = bad.orderBy("id").collect()
    assert [r["id"] for r in rows] == [507, 607, 707, 807, 907]
    assert all(r["check"] == "value__le" for r in rows)


def test_stream_verdicts_complete_mode(spark, src, tmp_path):
    stream = spark.readStream.schema("id long, value double, part long").parquet(src)
    agg = stream_verdicts(stream, _schema(), ["part"])
    q = (
        agg.writeStream.format("memory")
        .queryName("sv")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from sv").collect()
    assert sum(r["__rows__"] for r in out) == 1000
    assert sum(r["value__le"] for r in out) == 5
    # violations all have id % 100 == 7 -> part = 7 % 4 = 3
    by_part = {r["part"]: r["value__le"] for r in out}
    assert by_part[3] == 5 and by_part[0] == 0


def test_duplicate_ids_stream_cross_batch(spark, tmp_path):
    """Duplicates arriving in DIFFERENT micro-batches are caught by the
    state store — the case a per-batch groupBy cannot see."""
    from pandera_forge_spark.streaming import duplicate_ids_stream

    src = str(tmp_path / "docs")
    # batch 1: ids 0..99; batch 2: ids 50..149 (50 cross-batch dups)
    spark.range(0, 100).selectExpr("cast(id as string) as doc_id").write.parquet(
        src, mode="overwrite"
    )
    spark.range(50, 150).selectExpr("cast(id as string) as doc_id").write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema("doc_id string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    dups = duplicate_ids_stream(stream, "doc_id")
    q = (
        dups.writeStream.format("memory")
        .queryName("dupstream")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from dupstream").collect()
    found = sorted(int(r["doc_id"]) for r in rows)
    assert found == list(range(50, 100))
    assert all(r["dup_count"] == 2 for r in rows)
