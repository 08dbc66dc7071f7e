"""Streaming FDR-drift monitor (streaming/rates.py stream_drift_bh):
per-epoch output == the batch drift_by_partition -> ks_pvalue ->
bh_adjust chain over the epoch prefix; planted drifted slice is
rejected once its cumulative evidence lands."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.drift import (
    baseline_summary,
    bh_adjust,
    drift_by_partition,
    ks_pvalue,
)
from pandera_forge_spark.streaming.rates import stream_drift_bh

SCHEMA = "slice string, value double, id int"


def _epochs():
    out = []
    rid = 0
    for e in range(3):
        rows = []
        for s in ("a", "b", "c", "drift"):
            for i in range(40):
                v = 5.0 + (i % 10) if s != "drift" else 95.0 + (i % 5)
                rows.append((s, v, rid))
                rid += 1
        out.append(rows)
    return out


def _write_epochs(spark, root, epochs):
    src = os.path.join(root, "src")
    os.makedirs(src, exist_ok=True)
    for e, rows in enumerate(epochs):
        stage = os.path.join(root, f"stage{e}")
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        os.replace(
            os.path.join(stage, part), os.path.join(src, f"e{e}.parquet")
        )
        shutil.rmtree(stage, ignore_errors=True)
        os.utime(
            os.path.join(src, f"e{e}.parquet"),
            (1_000_000_000 + e * 1000,) * 2,
        )
    return src


def test_stream_drift_bh_equals_batch_prefix(spark, tmp_path):
    root = str(tmp_path)
    epochs = _epochs()
    src = _write_epochs(spark, root, epochs)
    base_rows = [("base", 5.0 + (i % 10), i) for i in range(400)]
    base_df = spark.createDataFrame(base_rows, SCHEMA)
    base = baseline_summary(base_df, "value", edges=[6.0, 9.0, 12.0])

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    writer = stream_drift_bh(
        stream,
        os.path.join(root, "state"),
        os.path.join(root, "census"),
        ["slice"],
        "value",
        base,
        q=0.05,
        checkpoint=os.path.join(root, "ckpt"),
    )
    q = writer.trigger(availableNow=True).start()
    assert q.awaitTermination(300), "stream did not finish in 300 s"
    out = spark.read.option(
        "basePath", os.path.join(root, "census")
    ).parquet(os.path.join(root, "census", "__epoch=*"))
    got = {
        (int(r["__epoch"]), r["slice"]): (
            r["n"], r["ks"], r["p"], r["p_rank"], r["rejected"]
        )
        for r in out.collect()
    }
    for e in range(3):
        prefix = [row for ep in epochs[: e + 1] for row in ep]
        pdf = spark.createDataFrame(prefix, SCHEMA)
        d = drift_by_partition(pdf, "value", ["slice"], base)
        scored = d.withColumn(
            "p", ks_pvalue(F.col("ks"), F.col("n"), F.lit(base["n"]))
        )
        expect = {
            r["slice"]: (r["n"], r["ks"], r["p"], r["p_rank"], r["rejected"])
            for r in bh_adjust(
                scored, "p", q=0.05, tie_cols=["slice"]
            ).collect()
        }
        for s, vals in expect.items():
            assert got[(e, s)] == vals
    # the planted slice is rejected at every epoch; healthy ones never
    assert all(got[(e, "drift")][4] for e in range(3))
    assert not any(got[(e, s)][4] for e in range(3) for s in ("a", "b", "c"))


def test_stream_drift_bh_validates_args(spark):
    base = {"edges": [1.0], "cdf": [0.5], "props": [0.5, 0.5], "n": 10}
    df = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="slice_cols"):
        stream_drift_bh(df, "/tmp/s", "/tmp/c", [], "value", base)
    with pytest.raises(ValueError, match="lacks columns"):
        stream_drift_bh(df, "/tmp/s", "/tmp/c", ["ghost"], "value", base)
    bad = dict(base, n=0)
    df2 = df.withColumnRenamed("value", "v").withColumn("s", F.lit("x")) \
        .withColumn("value", F.lit(1.0))
    with pytest.raises(ValueError, match="positive row count"):
        stream_drift_bh(df2, "/tmp/s", "/tmp/c", ["s"], "value", bad)
