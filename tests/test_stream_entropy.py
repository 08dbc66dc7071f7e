"""Streaming token-entropy monitor (streaming/text.py
stream_token_entropy): per-epoch running census == the batch
token_entropy of the epoch prefix; quiet groups keep reporting."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.operators.text import token_entropy
from pandera_forge_spark.streaming.text import stream_token_entropy

SCHEMA = "lang string, text string, id int"

EPOCHS = [
    [
        ("en", "a b b c", 1),
        ("de", "x x y", 2),
    ],
    [
        ("en", "a a d", 3),        # en grows; de absent -> must still report
        ("en", "", 4),             # empty text adds nothing
    ],
    [
        ("de", "y z", 5),
    ],
]


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


def _run(spark, root, src):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    writer = stream_token_entropy(
        stream,
        os.path.join(root, "state"),
        os.path.join(root, "census"),
        ["lang"],
        checkpoint=os.path.join(root, "ckpt"),
    )
    q = writer.trigger(availableNow=True).start()
    assert q.awaitTermination(300), "stream did not finish in 300 s"
    return spark.read.option(
        "basePath", os.path.join(root, "census")
    ).parquet(os.path.join(root, "census", "__epoch=*"))


def test_stream_entropy_equals_batch_prefix(spark, tmp_path):
    root = str(tmp_path)
    src = _write_epochs(spark, root, EPOCHS)
    out = _run(spark, root, src)
    got = {
        (int(r["__epoch"]), r["lang"]): (
            r["n_tokens"], r["n_distinct"], r["entropy"], r["eff_vocab"]
        )
        for r in out.collect()
    }
    # every epoch's census equals token_entropy of the concatenated prefix
    for e in range(3):
        prefix = [row for ep in EPOCHS[: e + 1] for row in ep]
        pdf = spark.createDataFrame(prefix, SCHEMA)
        expect = {
            r["lang"]: (r["n_tokens"], r["n_distinct"], r["entropy"], r["eff_vocab"])
            for r in token_entropy(pdf, group_cols=["lang"]).collect()
        }
        for lang, vals in expect.items():
            g = got[(e, lang)]
            assert g[0] == vals[0] and g[1] == vals[1]
            assert abs(g[2] - vals[2]) < 1e-12
            assert abs(g[3] - vals[3]) < 1e-12
    # quiet group keeps reporting: de row exists at epoch 1, unchanged
    assert got[(1, "de")][0] == got[(0, "de")][0] == 3


def test_stream_entropy_validates_args(spark):
    from pandera_forge_spark.streaming.text import stream_token_entropy

    df = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="group_cols"):
        stream_token_entropy(df, "/tmp/s", "/tmp/c", [])
    with pytest.raises(ValueError, match="lacks columns"):
        stream_token_entropy(df, "/tmp/s", "/tmp/c", ["ghost"])
