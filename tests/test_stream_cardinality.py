"""Streaming cardinality monitor (streaming/cardinality.py): per-epoch
running distinct census == exact prefix distinct counts while the
sketch is unsaturated; estimator regime == the batch KMV estimate of
the same prefix; quiet keys keep reporting."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.streaming import stream_cardinality

SCHEMA = "key string, val string, id int"

# three epochs; planted:
#  - key a: values overlap across epochs (v1 repeats) -> running
#    distinct 2, 3, 4 (NOT 2, 4, 6)
#  - key b: present only in epoch 0 -> must still report in 1 and 2
#  - null key: groups null-safely, grows 1 -> 2
#  - null value in epoch 1 never counts
EPOCHS = [
    [
        ("a", "v1", 1), ("a", "v2", 2),
        ("b", "x1", 3), ("b", "x2", 4),
        (None, "n1", 5),
    ],
    [
        ("a", "v1", 6), ("a", "v3", 7),
        ("a", None, 8),
        (None, "n2", 9),
    ],
    [
        ("a", "v4", 10),
    ],
]

# exact running distinct per (epoch, key)
EXPECT = {
    (0, "a"): 2, (0, "b"): 2, (0, None): 1,
    (1, "a"): 3, (1, "b"): 2, (1, None): 2,
    (2, "a"): 4, (2, "b"): 2, (2, None): 2,
}


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


def _run(spark, root, src, k=256):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    writer = stream_cardinality(
        stream,
        os.path.join(root, "state"),
        os.path.join(root, "census"),
        ["key"],
        "val",
        k=k,
        checkpoint=os.path.join(root, "ckpt"),
    )
    q = writer.trigger(availableNow=True).start()
    assert q.awaitTermination(300), "stream did not finish in 300 s"
    return spark.read.option("basePath", os.path.join(root, "census")).parquet(
        os.path.join(root, "census", "__epoch=*")
    )


@pytest.fixture(scope="module")
def census(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stream_card"))
    src = _write_epochs(spark, root, EPOCHS)
    return _run(spark, root, src).collect()


def test_running_distinct_exact_per_epoch(census):
    got = {
        (r["__epoch"], r["key"]): r["distinct_exact"] for r in census
    }
    assert got == EXPECT


def test_quiet_keys_keep_reporting(census):
    # b sends nothing after epoch 0 but appears in every census
    assert {(r["__epoch"]) for r in census if r["key"] == "b"} == {0, 1, 2}


def test_exact_regime_flags(census):
    for r in census:
        assert r["distinct_exact"] is not None  # k=256 never saturates
        assert r["sketch_size"] == r["distinct_exact"]
        assert r["distinct_est"] == float(r["distinct_exact"])


def test_saturated_regime_matches_batch_kmv(spark, tmp_path):
    from pandera_forge_spark.sketches import kmv_estimate, kmv_partition_sketch

    # k=2 saturates immediately for key a; the epoch-2 estimate must
    # equal the batch sketch estimate over the WHOLE concatenated input
    root = str(tmp_path)
    src = _write_epochs(spark, root, EPOCHS)
    out = _run(spark, root, src, k=2)
    last = {
        r["key"]: r
        for r in out.where(F.col("__epoch") == 2).collect()
    }
    assert last["a"]["distinct_exact"] is None  # saturated -> NULL
    whole = spark.createDataFrame(
        [r for e in EPOCHS for r in e], SCHEMA
    )
    batch = {
        r["key"]: r
        for r in kmv_estimate(
            kmv_partition_sketch(whole, "val", ["key"], k=2)
        ).collect()
    }
    for key in ("a", "b", None):
        assert last[key]["distinct_est"] == batch[key]["distinct_est"]
        assert last[key]["sketch_size"] == batch[key]["sketch_size"]


def test_guards(spark):
    df = spark.createDataFrame([("a", "v", 1)], SCHEMA)
    with pytest.raises(ValueError, match="key_cols"):
        stream_cardinality(df, "/tmp/s", "/tmp/o", [], "val")
    with pytest.raises(ValueError, match="lacks columns"):
        stream_cardinality(df, "/tmp/s", "/tmp/o", ["key"], "nope")
    with pytest.raises(ValueError, match="collide with internal"):
        stream_cardinality(
            df.withColumn("__kmv", F.lit(1)), "/tmp/s", "/tmp/o",
            ["key"], "val",
        )


def test_late_epoch_extends_the_carry(spark, tmp_path):
    # run 3 epochs, then a 4th file arrives: only epoch 3 is processed
    # (same checkpoint) and its census covers all four epochs' values
    root = str(tmp_path)
    src = _write_epochs(spark, root, EPOCHS)
    _run(spark, root, src)
    late = [("a", "v9", 14), ("c", "fresh", 15)]
    _write_epochs(spark, root, EPOCHS + [late])
    out = _run(spark, root, src)
    got = {
        (r["__epoch"], r["key"]): r["distinct_exact"] for r in out.collect()
    }
    assert got[(3, "a")] == 5  # v1..v4 + v9
    assert got[(3, "c")] == 1  # first-seen key
    assert got[(3, "b")] == 2  # quiet key still carried
    # earlier epochs were not rewritten
    assert got[(2, "a")] == 4
