"""Streaming CUSUM monitor (streaming/sequence.py stream_cusum):
multi-epoch run == batch cusum_scores alerts over the concatenated
input, and a replayed epoch rewrites identical output."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.operators.temporal import cusum_scores
from pandera_forge_spark.streaming import stream_cusum

SCHEMA = "key string, ts double, value double, id int"

# three epochs cutting each key's timeline in time order; planted:
#  - k1 drifts +3 above target from epoch 1 on — the evidence builds
#    ACROSS epochs and crosses the threshold mid-epoch 2
#  - k2 stays in band (never alerts) but has NULL values sprinkled in
#  - k3 crashes low inside one epoch (alerts low within epoch 2)
EPOCHS = [
    [
        ("k1", 10.0, 10.0, 1), ("k1", 20.0, 11.0, 2),
        ("k2", 10.0, 10.0, 3), ("k2", 20.0, None, 4),
        ("k3", 10.0, 10.0, 5),
    ],
    [
        ("k1", 110.0, 13.0, 6), ("k1", 120.0, 13.0, 7),
        ("k2", 110.0, 9.0, 8),
        ("k3", 110.0, 10.0, 9),
    ],
    [
        ("k1", 210.0, 13.0, 10), ("k1", 220.0, 13.0, 11),
        ("k2", 210.0, None, 12), ("k2", 220.0, 11.0, 13),
        ("k3", 210.0, 1.0, 14), ("k3", 220.0, 1.0, 15),
    ],
]
TARGET, SLACK, THRESHOLD = 10.0, 0.5, 4.0


def _write_epochs(spark, root, epochs):
    src = os.path.join(root, "src")
    os.makedirs(src, exist_ok=True)
    for e, rows in enumerate(epochs):
        stage = os.path.join(root, f"stage{e}")
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        os.replace(os.path.join(stage, part), os.path.join(src, f"e{e}.parquet"))
        shutil.rmtree(stage, ignore_errors=True)
        os.utime(
            os.path.join(src, f"e{e}.parquet"), (1_000_000_000 + e * 1000,) * 2
        )
    return src


def _run_stream(spark, root, src):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    writer = stream_cusum(
        stream,
        os.path.join(root, "state"),
        os.path.join(root, "alerts"),
        "key",
        "ts",
        "value",
        target=TARGET,
        slack=SLACK,
        threshold=THRESHOLD,
        order_col="id",
        checkpoint=os.path.join(root, "ckpt"),
    )
    q = writer.trigger(availableNow=True).start()
    assert q.awaitTermination(300), "stream did not finish in 300 s"
    return spark.read.parquet(os.path.join(root, "alerts", "__epoch=*"))


def _batch_alerts(spark):
    df = spark.createDataFrame(
        [r for rows in EPOCHS for r in rows], SCHEMA
    )
    out = cusum_scores(
        df, key_col="key", ts_col="ts", value_col="value",
        target=TARGET, slack=SLACK, threshold=THRESHOLD, order_col="id",
    )
    return out.where("is_alert").select(
        "key", "ts", "id", "value", "cusum_high", "cusum_low"
    )


@pytest.fixture(scope="module")
def streamed(spark):
    root = tempfile.mkdtemp(prefix="pfs_scusum_")
    try:
        src = _write_epochs(spark, root, EPOCHS)
        got = _run_stream(spark, root, src).collect()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return got


def _key(rows):
    return sorted(
        (r["key"], r["ts"], r["id"], r["value"], r["cusum_high"], r["cusum_low"])
        for r in rows
    )


def test_stream_equals_batch(spark, streamed):
    batch = _batch_alerts(spark).collect()
    assert _key(streamed) == _key(batch)
    assert len(batch) > 0  # the plant actually alerts


def test_cross_epoch_accumulation(streamed):
    # k1's evidence is (13 - 10.5) = 2.5 per row from epoch 1 on; the
    # first row of epoch 1 reaches only 3.0 WITH the carried 0.5 from
    # epoch 0, and the second (id 7) crosses 4 at 5.5 — so id 7 alerts
    # iff the epoch-0 state carried, and epoch 2's rows (ids 10, 11)
    # keep accumulating from 5.5, not from 0
    k1 = [r for r in streamed if r["key"] == "k1"]
    assert {r["id"] for r in k1} == {7, 10, 11}
    # k3's low-side crash alerts on the second low row (8 + 8 > 4
    # after two 1.0 rows against target-slack 9.5)
    k3 = [r for r in streamed if r["key"] == "k3"]
    assert all(r["cusum_low"] > THRESHOLD for r in k3)
    assert not any(r["key"] == "k2" for r in streamed)


def test_replay_rewrites_identically(spark):
    root = tempfile.mkdtemp(prefix="pfs_scusum_rp_")
    try:
        src = _write_epochs(spark, root, EPOCHS)
        first = _run_stream(spark, root, src).collect()
        # wipe the checkpoint: every epoch replays against the SAME
        # state dirs (reads strictly below own id, overwrites its own)
        shutil.rmtree(os.path.join(root, "ckpt"), ignore_errors=True)
        second = _run_stream(spark, root, src).collect()
        assert _key(first) == _key(second)
    finally:
        shutil.rmtree(root, ignore_errors=True)
