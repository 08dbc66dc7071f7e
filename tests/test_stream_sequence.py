"""Streaming sequence-gap monitor (streaming/sequence.py): multi-epoch
run == batch sequence_gaps over the concatenated input."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.operators.temporal import sequence_gaps
from pandera_forge_spark.streaming import stream_sequence_gaps

SCHEMA = "key string, ts double, id int"

# three epochs cutting each key's timeline in time order; planted:
#  - k1 goes dark through epoch 1 (cross-epoch hole: 40 -> 210)
#  - k2 has an IN-epoch-0 hole (20 -> 100), a boundary-crossing hole
#    (100 -> 190) and a boundary gap below threshold (205 - 190 = 15)
#  - null key rows carry state too (one cross-epoch hole: 30 -> 120)
#  - k4 has a gap exactly == threshold (never emitted)
#  - k3 arrives for the first time in the late-epoch test (no carry)
EPOCHS = [
    [
        ("k1", 10.0, 1), ("k1", 40.0, 2),
        ("k2", 20.0, 3), ("k2", 100.0, 4),
        (None, 30.0, 5),
        ("k4", 0.0, 6),
    ],
    [
        ("k2", 190.0, 7),
        (None, 120.0, 8), (None, 130.0, 9),
        ("k4", 50.0, 10),
    ],
    [
        ("k1", 210.0, 11),
        ("k2", 205.0, 12),
        (None, 140.0, 13),
    ],
]
MIN_GAP = 50.0


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
    writer = stream_sequence_gaps(
        stream,
        os.path.join(root, "state"),
        os.path.join(root, "gaps"),
        ["key"],
        "ts",
        MIN_GAP,
        order_cols=["ts", "id"],
        checkpoint=os.path.join(root, "ckpt"),
    )
    q = writer.trigger(availableNow=True).start()
    assert q.awaitTermination(300), "stream did not finish in 300 s"
    return spark.read.parquet(os.path.join(root, "gaps", "__epoch=*"))


@pytest.fixture(scope="module")
def run(spark):
    root = tempfile.mkdtemp(prefix="pfs_sgap_")
    src = _write_epochs(spark, root, EPOCHS)
    got = _run_stream(spark, root, src)
    rows = sorted(
        ((r["key"], r["gap_start"], r["gap_end"], r["gap_seconds"])
         for r in got.collect()),
        key=repr,  # None keys don't order against strings
    )
    yield {"root": root, "src": src, "rows": rows, "spark": spark}
    shutil.rmtree(root, ignore_errors=True)


def test_stream_equals_batch(run, spark):
    allrows = [r for ep in EPOCHS for r in ep]
    batch = sequence_gaps(
        spark.createDataFrame(allrows, SCHEMA),
        ["key"],
        "ts",
        MIN_GAP,
        order_cols=["ts", "id"],
    )
    expected = sorted(
        ((r["key"], r["gap_start"], r["gap_end"], r["gap_seconds"])
         for r in batch.collect()),
        key=repr,
    )
    assert run["rows"] == expected


def test_planted_holes_found_exactly_once(run):
    got = {(k, s, e): g for k, s, e, g in run["rows"]}
    assert got[("k1", 40.0, 210.0)] == 170.0  # cross-epoch, 2 epochs dark
    assert got[("k2", 20.0, 100.0)] == 80.0  # in-epoch hole
    assert got[("k2", 100.0, 190.0)] == 90.0  # boundary-crossing hole
    assert got[(None, 30.0, 120.0)] == 90.0  # null key carries state too
    assert len(run["rows"]) == 4  # k4 (gap == threshold) stays silent


def test_late_epoch_is_incremental(run, spark):
    """A fourth epoch appended to the same checkpoint emits ONLY its own
    holes (computed against carried state), leaving prior sinks
    untouched."""
    root, src = run["root"], run["src"]
    extra = [("k1", 500.0, 14), ("k3", 215.0, 15)]
    stage = os.path.join(root, "stage3")
    spark.createDataFrame(extra, SCHEMA).coalesce(1).write.parquet(stage)
    part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
    os.replace(os.path.join(stage, part), os.path.join(src, "e3.parquet"))
    shutil.rmtree(stage, ignore_errors=True)
    got = _run_stream(spark, root, src)
    rows = sorted(
        ((r["key"], r["gap_start"], r["gap_end"], r["gap_seconds"])
         for r in got.collect()),
        key=repr,  # None keys don't order against strings
    )
    allrows = [r for ep in EPOCHS for r in ep] + extra
    batch = sequence_gaps(
        spark.createDataFrame(allrows, SCHEMA),
        ["key"],
        "ts",
        MIN_GAP,
        order_cols=["ts", "id"],
    )
    expected = sorted(
        ((r["key"], r["gap_start"], r["gap_end"], r["gap_seconds"])
         for r in batch.collect()),
        key=repr,
    )
    assert rows == expected
    # the new epoch contributed exactly the k1 290-second hole
    assert (("k1", 210.0, 500.0, 290.0)) in rows
    assert len(rows) == len(run["rows"]) + 1


def test_stream_monotonic_equals_batch(spark):
    """The ordering-invariant twin over the same epoch-state kernel: a
    counter resetting ACROSS batches surfaces in the later batch."""
    from pandera_forge_spark.operators.temporal import monotonic_violations
    from pandera_forge_spark.streaming import stream_monotonic_violations

    epochs = [
        [("k1", 1, 10.0), ("k1", 2, 20.0), ("k2", 3, 5.0), (None, 4, 1.0)],
        [("k1", 5, 15.0), ("k2", 6, 7.0), (None, 7, 0.5)],  # k1 + null reset
        [("k1", 8, 16.0), ("k2", 9, 3.0)],  # k2 resets
    ]
    schema = "key string, seq int, v double"
    root = tempfile.mkdtemp(prefix="pfs_smono_")
    try:
        src = os.path.join(root, "src")
        os.makedirs(src)
        for e, rows in enumerate(epochs):
            stage = os.path.join(root, f"stage{e}")
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(stage)
            part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
            os.replace(os.path.join(stage, part), os.path.join(src, f"e{e}.parquet"))
            shutil.rmtree(stage, ignore_errors=True)
            os.utime(os.path.join(src, f"e{e}.parquet"), (1_000_000_000 + e * 1000,) * 2)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        writer = stream_monotonic_violations(
            stream,
            os.path.join(root, "state"),
            os.path.join(root, "viol"),
            ["key"],
            ["seq"],
            "v",
            checkpoint=os.path.join(root, "ckpt"),
        )
        q = writer.trigger(availableNow=True).start()
        assert q.awaitTermination(300), "stream did not finish in 300 s"
        got = sorted(
            ((r["key"], r["seq"], r["v"], r["prev_v"])
             for r in spark.read.parquet(os.path.join(root, "viol", "__epoch=*")).collect()),
            key=repr,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    allrows = [r for ep in epochs for r in ep]
    batch = monotonic_violations(
        spark.createDataFrame(allrows, schema), ["key"], ["seq"], "v"
    )
    expected = sorted(
        ((r["key"], r["seq"], r["v"], r["prev_v"]) for r in batch.collect()),
        key=repr,
    )
    assert got == expected
    # the three planted cross-epoch resets all surfaced, exactly once
    assert {(k, s) for k, s, _, _ in got} == {("k1", 5), (None, 7), ("k2", 9)}


def test_prior_state_legacy_format_and_markers(spark, tmp_path):
    """review-found pair: (a) ALL-legacy state (keys + __last_ts only)
    must reduce with plain max instead of referencing absent order
    columns; (b) prior-epoch dirs with NO _SUCCESS markers must raise,
    not silently drop every carry."""
    from pandera_forge_spark.streaming.sequence import _prior_state

    root = str(tmp_path / "state")
    legacy = spark.createDataFrame(
        [("k1", 10.0), ("k1", 99.0), ("k2", 5.0)], "key string, __last_ts double"
    )
    legacy.write.parquet(f"{root}/last_epochs/__epoch=0")
    st = _prior_state(spark, root, 1, ["key"], ["ts", "id"])
    got = {r["key"]: r["__last"] for r in st.collect()}
    assert got == {"k1": 99.0, "k2": 5.0}
    # strip the commit marker -> loud, not silent-empty
    import os

    os.remove(f"{root}/last_epochs/__epoch=0/_SUCCESS")
    with pytest.raises(RuntimeError, match="_SUCCESS"):
        _prior_state(spark, root, 1, ["key"], ["ts", "id"])


def test_stream_monitor_reserved_names_are_loud(spark, tmp_path):
    from pandera_forge_spark.streaming import (
        stream_monotonic_violations,
        stream_sequence_gaps,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    stream = (
        spark.readStream.schema("key string, ts double, __prev double")
        .parquet(src)
    )
    with pytest.raises(ValueError, match="collide"):
        stream_sequence_gaps(stream, "/tmp/x", "/tmp/y", ["key"], "ts", 10.0)
    stream2 = (
        spark.readStream.schema("key string, seq int, v double, prev_v double")
        .parquet(src)
    )
    with pytest.raises(ValueError, match="collide"):
        stream_monotonic_violations(
            stream2, "/tmp/x", "/tmp/y", ["key"], ["seq"], "v"
        )


# ---------------------------------------------------------------------------
# stream_lateness
# ---------------------------------------------------------------------------

from pandera_forge_spark.operators.temporal import lateness_census
from pandera_forge_spark.streaming import stream_lateness

LATE_SCHEMA = "key string, arr long, ts double"

# arrival-ordered epochs; planted: k1's epoch-1 rows are late vs the
# epoch-0 high watermark (cross-epoch carry), k2 stays in order, the
# NULL-ts / NULL-arr rows must be ignored
LATE_EPOCHS = [
    [("k1", 0, 100.0), ("k1", 1, 40.0), ("k2", 0, 10.0), ("k2", 1, 20.0)],
    [("k1", 2, 30.0), ("k1", 3, 200.0), ("k2", 2, 15.0),
     ("k1", 4, None), ("k2", None, 99.0)],
    [("k1", 5, 190.0), ("k2", 3, 400.0)],
]


def test_stream_lateness_equals_batch(spark, tmp_path):
    """Multi-epoch foreachBatch == batch lateness_census over the
    concatenated arrival-ordered input: per-key sums of epoch censuses
    match n_events and late counts, max of max_late_us matches."""
    import os
    import shutil

    root = str(tmp_path)
    src = os.path.join(root, "src")
    os.makedirs(src, exist_ok=True)
    for e, rows in enumerate(LATE_EPOCHS):
        stage = os.path.join(root, f"stage{e}")
        spark.createDataFrame(rows, LATE_SCHEMA).coalesce(1).write.parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        os.replace(os.path.join(stage, part), os.path.join(src, f"e{e}.parquet"))
        shutil.rmtree(stage, ignore_errors=True)
        os.utime(os.path.join(src, f"e{e}.parquet"),
                 (1_000_000_000 + e * 1000,) * 2)
    stream = (
        spark.readStream.schema(LATE_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    writer = stream_lateness(
        stream,
        os.path.join(root, "state"),
        os.path.join(root, "sink"),
        ["key"], "ts", "arr", thresholds=[10, 100],
        checkpoint=os.path.join(root, "ckpt"),
    )
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)
    got = (
        spark.read.parquet(os.path.join(root, "sink", "__epoch=*"))
        .groupBy("key")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.max("max_late_us").alias("max_late_us"),
            F.sum("late_10s").alias("late_10s"),
            F.sum("late_100s").alias("late_100s"),
        )
    )
    allrows = [r for ep in LATE_EPOCHS for r in ep]
    batch = lateness_census(
        spark.createDataFrame(allrows, LATE_SCHEMA),
        "ts", "arr", ["key"], thresholds=[10, 100],
    )
    g = {r["key"]: tuple(r)[1:] for r in got.collect()}
    b = {r["key"]: tuple(r)[1:] for r in batch.collect()}
    assert g == b
    # planted sanity: k1's epoch-1 row at ts=30 is 70 s behind hw=100
    assert b["k1"][2] >= 2  # late_10s: ts=40 (60s) and ts=30 (70s), ts=190 (10s? no: 200-190=10 NOT >10)


def test_stream_lateness_fences(spark, tmp_path):
    df = spark.createDataFrame([("k", 0, 1.0)], LATE_SCHEMA)
    with pytest.raises(ValueError, match="thresholds"):
        stream_lateness(df, str(tmp_path), str(tmp_path), ["key"], "ts",
                        "arr", thresholds=[])
    with pytest.raises(ValueError, match="unique"):
        stream_lateness(df, str(tmp_path), str(tmp_path), ["key"], "ts",
                        "arr", thresholds=[5, 5])
    with pytest.raises(ValueError, match="key_cols"):
        stream_lateness(df, str(tmp_path), str(tmp_path), [], "ts", "arr")
    with pytest.raises(ValueError, match="internal working"):
        stream_lateness(df.withColumn("__hw", F.lit(1)), str(tmp_path),
                        str(tmp_path), ["key"], "ts", "arr")
