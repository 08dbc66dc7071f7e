"""Streaming p-chart monitor (streaming/rates.py): epoch-N chart ==
batch rate_control_chart over epochs 0..N concatenated; quiet keys
keep reporting; replay-safe epoch state."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.streaming import stream_rate_chart
from pandera_forge_spark.validator import rate_control_chart

SCHEMA = "src string, viol boolean, id int"

# three epochs; planted:
#  - src "bad" runs hot (50%) vs the pool (~5%) -> flags once enough
#    cumulative evidence exists
#  - src "quiet" appears only in epoch 0 -> must still chart in 1, 2
#  - null verdicts never count
def _epochs():
    eps = []
    for e in range(3):
        rows = []
        for i in range(200):
            rows.append(("a", i % 20 == 0, e * 1000 + i))
        for i in range(40):
            rows.append(("bad", i % 2 == 0, e * 1000 + 500 + i))
        if e == 0:
            rows += [("quiet", False, 900 + i) for i in range(60)]
        rows.append(("a", None, e * 1000 + 999))
        eps.append(rows)
    return eps


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
    writer = stream_rate_chart(
        stream,
        os.path.join(root, "state"),
        os.path.join(root, "chart"),
        "viol",
        ["src"],
        include_ok=True,
        checkpoint=os.path.join(root, "ckpt"),
    )
    q = writer.trigger(availableNow=True).start()
    assert q.awaitTermination(300), "stream did not finish in 300 s"


def _key(rows):
    return sorted(tuple(r) for r in rows)


def test_epoch_chart_equals_batch_prefix(spark, tmp_path):
    root = str(tmp_path)
    epochs = _epochs()
    src = _write_epochs(spark, root, epochs)
    _run(spark, root, src)
    for e in range(3):
        got = spark.read.parquet(os.path.join(root, "chart", f"__epoch={e}"))
        prefix = [r for rows in epochs[: e + 1] for r in rows]
        batch = rate_control_chart(
            spark.createDataFrame(prefix, SCHEMA),
            "viol",
            ["src"],
            include_ok=True,
        )
        assert _key(got.collect()) == _key(batch.collect()), f"epoch {e}"
    # the hot key ends out-of-control; quiet key still charts at epoch 2
    final = {r["src"]: r for r in spark.read.parquet(
        os.path.join(root, "chart", "__epoch=2")
    ).collect()}
    assert final["bad"]["status"] == "high"
    assert "quiet" in final
    assert final["a"]["n_rows"] == 600  # null verdicts never counted


def test_replay_is_idempotent(spark, tmp_path):
    from pandera_forge_spark.streaming.rates import _prior_counts

    root = str(tmp_path)
    epochs = _epochs()
    src = _write_epochs(spark, root, epochs)
    _run(spark, root, src)
    before = _key(
        spark.read.parquet(os.path.join(root, "chart", "__epoch=2")).collect()
    )
    # re-derive epoch 2 by hand from state below 2 + its own batch —
    # the exact foreachBatch retry path
    from pandera_forge_spark.streaming.rates import stream_rate_chart as _  # noqa
    prior = _prior_counts(spark, os.path.join(root, "state"), 2)
    assert prior is not None
    # e0 has {a, bad, quiet} (3 rows); e1 has {a, bad} (2) -> 5 total
    assert prior.count() == 5
    local2 = (
        spark.createDataFrame(_epochs()[2], SCHEMA)
        .where(F.col("viol").isNotNull())
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("viol").cast("long")).alias("n_violations"),
        )
    )
    from pandera_forge_spark.validator import _chart_from_counts

    merged = (
        local2.unionByName(prior.select(*local2.columns))
        .groupBy("src")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("n_violations").alias("n_violations"),
        )
    )
    rederived = _chart_from_counts(merged, ["src"], 3, 30, True)
    assert _key(rederived.collect()) == before
