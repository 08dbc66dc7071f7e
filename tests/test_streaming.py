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


def test_windowed_verdicts_watermark_late_data(spark, tmp_path):
    """Event-time windows with a watermark, asserting the guarantees
    Structured Streaming actually provides: (a) late rows arriving
    while the watermark (as of the PREVIOUS batch's end — that is what
    the engine filters with) still covers their window are folded in;
    (b) append mode emits each closed window exactly once; (c) a row
    arriving after the watermark passed its window is dropped — no
    duplicate window row, no stray re-emission."""
    from pandera_forge_spark.streaming import windowed_verdicts

    src = str(tmp_path / "ts_src")
    mtime = [1_700_000_000]

    def write(rows):
        import os
        from pathlib import Path

        spark.createDataFrame(
            rows, "id long, ts timestamp, value double"
        ).coalesce(1).write.mode("append").parquet(src)
        # the file source orders micro-batches by modification time;
        # same-second writes would tie and process in arbitrary order,
        # so pin strictly increasing mtimes per arrival
        mtime[0] += 60
        for f in Path(src).glob("*.parquet"):
            if f.stat().st_mtime > mtime[0] - 30:
                os.utime(f, (mtime[0], mtime[0]))

    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    # batch 1: window [0,10) — 3 rows, one violation (value 150 > le=100)
    write([(1, ts(1), 10.0), (2, ts(2), 150.0), (3, ts(5), 20.0)])
    # batch 2: one LATE row for window [0,10) (filter watermark still at
    # 0) with a violation, plus rows at minute 30/31 that will advance
    # the watermark to 21 at this batch's end
    write([(4, ts(6), 150.0), (5, ts(30), 10.0), (6, ts(31), 99.0)])
    # batch 3: a second late row for [0,10): batch 2's END watermark is
    # 21, but the engine filters batch 3 with... also 21 — window [0,10)
    # was already emitted at batch 2's end, so this row MUST be dropped,
    # not resurrect the closed window's state
    write([(7, ts(3), 150.0), (8, ts(32), 10.0)])
    # batch 4: one more too-late row, long after the window closed
    write([(9, ts(4), 150.0), (10, ts(33), 10.0)])

    stream = (
        spark.readStream.schema("id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = windowed_verdicts(
        stream, _schema(), "ts", window_duration="10 minutes",
        watermark="10 minutes",
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wv")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_wv"))
        .start()
    )
    q.awaitTermination(120)

    out = spark.sql("select * from wv").collect()
    # exactly ONE emission, for the one closed window [0,10) — the
    # too-late rows of batches 3/4 neither re-opened it nor re-emitted
    assert len(out) == 1
    r = out[0]
    assert r["window"]["start"].minute == 0
    # batch-1's 3 rows + batch-2's in-bound late row; the engine
    # filtered batch-2's input with the pre-batch watermark (0), so id 4
    # is included. Whether batch-3's id 7 lands before eviction is
    # engine-internal timing — what IS guaranteed is batch 4's id 9 got
    # dropped (watermark 21 covered [0,10) before that batch started),
    # so the count is 4 or 5, never 6.
    assert r["__rows__"] in (4, 5)
    assert r["value__le"] == r["__rows__"] - 2  # violations track the extras
    # open windows (minute 30+) must NOT have emitted
    assert all(row["window"]["start"].minute == 0 for row in out)


def test_stream_sketch_profile_matches_one_shot(spark, src, tmp_path):
    """Sketch rows appended per micro-batch must merge to the SAME
    profile as one-shot sketching of everything that arrived — the
    continuous-profiling invariant (exact fields + HLL identical)."""
    from pandera_forge_spark.sketches import merge_sketches, partition_sketches
    from pandera_forge_spark.streaming.validate import stream_sketch_profile

    stream = (
        spark.readStream.schema("id long, value double, part long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    store = str(tmp_path / "sketch_store")
    writer = stream_sketch_profile(
        stream, store, ["part"], ["value"],
        checkpoint=str(tmp_path / "sk_ckpt"),
    )
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)

    arrived = spark.read.parquet(store)
    # multiple epochs landed (one per file trigger)
    assert arrived.select("__epoch").distinct().count() >= 2

    got = merge_sketches(arrived.drop("__epoch")).collect()[0]
    full = spark.read.parquet(src)
    want = merge_sketches(partition_sketches(full, ["part"], ["value"])).collect()[0]
    assert got["__rows"] == want["__rows"] == full.count()
    assert got["value__nulls"] == want["value__nulls"]
    assert got["value__min"] == want["value__min"]
    assert got["value__max"] == want["value__max"]
    assert got["value__distinct_est"] == want["value__distinct_est"]


def test_stream_drift_flags_shifted_epoch(spark, tmp_path):
    """Two arrivals: one drawn from the baseline distribution, one
    shifted +60. The shifted micro-batch's epoch rows must flag
    drifted=True; the in-distribution epoch must not. Per-epoch drift
    equals the batch drift of that file alone (state-free scoring)."""
    from pandera_forge_spark.drift import baseline_summary, drift_verdicts
    from pandera_forge_spark.streaming.validate import stream_drift

    base = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 100).cast("double").alias("value"),
        F.lit(0).alias("part"),
    )
    baseline = baseline_summary(base, "value")

    p = str(tmp_path / "dsrc")
    ok = spark.range(0, 500).select(
        F.col("id"), (F.col("id") % 100).cast("double").alias("value"),
        F.lit(0).alias("part"),
    )
    shifted = spark.range(500, 1000).select(
        F.col("id"), ((F.col("id") % 100) + 60).cast("double").alias("value"),
        F.lit(0).alias("part"),
    )
    ok.coalesce(1).write.parquet(p, mode="overwrite")
    shifted.coalesce(1).write.mode("append").parquet(p)

    stream = (
        spark.readStream.schema("id long, value double, part long")
        .option("maxFilesPerTrigger", "1")
        .parquet(p)
    )
    sink = str(tmp_path / "drift_out")
    writer = stream_drift(
        stream, "value", baseline, sink, group_cols=["part"],
        checkpoint=str(tmp_path / "dckpt"),
    )
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)

    out = spark.read.parquet(sink)
    rows = {r["__epoch"]: r for r in out.collect()}
    assert len(rows) == 2
    flags = sorted(r["drifted"] for r in rows.values())
    assert flags == [False, True]
    # the drifted epoch is the one whose n==500 shifted rows score high PSI
    drifted = [r for r in rows.values() if r["drifted"]][0]
    assert drifted["psi"] > 0.2
    # state-free: per-epoch result == batch drift of that file alone
    want = drift_verdicts(shifted, "value", ["part"], baseline).collect()[0]
    assert abs(drifted["psi"] - want["psi"]) < 1e-9
    assert abs(drifted["ks"] - want["ks"]) < 1e-9


def test_stream_drift_categorical_flags_shifted_mix(spark, tmp_path):
    """Categorical mode: baseline is 50/50 a/b; one arrival keeps the
    mix, the other is all-'c' (unseen category -> OTHER mass). Only
    the shifted epoch flags."""
    from pandera_forge_spark.drift import categorical_baseline
    from pandera_forge_spark.streaming.validate import stream_drift

    base = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(1000)], "id long, cat string"
    ).withColumn("part", F.lit(0))
    baseline = categorical_baseline(base, "cat")

    p = str(tmp_path / "csrc")
    ok = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(400)], "id long, cat string"
    ).withColumn("part", F.lit(0))
    shifted = spark.createDataFrame(
        [(i + 1000, "c") for i in range(400)], "id long, cat string"
    ).withColumn("part", F.lit(0))
    ok.coalesce(1).write.parquet(p, mode="overwrite")
    shifted.coalesce(1).write.mode("append").parquet(p)

    stream = (
        spark.readStream.schema("id long, cat string, part int")
        .option("maxFilesPerTrigger", "1")
        .parquet(p)
    )
    sink = str(tmp_path / "cdrift")
    q = stream_drift(
        stream, "cat", baseline, sink, group_cols=["part"],
        checkpoint=str(tmp_path / "cck"), categorical=True,
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 2
    assert sorted(r["drifted"] for r in rows) == [False, True]


def test_stream_near_dedup_cross_batch(spark, tmp_path):
    """The streaming twin of incremental near-dedup: planted cross-batch
    near-dups are found EXACTLY once, in the epoch their second member
    arrives; within-batch and unrelated docs match nothing; a replayed
    epoch re-derives identical matches and its index append does not
    duplicate (per-epoch overwrite)."""
    import os

    from pandera_forge_spark.operators.dedup import probe_band_index
    from pandera_forge_spark.streaming import stream_near_dedup

    BASE = "the quick brown fox jumps over the lazy dog near the river bank today"
    OTHER = "completely unrelated text about spark distributed query engines and parquet"
    epochs = [
        [("d1", BASE), ("d2", OTHER)],
        [("d101", BASE + " x"), ("d102", "some fresh totally new content words")],
        [("d201", BASE + " y"), ("d202", "more novel sentences that match nothing else at all")],
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(epochs):
        stage = str(tmp_path / f"e{i}")
        spark.createDataFrame(rows, "doc_id string, text string").coalesce(
            1
        ).write.parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        dst = src / f"epoch{i}.parquet"
        os.rename(f"{stage}/{part}", dst)
        os.utime(dst, (1_000_000_000 + i * 1000,) * 2)  # force epoch order

    stream = (
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    idx = str(tmp_path / "band_idx")
    sink = str(tmp_path / "matches")
    writer = stream_near_dedup(
        stream, idx, sink, text_col="text", id_col="doc_id",
        threshold=0.5, max_bucket=None,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(180)

    rows = spark.read.parquet(f"{sink}/__epoch=*").collect()
    got = sorted((r["new_id"], r["corpus_id"]) for r in rows)
    # exactly once each: d101~d1 in epoch 1; d201~{d1, d101} in epoch 2
    assert got == [("d101", "d1"), ("d201", "d1"), ("d201", "d101")]
    assert all(r["jaccard"] >= 0.5 for r in rows)

    # replay epoch 2: probing with max_epoch=2 excludes its own append,
    # so the matches are byte-identical to what the stream recorded
    batch2 = spark.createDataFrame(epochs[2], "doc_id string, text string")
    replay = probe_band_index(
        spark, idx, batch2, "text", "doc_id",
        threshold=0.5, max_bucket=None, max_epoch=2,
    )
    replay_pairs = sorted(
        (r["new_id"], r["corpus_id"]) for r in replay.collect()
    )
    assert replay_pairs == [("d201", "d1"), ("d201", "d101")]
    replay.unpersist()

    # replayed append overwrites, never duplicates
    from pandera_forge_spark.operators.dedup import append_band_index_epoch

    before = spark.read.parquet(f"{idx}/bands_epochs/__epoch=2").count()
    append_band_index_epoch(batch2, idx, 2, "text", "doc_id")
    after = spark.read.parquet(f"{idx}/bands_epochs/__epoch=2").count()
    assert before == after


def test_stream_sessions_matches_batch(spark, tmp_path):
    """Native session_window streaming sessionization emits the same
    sessions the batch lag+running-sum operator derives (same gap
    rule): per (key, session) the event counts and first/last event
    times agree, and session_end = last_event + gap."""
    import datetime as dt

    from pandera_forge_spark.operators.temporal import session_stats
    from pandera_forge_spark.streaming import stream_sessions

    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def t(sec):
        return base + dt.timedelta(seconds=sec)

    rows = [
        ("u1", t(0)), ("u1", t(100)),          # session 0
        ("u1", t(4000)), ("u1", t(4100)),      # session 1 (gap 3900 > 3600)
        ("u1", t(9000)),                       # session 2
        ("u2", t(50)),                         # session 0
        # watermark flush: append mode emits a session only once the
        # watermark passes its close; this far-future event advances it
        # (its own still-open session must NOT emit)
        ("zz", t(1_000_000)),
    ]
    src = str(tmp_path / "sess_src")
    spark.createDataFrame(rows, "user string, ts timestamp").write.parquet(src)

    stream = spark.readStream.schema("user string, ts timestamp").parquet(src)
    sess = stream_sessions(stream, "user", "ts", gap_seconds=3600.0,
                           watermark="0 seconds")
    q = (
        sess.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.sql("SELECT * FROM sess_out").collect()
    assert all(r["user"] != "zz" for r in emitted)  # open session held back
    got = {
        (r["user"], r["first_event"]): (
            r["n_events"], r["last_event"], r["session_end"]
        )
        for r in emitted
    }

    batch = [
        b
        for b in session_stats(
            spark.read.parquet(src), "user", "ts", gap_seconds=3600.0
        ).collect()
        if b["user"] != "zz"
    ]
    assert len(got) == len(batch) == 4
    for b in batch:
        # batch start_ts is epoch seconds; rebuild the timestamp
        first = dt.datetime.utcfromtimestamp(b["start_ts"])
        key = (b["user"], first)
        assert key in got, (key, sorted(got))
        n, last, end = got[key]
        assert n == b["n_events"]
        assert last == dt.datetime.utcfromtimestamp(b["end_ts"])
        assert (end - last).total_seconds() == 3600.0  # end = last + gap


def test_stream_contamination_stateless_matches_batch(spark, tmp_path):
    """The stateless streaming leak screen must (a) run append-mode
    with NO state store in the plan, and (b) for UNIQUE doc_ids (the
    normal ingest contract) produce exactly the batch
    contamination_bloom rows once all epochs drain — per-doc results
    are row-local, so with unique ids streaming vs batch is a pure
    re-partitioning of the same computation (a RE-ARRIVING id would
    instead emit one row per arrival; documented divergence)."""
    import os

    from pandera_forge_spark.operators.text import contamination_bloom
    from pandera_forge_spark.streaming.text import stream_contamination

    LEAK = "which planet is known as the red planet in our solar system"
    epochs = [
        [(1, LEAK), (2, "ordinary training text about cooking pasta at home")],
        [(3, "the red planet quiz says: " + LEAK), (4, "unrelated words entirely")],
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(epochs):
        stage = str(tmp_path / f"e{i}")
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        os.rename(f"{stage}/{part}", src / f"epoch{i}.parquet")

    bench = spark.createDataFrame([(LEAK,)], "text string")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    screened = stream_contamination(stream, bench, "text", "doc_id")
    assert screened.isStreaming
    q = (
        screened.writeStream.format("memory")
        .queryName("contamination_screen")
        .outputMode("append")  # stateless: append works with no watermark
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # stateless for real: the streaming progress reports zero state
    # operators (a groupBy-based screen would show one here)
    assert q.lastProgress["stateOperators"] == []

    got = {
        r["doc_id"]: (r["n_shingles"], r["n_contaminated"])
        for r in spark.table("contamination_screen").collect()
    }
    all_docs = spark.createDataFrame(
        [r for e in epochs for r in e], "doc_id long, text string"
    )
    want = {
        r["doc_id"]: (r["n_shingles"], r["n_contaminated"])
        for r in contamination_bloom(all_docs, bench, "text", "doc_id").collect()
    }
    assert got == want
    # the planted leak is fully contaminated; the pasta doc is not
    assert got[1][1] == got[1][0]
    assert got[2][1] < got[2][0]


def test_stream_near_dedup_reinit_clears_stale_epochs(spark, tmp_path):
    """Restarting a stream with a FRESH checkpoint restarts epoch ids at
    0, re-entering the init path against the existing index; the init
    must clear the PRIOR stream's bands_epochs/shingles_epochs appends,
    or later probes silently union stale corpus rows and emit matches
    against documents that are no longer part of the standing corpus."""
    import os

    from pandera_forge_spark.streaming import stream_near_dedup

    BASE = "the quick brown fox jumps over the lazy dog near the river bank today"

    def write_epochs(src, epochs):
        src.mkdir()
        for i, rows in enumerate(epochs):
            stage = str(src) + f".stage{i}"
            spark.createDataFrame(rows, "doc_id string, text string").coalesce(
                1
            ).write.parquet(stage)
            part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
            dst = src / f"epoch{i}.parquet"
            os.rename(f"{stage}/{part}", dst)
            os.utime(dst, (1_000_000_000 + i * 1000,) * 2)

    def run(src, sink, ckpt):
        stream = (
            spark.readStream.schema("doc_id string, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = stream_near_dedup(
            stream, idx, sink, text_col="text", id_col="doc_id",
            threshold=0.5, max_bucket=None, checkpoint=str(ckpt),
        ).trigger(availableNow=True).start()
        q.awaitTermination(180)

    idx = str(tmp_path / "idx")
    # first stream: d1 in epoch 0 (init), d101 ~ d1 appended at epoch 1,
    # d201 ~ d1 appended at epoch 2
    write_epochs(tmp_path / "src1", [
        [("d1", BASE)],
        [("d101", BASE + " x")],
        [("d201", BASE + " y")],
    ])
    sink1 = str(tmp_path / "matches1")
    run(tmp_path / "src1", sink1, tmp_path / "ck1")
    pairs1 = sorted(
        (r["new_id"], r["corpus_id"])
        for r in spark.read.parquet(f"{sink1}/__epoch=*").collect()
    )
    assert pairs1 == [("d101", "d1"), ("d201", "d1"), ("d201", "d101")]

    # second stream, FRESH checkpoint (epoch ids restart at 0), same
    # index: a SINGLE epoch, so it only re-initializes — the prior
    # stream's bands_epochs/__epoch=1,2 appends (d101, d201) are never
    # overwritten by new epochs and, without the init-path clear, stay
    # unioned into every later probe of the index
    write_epochs(tmp_path / "src2", [
        [("e0", "completely unrelated corpus about distributed query engines")],
    ])
    sink2 = str(tmp_path / "matches2")
    run(tmp_path / "src2", sink2, tmp_path / "ck2")

    # batch probe (max_epoch=None unions ALL epoch dirs): the query doc
    # is a near-dup of the FIRST stream's d101/d201 and of nothing in
    # the re-initialized corpus — any match is a stale-index leak
    from pandera_forge_spark.operators.dedup import probe_band_index

    q = spark.createDataFrame(
        [("q1", BASE + " x z")], "doc_id string, text string"
    )
    leaked = probe_band_index(
        spark, idx, q, "text", "doc_id", threshold=0.5, max_bucket=None
    )
    rows2 = leaked.collect()
    leaked.unpersist()
    assert rows2 == [], f"stale-index matches leaked: {rows2}"
