"""Streaming sequence monitors: freshness gaps and ordering
regressions, continuously.

The streaming twins of ``operators/temporal.sequence_gaps`` and
``operators/temporal.monotonic_violations``: each micro-batch checks
the arriving rows' per-key sequences both WITHIN the batch and ACROSS
the batch boundary, by carrying every key's last row (by the declared
order) from all prior epochs. This is validation run continuously —
the hole between yesterday's last tick and today's first one, or the
counter that reset between two batches, surfaces in the batch where
the second half arrived; a per-batch-only check would miss both.

State is one narrow row per key — the order tuple plus the captured
column of the key's last row BY ``order_cols`` — small and columnar,
so like the dedup band index it lives as epoch-keyed parquet appends
rather than in the state store:

- ``<state_dir>/last_epochs/__epoch=<id>`` — this epoch's per-key last
  row (overwrite; one row per key seen in the batch);
- a batch reads only epochs strictly BELOW its own id (committed dirs
  only) and reduces them per key with the same last-by-order rule — so
  a replayed micro-batch (foreachBatch retry, restart from checkpoint)
  re-derives byte-identical output and can never see its own partial
  append.

Findings land in ``<sink>/__epoch=<id>`` (overwrite): exactly-once per
epoch, same contract as ``streaming/dedup``. Give each monitor its OWN
``state_dir`` — they share the layout, not the content.

Correctness contract: with epochs that cut each key's rows in
``order_cols`` order (the ordered-ingest / watermark assumption every
event-time stream leans on — for a timestamp-led order this also means
NULL timestamps, which sort FIRST, may only appear in a key's first
epoch), the union of all epoch sinks is IDENTICAL to the batch
operator over the concatenated input — the epoch boundary is exactly a
``split_every`` chunk boundary, and the state carry is the chunk
stitch (pytest-asserted; driver rows ``stream_gaps_epochs`` /
``stream_monotonic_epochs`` replay it against the plain batch LAG
oracles). Violating the assumption degrades differently per monitor: the gaps
monitor can suppress a hole or shorten one but never fabricates a gap
the data doesn't bracket; the ordering monitor CAN emit a violation
the batch operator would not (a late row compared against a
later-ordered carried value), so feed it order-monotone epochs or
treat its alerts as at-least-once under disorder.

Scale: per trigger the cost is one window over the batch plus a
per-key last-row reduce over O(keys x epochs) narrow state rows;
compact the ``last_epochs`` dirs offline with ``cdc.latest_by_key``
when epoch count grows (the same hygiene as the dedup band index).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pandera_forge_spark.operators.temporal import (
    _check_reserved,
    _last_row_struct,
    _nullsafe_equi_join,
    _regression_predicate,
    _seconds,
)


def _prior_state(
    spark,
    state_dir: str,
    below_epoch: int,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
) -> Optional[DataFrame]:
    """Per-key captured column (``__last``) of the LAST row by
    ``order_cols`` over every epoch strictly below ``below_epoch``;
    None when no prior epoch exists. Epochs are enumerated driver-side
    and only dirs carrying a ``_SUCCESS`` commit marker are read: a
    crash mid state-write leaves a torn ``__epoch=N`` dir, and globbing
    it would fail schema inference FOREVER (review-found) — skipping it
    is also correct, because a torn epoch N is by definition the one
    being replayed, and a replay must not see its own partial writes
    anyway."""
    from pandera_forge_spark.sources.fs import DriverFS

    fs = DriverFS(spark)
    root = f"{state_dir}/last_epochs"
    if not fs.exists(root):
        return None
    below = [
        n
        for n in fs.listdir(root)
        if n.startswith("__epoch=")
        and int(n.split("=", 1)[1]) < int(below_epoch)
    ]
    dirs = [n for n in below if fs.exists(f"{root}/{n}/_SUCCESS")]
    if below and not dirs:
        # every prior-epoch dir exists but none carries a commit marker:
        # that is not "no state", it is success markers disabled
        # (mapreduce.fileoutputcommitter.marksuccessfuljobs=false) or
        # mass corruption — silently dropping every carry would emit
        # wrong (empty) findings with no error (review-found)
        raise RuntimeError(
            f"{root}: {len(below)} prior-epoch state dirs exist but none "
            "has a _SUCCESS marker — success markers disabled on this "
            "filesystem? The monitors rely on them to skip torn writes"
        )
    if not dirs:
        return None
    st = (
        spark.read.option("basePath", root)
        .option("mergeSchema", "true")
        .parquet(*[f"{root}/{n}" for n in dirs])
    )
    if "__last_ts" in st.columns:
        # state written by the pre-kernel gaps monitor named the carried
        # column __last_ts; honor it so an upgraded monitor restarting
        # from its checkpoint keeps its carry instead of wedging on an
        # unresolved column (mergeSchema surfaces BOTH names across
        # mixed-format epochs — coalesce bridges them)
        if "__last" in st.columns:
            st = st.withColumn(
                "__last", F.coalesce(F.col("__last"), F.col("__last_ts"))
            )
        else:
            st = st.withColumnRenamed("__last_ts", "__last")
    missing = [c for c in order_cols if c not in st.columns]
    if missing:
        # ALL prior epochs are legacy-format (keys + carried value only,
        # no order columns): reduce with a plain max — the legacy format
        # only ever carried timestamps under a ts-led order, where
        # max(ts) IS last-by-order (review-found: the struct reduce
        # would reference unresolved columns and wedge the stream)
        red = st.groupBy(*key_cols).agg(F.max("__last").alias("__last"))
        return red
    red = st.groupBy(*key_cols).agg(
        _last_row_struct(list(order_cols), ["__last"]).alias("__l")
    )
    return red.select(*key_cols, F.col("__l.__cap.__last").alias("__last"))


def _write_epoch_state(
    batch_df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str],
    src_col: str,
    state_dir: str,
    epoch: int,
) -> None:
    """Persist this epoch's per-key last row BY ``order`` (the carried
    value is ``src_col`` of that row — NOT a per-key max of src_col,
    which would diverge from the batch twin whenever the order isn't
    the captured column itself, review-found)."""
    batch_df.groupBy(*keys).agg(
        _last_row_struct(list(order), [src_col]).alias("__l")
    ).select(
        *keys,
        *[F.col(f"__l.{c}").alias(c) for c in order],
        F.col(f"__l.__cap.{src_col}").alias("__last"),
    ).write.mode("overwrite").parquet(f"{state_dir}/last_epochs/__epoch={epoch}")


def _with_carried_prev(
    batch_df: DataFrame,
    state_dir: str,
    epoch: int,
    keys: Sequence[str],
    order: Sequence[str],
    src_col: str,
) -> DataFrame:
    """The shared kernel: attach ``__prev`` = ``src_col`` of the
    previous row per key in ``order`` — in-batch rows via lag, each
    key's FIRST batch row via the carried prior-epoch state."""
    wc = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order])
    b = batch_df.withColumn("__rn", F.row_number().over(wc)).withColumn(
        "__prev", F.lag(F.col(src_col)).over(wc)
    )
    state = _prior_state(batch_df.sparkSession, state_dir, epoch, keys, order)
    if state is not None:
        b = _nullsafe_equi_join(b, state, keys, "left")
        b = b.withColumn(
            "__prev",
            F.when(F.col("__rn") == 1, F.col("__last")).otherwise(
                F.col("__prev")
            ),
        ).drop("__last")
    return b.drop("__rn")


def stream_sequence_gaps(
    stream_df: DataFrame,
    state_dir: str,
    gap_sink: str,
    key_cols: Sequence[str],
    ts_col: str,
    min_gap_seconds: float,
    order_cols: Optional[Sequence[str]] = None,
    checkpoint: Optional[str] = None,
    on_batch: Optional[Callable] = None,
):
    """Continuous freshness monitoring: per-key timeline holes longer
    than ``min_gap_seconds``, across batch boundaries. Returns the
    unstarted ``writeStream`` writer (caller picks the trigger, like
    every foreachBatch surface in this package). Sink rows:
    ``key_cols + gap_start + gap_end + gap_seconds`` — the batch
    operator's schema exactly."""
    keys = list(key_cols)
    order = list(order_cols) if order_cols is not None else [ts_col]
    gap = float(min_gap_seconds)
    _check_reserved(
        stream_df,
        ["__rn", "__prev", "__last", "gap_start", "gap_seconds"],
        "stream_sequence_gaps",
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        e = int(epoch_id)
        g = _with_carried_prev(batch_df, state_dir, e, keys, order, ts_col)
        # withColumn, not withColumnRenamed: renaming onto an existing
        # gap_start column would create a duplicate name and an
        # AMBIGUOUS_REFERENCE crash one line later (review-found);
        # replacing matches the batch twin's semantics
        g = g.withColumn("gap_start", F.col("__prev")).drop("__prev")
        g = g.withColumn(
            "gap_seconds", _seconds(g, ts_col) - _seconds(g, "gap_start")
        )
        gaps = g.where(F.col("gap_seconds") > F.lit(gap)).select(
            *keys,
            "gap_start",
            F.col(ts_col).alias("gap_end"),
            "gap_seconds",
        )
        gaps.write.mode("overwrite").parquet(f"{gap_sink}/__epoch={e}")
        # state append AFTER the sink: a crash between the two replays
        # the epoch, which rewrites both dirs identically (reads only
        # epochs < e, so its own partial append is invisible)
        _write_epoch_state(batch_df, keys, order, ts_col, state_dir, e)
        if on_batch is not None:
            on_batch(gaps, e)

    writer = stream_df.writeStream.foreachBatch(process)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def stream_monotonic_violations(
    stream_df: DataFrame,
    state_dir: str,
    sink: str,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    strict: bool = False,
    decreasing: bool = False,
    checkpoint: Optional[str] = None,
    on_batch: Optional[Callable] = None,
):
    """Continuous ordering-invariant monitoring: per-key value
    regressions in ``order_cols`` order, across batch boundaries — the
    counter that reset between two micro-batches surfaces in the batch
    where it came back lower. Same state kernel, carry rules, and
    exactly-once contract as ``stream_sequence_gaps``; the union of
    epoch sinks equals the batch ``monotonic_violations`` over the
    concatenated input under the same epoch-cut assumption. Sink rows:
    the violating input rows plus ``prev_<value_col>``."""
    keys = list(key_cols)
    order = list(order_cols)
    prev_name = f"prev_{value_col}"
    _check_reserved(
        stream_df,
        ["__rn", "__prev", "__last", prev_name],
        "stream_monotonic_violations",
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        e = int(epoch_id)
        b = _with_carried_prev(batch_df, state_dir, e, keys, order, value_col)
        b = b.withColumn(prev_name, F.col("__prev")).drop("__prev")
        out = b.where(
            _regression_predicate(
                F.col(prev_name), F.col(value_col), strict, decreasing
            )
        )
        out.write.mode("overwrite").parquet(f"{sink}/__epoch={e}")
        _write_epoch_state(batch_df, keys, order, value_col, state_dir, e)
        if on_batch is not None:
            on_batch(out, e)

    writer = stream_df.writeStream.foreachBatch(process)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def stream_cusum(
    stream_df: DataFrame,
    state_dir: str,
    sink: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    target: float,
    slack: float = 0.0,
    threshold: float = 25.0,
    order_col: Optional[str] = None,
    checkpoint: Optional[str] = None,
    on_batch: Optional[Callable] = None,
):
    """Continuous changepoint monitoring: the streaming twin of
    ``operators/temporal.cusum_scores``. Each micro-batch advances
    every key's two-sided CUSUM statistic and emits the rows whose
    statistic crosses ``threshold`` — a mean shift that builds up
    ACROSS micro-batches (the exact case a per-batch-only check
    misses: ten small batches each drifting a little) surfaces in the
    batch where the accumulated evidence crosses.

    The CUSUM recurrence is Markovian, so the carried state is ONE
    narrow row per key — (order tuple, cusum_high, cusum_low) of the
    key's last row — in the same epoch-keyed parquet layout, commit
    rules, and replay contract as the other sequence monitors (state
    dirs are read strictly below the batch's own epoch; both writes
    are per-epoch overwrites, so a foreachBatch retry re-derives
    byte-identical output). In-batch, the seeded recurrence has the
    same closed window form as the batch operator:
    ``S_i = greatest(seed + P_i, P_i - min_{j<=i} P_j)`` over
    batch-local prefix sums (induction on the max(0,·) reset; with no
    seed this is exactly the batch formula), so a trigger costs two
    stacked windows over the batch plus the O(keys x epochs) state
    reduce.

    Correctness contract (same as the module's other monitors): with
    epochs that cut each key's rows in (ts, order_col) order, the
    union of all epoch sinks equals the batch operator's alert rows
    over the concatenated input — driver row ``stream_cusum_epochs``
    replays that against the batch oracle SQL. Sink rows:
    (key_col, order cols, value_col, cusum_high, cusum_low).

    Scale: state is one row per key per epoch; compact
    ``last_epochs`` offline with ``cdc.latest_by_key`` when epoch
    count grows, like the dedup band index."""
    keys = [key_col]
    order = [ts_col] + ([order_col] if order_col is not None else [])
    _check_reserved(
        stream_df,
        ["__ph", "__pl", "__mh", "__ml", "__last", "__cusum",
         "cusum_high", "cusum_low"],
        "stream_cusum",
    )
    t_hi = float(target) + float(slack)
    t_lo = float(target) - float(slack)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        e = int(epoch_id)
        b = batch_df.where(F.col(ts_col).isNotNull())
        state = _prior_state(b.sparkSession, state_dir, e, keys, order)
        if state is not None:
            b = _nullsafe_equi_join(b, state, keys, "left")
        else:
            b = b.withColumn(
                "__last",
                F.lit(None).cast("struct<h:double,l:double>"),
            )
        v = F.col(value_col).cast("double")
        w = (
            Window.partitionBy(*keys)
            .orderBy(*[F.col(c) for c in order])
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        b = b.withColumn("__ph", F.sum(v - F.lit(t_hi)).over(w)).withColumn(
            "__pl", F.sum(F.lit(t_lo) - v).over(w)
        )
        wm = (
            Window.partitionBy(*keys)
            .orderBy(*[F.col(c) for c in order])
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        seed_h = F.coalesce(F.col("__last.h"), F.lit(0.0))
        seed_l = F.coalesce(F.col("__last.l"), F.lit(0.0))
        ph = F.coalesce(F.col("__ph"), F.lit(0.0))
        pl = F.coalesce(F.col("__pl"), F.lit(0.0))
        # greatest skips the NULL min term (rows before any observed
        # value in the batch), leaving the carried seed — the correct
        # "statistic unchanged" answer for a NULL-valued prefix
        hi = F.greatest(seed_h + ph, ph - F.min("__ph").over(wm))
        lo = F.greatest(seed_l + pl, pl - F.min("__pl").over(wm))
        stats = (
            b.withColumn("cusum_high", hi)
            .withColumn("cusum_low", lo)
            .drop("__ph", "__pl", "__last")
        )
        alerts = stats.where(
            (F.col("cusum_high") > F.lit(float(threshold)))
            | (F.col("cusum_low") > F.lit(float(threshold)))
        ).select(key_col, *order, value_col, "cusum_high", "cusum_low")
        alerts.write.mode("overwrite").parquet(f"{sink}/__epoch={e}")
        # state append AFTER the sink (replay rewrites both identically)
        carried = stats.withColumn(
            "__cusum",
            F.struct(
                F.col("cusum_high").alias("h"), F.col("cusum_low").alias("l")
            ),
        )
        _write_epoch_state(carried, keys, order, "__cusum", state_dir, e)
        if on_batch is not None:
            on_batch(alerts, e)

    writer = stream_df.writeStream.foreachBatch(process)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def _prior_hw(spark, state_dir: str, below_epoch: int, key_cols):
    """Per-key HIGH WATERMARK (max event-time micros) over every epoch
    strictly below ``below_epoch`` — the `_prior_state` discipline
    (committed dirs only, loud when markers are disabled) with a plain
    MAX reduce: unlike the last-row carry, a running max is
    order-free, so the state merge is trivially associative."""
    from pandera_forge_spark.sources.fs import DriverFS

    fs = DriverFS(spark)
    root = f"{state_dir}/hw_epochs"
    if not fs.exists(root):
        return None
    below = [
        n
        for n in fs.listdir(root)
        if n.startswith("__epoch=")
        and int(n.split("=", 1)[1]) < int(below_epoch)
    ]
    dirs = [n for n in below if fs.exists(f"{root}/{n}/_SUCCESS")]
    if below and not dirs:
        raise RuntimeError(
            f"{root}: {len(below)} prior-epoch state dirs exist but none "
            "has a _SUCCESS marker — success markers disabled on this "
            "filesystem? The monitors rely on them to skip torn writes"
        )
    if not dirs:
        return None
    st = spark.read.option("basePath", root).parquet(
        *[f"{root}/{n}" for n in dirs]
    )
    return st.groupBy(*key_cols).agg(F.max("__hw").alias("__hw"))


def stream_lateness(
    stream_df: DataFrame,
    state_dir: str,
    sink: str,
    key_cols: Sequence[str],
    ts_col: str,
    arrival_col: str,
    thresholds: Sequence[int] = (60, 300, 3600, 86400),
    checkpoint: Optional[str] = None,
    on_batch: Optional[Callable] = None,
):
    """Continuous watermark-lateness monitoring — the streaming twin of
    ``operators/temporal.lateness_census``: each micro-batch scores its
    events' lateness against the per-key HIGH WATERMARK carried across
    all prior epochs plus the in-batch running max along
    ``arrival_col``, and writes one census row per key per epoch to
    ``<sink>/__epoch=<id>`` (overwrite — exactly-once per epoch, the
    package's foreachBatch contract): ``keys + n_events + max_late_us
    + late_<t>s`` per threshold. Summing the epoch sinks per key (and
    max-ing ``max_late_us``) reproduces the batch census exactly when
    epochs cut the stream in arrival order — the carry IS the chunk
    stitch, and a running max composes associatively across chunks
    (unlike the sequence monitors there is no disorder caveat: a max
    only grows, so a late-cut epoch can only UNDER-count lateness it
    hasn't seen, never fabricate it).

    State is one ``(keys, __hw)`` micros row per key per epoch under
    ``<state_dir>/hw_epochs`` (max-reduced on read, committed dirs
    only); rows with NULL timestamp or arrival are excluded, matching
    the batch twin. Returns the unstarted ``writeStream`` writer."""
    keys = list(key_cols)
    ths = [int(t) for t in thresholds]
    if not ths:
        raise ValueError("stream_lateness: thresholds must be non-empty")
    if any(t < 0 for t in ths) or len(set(ths)) != len(ths):
        raise ValueError(
            f"stream_lateness: thresholds must be unique and >= 0: {ths}"
        )
    if not keys:
        raise ValueError("stream_lateness: key_cols must be non-empty")
    _check_reserved(
        stream_df, ["__ts_us", "__bmax", "__hw", "__late"], "stream_lateness"
    )
    dtype = dict(stream_df.dtypes)[ts_col]

    def _us(df):
        c = F.col(ts_col)
        if dtype.startswith("timestamp"):
            return F.unix_micros(c.cast("timestamp_ltz"))
        return (c.cast("double") * F.lit(1000000.0)).cast("long")

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        e = int(epoch_id)
        base = batch_df.where(
            F.col(ts_col).isNotNull() & F.col(arrival_col).isNotNull()
        ).withColumn("__ts_us", _us(batch_df))
        w = (
            Window.partitionBy(*[F.col(k) for k in keys])
            .orderBy(F.col(arrival_col))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        b = base.withColumn("__bmax", F.max("__ts_us").over(w))
        prior = _prior_hw(batch_df.sparkSession, state_dir, e, keys)
        if prior is not None:
            b = _nullsafe_equi_join(b, prior, keys, "left")
        else:
            b = b.withColumn("__hw", F.lit(None).cast("long"))
        # greatest skips NULLs: no carried state -> in-batch max alone
        b = b.withColumn(
            "__late",
            F.greatest(F.col("__bmax"), F.col("__hw")) - F.col("__ts_us"),
        )
        census = b.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("__late").alias("max_late_us"),
            *[
                F.sum((F.col("__late") > t * 1000000).cast("long")).alias(
                    f"late_{t}s"
                )
                for t in ths
            ],
        )
        census.write.mode("overwrite").parquet(f"{sink}/__epoch={e}")
        # state after sink (crash => replay rewrites both identically;
        # reads only epochs < e, so partials are invisible)
        base.groupBy(*keys).agg(F.max("__ts_us").alias("__hw")).write.mode(
            "overwrite"
        ).parquet(f"{state_dir}/hw_epochs/__epoch={e}")
        if on_batch is not None:
            on_batch(census, e)

    writer = stream_df.writeStream.foreachBatch(process)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer
