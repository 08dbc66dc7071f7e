"""Streaming freshness / coverage-gap monitoring.

The streaming twin of ``operators/temporal.sequence_gaps``: each
micro-batch checks the arriving events' timelines for holes longer than
``min_gap_seconds`` — both WITHIN the batch and ACROSS the batch
boundary, by carrying every key's last-seen timestamp from all prior
epochs. This is the "feed went dark overnight" validator run
continuously: the hole between yesterday's last tick and today's first
one surfaces in today's epoch, which a per-batch-only check would miss
entirely.

State is the per-key last event timestamp — small (O(keys)) and
columnar, so like the band index it lives as epoch-keyed parquet
appends rather than in the state store:

- ``<state_dir>/last_epochs/__epoch=<id>`` — the timestamp of each
  key's last row BY ``order_cols`` in this epoch (overwrite; one row
  per key seen in the batch);
- a batch reads only epochs strictly BELOW its own id (committed dirs
  only) and reduces them per key with the same last-by-order rule — so
  a replayed micro-batch (foreachBatch retry, restart from checkpoint)
  re-derives byte-identical gaps and can never see its own partial
  append.

Gaps land in ``<gap_sink>/__epoch=<id>`` (overwrite): exactly-once per
epoch, same contract as ``streaming/dedup``.

Correctness contract: with epochs that cut each key's rows in
``order_cols`` order (the ordered-ingest / watermark assumption every
event-time stream leans on — for the default ``order_cols=[ts_col]``
this also means NULL timestamps, which sort FIRST, may only appear in
a key's first epoch), the union of all epoch sinks is IDENTICAL to
the batch ``sequence_gaps`` over the concatenated input — the epoch
boundary is exactly a ``split_every`` chunk boundary, and the state
carry is the chunk stitch (pytest-asserted; driver row
``stream_gaps_epochs`` replays it against the plain batch LAG oracle).
Violating the assumption degrades gracefully: an out-of-order arrival
can suppress a hole or shorten one, but never fabricates a gap the
data doesn't bracket.

Scale: per trigger the cost is one window over the batch plus a
per-key last-row reduce over O(keys x epochs) narrow state rows;
compact the
``last_epochs`` dirs offline with ``cdc.latest_by_key`` when epoch
count grows (the same hygiene as the dedup band index).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pandera_forge_spark.operators.temporal import (
    _last_row_struct,
    _nullsafe_equi_join,
    _seconds,
)


def _prior_state(
    spark,
    state_dir: str,
    below_epoch: int,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
) -> Optional[DataFrame]:
    """Per-key timestamp of the LAST row by ``order_cols`` over every
    epoch strictly below ``below_epoch``; None when no prior epoch
    exists. Epochs are enumerated driver-side and only dirs carrying a
    ``_SUCCESS`` commit marker are read: a crash mid state-write leaves
    a torn ``__epoch=N`` dir, and globbing it would fail schema
    inference FOREVER (review-found) — skipping it is also correct,
    because a torn epoch N is by definition the one being replayed, and
    a replay must not see its own partial writes anyway."""
    from pandera_forge_spark.sources.fs import DriverFS

    fs = DriverFS(spark)
    root = f"{state_dir}/last_epochs"
    if not fs.exists(root):
        return None
    dirs = [
        n
        for n in fs.listdir(root)
        if n.startswith("__epoch=")
        and int(n.split("=", 1)[1]) < int(below_epoch)
        and fs.exists(f"{root}/{n}/_SUCCESS")
    ]
    if not dirs:
        return None
    st = spark.read.option("basePath", root).parquet(
        *[f"{root}/{n}" for n in dirs]
    )
    red = st.groupBy(*key_cols).agg(
        _last_row_struct(list(order_cols), ["__last_ts"]).alias("__l")
    )
    return red.select(
        *key_cols, F.col("__l.__cap.__last_ts").alias("__last_ts")
    )


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
    """Returns the unstarted ``writeStream`` writer (caller picks the
    trigger, like every foreachBatch surface in this package). Sink
    rows: ``key_cols + gap_start + gap_end + gap_seconds`` — the batch
    operator's schema exactly."""
    keys = list(key_cols)
    order = list(order_cols) if order_cols is not None else [ts_col]
    gap = float(min_gap_seconds)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        e = int(epoch_id)
        wc = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order])
        b = batch_df.withColumn("__rn", F.row_number().over(wc)).withColumn(
            "__prev_ts", F.lag(F.col(ts_col)).over(wc)
        )
        state = _prior_state(spark, state_dir, e, keys, order)
        if state is not None:
            b = _nullsafe_equi_join(b, state, keys, "left")
            prev = F.when(F.col("__rn") == 1, F.col("__last_ts")).otherwise(
                F.col("__prev_ts")
            )
        else:
            prev = F.col("__prev_ts")
        g = b.withColumn("gap_start", prev)
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
        # the carried value is the ts of the last row BY order_cols —
        # max(ts) would diverge from the batch twin whenever order_cols
        # is not the timestamp itself (review-found)
        batch_df.groupBy(*keys).agg(
            _last_row_struct(order, [ts_col]).alias("__l")
        ).select(
            *keys,
            *[F.col(f"__l.{c}").alias(c) for c in order],
            F.col(f"__l.__cap.{ts_col}").alias("__last_ts"),
        ).write.mode("overwrite").parquet(
            f"{state_dir}/last_epochs/__epoch={e}"
        )
        if on_batch is not None:
            on_batch(gaps, e)

    writer = stream_df.writeStream.foreachBatch(process)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer
