"""Structured-Streaming validation: the batch engine's checks applied
per micro-batch.

Two surfaces:

- ``stream_verdicts(stream_df, schema, ...)``: a fully STREAMING
  aggregation — per-partition violation counters as a stateful
  streaming agg (output mode "complete"/"update"). All checks compile
  to the same algebraic ``sum(!pred)`` aggregates as the batch path,
  so Spark maintains them incrementally with its own state store;
  nothing is collected and no foreachBatch is needed.

- ``validate_stream(stream_df, schema, verdict_sink, ...)``:
  ``foreachBatch`` wrapper for when per-batch ARTIFACTS are wanted
  (verdict rows + violation rows written to parquet/Iceberg audit
  paths). foreachBatch is at-least-once — a failed micro-batch is
  retried with the SAME epoch id — so each epoch writes to its own
  ``<sink>/__epoch=<id>`` directory with mode("overwrite"): the retry
  replaces the partial output instead of appending a duplicate, making
  the sink effectively exactly-once. Readers get ``__epoch`` back as a
  discovered partition column. Reuses ``validate_table`` /
  ``violation_rows`` verbatim — one code path for batch and stream.

Scale notes: the verdict aggregation state is O(partitions x checks)
— tiny; violation rows append incrementally and are bounded per batch
by ``max_per_check``. Checkpointing is Spark's own
(``checkpointLocation``), which makes the stream resumable the same
way the batch runner's manifest does.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandera_forge_spark.schema import TableSchema
from pandera_forge_spark.validator import (
    validate_table,
    violation_count_exprs,
    violation_rows,
)


def stream_verdicts(
    stream_df: DataFrame,
    schema: TableSchema,
    partition_cols: Sequence[str],
) -> DataFrame:
    """Streaming per-partition violation counters: the same fused
    ``sum(!pred)`` aggregate list as batch ``validate_table``, grouped
    by the partition key, maintained incrementally by the streaming
    state store. Returns a streaming DataFrame — start it with
    ``.writeStream.outputMode("complete")`` (or "update")."""
    checks = schema.checks()
    exprs = violation_count_exprs(checks) + [F.count(F.lit(1)).alias("__rows__")]
    return stream_df.groupBy(*partition_cols).agg(*exprs)


def windowed_verdicts(
    stream_df: DataFrame,
    schema: TableSchema,
    ts_col: str,
    window_duration: str = "10 minutes",
    slide: Optional[str] = None,
    watermark: str = "10 minutes",
    extra_group_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """EVENT-TIME windowed violation counters with late-data handling:
    the same fused ``sum(!pred)`` aggregate list, grouped by
    ``window(ts_col, window_duration[, slide])`` (+ optional partition
    columns), under ``withWatermark(ts_col, watermark)``.

    Semantics (standard Structured Streaming, stated one-sided the way
    the engine actually guarantees them): rows late but WITHIN the
    watermark bound are ALWAYS folded into their window's state; rows
    beyond the bound are EVENTUALLY dropped — the input filter uses the
    watermark as of the previous micro-batch's end, so a row straddling
    the advance may still be merged, but it can never re-open or
    re-emit a window that append mode already finalized. With output
    mode "append" each window emits exactly once — when the watermark
    passes its end — so downstream sinks get final, immutable
    per-window verdict rows (asserted in tests/test_streaming.py). The watermark also bounds state:
    closed windows are evicted, keeping state O(open windows x groups x
    checks) no matter how long the stream runs — the property that
    makes this viable on an unbounded 10^12-doc ingest."""
    checks = schema.checks()
    exprs = violation_count_exprs(checks) + [F.count(F.lit(1)).alias("__rows__")]
    win = F.window(F.col(ts_col), window_duration, slide or window_duration)
    groups = [win.alias("window")] + [
        F.col(c) for c in (extra_group_cols or [])
    ]
    return (
        stream_df.withWatermark(ts_col, watermark).groupBy(*groups).agg(*exprs)
    )


def validate_stream(
    stream_df: DataFrame,
    schema: TableSchema,
    verdict_sink: str,
    violation_sink: Optional[str] = None,
    id_cols: Optional[Sequence[str]] = None,
    partition_cols: Optional[Sequence[str]] = None,
    checkpoint: Optional[str] = None,
    max_per_check: Optional[int] = 1000,
    on_batch: Optional[Callable] = None,
):
    """Validate each micro-batch with the BATCH engine and append the
    artifacts to parquet sinks; returns the (unstarted) stream writer
    so callers pick the trigger (``availableNow`` for catch-up runs,
    processing-time for continuous).

    Epoch ids ride along in an ``__epoch`` column, giving per-batch
    lineage in the audit output (mirrors the batch runner's
    per-partition lineage rows).
    """

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        res = validate_table(
            batch_df,
            schema,
            partition_cols=list(partition_cols) if partition_cols else None,
            check_unique=False,  # uniqueness is cross-batch state; use the batch runner
        )
        if res.verdicts is not None:
            out = res.verdicts
        else:
            rows = [
                tuple([name, int(n)]) for name, n in sorted(res.counts.items())
            ]
            out = batch_df.sparkSession.createDataFrame(
                rows, "check string, violations long"
            )
        # idempotent per-epoch overwrite: foreachBatch retries re-run
        # the same epoch id, replacing (not duplicating) its output
        out.write.mode("overwrite").parquet(f"{verdict_sink}/__epoch={epoch_id}")
        if violation_sink and id_cols:
            bad = violation_rows(batch_df, schema, list(id_cols), max_per_check)
            bad.write.mode("overwrite").parquet(
                f"{violation_sink}/__epoch={epoch_id}"
            )
        if on_batch is not None:
            on_batch(res, epoch_id)

    writer = stream_df.writeStream.foreachBatch(process)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def stream_sketch_profile(
    stream_df: DataFrame,
    store_root: str,
    partition_cols: Sequence[str],
    columns: Optional[Sequence[str]] = None,
    theta: bool = False,
    checkpoint: Optional[str] = None,
):
    """Continuous profiling: sketch each micro-batch (the same
    mergeable HLL/KLL/Theta rows ``sketches.partition_sketches``
    produces) and append the rows under ``<store_root>/__epoch=<id>``.

    Because every sketch field merges associatively, the UNION of all
    epoch rows IS the running profile — ``load_sketch_store`` +
    ``merge_sketches`` over the store equals one-shot profiling of
    everything that has arrived (exact fields and HLL identical, KLL
    within rank error; same invariant the batch incremental store
    asserts). Profiling cost is O(new data) per trigger, never
    O(history), and the per-epoch overwrite keeps foreachBatch retries
    idempotent. Returns the unstarted writer (caller picks the
    trigger)."""
    from pandera_forge_spark.sketches import partition_sketches

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        sk = partition_sketches(
            batch_df, list(partition_cols), columns, theta=theta
        )
        sk.write.mode("overwrite").parquet(f"{store_root}/__epoch={epoch_id}")

    writer = stream_df.writeStream.foreachBatch(process)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def stream_drift(
    stream_df: DataFrame,
    col: str,
    baseline: dict,
    drift_sink: str,
    group_cols: Sequence[str] = (),
    checkpoint: Optional[str] = None,
    psi_threshold: float = 0.2,
    ks_threshold: float = 0.1,
    categorical: bool = False,
    on_batch: Optional[Callable] = None,
):
    """Continuous distribution-drift monitoring: each micro-batch is
    scored against a STATIC baseline (PSI + KS on the baseline's fixed
    quantile grid for numeric columns; PSI + chi² over the baseline's
    top-category shares when ``categorical=True`` — pass the matching
    ``baseline_summary`` / ``categorical_baseline`` dict), and the
    per-(group, epoch) verdict rows land in an idempotent per-epoch
    overwrite sink exactly like ``validate_stream``.

    This is the production shape for "is today's feed drifting from
    last month": the baseline is computed ONCE offline (or from the
    sketch store) and never rescanned; per batch the cost is one
    algebraic aggregation over the batch — state-free, so foreachBatch
    retries are safe and the stream carries no growing state store.
    Returns the unstarted writer (caller picks the trigger)."""
    from pandera_forge_spark.drift import categorical_drift_verdicts, drift_verdicts

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if categorical:
            out = categorical_drift_verdicts(
                batch_df,
                col,
                list(group_cols),
                baseline,
                psi_threshold=psi_threshold,
            )
        else:
            out = drift_verdicts(
                batch_df,
                col,
                list(group_cols),
                baseline,
                psi_threshold=psi_threshold,
                ks_threshold=ks_threshold,
            )
        out.write.mode("overwrite").parquet(f"{drift_sink}/__epoch={epoch_id}")
        if on_batch is not None:
            # same (result, epoch_id) convention as validate_stream's
            # hook, and the verdict frame is what an alert-on-drift
            # callback needs without re-reading the sink
            on_batch(out, epoch_id)

    writer = stream_df.writeStream.foreachBatch(process)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer
