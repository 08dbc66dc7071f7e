"""Streaming sessionization — the Structured-Streaming twin of
``operators/temporal.sessionize``/``session_stats``.

Batch sessionization numbers each key's sessions with an ordered
window; a stream cannot sort history, so this uses Spark's NATIVE
gap-based session windows (``F.session_window``, the built-in the
batch operator re-derives with lag+running-sum): state is one open
window per active (key, session), merged as events arrive and EMITTED
ONCE the watermark passes the session's close — exactly the
"session ends after <gap> of silence" semantics, with late data inside
the watermark still merging into its session.

Scale: state is O(active sessions) and hash-partitioned by key; the
watermark bounds it — closed sessions leave the store when emitted.
A hot key holds at most its open sessions, never its history (the
batch path needs split-stitch for that; the streaming engine gets the
same bound from windowed state for free).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_sessions(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: float,
    watermark: str = "10 minutes",
    extra_aggs: Optional[list] = None,
) -> DataFrame:
    """Per-session rollup rows (key, session_start, session_end,
    n_events [, extra aggs]) emitted in append mode once the watermark
    closes each session. ``ts_col`` must be a timestamp column
    (streaming watermarks are event-time).

    Output matches the batch ``session_stats`` rollup on the same data
    (same gap rule; window end is last_event + gap, so
    ``duration_secs`` derives as end - gap - start) — asserted by the
    batch-equivalence pytest."""
    gap = f"{float(gap_seconds)} seconds"
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("first_event"),
        F.max(ts_col).alias("last_event"),
    ] + list(extra_aggs or [])
    out = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), gap).alias("session"),
        )
        .agg(*aggs)
    )
    return out.select(
        F.col(key_col),
        F.col("session.start").alias("session_start"),
        F.col("session.end").alias("session_end"),
        *[c for c in out.columns if c not in (key_col, "session")],
    )
