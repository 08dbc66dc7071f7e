"""Custom stateful streaming operators (applyInPandasWithState).

The batch engine settles uniqueness with a shuffle over the whole
table; a stream can't do that — duplicates may arrive BATCHES apart.
``duplicate_ids_stream`` keeps one counter of rows-seen per key in the
Spark state store (checkpointed, recoverable) and emits a key as soon
as its cumulative count exceeds one — the streaming twin of
``validator.duplicate_keys``.

Scale notes: state is O(distinct keys) x one long, hash-partitioned by
key across executors like any streaming agg; the pandas kernel is
Arrow-batched per key group (never per-row Python). For unbounded key
spaces set a TTL via ``timeout_minutes`` — a key idle that long is
dropped from the state store (dedup becomes windowed, the standard
bounded-state trade).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def duplicate_ids_stream(
    stream_df: DataFrame,
    id_col: str = "doc_id",
    timeout_minutes: int = 0,
) -> DataFrame:
    """Streaming duplicate-key detector: emits (id, dup_count) whenever
    a key's cumulative row count (across ALL micro-batches so far)
    reaches 2, and again each time it grows. Use output mode "update"/
    "append" downstream.
    """
    out_schema = f"{id_col} string, dup_count long"
    state_schema = "seen long"
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_minutes > 0
        else GroupStateTimeout.NoTimeout
    )

    def track(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        prev = state.get[0] if state.exists else 0
        new = sum(len(p) for p in pdfs)
        total = prev + new
        state.update((total,))
        if timeout_minutes > 0:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        if total > 1 and new > 0:
            yield pd.DataFrame({id_col: [key[0]], "dup_count": [total]})

    return (
        stream_df.select(id_col)
        .groupBy(id_col)
        .applyInPandasWithState(track, out_schema, state_schema, "update", timeout)
    )
