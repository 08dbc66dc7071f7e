"""Incremental (streaming) validation.

The reference is strictly batch (SURVEY.md §2.10: no watermarks,
windows, or state anywhere), and the north rule's resumability is
batch-checkpoint — the engine's primary path stays the batch
``runner``. This module is the additive streaming surface: validate
documents AS THEY ARRIVE with Structured Streaming, reusing the exact
same check compiler and verdict semantics via ``foreachBatch``.
"""

from pandera_forge_spark.streaming.cardinality import stream_cardinality
from pandera_forge_spark.streaming.rates import stream_rate_chart
from pandera_forge_spark.streaming.dedup import stream_near_dedup
from pandera_forge_spark.streaming.sequence import (
    stream_cusum,
    stream_lateness,
    stream_monotonic_violations,
    stream_sequence_gaps,
)
from pandera_forge_spark.streaming.stateful import duplicate_ids_stream
from pandera_forge_spark.streaming.temporal import stream_sessions
from pandera_forge_spark.streaming.text import stream_contamination
from pandera_forge_spark.streaming.validate import (
    stream_drift,
    stream_sketch_profile,
    stream_verdicts,
    validate_stream,
    windowed_verdicts,
)

__all__ = [
    "duplicate_ids_stream",
    "stream_cardinality",
    "stream_rate_chart",
    "stream_drift",
    "stream_contamination",
    "stream_cusum",
    "stream_lateness",
    "stream_monotonic_violations",
    "stream_near_dedup",
    "stream_sequence_gaps",
    "stream_sessions",
    "stream_sketch_profile",
    "stream_verdicts",
    "validate_stream",
    "windowed_verdicts",
]
