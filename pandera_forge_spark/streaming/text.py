"""Stateless streaming text screens.

``stream_contamination`` is deliberately NOT a foreachBatch operator:
the Bloom-filter leak probe is pure per-row column algebra (shingle
the document, test each shingle against a broadcast bit array), so the
Spark-first shape is a stream-static broadcast join + projection — a
plain transformed STREAMING DataFrame that runs in append mode with
any sink, no state store, no custom epoch handling, and watermark-free
(nothing accumulates). Contrast with the stateful twins in
``streaming/dedup.py`` (cross-batch identity needs state) — leak
screening per document needs none.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandera_forge_spark.operators.text import bloom_filter_words, bloom_hit_expr


def stream_contamination(
    stream_df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    fp_rate: float = 0.01,
) -> DataFrame:
    """Per-document benchmark-leak screen over a STREAM: returns a
    streaming frame ``(id, n_shingles, n_contaminated,
    contamination_ratio)`` — the same columns and the same Bloom bits
    as the batch ``operators.text.contamination_bloom`` (shared
    builder), but with the per-doc counts computed ROW-LOCALLY
    (``size``/``filter`` over the shingle array) instead of
    explode+groupBy, so the plan is stateless and append-mode-safe.

    Semantics are PER ARRIVING ROW: each document emits exactly one
    output row in its own micro-batch. When ``id_col`` is unique
    across the stream (the normal ingest contract) this equals the
    batch operator row for row; if the same id can RE-ARRIVE (replays,
    late re-ingest), the batch groupBy would merge those texts into
    one row while this screen emits one row per arrival — dedupe
    downstream if your sink is keyed by id (statelessness is exactly
    the property that makes cross-arrival merging impossible here).

    The static ``benchmark`` frame is collapsed to its packed filter
    once at plan time (~1.2 bytes per benchmark shingle at 1% fp) and
    broadcast; each micro-batch is then a narrow map stage. Bloom
    semantics carry over: no false negatives, ~``fp_rate`` false
    positives, so the ratio is an upper bound of the exact operator's.
    """
    from pandera_forge_spark.operators.dedup import shingles

    packed, m_bits, k = bloom_filter_words(benchmark, text_col, n, fp_rate)
    bloom = stream_df.sparkSession.createDataFrame(
        [(packed,)], "__bloom array<long>"
    )
    joined = stream_df.join(F.broadcast(bloom))
    sh = shingles(F.col(text_col), n)
    # sh appears three times below (two sizes + the filter input), so
    # the shingle pipeline is evaluated up to ~3x per ROW — a constant
    # factor, unlike the per-ELEMENT recompute the HOF-capture trap
    # causes (see winnow_fingerprints). Do NOT count on whole-stage-
    # codegen subexpression elimination collapsing them: higher-order
    # functions are CodegenFallback expressions outside its reach.
    # The filter lambda itself touches only its element and the cheap
    # broadcast __bloom column reference.
    contaminated = F.size(F.filter(sh, lambda s: bloom_hit_expr(s, m_bits, k)))
    return joined.select(
        F.col(id_col),
        F.size(sh).cast("long").alias("n_shingles"),
        contaminated.cast("long").alias("n_contaminated"),
        F.round(contaminated / F.size(sh), 6).alias("contamination_ratio"),
    )
