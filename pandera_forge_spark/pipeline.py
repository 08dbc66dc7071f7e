"""The flagship end-to-end validation pipeline over interleaved
text+media documents (north rule): per-bucket verdict rows containing
document counts, span-order violations, kind-consistency violations,
span-sequence mismatches against an expected copy, and duplicate
doc_ids — in a single co-partitioned flow.

Scale design (vs naively composing the individual operators):

- The naive composition scans ``actual`` three times (row flags,
  sequence join, duplicate check) and shuffles full span arrays into
  the sequence join. Here ``actual`` is scanned ONCE, reduced in the
  very first projection to (id, bucket, 2 flag bits, one 64-bit
  sequence hash) — everything downstream shuffles ~40 bytes/row no
  matter how wide the media payloads are.
- Duplicate detection and flag aggregation share ONE groupBy(doc_id);
  the expected side reduces to (id, hash); the equality check is a
  join of two narrow frames on ``doc_id``, then a tiny per-bucket
  rollup. Total: two shuffles + one join, all partial-aggregatable.
- Sequence equality compares ``xxhash64`` over the canonical
  (kind, text, media_ref) array — order-sensitive, null-safe. A hash
  collision (2^-64 per doc pair) could mask a real mismatch; exact
  row-identity extraction (``spans.span_sequence_mismatches``) remains
  the forensic path once a bucket fails.
- Docs with duplicated ids: flags/hash are aggregated max-over-copies,
  so a doc counts as mismatched if its surviving representative
  mismatches; per-ROW violation counts weight by copy count, matching
  the row semantics of the individual operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandera_forge_spark.spans import (
    kind_consistency_ok,
    offsets_nondecreasing,
)


def _sequence_hash(spans) -> "F.Column":
    """Order-sensitive 64-bit hash of the (kind, text, media_ref)
    sequence, hashing the three pruned FIELD ARRAYS directly.

    Hashing ``transform``-built canonical structs costs ~4x more (the
    lambda runs in the CodegenFallback interpreter and the full struct
    array is materialized per row); ``spans.kind`` etc. are
    GetArrayStructFields extractions that stay in codegen and let
    Catalyst generate only the needed fields.

    Caveat: Spark's hash folds SKIP null array elements, so two
    sequences that differ only by moving a null among otherwise
    identical non-null folds (e.g. texts [a,NULL,b] vs [a,b,NULL])
    alias. Such a doc necessarily violates the kind/text/media_ref
    consistency contract on one side (null pattern must follow kinds),
    so it is still flagged — through the consistency channel — and the
    exact comparator (spans.span_sequence_mismatches) remains the
    forensic path.
    """
    return F.xxhash64(
        spans.getField("kind"), spans.getField("text"), spans.getField("media_ref")
    )


def interleaved_verdicts(
    actual: DataFrame,
    expected: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Per-bucket validation verdicts for an interleaved-docs table.

    Output columns: (bucket, docs, order_violations,
    consistency_violations, sequence_mismatches, duplicate_ids).
    ``docs`` and the two violation counts are ROW counts (duplicated
    ids weight by multiplicity); ``sequence_mismatches`` and
    ``duplicate_ids`` count distinct documents. Docs present only in
    ``expected`` (missing) or only in ``actual`` (extra) count as
    sequence mismatches; a missing doc's bucket comes from the
    expected side when it carries ``bucket_col``, else NULL.
    """
    spans = F.col(spans_col)
    a = actual.select(
        F.col(id_col).alias("__id"),
        F.col(bucket_col).alias("__bucket"),
        (~offsets_nondecreasing(spans)).cast("long").alias("__order_bad"),
        (~kind_consistency_ok(spans)).cast("long").alias("__cons_bad"),
        _sequence_hash(spans).alias("__h"),
    )
    per_doc = a.groupBy("__id").agg(
        F.max("__bucket").alias("__bucket"),
        F.count(F.lit(1)).alias("__copies"),
        F.sum("__order_bad").alias("__order_rows"),
        F.sum("__cons_bad").alias("__cons_rows"),
        F.max("__h").alias("__h"),
    )

    e_cols = [F.col(id_col).alias("__id"), _sequence_hash(spans).alias("__eh")]
    if bucket_col in expected.columns:
        e_cols.append(F.col(bucket_col).alias("__ebucket"))
    e = expected.select(*e_cols)
    if bucket_col not in expected.columns:
        e = e.withColumn("__ebucket", F.lit(None).cast("int"))

    j = per_doc.join(e, on="__id", how="full_outer")
    mismatch = (
        F.col("__h").isNull()  # missing from actual
        | F.col("__eh").isNull()  # extra in actual
        | (F.col("__h") != F.col("__eh"))
    )
    return (
        j.select(
            F.coalesce(F.col("__bucket"), F.col("__ebucket")).alias(bucket_col),
            F.coalesce(F.col("__copies"), F.lit(0)).alias("__copies"),
            F.coalesce(F.col("__order_rows"), F.lit(0)).alias("__order_rows"),
            F.coalesce(F.col("__cons_rows"), F.lit(0)).alias("__cons_rows"),
            mismatch.cast("long").alias("__mismatch"),
            (F.coalesce(F.col("__copies"), F.lit(0)) > 1).cast("long").alias("__dup"),
        )
        .groupBy(bucket_col)
        .agg(
            F.sum("__copies").alias("docs"),
            F.sum("__order_rows").alias("order_violations"),
            F.sum("__cons_rows").alias("consistency_violations"),
            F.sum("__mismatch").alias("sequence_mismatches"),
            F.sum("__dup").alias("duplicate_ids"),
        )
    )
