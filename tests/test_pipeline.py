"""Flagship single-pass pipeline: parity with the exact per-operator
composition on the mutated interleaved fixture."""

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.fixtures import make_documents, mutate_documents
from pandera_forge_spark.pipeline import interleaved_verdicts
from pandera_forge_spark.spans import (
    kind_consistency_ok,
    offsets_nondecreasing,
    span_sequence_mismatches,
)
from pandera_forge_spark.validator import duplicate_keys

N = 700


@pytest.fixture(scope="module")
def frames(spark):
    clean = make_documents(spark, N, seed=42).cache()
    actual = mutate_documents(clean).cache()
    return clean, actual


def test_totals_match_exact_operators(spark, frames):
    clean, actual = frames
    v = interleaved_verdicts(actual, clean)
    row = v.agg(
        F.sum("docs").alias("docs"),
        F.sum("order_violations").alias("o"),
        F.sum("consistency_violations").alias("c"),
        F.sum("sequence_mismatches").alias("m"),
        F.sum("duplicate_ids").alias("d"),
    ).collect()[0]
    assert row["docs"] == actual.count()
    assert row["o"] == actual.where(~offsets_nondecreasing(F.col("spans"))).count()
    assert row["c"] == actual.where(~kind_consistency_ok(F.col("spans"))).count()
    assert row["m"] == span_sequence_mismatches(
        actual.dropDuplicates(["doc_id"]), clean
    ).count()
    assert row["d"] == duplicate_keys(actual, ["doc_id"]).count()


def test_per_bucket_rows_and_clean_input(spark, frames):
    clean, actual = frames
    v = interleaved_verdicts(actual, clean)
    assert v.count() == clean.select("bucket").distinct().count()
    # clean vs clean: zero everything
    z = interleaved_verdicts(clean, clean).agg(
        F.sum("order_violations") + F.sum("consistency_violations")
        + F.sum("sequence_mismatches") + F.sum("duplicate_ids")
    ).collect()[0][0]
    assert z == 0


def test_missing_and_extra_docs_count_as_mismatches(spark, frames):
    clean, _ = frames
    num = F.substring_index(F.col("doc_id"), "-", -1).cast("long")
    actual = clean.where(num % 5 != 0)  # drop 1/5 -> missing
    n_missing = clean.count() - actual.count()
    v = interleaved_verdicts(actual, clean)
    m = v.agg(F.sum("sequence_mismatches")).collect()[0][0]
    assert m == n_missing
