"""Bucketed table layout — co-located joins without a shuffle.

The validation engine's expensive joins all key on ``doc_id``
(span-sequence equality actual-vs-expected, duplicate-row extraction,
audit joins). When both sides are written BUCKETED on that key with
the same bucket count, Spark's scan reports a compatible
``HashPartitioning`` output and the sort-merge join planner drops the
Exchange on both sides entirely — at 10^12 docs that is the single
largest shuffle in the pipeline gone, paid once at write time instead
of on every validation run. (Iceberg equivalent: a ``bucket(N,
doc_id)`` partition transform; the Spark SQL bucketed-table form below
is the sandbox-runnable demonstration of the same plan shape —
asserted shuffle-free in tests/test_plans.py.)

Sizing: pick ``n_buckets`` so one bucket's rows fit a task comfortably
(rows/bucket ≈ table_rows / n_buckets); bucket counts must MATCH
across tables that join. ``sortBy`` the same key so the merge join's
sort is satisfied by the scan too.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) parquet
    table in the session catalog."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table — the bucketing metadata rides along, so
    joins/aggregations on the bucket key skip their Exchange."""
    return spark.table(table_name)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts this plans as a zero-Exchange sort-merge join (or a
    zero-Exchange hash join); the plan assertion lives in
    tests/test_plans.py so a regression in the layout contract fails
    loudly."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), on=on, how=how
    )
