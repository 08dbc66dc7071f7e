"""Incremental re-validation walkthrough — the north-star loop at
100 TB, runnable as-is against the driver testdata:

    python examples/incremental_pipeline.py [sf_dir]

At 10^12 rows you cannot re-profile the lake nightly; you re-validate
what MOVED. This example runs the full cycle twice over a
hive-partitioned snapshot and proves the shortcut exact:

  day 0   write snapshot v0 (partitioned by day), persist
          per-partition CHECKSUM rows alongside it (table_checksum —
          the ingest job pays one map-side aggregate), validate every
          partition with the resumable runner + audit log
  day 1   a changelog lands: one partition mutated (NULLed
          event_type), one dropped, one backfilled — snapshot v1
  diff    checksum_diff(v0 rows, v1 rows): O(partitions) full-outer
          join → the work list {changed, added, removed}; the 100-TB
          property is that NOTHING ELSE is read — v0's checksums were
          persisted at ingest, v1's cost one linear aggregate
  carry   unchanged partitions' audit rows carry forward verbatim
          (their content hash proves the old verdict still holds)
  rerun   run_partitions processes ONLY the moved partitions (the
          carried commits make the runner skip the rest — the same
          mechanism that makes it crash-resumable)
  proof   an independent FULL validation of v1 must agree with
          carried + incremental audit rows, partition by partition

Prints one JSON report per stage; returns the report dict when called
in-process (the pytest smoke asserts the proof step).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

CS_COLS = ["event_id", "user_id", "event_type", "value_micro"]


def _with_day(ev):
    """Deterministic day-bucket partition key + exact fixed-point value
    column (doubles are fenced out of checksums by type contract)."""
    sec = F.col("ts").cast("timestamp_ltz").cast("double")
    return (
        ev.where(F.col("ts").isNotNull())
        .withColumn(
            "day",
            F.concat(
                F.lit("d"),
                (F.floor(sec / F.lit(86400.0)).cast("long") % 8).cast(
                    "string"
                ),
            ),
        )
        .withColumn(
            "value_micro",
            F.floor(F.col("value").cast("double") * F.lit(1000000.0)).cast(
                "long"
            ),
        )
        .select("event_id", "user_id", "event_type", "value_micro", "day")
    )


def _mutate_v1(v0):
    """The day-1 changelog, applied: d2 mutated (every 5th event_type
    NULLed — a not_null violation the validator must catch), d5
    dropped, d1 backfilled under a new day d8."""
    mutated = v0.withColumn(
        "event_type",
        F.when(
            (F.col("day") == "d2") & (F.col("event_id") % 5 == 0),
            F.lit(None).cast("string"),
        ).otherwise(F.col("event_type")),
    ).where(F.col("day") != "d5")
    backfill = v0.where(F.col("day") == "d1").withColumn("day", F.lit("d8"))
    return mutated.unionByName(backfill)


def run(spark: SparkSession, sf_dir: str, work_root: str | None = None) -> dict:
    from pandera_forge_spark.inference import infer_schema
    from pandera_forge_spark.runner import (
        AuditLog,
        HivePartitionedParquet,
        run_partitions,
        validation_process_batch,
    )
    from pandera_forge_spark.sketches import checksum_diff, table_checksum

    report: dict = {}
    root = work_root or tempfile.mkdtemp(prefix="pfs_incremental_")
    owns_root = work_root is None
    try:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        v0_rows = _with_day(ev)

        # ---- day 0: ingest v0 + persist checksums + full validation
        v0 = HivePartitionedParquet(spark, f"{root}/v0", "day")
        v0.write(v0_rows)
        table_checksum(
            v0_rows, cols=CS_COLS, group_cols=["day"]
        ).write.mode("overwrite").parquet(f"{root}/checksums_v0")

        schema = infer_schema(
            spark.read.parquet(f"{root}/v0").drop("day"), "events_day"
        )
        audit0 = AuditLog(spark, f"{root}/audit_v0")
        rep0 = run_partitions(
            v0,
            audit0,
            process_batch=validation_process_batch(schema, "day"),
            batch_size=4,
        )
        report["day0"] = {
            "partitions_validated": len(rep0.processed),
            "failed": rep0.failed_partitions,
        }

        # ---- day 1: the changelog lands; write v1 + its checksums
        v1_rows = _mutate_v1(spark.read.option("basePath", f"{root}/v0").parquet(f"{root}/v0"))
        v1 = HivePartitionedParquet(spark, f"{root}/v1", "day")
        v1.write(v1_rows)
        table_checksum(
            v1_rows, cols=CS_COLS, group_cols=["day"]
        ).write.mode("overwrite").parquet(f"{root}/checksums_v1")

        # ---- diff: O(partitions) join of two persisted checksum frames
        diff = checksum_diff(
            spark.read.parquet(f"{root}/checksums_v0"),
            spark.read.parquet(f"{root}/checksums_v1"),
            ["day"],
            include_unchanged=True,
        )
        by_status: dict[str, list[str]] = {}
        for r in diff.collect():
            by_status.setdefault(r["status"], []).append(r["day"])
        report["diff"] = {k: sorted(v) for k, v in by_status.items()}

        # ---- carry unchanged verdicts, re-validate only the moved set
        audit1 = AuditLog(spark, f"{root}/audit_v1")
        carried = sorted(by_status.get("unchanged", []))
        old_rows = audit0.read().collect()
        for day in carried:
            rows = [
                {
                    "status": r["status"],
                    "rows": r["rows"],
                    "violations": r["violations"],
                    "checks": json.loads(r["checks"]),
                    "started": r["started"],
                    "finished": r["finished"],
                }
                for r in old_rows
                if r["partition"] == day
            ]
            audit1.commit(day, rows)
        rep1 = run_partitions(
            v1,
            audit1,
            process_batch=validation_process_batch(schema, "day"),
            batch_size=4,
        )
        report["incremental"] = {
            "carried": carried,
            "revalidated": sorted(rep1.processed),
            "removed": sorted(by_status.get("removed", [])),
        }

        # ---- proof: full independent validation of v1 agrees per
        # partition with carried + incremental audit rows
        audit_full = AuditLog(spark, f"{root}/audit_v1_full")
        run_partitions(
            v1,
            audit_full,
            process_batch=validation_process_batch(schema, "day"),
            batch_size=8,
        )

        def _verdicts(audit: "AuditLog") -> dict:
            return {
                r["partition"]: (r["rows"], r["violations"])
                for r in audit.read()
                .groupBy("partition")
                .agg(
                    F.sum("rows").alias("rows"),
                    F.sum("violations").alias("violations"),
                )
                .collect()
            }

        inc, full = _verdicts(audit1), _verdicts(audit_full)
        report["proof"] = {
            "partitions": len(full),
            "incremental_equals_full": inc == full,
            "violations_found": {
                k: v[1] for k, v in sorted(full.items()) if v[1] > 0
            },
        }
        return report
    finally:
        if owns_root:
            shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("incremental-pipeline-example")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    try:
        report = run(spark, sf_dir)
        print(json.dumps(report, indent=2))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
