"""spark-submit entry point for the INCREMENTAL re-validation job —
the nightly shape of the north rule's resumable validation:

    python scripts/make_pyfiles_zip.py /tmp/pfs.zip

    # day 0: full validation + persist the partition checksums
    spark-submit --master <cluster> --py-files /tmp/pfs.zip \\
        scripts/run_incremental_job.py \\
        --snapshot /data/v0 --partition-col day \\
        --cols id,cat,val_micro \\
        --checksums /audit/checksums_v0 --audit /audit/v0 \\
        --schema /audit/contract.json

    # day 1: only the moved partitions re-validate
    spark-submit ... scripts/run_incremental_job.py \\
        --snapshot /data/v1 --partition-col day \\
        --cols id,cat,val_micro \\
        --checksums /audit/checksums_v1 --audit /audit/v1 \\
        --schema /audit/contract.json \\
        --prev-checksums /audit/checksums_v0 --prev-audit /audit/v0

The schema contract is inferred on the FIRST run and persisted to
``--schema``; every later run validates against that same contract
(inferring per-run would move the goalposts with the data). Unchanged
partitions' audit rows carry forward from ``--prev-audit`` — their
content checksum proves the old verdict still holds — and
``run_partitions``'s completed-partition skip does the rest, the same
mechanism that makes a crashed run resumable.

Fixture mode (smoke runs on a bare cluster):
    --fixture N --snapshot <dir>          write a deterministic v0
    --mutate-from <v0dir> --snapshot <dir> write its day-1 twin
      (partition d2 gets NULL cats every 5th row, d5 drops, d1
      backfills as d8)

Prints ONE JSON report line. No master/parallelism is hardcoded.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

try:
    import pandera_forge_spark  # noqa: F401 — resolves from --py-files
except ImportError:  # running from a checkout without the zip
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _fixture(spark, n: int):
    from pyspark.sql import functions as F

    base = spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("c"), (F.col("id") % 7).cast("string")).alias("cat"),
        (F.col("id") * 37 % 100000).alias("val_micro"),
        F.concat(F.lit("d"), (F.col("id") % 8).cast("string")).alias("day"),
    )
    return base


def _mutate(spark, v0_dir: str):
    from pyspark.sql import functions as F

    v0 = spark.read.option("basePath", v0_dir).parquet(v0_dir)
    mutated = v0.withColumn(
        "cat",
        F.when(
            (F.col("day") == "d2") & (F.col("id") % 5 == 0),
            F.lit(None).cast("string"),
        ).otherwise(F.col("cat")),
    ).where(F.col("day") != "d5")
    backfill = v0.where(F.col("day") == "d1").withColumn("day", F.lit("d8"))
    return mutated.unionByName(backfill)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshot", required=True, help="hive-partitioned parquet dir")
    ap.add_argument("--partition-col", default="day")
    ap.add_argument("--cols", help="comma list of checksum columns (exact types)")
    ap.add_argument("--checksums", help="output dir for this run's checksum rows")
    ap.add_argument("--audit", help="audit output dir for this run")
    ap.add_argument("--schema", help="schema-contract JSON path (inferred+saved on first run)")
    ap.add_argument("--prev-checksums", help="previous run's checksum rows")
    ap.add_argument("--prev-audit", help="previous run's audit dir (verdict carry)")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--fixture", type=int, help="write a deterministic N-row v0 and exit")
    ap.add_argument("--mutate-from", help="write the day-1 twin of this v0 and exit")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("pfs-incremental-validation").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try:
        pcol = args.partition_col
        if args.fixture is not None:
            _fixture(spark, args.fixture).write.partitionBy(pcol).mode(
                "overwrite"
            ).parquet(args.snapshot)
            print(json.dumps({"fixture_rows": args.fixture, "snapshot": args.snapshot}))
            return 0
        if args.mutate_from:
            _mutate(spark, args.mutate_from).write.partitionBy(pcol).mode(
                "overwrite"
            ).parquet(args.snapshot)
            print(json.dumps({"mutated_from": args.mutate_from, "snapshot": args.snapshot}))
            return 0

        for req in ("cols", "checksums", "audit", "schema"):
            if not getattr(args, req):
                ap.error(f"--{req} is required outside fixture modes")

        from pandera_forge_spark.inference import infer_schema
        from pandera_forge_spark.runner import (
            AuditLog,
            HivePartitionedParquet,
            run_partitions,
            validation_process_batch,
        )
        from pandera_forge_spark.schema import TableSchema
        from pandera_forge_spark.sketches import checksum_diff, table_checksum
        from pandera_forge_spark.sources.fs import DriverFS

        table = HivePartitionedParquet(spark, args.snapshot, pcol)
        rows = spark.read.option("basePath", args.snapshot).parquet(args.snapshot)
        cs_cols = [c.strip() for c in args.cols.split(",") if c.strip()]
        table_checksum(rows, cols=cs_cols, group_cols=[pcol]).write.mode(
            "overwrite"
        ).parquet(args.checksums)

        fs = DriverFS(spark)
        if fs.exists(args.schema):
            schema = TableSchema.from_json(
                fs.read_bytes(args.schema).decode("utf-8")
            )
        else:
            schema = infer_schema(rows.drop(pcol), "incremental_contract")
            fs.write_bytes(args.schema, schema.to_json().encode("utf-8"))

        audit = AuditLog(spark, args.audit)
        carried, removed = [], []
        if args.prev_checksums:
            diff = checksum_diff(
                spark.read.parquet(args.prev_checksums),
                spark.read.parquet(args.checksums),
                [pcol],
                include_unchanged=True,
            )
            by_status: dict[str, list[str]] = {}
            for r in diff.collect():
                by_status.setdefault(r["status"], []).append(r[pcol])
            removed = sorted(by_status.get("removed", []))
            carried = sorted(by_status.get("unchanged", []))
            if carried and args.prev_audit:
                prev = AuditLog(spark, args.prev_audit)
                done = prev.completed_partitions()
                old_rows = prev.read().collect()
                for part in carried:
                    if part not in done:
                        continue
                    audit.commit(
                        part,
                        [
                            {
                                "status": r["status"],
                                "rows": r["rows"],
                                "violations": r["violations"],
                                "checks": json.loads(r["checks"]),
                                "started": r["started"],
                                "finished": r["finished"],
                            }
                            for r in old_rows
                            if r["partition"] == part
                        ],
                    )
        report = run_partitions(
            table,
            audit,
            process_batch=validation_process_batch(schema, pcol),
            batch_size=args.batch_size,
        )
        from pyspark.sql import functions as F

        verdicts = {
            r["partition"]: int(r["v"])
            for r in audit.read()
            .groupBy("partition")
            .agg(F.sum("violations").alias("v"))
            .collect()
        }
        print(
            json.dumps(
                {
                    "revalidated": sorted(report.processed),
                    "carried": carried,
                    "removed": removed,
                    "failed": report.failed_partitions,
                    "violations": {
                        k: v for k, v in sorted(verdicts.items()) if v > 0
                    },
                }
            )
        )
        return 0 if report.ok else 1
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
