"""spark-submit entry point for resumable, batched schema validation.

The second deployment shape (the first, run_validation_job.py, is the
interleaved-document pipeline): infer a constraint schema for a
hive-partitioned table, then validate every partition through the
checkpointed runner — k partitions per Spark job, per-partition audit
rows, resume-by-_SUCCESS on restart.

    python scripts/make_pyfiles_zip.py /tmp/pfs.zip
    spark-submit --master <cluster> --py-files /tmp/pfs.zip \\
        scripts/run_schema_validation.py \\
        --table s3a://.../events --partition-col day \\
        --audit s3a://.../audit [--batch-size 16] \\
        [--infer-sample 0.1] [--pattern-sample 10000]

No master/parallelism is hardcoded: spark-submit owns cluster config.
Table and audit paths take any scheme the cluster's Hadoop FS can
reach (s3a://, hdfs://, local): the manifest listing and the
per-partition audit commits go through the same FileSystem API as the
Spark reads (sources/fs.DriverFS), not the driver's local filesystem.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

try:
    import pandera_forge_spark  # noqa: F401 — resolves from --py-files
except ImportError:  # running from a checkout without the zip
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="hive-partitioned parquet root")
    ap.add_argument("--partition-col", required=True)
    ap.add_argument("--audit", required=True, help="audit output directory")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument(
        "--infer-sample",
        type=float,
        default=None,
        help="seeded fraction to infer the schema from (default: full table)",
    )
    ap.add_argument(
        "--pattern-sample",
        type=int,
        default=10_000,
        help="rows for regex-pattern detection (0 = full scan)",
    )
    ap.add_argument(
        "--schema-json",
        help="validate against this persisted TableSchema contract "
        "instead of inferring (see TableSchema.to_json)",
    )
    ap.add_argument(
        "--save-schema-json",
        help="write the inferred contract here for future runs",
    )
    ap.add_argument("--fail-fast", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from pandera_forge_spark.inference import infer_schema
    from pandera_forge_spark.runner import (
        AuditLog,
        HivePartitionedParquet,
        run_partitions,
        validation_process_batch,
    )
    from pandera_forge_spark.sources.readers import DEFAULT_SAMPLE_SEED

    spark = SparkSession.builder.appName("pfs-validate-schema").getOrCreate()

    table = HivePartitionedParquet(spark, args.table, args.partition_col)
    if args.schema_json:
        from pandera_forge_spark.schema import TableSchema

        schema = TableSchema.from_json(Path(args.schema_json).read_text())
        print(
            f"loaded contract {schema.name}: {len(schema.checks())} checks",
            file=sys.stderr,
        )
    else:
        full = spark.read.option("basePath", args.table).parquet(args.table)
        sample = full
        if args.infer_sample and 0 < args.infer_sample < 1:
            sample = full.sample(False, args.infer_sample, seed=DEFAULT_SAMPLE_SEED)
        schema = infer_schema(
            sample,
            "InferredModel",
            pattern_sample=args.pattern_sample or None,
        )
        print(
            f"inferred {sum(1 for c in schema.columns if c.pandera_type)} columns, "
            f"{len(schema.checks())} checks",
            file=sys.stderr,
        )
        if args.save_schema_json:
            Path(args.save_schema_json).write_text(schema.to_json())

    audit = AuditLog(spark, args.audit)
    report = run_partitions(
        table,
        audit,
        batch_size=args.batch_size,
        process_batch=validation_process_batch(schema, args.partition_col),
        fail_fast=args.fail_fast,
    )
    print(
        f"processed={len(report.processed)} skipped={len(report.skipped)} "
        f"failed={len(report.failed_partitions)}"
    )
    spark.stop()
    return 0 if report.ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
