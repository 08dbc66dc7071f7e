"""spark-submit entry point for the interleaved-document validation job.

North-rule deployment shape: the engine ships as a zip on
``--py-files`` and this script is the driver program —

    python scripts/make_pyfiles_zip.py /tmp/pfs.zip
    spark-submit --master <cluster> --py-files /tmp/pfs.zip \\
        scripts/run_validation_job.py \\
        --docs <parquet path of (doc_id, spans[, bucket])> \\
        --expected <parquet path of the reference corpus> \\
        --audit /path/to/audit_out [--resume]

With ``--fixture N`` instead of ``--docs/--expected``, the job
generates the deterministic N-doc fixture + mutated twin (for smoke
runs on a bare cluster). Verdicts append to ``<audit>/verdicts``; with
``--resume``, buckets already present in the audit output are skipped
(anti-join on the manifest — the same idempotent-batch semantics as
runner.run_partitions, expressed over the bucket partition column).

No master/parallelism is hardcoded: spark-submit owns the cluster
config, the job only declares the plan.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

# when run from the repo (no --py-files), make the package importable
try:
    import pandera_forge_spark  # noqa: F401 — resolves from --py-files
except ImportError:  # running from a checkout without the zip
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", help="parquet path: actual documents")
    ap.add_argument("--expected", help="parquet path: expected documents")
    ap.add_argument("--fixture", type=int, help="generate an N-doc fixture instead")
    ap.add_argument("--audit", required=True, help="audit output directory")
    ap.add_argument("--bucket-col", default="bucket")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pandera_forge_spark.fixtures import make_documents, mutate_documents
    from pandera_forge_spark.pipeline import interleaved_verdicts

    spark = SparkSession.builder.appName("pfs-validate-interleaved").getOrCreate()

    if args.fixture:
        expected = make_documents(spark, args.fixture)
        actual = mutate_documents(expected)
    else:
        if not (args.docs and args.expected):
            ap.error("--docs and --expected required unless --fixture is given")
        actual = spark.read.parquet(args.docs)
        expected = spark.read.parquet(args.expected)

    verdict_path = f"{args.audit}/verdicts"
    if args.resume:
        try:
            done = {
                r[0]
                for r in spark.read.parquet(verdict_path)
                .select(args.bucket_col)
                .distinct()
                .collect()
            }
        except Exception:
            done = set()
        if done:
            actual = actual.where(~F.col(args.bucket_col).isin(*done))
            expected = expected.where(~F.col(args.bucket_col).isin(*done))
            print(f"resume: skipping {len(done)} completed buckets", file=sys.stderr)

    verdicts = interleaved_verdicts(actual, expected, bucket_col=args.bucket_col)
    (
        verdicts.repartition(1)
        .write.mode("append")
        .partitionBy(args.bucket_col)
        .parquet(verdict_path)
    )
    n = spark.read.parquet(verdict_path).count()
    print(f"audit verdict rows: {n}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
