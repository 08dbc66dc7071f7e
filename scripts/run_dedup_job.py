"""spark-submit entry point for the corpus-curation job: dedup (exact
then near), optional deterministic stratified sampling, one pass out.

Third deployment shape (1: interleaved validation, 2: schema
validation runner) — the LLM-training-data flow:

    python scripts/make_pyfiles_zip.py /tmp/pfs.zip
    spark-submit --master <cluster> --py-files /tmp/pfs.zip \\
        scripts/run_dedup_job.py \\
        --docs s3a://.../documents --out s3a://.../curated \\
        [--method minhash|simhash] [--threshold 0.8] \\
        [--sample-per-stratum 1000 --strata-col lang]

Writes ``<out>/corpus`` (survivors), ``<out>/mapping`` (id →
cluster_id lineage for every clustered doc), and optionally
``<out>/sample``; prints ONE JSON line of counts. ``--fixture N``
synthesizes a deterministic N-doc corpus with planted duplicates for
bare-cluster smoke runs. No master/parallelism is hardcoded:
spark-submit owns cluster config.
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
    """Deterministic text corpus: every 10th doc is an exact copy of
    its predecessor, every 10th+1 a near copy (suffix mutation)."""
    from pyspark.sql import functions as F

    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("document body "),
            (F.col("id") / 10).cast("long").cast("string"),
            F.lit(" about topic "),
            (F.col("id") % 7).cast("string"),
            F.lit(" with enough tokens to shingle reliably across the corpus"),
        ).alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    )
    return base.withColumn(
        "text",
        F.when(F.col("doc_id") % 10 == 1, F.concat(F.col("text"), F.lit(" tail")))
        .otherwise(F.col("text")),
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", help="parquet path of (doc_id, text[, strata])")
    ap.add_argument("--fixture", type=int, help="synthesize N docs instead")
    ap.add_argument("--out", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--method", choices=["minhash", "simhash"], default="minhash")
    # default None: dedup_near applies 0.8 for minhash; simhash rejects
    # an explicit threshold (Hamming-based — pass max_hamming instead)
    ap.add_argument("--threshold", type=float, default=None)
    ap.add_argument("--checkpoint-dir", help="reliable checkpoint dir for clustering")
    ap.add_argument("--sample-per-stratum", type=int)
    ap.add_argument("--strata-col", default="lang")
    args = ap.parse_args()
    if (args.docs is None) == (args.fixture is None):
        ap.error("pass exactly one of --docs / --fixture")

    from pyspark.sql import SparkSession

    from pandera_forge_spark.operators.dedup import dedup_exact, dedup_near
    from pandera_forge_spark.operators.sampling import stratified_take

    spark = SparkSession.builder.appName("pfs-dedup").getOrCreate()
    docs = (
        spark.read.parquet(args.docs) if args.docs else _fixture(spark, args.fixture)
    )
    n_in = docs.count()

    exact = dedup_exact(docs, args.text_col, args.id_col)
    survivors, mapping = dedup_near(
        exact,
        args.text_col,
        args.id_col,
        threshold=args.threshold,
        method=args.method,
        checkpoint_dir=args.checkpoint_dir,
    )
    survivors.write.mode("overwrite").parquet(f"{args.out}/corpus")
    mapping.write.mode("overwrite").parquet(f"{args.out}/mapping")
    n_out = spark.read.parquet(f"{args.out}/corpus").count()
    n_clustered = spark.read.parquet(f"{args.out}/mapping").count()

    n_sample = None
    if args.sample_per_stratum:
        sample = stratified_take(
            spark.read.parquet(f"{args.out}/corpus"),
            [args.strata_col],
            args.sample_per_stratum,
            args.id_col,
        )
        sample.write.mode("overwrite").parquet(f"{args.out}/sample")
        n_sample = spark.read.parquet(f"{args.out}/sample").count()

    report = {
        "docs_in": n_in,
        "corpus_out": n_out,
        "dropped": n_in - n_out,
        "clustered_ids": n_clustered,
        "sample": n_sample,
    }
    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
