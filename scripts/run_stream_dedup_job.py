"""spark-submit entry point for STREAMING near-dedup: probe + grow the
persisted MinHash band index as document files arrive.

Fourth deployment shape (1: interleaved validation, 2: schema
validation runner, 3: batch curation) — the continuous-ingest flow:

    python scripts/make_pyfiles_zip.py /tmp/pfs.zip
    spark-submit --master <cluster> --py-files /tmp/pfs.zip \\
        scripts/run_stream_dedup_job.py \\
        --input s3a://.../arrivals --index s3a://.../band_index \\
        --matches s3a://.../matches --checkpoint s3a://.../ckpt \\
        [--continuous 30]

Default is CATCH-UP mode (``availableNow``): process every file not
yet recorded in the checkpoint, then exit — the shape a cron'd ingest
uses, resuming exactly where the last run stopped. ``--continuous N``
instead leaves the query running with an N-second processing-time
trigger. Either way, semantics come from
``streaming.dedup.stream_near_dedup``: per micro-batch the arriving
docs probe the standing index (matches land under
``<matches>/__epoch=<id>``), then join it; all side effects are
epoch-keyed overwrites, so retries/restarts never double-report.

``--fixture N`` synthesizes three epoch files with planted cross-epoch
near-dups into ``--input`` first (bare-cluster smoke runs). Prints ONE
JSON line of counts in catch-up mode. No master/parallelism hardcoded:
spark-submit owns cluster config.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _fixture_epochs(spark, input_dir: str, n: int) -> None:
    """Three arrival files: a base corpus, then two waves whose docs
    include suffix-mutated near-copies of earlier waves."""
    import os

    from pyspark.sql import functions as F

    def wave(lo: int, hi: int, suffix: str):
        return spark.range(lo, hi).select(
            F.col("id").cast("string").alias("doc_id"),
            F.concat(
                F.lit("streaming document body "),
                (F.col("id") % (n // 3 or 1)).cast("string"),
                F.lit(" about topic "),
                (F.col("id") % 5).cast("string"),
                F.lit(" with enough tokens to shingle reliably"),
                F.lit(suffix),
            ).alias("text"),
        )

    k = max(n // 3, 1)
    for i, suffix in enumerate(["", " tail", " tip"]):
        # literal sibling path: Hadoop would normalize "a/../b" away
        # while os.listdir resolves it through a not-yet-existing dir
        stage = f"{input_dir.rstrip('/')}.stage{i}"
        wave(i * k, (i + 1) * k, suffix).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = next(
            f for f in os.listdir(stage) if f.endswith(".parquet")
        )
        os.makedirs(input_dir, exist_ok=True)
        os.replace(f"{stage}/{part}", f"{input_dir}/epoch{i}.parquet")
        os.utime(f"{input_dir}/epoch{i}.parquet", (1_000_000_000 + i * 100,) * 2)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="arrivals dir (parquet)")
    ap.add_argument("--index", required=True, help="band index root")
    ap.add_argument("--matches", required=True, help="match sink root")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--max-files-per-trigger", type=int, default=1)
    ap.add_argument(
        "--continuous", type=float,
        help="run forever with this processing-time trigger (seconds); "
        "default: availableNow catch-up, then exit",
    )
    ap.add_argument("--fixture", type=int, help="synthesize N docs as 3 epochs")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from pandera_forge_spark.streaming.dedup import stream_near_dedup

    spark = SparkSession.builder.appName("pfs-stream-dedup").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.fixture:
        _fixture_epochs(spark, args.input, args.fixture)

    schema = f"{args.id_col} string, {args.text_col} string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(args.max_files_per_trigger))
        .parquet(args.input)
    )
    writer = stream_near_dedup(
        stream,
        args.index,
        args.matches,
        text_col=args.text_col,
        id_col=args.id_col,
        threshold=args.threshold,
        checkpoint=args.checkpoint,
    )

    if args.continuous is not None:
        q = writer.trigger(processingTime=f"{args.continuous} seconds").start()
        q.awaitTermination()
        return 0

    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()

    from pandera_forge_spark.sources.fs import DriverFS

    fs = DriverFS(spark)
    n_matches = 0
    epochs = []
    if fs.exists(args.matches):
        epochs = sorted(
            n for n in fs.listdir(args.matches) if n.startswith("__epoch=")
        )
        if epochs:
            n_matches = spark.read.parquet(
                f"{args.matches}/__epoch=*"
            ).count()
    n_indexed = spark.read.parquet(f"{args.index}/bands").select(
        args.id_col
    ).distinct().count()
    if fs.exists(f"{args.index}/bands_epochs"):
        n_indexed += (
            spark.read.option("basePath", f"{args.index}/bands_epochs")
            .parquet(f"{args.index}/bands_epochs/__epoch=*")
            .select(args.id_col).distinct().count()
        )
    print(json.dumps({
        "match_epochs": len(epochs),
        "matches": int(n_matches),
        "docs_indexed": int(n_indexed),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
