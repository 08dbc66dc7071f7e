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

try:
    import pandera_forge_spark  # noqa: F401 — resolves from --py-files
except ImportError:  # running from a checkout without the zip
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _fixture_epochs(spark, input_dir: str, n: int) -> None:
    """Exactly ``n`` docs as three arrival files: a base corpus, then
    two waves whose docs are suffix-mutated near-copies of earlier
    waves. Driver-local file manipulation by design (mtime ordering
    needs os.utime) — fixture smoke runs are local-path only."""
    import os
    import shutil

    if "://" in input_dir:
        raise ValueError(
            "--fixture synthesizes local files only (mtime-ordered via "
            "os.utime); point --input at a local path for smoke runs"
        )

    from pyspark.sql import functions as F

    k = max(n // 3, 1)

    def wave(lo: int, hi: int, suffix: str):
        return spark.range(lo, hi).select(
            F.col("id").cast("string").alias("doc_id"),
            F.concat(
                F.lit("streaming document body "),
                (F.col("id") % k).cast("string"),
                F.lit(" about topic "),
                (F.col("id") % 5).cast("string"),
                F.lit(" with enough tokens to shingle reliably"),
                F.lit(suffix),
            ).alias("text"),
        )

    bounds = [(0, k), (k, 2 * k), (2 * k, n)]  # last wave absorbs remainder
    for i, ((lo, hi), suffix) in enumerate(zip(bounds, ["", " tail", " tip"])):
        if lo >= hi:
            continue
        # literal sibling path: Hadoop would normalize "a/../b" away
        # while os.listdir resolves it through a not-yet-existing dir
        stage = f"{input_dir.rstrip('/')}.stage{i}"
        wave(lo, hi, suffix).coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(
            f for f in os.listdir(stage) if f.endswith(".parquet")
        )
        os.makedirs(input_dir, exist_ok=True)
        os.replace(f"{stage}/{part}", f"{input_dir}/epoch{i}.parquet")
        shutil.rmtree(stage, ignore_errors=True)
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
    ap.add_argument(
        "--full-report", action="store_true",
        help="also census the WHOLE index and match history (O(index) "
        "scans — the default report covers only this run's new epochs)",
    )
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

    from pandera_forge_spark.sources.fs import DriverFS

    fs = DriverFS(spark)

    def match_epochs() -> set:
        if not fs.exists(args.matches):
            return set()
        return {
            n for n in fs.listdir(args.matches) if n.startswith("__epoch=")
        }

    before = match_epochs()
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()

    # default report is scoped to THIS run's new epochs — a daily
    # catch-up never pays an O(match-history) or O(index) scan just to
    # print a count line
    new_epochs = sorted(match_epochs() - before)
    n_matches = sum(
        spark.read.parquet(f"{args.matches}/{e}").count() for e in new_epochs
    )
    report = {
        "new_match_epochs": len(new_epochs),
        "new_matches": int(n_matches),
    }
    if args.full_report:
        from pyspark.sql import functions as F

        n_all = 0
        all_epochs = sorted(match_epochs())
        if all_epochs:
            n_all = spark.read.parquet(f"{args.matches}/__epoch=*").count()
        ids = None
        if fs.exists(f"{args.index}/bands"):
            ids = spark.read.parquet(f"{args.index}/bands").select(
                F.col(args.id_col).alias("__id")
            )
        if fs.exists(f"{args.index}/bands_epochs"):
            ep = (
                spark.read.option("basePath", f"{args.index}/bands_epochs")
                .parquet(f"{args.index}/bands_epochs/__epoch=*")
                .select(F.col(args.id_col).alias("__id"))
            )
            ids = ep if ids is None else ids.unionByName(ep)
        report.update(
            match_epochs_total=len(all_epochs),
            matches_total=int(n_all),
            # union-distinct: a re-delivered doc_id in base + an epoch
            # counts once
            docs_indexed=int(ids.distinct().count()) if ids is not None else 0,
        )
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
