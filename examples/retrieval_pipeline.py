"""End-to-end corpus-retrieval walkthrough — the search-side twin of
examples/curation_pipeline.py, every stage a real engine operator,
runnable as-is against the driver testdata:

    python examples/retrieval_pipeline.py [sf_dir]

Stages (100-TB shapes per SCALE.md):
  1. index build         bm25_index -> persisted postings (the
                         inverted index; bucketBy(term) in production),
                         corpus_stats (1-row global state)
  2. sparse retrieval    bm25_topk over the PERSISTED postings — the
                         query-term filter prunes the index scan
  3. dense retrieval     quantize_embeddings (int8, 4x smaller store)
                         -> cosine_topk on the quantized codes
  4. hybrid ranking      rrf_fuse of the two bounded top-N lists
  5. leak triage         contamination of the top hybrid hits against
                         a benchmark frame (broadcast shingle probe) —
                         "is my best-retrieved training doc actually
                         an eval question?"
Prints one JSON report per stage; returns the report dict when called
in-process (the pytest smoke does exactly that).
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

QUERY = "hash join spark window"


def run(spark: SparkSession, sf_dir: str, index_dir: str | None = None) -> dict:
    report: dict = {}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )

    # 1. build + persist the inverted index once; queries then touch
    #    only their own terms' postings (bucketBy(term) on a real
    #    warehouse table makes that a bucket prune)
    own_tmp = index_dir is None
    tmp = tempfile.TemporaryDirectory() if own_tmp else None
    try:
        return _run_stages(spark, report, docs, emb, tmp.name if own_tmp else index_dir)
    finally:
        if tmp is not None:
            tmp.cleanup()


def _run_stages(spark, report: dict, docs, emb, base: str) -> dict:
    from pandera_forge_spark.operators.search import (
        bm25_index,
        bm25_topk,
        corpus_stats,
        rrf_fuse,
    )
    from pandera_forge_spark.operators.similarity import (
        cosine_topk,
        quantize_embeddings,
    )
    from pandera_forge_spark.operators.text import contamination

    postings_path = f"{base}/postings"
    bm25_index(docs, "text", "doc_id").write.mode("overwrite").parquet(
        postings_path
    )
    idx = spark.read.parquet(postings_path)
    st = corpus_stats(docs, "text")
    report["index"] = {
        "postings": idx.count(),
        "docs": docs.count(),
    }

    # 2. sparse: BM25 over the persisted postings
    sparse = bm25_topk(
        docs, "text", "doc_id", QUERY, k=20, index=idx, stats=st
    )
    report["sparse"] = {"hits": sparse.count()}

    # 3. dense: int8-quantized cosine (same top-k plan, 4x smaller
    #    vectors; scores engine-exact integer arithmetic)
    q = quantize_embeddings(emb, "embedding")
    corpus_q = q.select(
        "vec_id", F.col("qvec").cast("array<double>").alias("embedding")
    )
    # probe with the lowest-id vector; fail with a real message rather
    # than a NoneType subscript when the corpus is empty
    probe = corpus_q.orderBy("vec_id").head()
    if probe is None:
        raise ValueError("embeddings corpus is empty — nothing to retrieve")
    qv = probe["embedding"]
    dense = cosine_topk(corpus_q, qv, k=20).select(
        F.col("vec_id").alias("doc_id"), F.col("cosine").alias("score")
    )
    report["dense"] = {"hits": dense.count()}

    # 4. hybrid: reciprocal-rank fusion of the two bounded lists
    fused = rrf_fuse([(sparse, "score"), (dense, "score")], "doc_id", k=10)
    fused_rows = fused.collect()
    report["hybrid"] = {
        "top": [int(r["doc_id"]) for r in fused_rows],
    }

    # 5. leak triage: shingle-contamination of the winners against a
    #    stand-in benchmark (first 20 docs) — broadcast probe, no
    #    corpus shuffle
    bench = docs.where(F.col("doc_id") < 20).select("text")
    winners = docs.join(
        F.broadcast(fused.select("doc_id")), "doc_id"
    )
    cont = contamination(winners, bench, "text", "doc_id")
    flagged = cont.where(F.col("contamination_ratio") >= 0.8).count()
    report["leak_triage"] = {
        "checked": cont.count(),
        "flagged_ratio_ge_0.8": flagged,
    }
    return report


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("retrieval-pipeline-example")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    try:
        report = run(spark, sf_dir)
        print(json.dumps(report, indent=2))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
