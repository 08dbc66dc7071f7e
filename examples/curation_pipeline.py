"""End-to-end training-data curation walkthrough — every stage a real
engine operator, runnable as-is against the driver testdata:

    python examples/curation_pipeline.py [sf_dir]

Stages (each one scales to the 100-TB shapes documented in SCALE.md):
  1. ingest + normalize      read_parquet / normalize_text
  2. URL hygiene             canonicalize_url + domain_filter blocklist
                             + per_domain_cap anti-monoculture cap
  3. quality gate            filter_funnel (attrition report) + filter
  4. perplexity filter       train_bigram_lm + lm_score, drop the
                             least-fluent tail (CCNet/Gopher shape)
  5. dedup                   dedup_exact, then dedup_near (MinHash-LSH
                             pairs -> clusters -> min-id survivors)
  6. contract                infer_schema -> validate_table verdicts
  7. curate                  stratified_take per language + weighted
                             sample by length
  8. export manifest         pack_concat_split + deterministic_shuffle
                             + leak-aware train_val_test_split
Prints one JSON report per stage; returns the report dict when called
in-process (the pytest smoke does exactly that).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(spark: SparkSession, sf_dir: str) -> dict:
    from pandera_forge_spark.inference import infer_schema
    from pandera_forge_spark.operators.dedup import dedup_near
    from pandera_forge_spark.operators.sampling import (
        deterministic_shuffle,
        pack_concat_split,
        stratified_take,
        weighted_take,
    )
    from pandera_forge_spark.operators.text import (
        filter_funnel,
        normalize_text,
        quality_score,
        token_count,
    )
    from pandera_forge_spark.validator import validate_table

    report: dict = {}

    # 1. ingest + normalize (narrow projection, no shuffle)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        "lang",
        "source",
        normalize_text(F.col("text")).alias("text"),
    )

    # 2. URL hygiene: canonical page identity, blocklist, and the
    #    per-domain contribution cap (the corpus ships no URL column,
    #    so one is synthesized from the source — per-source co.uk
    #    hosts give each source its own registrable domain)
    from pandera_forge_spark.operators.web import (
        canonicalize_url,
        domain_filter,
        per_domain_cap,
    )

    with_urls = docs.withColumn(
        "url",
        canonicalize_url(
            F.concat(
                F.lit("HTTPS://"), F.upper("source"),
                F.lit(".co.uk/d/"), F.col("doc_id"),
                F.lit("?utm_source=crawl"),
            )
        ),
    )
    unblocked = domain_filter(with_urls, "url", ["src19.co.uk"])
    capped = per_domain_cap(unblocked, "url", 20, "doc_id").drop(
        "__domain", "url"
    )
    report["url_hygiene"] = {
        "input": docs.count(),
        "after_blocklist": unblocked.count(),
        "after_domain_cap": capped.count(),
    }
    docs = capped

    # 3. quality gate: sequential rule attrition in ONE scan, then the
    #    surviving filter applied
    rules = {
        "min_tokens": token_count(F.col("text")) >= 5,
        "quality": quality_score(F.col("text")) >= 0.2,
    }
    funnel = filter_funnel(docs, rules).collect()[0].asDict()
    report["funnel"] = {k: int(v) for k, v in funnel.items()}
    gated = docs
    for pred in rules.values():
        gated = gated.where(pred)

    # 4. perplexity filter: train a bigram LM on the gated corpus and
    #    drop the least-fluent 5% tail. At scale the LM trains ONCE on
    #    a trusted corpus and persists (vocab-sized counts); here it
    #    self-trains, which still ranks gibberish below fluent text.
    from pandera_forge_spark.operators.text import lm_score, train_bigram_lm

    lm = train_bigram_lm(gated, min_count=1)
    scores = lm_score(gated, lm, broadcast_lm=True)
    cutoff = scores.agg(
        F.percentile_approx("avg_logprob", 0.05).alias("c")
    ).collect()[0]["c"]
    fluent = scores.where(F.col("avg_logprob") >= F.lit(cutoff)).select("doc_id")
    n_before_ppl = gated.count()
    gated = gated.join(fluent, "doc_id", "left_semi")
    report["perplexity_filter"] = {
        "input": n_before_ppl,
        "cutoff_avg_logprob": round(float(cutoff), 6),
        "kept": gated.count(),
    }

    # 5. dedup: exact first (hash-groupBy survivors — the cheap pass
    #    the near-dedup cost model assumes), then near (banded MinHash
    #    candidates, verified, clustered, min-id kept)
    from pandera_forge_spark.operators.dedup import dedup_exact

    n_gated = gated.count()
    exact = dedup_exact(gated, "text", "doc_id")
    survivors, mapping = dedup_near(exact, "text", "doc_id", threshold=0.7)
    survivors = survivors.persist()
    report["dedup"] = {
        "input": n_gated,
        "after_exact": exact.count(),
        "survivors": survivors.count(),
        "clustered_ids": mapping.count(),
    }

    # 6. contract: infer on the cleaned corpus, validate it back
    schema = infer_schema(survivors, "curated_documents")
    res = validate_table(survivors, schema)
    report["validation"] = {"ok": res.ok, "checks": len(res.counts)}

    # 7. curate: deterministic per-language take + length-weighted draw
    per_lang = stratified_take(survivors, ["lang"], 50, "doc_id")
    weighted = weighted_take(
        survivors.withColumn("n_chars", F.length("text")),
        100,
        "doc_id",
        "n_chars",
    )
    report["curation"] = {
        "stratified_rows": per_lang.count(),
        "weighted_rows": weighted.count(),
    }

    # 8. export: pack manifest + reproducible shard/order columns
    packed = pack_concat_split(
        per_lang.withColumn("n_tokens", token_count(F.col("text"))),
        "doc_id",
        "n_tokens",
        capacity=512,
    )
    shuffled = deterministic_shuffle(per_lang, "doc_id", n_shards=8)
    # leak-aware split: group on source so near-identical docs from one
    # site can never straddle train and eval
    from pandera_forge_spark.operators.sampling import train_val_test_split

    split = train_val_test_split(
        per_lang, "doc_id", {"train": 0.9, "val": 0.1}, group_col="source"
    )
    report["export"] = {
        "packs": int(packed.agg(F.max("pack_last")).collect()[0][0]) + 1,
        "shards": shuffled.select("__shard").distinct().count(),
        "split": {
            r["__split"]: r["n"]
            for r in split.groupBy("__split")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        },
    }
    survivors.unpersist()
    return report


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("curation-pipeline-example")
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
