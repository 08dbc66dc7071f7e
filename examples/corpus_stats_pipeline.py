"""Corpus-statistics walkthrough — the fingerprint-and-alert loop for
a text corpus, runnable as-is against the driver testdata:

    python examples/corpus_stats_pipeline.py [sf_dir]

Stages (100-TB shapes per SCALE.md):
  1. shape fingerprint      zipf_fit + token_entropy + chao1_estimate
                            per language (three reads of ONE token
                            census shape: head slope, concentration,
                            unseen richness)
  2. quality axes           readability rollup + hill_tail_index on
                            doc length (prose health + heavy-tail
                            health)
  3. routing confidence     language_margin census (the band-0 mass
                            is the code-switched review queue)
  4. slice vocabulary       keyness_by_group (what makes each lang
                            bucket its bucket)
  5. FDR-controlled alerts  drift_by_partition -> ks_pvalue ->
                            bh_adjust at q=0.05 over per-source
                            doc-length slices: expected false-alert
                            fraction bounded no matter how many
                            slices the fleet audits
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
    from pandera_forge_spark.drift import (
        baseline_summary,
        bh_adjust,
        drift_by_partition,
        ks_pvalue,
    )
    from pandera_forge_spark.operators.text import (
        keyness_by_group,
        language_margin,
        readability,
        token_entropy,
        tokens,
        zipf_fit,
    )
    from pandera_forge_spark.profiler import (
        chao1_estimate,
        hill_tail_index,
    )

    report: dict = {}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. corpus-shape fingerprint per language
    zipf = {r["lang"]: round(r["slope"], 4) for r in zipf_fit(
        docs, group_cols=["lang"], top_k=30
    ).collect() if r["slope"] is not None}
    ent = {r["lang"]: round(r["eff_vocab"], 1) for r in token_entropy(
        docs, group_cols=["lang"]
    ).collect()}
    tok = docs.select(
        "lang", F.explode(tokens(F.col("text"))).alias("tok")
    ).where(F.col("tok") != "")
    chao = {r["lang"]: round(r["chao1"], 1) for r in chao1_estimate(
        tok, "tok", ["lang"]
    ).collect()}
    report["fingerprint"] = {
        lang: {
            "zipf_slope": zipf.get(lang),
            "eff_vocab": ent.get(lang),
            "chao1": chao.get(lang),
        }
        for lang in sorted(ent)
    }

    # 2. prose + tail health
    rd = readability(docs)
    flesch = rd.agg(
        F.sum("n_words").alias("w"), F.sum("n_syllables").alias("s"),
        F.sum("n_sentences").alias("st"),
    ).collect()[0]
    hill = {r["lang"]: (round(r["alpha"], 3) if r["alpha"] else None)
            for r in hill_tail_index(
                docs, "n_chars", ["lang"], "doc_id", k=50
            ).collect()}
    report["health"] = {
        "corpus_flesch": round(
            206.835 - 1.015 * (flesch["w"] / flesch["st"])
            - 84.6 * (flesch["s"] / flesch["w"]), 2
        ),
        "tail_alpha": hill,
    }

    # 3. routing confidence: how much mass sits in the ambiguous band
    m = docs.select(
        F.floor(language_margin(F.col("text")) * 10).alias("band")
    )
    total = m.count()
    low = m.where(F.col("band") == 0).count()
    report["routing"] = {
        "docs": total, "band0": low,
        "band0_frac": round(low / total, 4),
    }

    # 4. slice vocabulary
    keys = keyness_by_group(docs, "text", "lang", top_k=3, min_count=5)
    report["keyness"] = {
        lang: [r["token"] for r in rows]
        for lang, rows in _group_rows(keys.collect(), "lang").items()
    }

    # 5. FDR-bounded drift alerting over per-source length slices
    base = baseline_summary(docs, "n_chars", edges=[120.0, 240.0, 420.0])
    d = drift_by_partition(docs, "n_chars", ["source"], base)
    mdf = docs.where(F.col("n_chars").isNotNull()).agg(
        F.count(F.lit(1)).alias("__m")
    )
    scored = (
        d.crossJoin(F.broadcast(mdf))
        .withColumn("p", ks_pvalue(F.col("ks"), F.col("n"), F.col("__m")))
        .drop("__m")
    )
    alerts = bh_adjust(scored, "p", q=0.05, tie_cols=["source"])
    rej = [r["source"] for r in alerts.collect() if r["rejected"]]
    report["alerts"] = {"slices": alerts.count(), "rejected": sorted(rej)}

    for stage, payload in report.items():
        print(json.dumps({stage: payload}))
    return report


def _group_rows(rows, key):
    out: dict = {}
    for r in rows:
        out.setdefault(r[key], []).append(r)
    return out


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    s = (
        SparkSession.builder.master("local[4]")
        .appName("corpus-stats-pipeline")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        run(s, sf)
    finally:
        s.stop()
